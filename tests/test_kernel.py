"""Bytes-kernel API + model-state voice export tests."""

import numpy as np
import pytest

from go_pocket_tts_tpu.kernel import PocketTTSKernel
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.text.sentencepiece import SentencePieceModel
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, write_file

ARCH = synthetic.tiny_arch()


def _tokenizer_bytes():
    m = SentencePieceModel()
    pieces = [("<unk>", 0.0, 2)] + [
        (p, -1.0, 1) for p in ("▁hello", "▁world", "▁test", ".", "▁a")
    ] + [(c, -5.0, 1) for c in "abcdefghijklmnopqrstuvwxyz▁HT"]
    for p, s, t in pieces:
        m.pieces.append(p)
        m.scores.append(s)
        m.types.append(t)
    return m.serialize()


@pytest.fixture(scope="module")
def model_bytes():
    return encode_tensors(synthetic.build_checkpoint(ARCH, seed=88))


def test_kernel_end_to_end(model_bytes):
    kernel = PocketTTSKernel(seed=3)
    assert not kernel.loaded
    with pytest.raises(RuntimeError, match="loadModel"):
        kernel.tokenize("x")

    kernel.load_model(model_bytes, _tokenizer_bytes())
    assert kernel.loaded
    assert kernel.normalize("  hello\r\nworld ") == "hello\nworld"
    ids = kernel.tokenize("hello world")
    assert ids

    progress = []
    data = kernel.synthesize(
        "hello world test",
        eos_threshold=1e9,
        temperature=0.0,
        progress=lambda done, total: progress.append((done, total)),
    )
    samples, rate = wav.decode_wav(data)
    assert rate == 24000
    assert len(samples) > 0 and len(samples) % 1920 == 0
    # Block-granular progress in frame units: monotone done counts, ending
    # exactly at (total, total) with total == generated frames.
    n_frames = len(samples) // 1920
    assert len(progress) >= 2  # >=1 per ~16-frame block + the final call
    dones = [d for d, _t in progress]
    assert dones == sorted(dones)
    assert progress[-1] == (n_frames, n_frames)
    assert all(d <= t for d, t in progress)


def test_kernel_continuity(model_bytes):
    """continuity=True threads the KV session across chunks: valid WAV,
    per-chunk progress ending at (total, total), and the output differs
    from the per-chunk-reset path (the carried state conditions audio)."""
    kernel = PocketTTSKernel(seed=3)
    kernel.load_model(model_bytes, _tokenizer_bytes())
    # Long enough to chunk (>50 tokens): continuity must actually carry.
    text = " ".join("hello world test a." for _ in range(20))

    progress = []
    data = kernel.synthesize(
        text,
        eos_threshold=1e9,
        temperature=0.0,
        continuity=True,
        progress=lambda done, total: progress.append((done, total)),
    )
    samples, rate = wav.decode_wav(data)
    assert rate == 24000 and len(samples) % 1920 == 0
    n_frames = len(samples) // 1920
    assert progress[-1] == (n_frames, n_frames)
    dones = [d for d, _t in progress]
    assert dones == sorted(dones)
    # r4: progress stays block-granular WITH continuity (the session-aware
    # frame streamer) — strictly more events than the per-chunk count.
    from go_pocket_tts_tpu.text import prepare_chunks

    n_chunks = len(prepare_chunks(kernel.normalize(text), kernel._tokenizer))
    assert n_chunks >= 2
    assert len(progress) > n_chunks + 1

    plain = kernel.synthesize(text, eos_threshold=1e9, temperature=0.0)
    plain_samples, _ = wav.decode_wav(plain)
    assert len(plain_samples) == len(samples)
    # later chunks must be conditioned differently by the carried state
    assert not np.allclose(samples, plain_samples, atol=1e-5)

    # The streamed session (progress path) and the plain session (no
    # progress) must be the same audio at temperature 0 — the progress
    # callback must not change what the user hears (block decoder is
    # sample-exact up to f32->int16 rounding of ~2e-4 decode tolerance).
    kernel2 = PocketTTSKernel(seed=3)
    kernel2.load_model(model_bytes, _tokenizer_bytes())
    data_noprog = kernel2.synthesize(
        text, eos_threshold=1e9, temperature=0.0, continuity=True
    )
    samples_noprog, _ = wav.decode_wav(data_noprog)
    assert len(samples_noprog) == len(samples)
    np.testing.assert_allclose(samples, samples_noprog, atol=5e-4)


def test_kernel_voice_bytes(model_bytes):
    kernel = PocketTTSKernel(seed=3)
    kernel.load_model(model_bytes, _tokenizer_bytes())
    base = kernel.synthesize("hello world", eos_threshold=1e9, temperature=0.0)

    voice = encode_tensors(
        {"audio_prompt": np.random.RandomState(0).randn(1, 2, ARCH.d_model).astype(np.float32) * 0.2}
    )
    voiced = kernel.synthesize(
        "hello world", voice=voice, eos_threshold=1e9, temperature=0.0
    )
    assert base != voiced


def test_export_model_state_roundtrip(tmp_path):
    """model-state export → hydration produces the same continuation as the
    in-memory prefilled cache."""
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
    from go_pocket_tts_tpu.tts.voice_export import export_voice_model_state
    from go_pocket_tts_tpu.utils.safetensors import (
        inspect_voice_file,
        load_voice_model_state,
        open_store_from_bytes,
        VoiceFileKind,
    )

    ckpt = synthetic.build_checkpoint(ARCH, seed=88)
    model_path = tmp_path / "model.safetensors"
    write_file(model_path, ckpt)

    speaker = tmp_path / "speaker.wav"
    speaker.write_bytes(
        wav.encode_wav((np.random.RandomState(2).randn(1920 * 2) * 0.1).astype(np.float32))
    )
    out = tmp_path / "voice_state.safetensors"
    frames = export_voice_model_state(
        str(model_path), str(speaker), str(out), num_heads=ARCH.num_heads
    )
    assert frames == 2
    assert inspect_voice_file(str(out)) == VoiceFileKind.MODEL_STATE

    state = load_voice_model_state(str(out))
    assert len(state.modules) == ARCH.num_layers
    cache = state.modules["transformer.layers.0.self_attn"]["cache"]
    assert cache.shape == (2, 1, frames, ARCH.num_heads, ARCH.d_model // ARCH.num_heads)

    # Hydrated synthesis runs and differs from unconditioned synthesis.
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(ckpt)), num_heads=ARCH.num_heads
    )
    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=3)
    base = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([2, 3], cfg)
    cfg.voice_model_state = state
    voiced = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([2, 3], cfg)
    assert not np.allclose(base, voiced)


def test_cli_export_voice_model_state(tmp_path, monkeypatch):
    from go_pocket_tts_tpu.cli.main import main

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=88))
    monkeypatch.setenv("POCKETTTS_PATHS_MODEL_PATH", str(model_path))

    speaker = tmp_path / "speaker.wav"
    speaker.write_bytes(
        wav.encode_wav((np.random.RandomState(1).randn(1920) * 0.1).astype(np.float32))
    )
    out = tmp_path / "voice.safetensors"
    rc = main(
        ["export-voice", "--input", str(speaker), "--output", str(out), "--format", "model-state"]
    )
    assert rc == 0
    from go_pocket_tts_tpu.utils.safetensors import inspect_voice_file, VoiceFileKind

    assert inspect_voice_file(str(out)) == VoiceFileKind.MODEL_STATE
