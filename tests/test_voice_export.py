"""Voice export pipeline tests: Mimi encoder, speaker projection, round-trip
into synthesis conditioning."""

import numpy as np
import pytest

import jax.numpy as jnp

from go_pocket_tts_tpu.models import mimi_encoder as enc
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.mimi import load_mimi
from go_pocket_tts_tpu.models.params import VarBuilder
from go_pocket_tts_tpu.tts.voice_export import VoiceEncoder, export_voice_embedding, resample_linear
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.safetensors import (
    encode_tensors,
    inspect_voice_file,
    load_voice_embedding,
    open_store_from_bytes,
    VoiceFileKind,
)

ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def store():
    return open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(ARCH, seed=44)))


def test_encoder_loads_and_downsamples_120x16(store):
    vb = VarBuilder(store)
    _, cfg = load_mimi(vb)
    params = enc.load_mimi_encoder(vb, cfg)
    assert params is not None
    n = 1920 * 4  # 4 latent frames of audio
    pcm = jnp.asarray(np.random.RandomState(0).randn(1, 1, n).astype(np.float32) * 0.1)
    emb = enc.mimi_encode(params, cfg, pcm)
    assert emb.shape == (1, ARCH.mimi_dim, 4)  # ÷120 SEANet, ÷16 downsample
    latent = enc.mimi_encode(params, cfg, pcm, to_latent=True)
    assert latent.shape == (1, ARCH.latent_dim, 4)


def test_encoder_absent_returns_none():
    ckpt = {
        k: v
        for k, v in synthetic.build_checkpoint(ARCH, seed=1).items()
        if not k.startswith(("mimi.encoder", "mimi.downsample", "condition_provider"))
    }
    store = open_store_from_bytes(encode_tensors(ckpt))
    vb = VarBuilder(store)
    _, cfg = load_mimi(vb)
    assert enc.load_mimi_encoder(vb, cfg) is None
    with pytest.raises(ValueError, match="no Mimi encoder"):
        VoiceEncoder(store)


def test_resample_linear():
    x = np.sin(np.linspace(0, 10, 16000)).astype(np.float32)
    y = resample_linear(x, 16000, 24000)
    assert len(y) == 24000
    assert resample_linear(x, 24000, 24000) is x


def test_export_voice_roundtrip(tmp_path, store):
    # Write a 24 kHz speaker WAV, export, verify the embedding file loads as
    # a voice and conditions synthesis.
    rng = np.random.RandomState(3)
    speaker = (rng.randn(1920 * 3) * 0.1).astype(np.float32)
    wav_path = tmp_path / "speaker.wav"
    wav_path.write_bytes(wav.encode_wav(speaker))

    model_path = tmp_path / "model.safetensors"
    from go_pocket_tts_tpu.utils.safetensors import write_file

    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=44))

    out_path = tmp_path / "voice.safetensors"
    emb = export_voice_embedding(str(model_path), str(wav_path), str(out_path))
    assert emb.shape == (1, 3, ARCH.d_model)

    assert inspect_voice_file(str(out_path)) == VoiceFileKind.EMBEDDING
    loaded = load_voice_embedding(str(out_path))
    np.testing.assert_allclose(loaded, emb, atol=1e-6)

    # And it conditions generation.
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime

    model = load_model_from_store(store, num_heads=ARCH.num_heads)
    rt = TPURuntime(model, seed=9, frame_bucket=64)
    base = rt.generate_audio([3, 4], GenerateConfig(max_steps=2, eos_threshold=1e9, temperature=0.0))
    voiced = rt.generate_audio(
        [3, 4],
        GenerateConfig(max_steps=2, eos_threshold=1e9, temperature=0.0, voice_embedding=loaded),
    )
    assert not np.allclose(base, voiced)


def test_encoder_resampling_path(store):
    ve = VoiceEncoder(store)
    x16k = (np.random.RandomState(5).randn(16000) * 0.1).astype(np.float32)
    emb = ve.encode_samples(x16k, 16000)
    # 1 s of audio → 12.5 latent frames → causal conv yields floor+1 range
    assert emb.shape[0] == 1 and emb.shape[2] == ARCH.d_model
    assert 10 <= emb.shape[1] <= 13


def test_encoder_matches_torch_oracle(store):
    """JAX Mimi encoder + speaker projection vs an independent torch
    implementation of the same checkpoint."""
    from go_pocket_tts_tpu.tts.runtime_torch import TorchRuntime

    samples = (np.random.RandomState(7).randn(1920 * 2) * 0.1).astype(np.float32)
    jax_emb = VoiceEncoder(store).encode_samples(samples, 24000)
    torch_emb = TorchRuntime(store, num_heads=ARCH.num_heads).encode_voice(samples)
    assert jax_emb.shape == torch_emb.shape
    np.testing.assert_allclose(jax_emb, torch_emb, atol=5e-3, rtol=5e-3)
