"""Service orchestration + cross-backend parity tests."""

import json

import numpy as np
import pytest

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import TPURuntime
from go_pocket_tts_tpu.tts import parity
from go_pocket_tts_tpu.tts.service import PCMChunk, Service
from go_pocket_tts_tpu.tts.runtime_torch import TorchRuntime
from go_pocket_tts_tpu.tts.voices import VoiceManager
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes, write_file

ARCH = synthetic.tiny_arch()


class _WordTokenizer:
    """One token id per word, bounded to the tiny vocab."""

    def encode(self, s):
        return [(abs(hash(w)) % ARCH.n_bins) for w in s.split()]


@pytest.fixture(scope="module")
def ckpt_bytes():
    return encode_tensors(synthetic.build_checkpoint(ARCH, seed=33))


@pytest.fixture(scope="module")
def jax_model(ckpt_bytes):
    return load_model_from_store(open_store_from_bytes(ckpt_bytes), num_heads=ARCH.num_heads)


def _tts_cfg(**overrides):
    from go_pocket_tts_tpu.config import TTSConfig

    base = dict(temperature=0.0, eos_threshold=1e9, max_steps=3, lsd_decode_steps=1)
    base.update(overrides)
    return TTSConfig(**base)


def test_service_synthesize_concatenates_chunks(jax_model):
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    audio = svc.synthesize("one two three. four five six.")
    # two sentences fit one chunk (≤50 tokens) → single chunk
    assert len(audio) % 1920 == 0
    assert len(audio) > 0


def test_service_stream_yields_final_flag(jax_model):
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())

    class _Tok:
        def encode(self, s):
            return [1] * len(s.split())

    svc.tokenizer = _Tok()
    text = " ".join(["word"] * 60) + ". " + " ".join(["more"] * 60) + "."
    chunks = list(svc.synthesize_stream(text))
    assert len(chunks) == 2
    assert [c.final for c in chunks] == [False, True]
    assert all(isinstance(c, PCMChunk) for c in chunks)


def test_service_cancel(jax_model):
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    from go_pocket_tts_tpu.tts.service import CancelledError

    with pytest.raises(CancelledError):
        list(svc.synthesize_stream("hello world.", cancel=lambda: True))


def test_user_set_max_steps_honored_even_at_default_value(jax_model):
    """--max-steps 256 (the default value, explicitly set) must NOT be
    silently overridden by the estimate (VERDICT r1 weak #7)."""
    from go_pocket_tts_tpu.text import ChunkMetadata

    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    chunk = ChunkMetadata(text="x", token_ids=[1] * 30, num_tokens=30, num_words=30)

    # Untouched default → estimate wins.
    svc = Service(rt, _WordTokenizer(), _tts_cfg(max_steps=256))
    svc.tts_cfg.max_steps_user_set = False
    assert svc._generate_config(chunk).max_steps == 150  # ceil((10+2)*12.5)

    # Explicitly set to the default value → honored verbatim.
    svc.tts_cfg.max_steps_user_set = True
    assert svc._generate_config(chunk).max_steps == 256

    # Config layer sets the marker for file/env/flag sources.
    import argparse

    from go_pocket_tts_tpu.config import load_config, register_flags

    parser = argparse.ArgumentParser()
    register_flags(parser)
    cfg = load_config(parser.parse_args(["--max-steps", "256"]))
    assert cfg.tts.max_steps_user_set is True
    cfg2 = load_config(parser.parse_args([]))
    assert cfg2.tts.max_steps_user_set is False


def test_service_deadline_clamps_max_steps(jax_model):
    """A request deadline bounds max_steps at dispatch: one step = one 80 ms
    frame, so the remaining budget maps to a frame bound (VERDICT r1 #8)."""
    import time

    from go_pocket_tts_tpu.text import ChunkMetadata

    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg(max_steps=0))
    chunk = ChunkMetadata(text="x", token_ids=[1] * 30, num_tokens=30, num_words=30)

    unclamped = svc._generate_config(chunk)
    assert unclamped.max_steps > 25  # estimate for 30 tokens: ceil((10+2)*12.5)=150

    clamped = svc._generate_config(chunk, deadline=time.monotonic() + 2.0)
    assert 1 <= clamped.max_steps <= 25  # 2 s * 12.5 fps = 25 frames

    from go_pocket_tts_tpu.tts.service import CancelledError

    with pytest.raises(CancelledError):
        svc._generate_config(chunk, deadline=time.monotonic() - 1.0)


def test_service_deadline_threads_through_stream(jax_model):
    """synthesize_stream(deadline=past) raises before any device work."""
    import time

    from go_pocket_tts_tpu.tts.service import CancelledError

    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    with pytest.raises(CancelledError):
        list(svc.synthesize_stream("hello world.", deadline=time.monotonic() - 1.0))


def test_voice_manager(tmp_path):
    voice_file = tmp_path / "v1.safetensors"
    write_file(voice_file, {"audio_prompt": np.zeros((2, 8), np.float32)})
    manifest = tmp_path / "manifest.json"
    manifest.write_text(
        json.dumps({"voices": [{"id": "v1", "path": "v1.safetensors", "license": "CC"}]})
    )
    mgr = VoiceManager(str(manifest))
    assert [v.id for v in mgr.list_voices()] == ["v1"]
    assert mgr.resolve_path("v1") == str(voice_file)
    with pytest.raises(KeyError):
        mgr.resolve_path("nope")


def test_voice_manager_duplicate_rejected(tmp_path):
    manifest = tmp_path / "manifest.json"
    manifest.write_text(
        json.dumps(
            {"voices": [{"id": "a", "path": "x"}, {"id": "a", "path": "y"}]}
        )
    )
    with pytest.raises(ValueError, match="duplicate"):
        VoiceManager(str(manifest))


# -- cross-backend parity ----------------------------------------------------


def test_jax_vs_torch_waveform_parity(jax_model, ckpt_bytes):
    """At temperature=0 the JAX engine and the independent torch engine must
    produce the same waveform within the 1e-3 RMS budget (BASELINE.md)."""
    tokens = [3, 17, 41, 9]
    from go_pocket_tts_tpu.runtime import GenerateConfig

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=6)

    jax_rt = TPURuntime(jax_model, seed=1, frame_bucket=64)
    a = jax_rt.generate_audio(tokens, cfg)

    torch_rt = TorchRuntime(open_store_from_bytes(ckpt_bytes), num_heads=ARCH.num_heads, seed=1)
    b = torch_rt.generate_audio(tokens, cfg)

    assert len(a) == len(b)
    assert parity.rms_delta(a, b) < 1e-3
    # And with a tight tolerance elementwise (same math, different frameworks).
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_parity_snapshots_roundtrip(tmp_path, jax_model):
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc_factory = lambda: Service(rt, _WordTokenizer(), _tts_cfg())
    snaps = parity.run_parity_case({"tpu": svc_factory}, "hello world test case.")
    assert snaps["tpu"].num_samples > 0
    p = tmp_path / "snaps.json"
    parity.save_snapshots(str(p), snaps)
    loaded = parity.load_snapshots(str(p))
    assert loaded["tpu"] == snaps["tpu"]


def test_service_prewarm(jax_model):
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    svc.prewarm(token_lengths=(3,))  # compiles without error; no output needed


def test_service_prewarm_voices_covers_voiced_traffic(
    jax_model, tmp_path, fresh_compile_cache
):
    """Voice conditioning keys its own program shapes; prewarm(voice_paths=…)
    must leave a voiced request with ZERO cold XLA compiles (the batcher is
    the serving shape where a mid-traffic compile stalls every lane)."""
    import logging

    import jax

    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime

    voice_file = str(tmp_path / "v.safetensors")
    write_file(
        voice_file, {"audio_prompt": np.zeros((5, ARCH.d_model), np.float32)}
    )
    rt = BatcherRuntime(jax_model, slots=2, seed=5, prompt_capacity=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    compiles = []

    class _Handler(logging.Handler):
        def emit(self, record):
            if "Finished XLA compilation" in record.getMessage():
                compiles.append(record.getMessage())

    handler = _Handler(level=logging.DEBUG)
    dispatch_log = logging.getLogger("jax._src.dispatch")
    prev_level = dispatch_log.level
    prev_flag = jax.config.jax_log_compiles
    try:
        svc.prewarm(token_lengths=(3,), voice_paths=[voice_file])
        dispatch_log.addHandler(handler)
        dispatch_log.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)
        audio = svc.synthesize("one two", voice_path=voice_file)
        assert len(audio) > 0
        # 15 tokens + voice 5 = prompt 20 → bucket 32: a bucket the naive
        # "warm at the caller's token_lengths" scheme missed.
        audio = svc.synthesize(" ".join(["word"] * 15), voice_path=voice_file)
        assert len(audio) > 0
        # Full-slot burst of voiced 45-token requests (prompt 50 → bucket
        # 64): the count=slots admission variant at a voice-extended bucket
        # (a verified pre-fix cold-compile repro).
        import concurrent.futures

        text45 = " ".join(["word"] * 45)
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            futs = [
                ex.submit(svc.synthesize, text45, voice_file) for _ in range(2)
            ]
            for f in futs:
                assert len(f.result(timeout=300)) > 0
    finally:
        jax.config.update("jax_log_compiles", prev_flag)
        dispatch_log.removeHandler(handler)
        dispatch_log.setLevel(prev_level)
        rt.close()
    assert compiles == [], f"voiced traffic hit cold variants: {compiles}"


def test_service_prewarm_voices_single_runtime(
    jax_model, tmp_path, fresh_compile_cache
):
    """The single-request TPURuntime buckets tokens WITHOUT the voice offset
    and keys capacity on voice_len + token_bucket — a voiced 40-token
    request after prewarm must also hit only warm programs (a verified
    pre-fix cold-compile repro)."""
    import logging

    import jax

    voice_file = str(tmp_path / "v.safetensors")
    write_file(
        voice_file, {"audio_prompt": np.zeros((5, ARCH.d_model), np.float32)}
    )
    rt = TPURuntime(jax_model, seed=5, frame_bucket=64)
    svc = Service(rt, _WordTokenizer(), _tts_cfg())
    compiles = []

    class _Handler(logging.Handler):
        def emit(self, record):
            if "Finished XLA compilation" in record.getMessage():
                compiles.append(record.getMessage())

    handler = _Handler(level=logging.DEBUG)
    dispatch_log = logging.getLogger("jax._src.dispatch")
    prev_level = dispatch_log.level
    prev_flag = jax.config.jax_log_compiles
    try:
        svc.prewarm(token_lengths=(10, 30, 50), voice_paths=[voice_file])
        dispatch_log.addHandler(handler)
        dispatch_log.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)
        audio = svc.synthesize(
            " ".join(["word"] * 40), voice_path=voice_file
        )
        assert len(audio) > 0
    finally:
        jax.config.update("jax_log_compiles", prev_flag)
        dispatch_log.removeHandler(handler)
        dispatch_log.setLevel(prev_level)
    assert compiles == [], f"voiced traffic hit cold variants: {compiles}"


def test_jax_vs_torch_session_parity(jax_model, ckpt_bytes):
    """Long-form continuity cross-check: a two-chunk session at temperature=0
    must produce the same audio per chunk in the JAX session path and the
    independent torch engine's session path (hydrated positions continue,
    the carried KV actually conditions chunk 2)."""
    from go_pocket_tts_tpu.runtime import GenerateConfig

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    jax_rt = TPURuntime(jax_model, seed=1, frame_bucket=64)
    a1, jcont = jax_rt.generate_audio_session([3, 17, 41], cfg, None, session_capacity=128)
    a2, _ = jax_rt.generate_audio_session([9, 5], cfg, jcont)

    torch_rt = TorchRuntime(
        open_store_from_bytes(ckpt_bytes), num_heads=ARCH.num_heads, seed=1
    )
    b1, tcont = torch_rt.generate_audio_session([3, 17, 41], cfg, None)
    b2, _ = torch_rt.generate_audio_session([9, 5], cfg, tcont)

    np.testing.assert_allclose(a1, b1, atol=5e-3)
    np.testing.assert_allclose(a2, b2, atol=5e-3)
    # and the state must matter: torch chunk 2 fresh != chunk 2 with state
    b2_fresh, _ = torch_rt.generate_audio_session([9, 5], cfg, None)
    assert not np.allclose(b2, b2_fresh, atol=1e-5)


def test_torch_runtime_voice_state_parity(jax_model, ckpt_bytes):
    """Voice model-state conditioning agrees between the JAX and torch
    engines at temperature 0."""
    import numpy as _np

    from go_pocket_tts_tpu.runtime import GenerateConfig
    from go_pocket_tts_tpu.utils.safetensors import VoiceModelState

    tcfg = jax_model.config.flow_lm.transformer
    rng = _np.random.RandomState(8)
    t_v = 3
    modules = {}
    for li in range(tcfg.num_layers):
        kv = rng.randn(2, 1, t_v, tcfg.num_heads, tcfg.head_dim).astype(_np.float32) * 0.2
        modules[f"transformer.layers.{li}.self_attn"] = {
            "cache": kv,
            "offset": _np.array([float(t_v)], _np.float32),
        }
    state = VoiceModelState(modules=modules)
    cfg = GenerateConfig(
        temperature=0.0, eos_threshold=1e9, max_steps=4, voice_model_state=state
    )

    a = TPURuntime(jax_model, seed=1, frame_bucket=64).generate_audio([3, 17], cfg)
    b = TorchRuntime(
        open_store_from_bytes(ckpt_bytes), num_heads=ARCH.num_heads, seed=1
    ).generate_audio([3, 17], cfg)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=5e-3)
