"""Generation runtime tests: the jitted while-loop AR pipeline vs a
step-by-step host-loop oracle, EOS countdown semantics, determinism,
voice conditioning paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import flow_transformer as ftr
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.runtime.generate import _ar_loop
from go_pocket_tts_tpu.utils.safetensors import (
    VoiceModelState,
    encode_tensors,
    open_store_from_bytes,
)

ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def model():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=21))
    return load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)


@pytest.fixture(scope="module")
def runtime(model):
    return TPURuntime(model, seed=1234, frame_bucket=64)


def _host_loop_reference(model, tokens, key, max_steps, eos_threshold, temperature, frames_after_eos):
    """Step-by-step host loop implementing runtime_native_safetensors.go:155-201
    with the same per-step noise stream as the jitted while_loop."""
    params = model.params["flow_lm"]
    cfg = model.config.flow_lm
    L = cfg.latent_dim

    emb = flm.text_embeddings(params, jnp.asarray(np.asarray(tokens, np.int32)[None]))
    # Same bucketing as the runtime (frame_bucket=64, prompt bucket 16).
    from go_pocket_tts_tpu.utils import buckets as bk

    prompt_bucket = bk.pick_bucket(emb.shape[1], bk.PROMPT_BUCKETS)
    capacity = bk.round_up(prompt_bucket, 64) + 64
    cache = ftr.init_kv_cache(cfg.transformer, 1, capacity)
    padded = jnp.pad(emb, ((0, 0), (0, prompt_bucket - emb.shape[1]), (0, 0)))
    cache = flm.prompt(params, cfg, cache, padded, jnp.int32(emb.shape[1]))

    sigma = np.sqrt(max(temperature, 0.0))
    frame = jnp.full((1, 1, L), jnp.nan)
    frames = []
    countdown = None
    for step in range(max_steps):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (1, L), dtype=jnp.float32) * sigma
        cache, frame, eos_logit = flm.ar_core(params, cfg, cache, frame, noise)
        frames.append(np.asarray(frame)[0, 0])
        is_eos = float(eos_logit[0]) > eos_threshold
        if is_eos and countdown is None:
            countdown = frames_after_eos
        if countdown is not None:
            if countdown == 0:
                break
            countdown -= 1
    return np.stack(frames)


def test_ar_loop_matches_host_loop(model):
    """The single-program while_loop must reproduce the host-driven loop
    frame-for-frame (same RNG stream, same EOS bookkeeping)."""
    tokens = [3, 7, 11, 2]
    key = jax.random.PRNGKey(99)
    eos_threshold = -1e9  # force EOS at step 0 → frames_after_eos+1 frames
    want = _host_loop_reference(model, tokens, key, 30, eos_threshold, 0.7, 3)
    assert want.shape[0] == 4  # EOS frame + 3

    rt = TPURuntime(model, seed=0, frame_bucket=64)
    cfgs = model.config.flow_lm
    params = model.params["flow_lm"]
    from go_pocket_tts_tpu.utils import buckets as bk

    emb = flm.text_embeddings(params, jnp.asarray(np.asarray(tokens, np.int32)[None]))
    prompt_bucket = bk.pick_bucket(emb.shape[1], bk.PROMPT_BUCKETS)
    capacity = bk.round_up(prompt_bucket, 64) + 64
    cache = ftr.init_kv_cache(cfgs.transformer, 1, capacity)
    padded = jnp.pad(emb, ((0, 0), (0, prompt_bucket - emb.shape[1]), (0, 0)))
    cache = flm.prompt(params, cfgs, cache, padded, jnp.int32(emb.shape[1]))

    frames, n_frames, _ = _ar_loop(
        params,
        cfgs,
        cache,
        key,
        jnp.int32(30),
        jnp.float32(eos_threshold),
        jnp.float32(0.7),
        jnp.int32(3),
        1,
        64,
    )
    n = int(n_frames[0])
    assert n == want.shape[0]
    np.testing.assert_allclose(np.asarray(frames)[0, :n], want, atol=1e-4, rtol=1e-3)


def test_eos_never_fires_runs_to_max(model):
    tokens = [1, 2, 3]
    rt = TPURuntime(model, seed=7, frame_bucket=64)
    audio = rt.generate_audio(
        tokens,
        GenerateConfig(max_steps=5, eos_threshold=1e9, temperature=0.0),
    )
    assert len(audio) == 5 * 1920


def test_generate_deterministic_with_seed(model):
    a = TPURuntime(model, seed=42, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=4, eos_threshold=1e9)
    )
    b = TPURuntime(model, seed=42, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=4, eos_threshold=1e9)
    )
    np.testing.assert_array_equal(a, b)
    c = TPURuntime(model, seed=43, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=4, eos_threshold=1e9)
    )
    assert not np.array_equal(a, c)


def test_zero_temperature_ignores_seed(model):
    a = TPURuntime(model, seed=1, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=3, eos_threshold=1e9, temperature=0.0)
    )
    b = TPURuntime(model, seed=2, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=3, eos_threshold=1e9, temperature=0.0)
    )
    np.testing.assert_array_equal(a, b)


def test_empty_tokens_rejected(runtime):
    with pytest.raises(ValueError):
        runtime.generate_audio([], GenerateConfig())


def test_out_of_range_token_rejected(runtime):
    with pytest.raises(ValueError, match="out of range"):
        runtime.generate_audio([10_000], GenerateConfig(max_steps=2))


def test_voice_embedding_and_state_mutually_exclusive(runtime):
    emb = np.zeros((1, 2, ARCH.d_model), np.float32)
    state = VoiceModelState(modules={"m": {"offset": np.array([0.0])}})
    with pytest.raises(ValueError, match="mutually exclusive"):
        runtime.generate_audio(
            [1], GenerateConfig(voice_embedding=emb, voice_model_state=state)
        )


def test_voice_embedding_changes_output(model):
    base = TPURuntime(model, seed=5, frame_bucket=64).generate_audio(
        [5, 6, 7], GenerateConfig(max_steps=3, eos_threshold=1e9, temperature=0.0)
    )
    emb = np.random.RandomState(0).randn(1, 3, ARCH.d_model).astype(np.float32) * 0.3
    voiced = TPURuntime(model, seed=5, frame_bucket=64).generate_audio(
        [5, 6, 7],
        GenerateConfig(
            max_steps=3, eos_threshold=1e9, temperature=0.0, voice_embedding=emb
        ),
    )
    assert len(base) == len(voiced)
    assert not np.allclose(base, voiced)


def test_voice_model_state_path(model):
    """Voice model-state conditioning feeds the hydrated KV cache."""
    tcfg = model.config.flow_lm.transformer
    rng = np.random.RandomState(2)
    t_v = 3
    modules = {}
    for li in range(tcfg.num_layers):
        kv = rng.randn(2, 1, t_v, tcfg.num_heads, tcfg.head_dim).astype(np.float32) * 0.2
        modules[f"transformer.layers.{li}.self_attn"] = {
            "cache": kv,
            "offset": np.array([float(t_v)], np.float32),
        }
    state = VoiceModelState(modules=modules)
    out = TPURuntime(model, seed=5, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=3, eos_threshold=1e9, temperature=0.0,
                               voice_model_state=state)
    )
    base = TPURuntime(model, seed=5, frame_bucket=64).generate_audio(
        [5, 6], GenerateConfig(max_steps=3, eos_threshold=1e9, temperature=0.0)
    )
    assert not np.allclose(out, base)


def test_step_callback_reports_progress(model):
    calls = []
    TPURuntime(model, seed=5, frame_bucket=64).generate_audio(
        [5, 6],
        GenerateConfig(
            max_steps=4,
            eos_threshold=1e9,
            step_callback=lambda done, total: calls.append((done, total)),
        ),
    )
    assert calls == [(4, 4)]
