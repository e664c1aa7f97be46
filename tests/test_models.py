"""Model graph tests on synthetic checkpoints.

Mirrors the reference's test tiers (SURVEY.md §4): synthetic-weight model
tests, a NumPy cross-implementation oracle for flowNet (the analogue of the
Python parity fixtures), stateless-vs-stateful equivalence for the KV cache,
and causality/bucketing invariants for the Mimi decoder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import flow_net as fnet
from go_pocket_tts_tpu.models import flow_transformer as ftr
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.utils.safetensors import open_store_from_bytes

ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def ckpt():
    return synthetic.build_checkpoint(ARCH, seed=7)


@pytest.fixture(scope="module")
def model(ckpt):
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors

    store = open_store_from_bytes(encode_tensors(ckpt))
    return load_model_from_store(store, num_heads=ARCH.num_heads)


def test_load_infers_config(model):
    cfg = model.config
    assert cfg.flow_lm.d_model == ARCH.d_model
    assert cfg.flow_lm.latent_dim == ARCH.latent_dim
    assert cfg.flow_lm.transformer.num_layers == ARCH.num_layers
    assert cfg.flow_lm.transformer.num_heads == ARCH.num_heads
    assert cfg.mimi.steps_per_latent == 16
    assert cfg.mimi.samples_per_latent == 1920


def test_text_embeddings_gather(model, ckpt):
    ids = jnp.asarray([[1, 5, 9]])
    emb = model.text_embeddings(ids)
    assert emb.shape == (1, 3, ARCH.d_model)
    np.testing.assert_allclose(
        np.asarray(emb[0, 1]), ckpt["flow_lm.conditioner.embed.weight"][5], atol=1e-6
    )


# -- flowNet vs NumPy oracle -------------------------------------------------


def _np_linear(t, prefix, x):
    w = t[f"{prefix}.weight"]
    y = x @ w.T
    if f"{prefix}.bias" in t:
        y = y + t[f"{prefix}.bias"]
    return y


def _np_ln(t, prefix, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * t[f"{prefix}.weight"] + t[f"{prefix}.bias"]


def _np_silu(x):
    return x / (1 + np.exp(-x))


def _np_flow_direction(t, c, s, tt, x):
    """Independent NumPy transcription of flow_net.go:314-356."""

    def timestep(prefix, time):
        args = time * t[f"{prefix}.freqs"][None, :]
        emb = np.concatenate([np.cos(args), np.sin(args)], -1)
        h = _np_silu(_np_linear(t, f"{prefix}.mlp.0", emb))
        h = _np_linear(t, f"{prefix}.mlp.2", h)
        mean = h.mean(-1, keepdims=True)
        var = ((h - mean) ** 2).sum(-1, keepdims=True) / (h.shape[-1] - 1)
        return h / np.sqrt(var + 1e-5) * t[f"{prefix}.mlp.3.alpha"]

    xp = _np_linear(t, "flow_lm.flow_net.input_proj", x)
    y = 0.5 * (
        timestep("flow_lm.flow_net.time_embed.0", s)
        + timestep("flow_lm.flow_net.time_embed.1", tt)
    ) + _np_linear(t, "flow_lm.flow_net.cond_embed", c)

    cur = xp
    i = 0
    while f"flow_lm.flow_net.res_blocks.{i}.in_ln.weight" in t:
        p = f"flow_lm.flow_net.res_blocks.{i}"
        ada = _np_linear(t, f"{p}.adaLN_modulation.1", _np_silu(y))
        shift, scale, gate = np.split(ada, 3, -1)
        h = _np_ln(t, f"{p}.in_ln", cur, eps=1e-6)
        h = h * (1 + scale) + shift
        h = _np_silu(_np_linear(t, f"{p}.mlp.0", h))
        h = _np_linear(t, f"{p}.mlp.2", h)
        cur = cur + h * gate
        i += 1

    ada = _np_linear(t, "flow_lm.flow_net.final_layer.adaLN_modulation.1", _np_silu(y))
    shift, scale = np.split(ada, 2, -1)
    mean = cur.mean(-1, keepdims=True)
    var = ((cur - mean) ** 2).mean(-1, keepdims=True)
    out = (cur - mean) / np.sqrt(var + 1e-6)
    out = out * (1 + scale) + shift
    return _np_linear(t, "flow_lm.flow_net.final_layer.linear", out)


def test_flow_net_matches_numpy_oracle(model, ckpt):
    rng = np.random.RandomState(3)
    c = rng.randn(2, ARCH.d_model).astype(np.float32)
    s = np.zeros((2, 1), np.float32)
    tt = np.ones((2, 1), np.float32)
    x = rng.randn(2, ARCH.latent_dim).astype(np.float32)

    got = np.asarray(
        fnet.flow_direction(
            model.params["flow_lm"]["flow_net"],
            jnp.asarray(c),
            jnp.asarray(s),
            jnp.asarray(tt),
            jnp.asarray(x),
        )
    )
    want = _np_flow_direction(ckpt, c, s, tt, x)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=5e-3)


def test_lsd_decode_euler_steps(model):
    """x += f(...)/n per step (flow_lm.go:311-353): 2-step must equal manual."""
    p = model.params["flow_lm"]["flow_net"]
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(1, ARCH.d_model).astype(np.float32))
    x0 = jnp.asarray(rng.randn(1, ARCH.latent_dim).astype(np.float32))

    got = fnet.lsd_decode(p, c, x0, steps=2)

    x = x0
    for i in range(2):
        s = jnp.full((1, 1), i / 2.0)
        t = jnp.full((1, 1), (i + 1) / 2.0)
        x = x + fnet.flow_direction(p, c, s, t, x) / 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


# -- transformer: stateless vs cached equivalence ----------------------------


def test_prefill_plus_steps_match_stateless(model):
    """The static-cache formulation must reproduce the stateless full-sequence
    forward exactly: prefill text, then step frames one at a time, equals
    concat-everything (the Go stateless FlowMain path, flow_lm.go:355-384)."""
    params = model.params["flow_lm"]
    cfg = model.config.flow_lm
    rng = np.random.RandomState(5)

    t_text, n_frames = 6, 3
    text_emb = jnp.asarray(rng.randn(1, t_text, ARCH.d_model).astype(np.float32) * 0.3)
    frames = [
        jnp.asarray(rng.randn(1, 1, ARCH.latent_dim).astype(np.float32)) for _ in range(n_frames)
    ]

    # Stateless: transformer over concat(text, frames[0..i]) per step.
    stateless_hidden = []
    for i in range(n_frames):
        seq = jnp.concatenate(frames[: i + 1], axis=1)
        last, eos = flm.flow_main(params, cfg, seq, text_emb)
        stateless_hidden.append((np.asarray(last), np.asarray(eos)))

    # Stateful: prefill once, then steps.
    cache = ftr.init_kv_cache(cfg.transformer, batch=1, capacity=32)
    cache = flm.prompt(params, cfg, cache, text_emb)
    assert int(cache["offset"]) == t_text

    for i in range(n_frames):
        seq = flm._replace_nan_with_bos(frames[i], params["bos_emb"])
        x = flm.apply_linear(params["input_linear"], seq)
        y, cache = ftr.transformer_forward_cached(
            params["transformer"], cfg.transformer, cache, x
        )
        last, eos = flm._hidden_and_eos(params, y)
        np.testing.assert_allclose(
            np.asarray(last), stateless_hidden[i][0], atol=2e-4, rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(eos), stateless_hidden[i][1], atol=2e-4, rtol=2e-3
        )


def test_padded_prefill_matches_exact(model):
    """Zero-padded prefill with valid_len must leave the cache equivalent."""
    params = model.params["flow_lm"]
    cfg = model.config.flow_lm
    rng = np.random.RandomState(9)
    emb = rng.randn(1, 5, ARCH.d_model).astype(np.float32) * 0.3

    cache_a = ftr.init_kv_cache(cfg.transformer, 1, 32)
    cache_a = flm.prompt(params, cfg, cache_a, jnp.asarray(emb))

    padded = np.zeros((1, 9, ARCH.d_model), np.float32)
    padded[:, :5] = emb
    cache_b = ftr.init_kv_cache(cfg.transformer, 1, 32)
    cache_b = flm.prompt(params, cfg, cache_b, jnp.asarray(padded), valid_len=jnp.int32(5))

    assert int(cache_a["offset"]) == int(cache_b["offset"]) == 5

    # A subsequent step must produce identical output from both caches.
    frame = jnp.asarray(rng.randn(1, 1, ARCH.latent_dim).astype(np.float32))
    noise = jnp.zeros((1, ARCH.latent_dim))
    _, out_a, eos_a = flm.ar_core(params, cfg, cache_a, frame, noise)
    _, out_b, eos_b = flm.ar_core(params, cfg, cache_b, frame, noise)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eos_a), np.asarray(eos_b), atol=1e-5)


def test_nan_frame_uses_bos(model):
    params = model.params["flow_lm"]
    cfg = model.config.flow_lm

    nan_frame = jnp.full((1, 1, ARCH.latent_dim), jnp.nan)
    bos_frame = jnp.broadcast_to(params["bos_emb"], (1, 1, ARCH.latent_dim))
    noise = jnp.zeros((1, ARCH.latent_dim))

    cache = ftr.init_kv_cache(cfg.transformer, 1, 16)
    _, out_nan, _ = flm.ar_core(params, cfg, cache, nan_frame, noise)
    cache = ftr.init_kv_cache(cfg.transformer, 1, 16)
    _, out_bos, _ = flm.ar_core(params, cfg, cache, bos_frame, noise)
    np.testing.assert_allclose(np.asarray(out_nan), np.asarray(out_bos), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(out_nan)))


# -- voice model-state hydration ---------------------------------------------


def test_voice_state_hydration_matches_prefill(model):
    """Hydrating a cache from an exported [2,B,T,H,Dh] state must equal the
    cache produced by prefilling the same embeddings."""
    params = model.params["flow_lm"]
    cfg = model.config.flow_lm
    tcfg = cfg.transformer
    rng = np.random.RandomState(11)
    t_v = 4
    emb = jnp.asarray(rng.randn(1, t_v, ARCH.d_model).astype(np.float32) * 0.3)

    cache = ftr.init_kv_cache(tcfg, 1, 32)
    cache = flm.prompt(params, cfg, cache, emb)

    # Export in the upstream layout: [2, B, T, H, Dh], time-major.
    modules = {}
    for li in range(tcfg.num_layers):
        k = np.asarray(cache["k"])[li][:, :, :t_v]  # [B,H,T,Dh]
        v = np.asarray(cache["v"])[li][:, :, :t_v]
        kv = np.stack([np.moveaxis(k, 1, 2), np.moveaxis(v, 1, 2)])  # [2,B,T,H,Dh]
        modules[f"transformer.layers.{li}.self_attn"] = {
            "cache": kv,
            "offset": np.array([float(t_v)], np.float32),
        }

    hydrated = ftr.kv_cache_from_voice_state(tcfg, modules, capacity=32)
    assert int(hydrated["offset"]) == t_v
    np.testing.assert_allclose(
        np.asarray(hydrated["k"])[:, :, :, :t_v],
        np.asarray(cache["k"])[:, :, :, :t_v],
        atol=1e-6,
    )

    # And stepping from either cache is identical.
    frame = jnp.asarray(rng.randn(1, 1, ARCH.latent_dim).astype(np.float32))
    noise = jnp.zeros((1, ARCH.latent_dim))
    _, out_a, _ = flm.ar_core(params, cfg, cache, frame, noise)
    _, out_b, _ = flm.ar_core(params, cfg, hydrated, frame, noise)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_voice_state_mismatched_offsets_rejected(model):
    tcfg = model.config.flow_lm.transformer
    modules = {}
    for li in range(tcfg.num_layers):
        kv = np.zeros((2, 1, 4, tcfg.num_heads, tcfg.head_dim), np.float32)
        modules[f"transformer.layers.{li}.self_attn"] = {
            "cache": kv,
            "offset": np.array([float(li + 1)], np.float32),
        }
    with pytest.raises(ValueError, match="inconsistent"):
        ftr.kv_cache_from_voice_state(tcfg, modules, capacity=8)


# -- latent→mimi + Mimi decode -----------------------------------------------


def test_latent_to_mimi_fused_matches_explicit(model, ckpt):
    rng = np.random.RandomState(13)
    latent = rng.randn(1, 5, ARCH.latent_dim).astype(np.float32)
    got = np.asarray(model.latent_to_mimi(jnp.asarray(latent)))
    assert got.shape == (1, ARCH.mimi_dim, 5)

    # Explicit: denorm then 1x1 conv.
    w = ckpt["mimi.quantizer.output_proj.weight"][:, :, 0]
    denorm = latent * ckpt["flow_lm.emb_std"] + ckpt["flow_lm.emb_mean"]
    want = np.einsum("oc,btc->bot", w, denorm)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mimi_decode_shape_and_finite(model):
    rng = np.random.RandomState(17)
    latent = jnp.asarray(rng.randn(1, ARCH.mimi_dim, 3).astype(np.float32) * 0.1)
    pcm = np.asarray(model.mimi_decode(latent))
    assert pcm.shape == (1, 1, 3 * 1920)
    assert np.all(np.isfinite(pcm))


def test_mimi_decode_causal_bucketing(model):
    """Right-padding the latent must not change the prefix samples — the
    invariant that makes padded decode buckets and streaming exact."""
    rng = np.random.RandomState(19)
    latent = rng.randn(1, ARCH.mimi_dim, 4).astype(np.float32) * 0.1
    full = np.asarray(model.mimi_decode(jnp.asarray(latent)))

    padded = np.zeros((1, ARCH.mimi_dim, 7), np.float32)
    padded[:, :, :4] = latent
    padded_out = np.asarray(model.mimi_decode(jnp.asarray(padded)))

    np.testing.assert_allclose(padded_out[:, :, : 4 * 1920], full, atol=1e-4, rtol=1e-3)
