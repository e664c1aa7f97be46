"""INT8 weight-only quantization tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.models.params import apply_linear
from go_pocket_tts_tpu.models.quantize import is_quantized, quantize_linear, quantize_model_params
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

ARCH = synthetic.tiny_arch()


def test_quantize_linear_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) / 8)
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    p = {"w": w, "b": b}
    q = quantize_linear(p)
    assert q["w"].dtype == jnp.int8
    assert is_quantized(q)

    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    y_ref = np.asarray(apply_linear(p, x))
    y_q = np.asarray(apply_linear(q, x))
    # per-channel int8: relative error ~1/127 of the channel range
    err = np.abs(y_q - y_ref) / (np.abs(y_ref).max() + 1e-6)
    assert err.max() < 0.05


def test_quantize_model_params_structure():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=9))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    qparams = quantize_model_params(model.params)

    flow = qparams["flow_lm"]
    assert flow["transformer"]["layers"][0]["in_proj"]["w"].dtype == jnp.int8
    assert flow["flow_net"]["cond_embed"]["w"].dtype == jnp.int8
    # skipped: embedding gather, latent->mimi, norms, conv kernels, rope
    assert flow["conditioner_embed"].dtype == jnp.float32
    assert qparams["latent_to_mimi"]["w"].dtype == jnp.float32
    assert flow["transformer"]["layers"][0]["norm1"]["weight"].dtype == jnp.float32
    assert qparams["mimi"]["init_conv"]["w"].dtype == jnp.float32


def test_quantized_generation_close_to_f32():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=9))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)

    ref = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([3, 7], cfg)
    quant = TPURuntime(model, seed=1, frame_bucket=64, quantize=True).generate_audio(
        [3, 7], cfg
    )
    assert len(ref) == len(quant)
    # INT8 weights perturb the AR trajectory; demand bounded divergence.
    rms_ref = float(np.sqrt(np.mean(ref**2))) + 1e-9
    rms_err = float(np.sqrt(np.mean((ref - quant) ** 2)))
    assert rms_err / rms_ref < 0.6, (rms_err, rms_ref)
    assert np.all(np.isfinite(quant))


def test_int4_matmul_variants_agree():
    """The two XLA int4 formulations (split contractions vs in-flight
    dequant single dot; hardware A/B in scripts/exp_int4_step.py) must
    agree numerically on both grouped and per-channel scales."""
    from go_pocket_tts_tpu.models.params import set_int4_matmul_variant

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    xs = jnp.asarray(rng.randn(4, 96).astype(np.float32))
    grouped = quantize_linear(
        {"w": jnp.asarray(rng.randn(256, 32).astype(np.float32) / 8)}, bits=4
    )
    perchan = quantize_linear(
        {"w": jnp.asarray(rng.randn(96, 32).astype(np.float32) / 8)}, bits=4
    )
    assert grouped["scale"].ndim == 2 and perchan["scale"].ndim == 1
    try:
        set_int4_matmul_variant("split")
        y1g = np.asarray(apply_linear(grouped, x))
        y1p = np.asarray(apply_linear(perchan, xs))
        set_int4_matmul_variant("dequant")
        y2g = np.asarray(apply_linear(grouped, x))
        y2p = np.asarray(apply_linear(perchan, xs))
    finally:
        set_int4_matmul_variant("split")
    np.testing.assert_allclose(y1g, y2g, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(y1p, y2p, atol=1e-4, rtol=1e-4)


def test_quantize_linear_int4_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) / 8)
    p = {"w": w, "b": jnp.asarray(rng.randn(32).astype(np.float32))}
    q = quantize_linear(p, bits=4)
    assert q["w"].dtype == jnp.uint8  # packed int4
    assert is_quantized(q)

    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    y_ref = np.asarray(apply_linear(p, x))
    y_q = np.asarray(apply_linear(q, x))
    # per-channel int4: 15 levels per channel range — ~16x coarser than int8
    err = np.abs(y_q - y_ref) / (np.abs(y_ref).max() + 1e-6)
    assert err.max() < 0.35
    # ...but it must still beat a zeroed weight by a wide margin
    assert np.abs(y_q - y_ref).max() < 0.5 * np.abs(y_ref).max()


def test_int4_group_scales_beat_per_channel():
    """k=512 → group-wise scales [4, out]; with outlier rows confined to one
    group, grouped int4 RMS error must be well below per-channel (whose one
    scale per column is swamped by the outliers for EVERY row)."""
    rng = np.random.RandomState(1)
    w = rng.randn(512, 32).astype(np.float32) / 8
    w[7, :] *= 40.0  # outlier row swamps a whole-column scale
    p = {"w": jnp.asarray(w)}
    q = quantize_linear(p, bits=4)
    assert q["scale"].shape == (4, 32)

    x = jnp.asarray(rng.randn(16, 512).astype(np.float32))
    y_ref = np.asarray(apply_linear(p, x))
    y_g = np.asarray(apply_linear(q, x))

    # hand-built per-channel int4 over the full matrix
    scale = np.abs(w).max(axis=0) / 7.0
    wq = np.clip(np.round(w / scale), -7, 7)
    y_pc = np.asarray(x) @ (wq * scale)

    err_g = np.sqrt(np.mean((y_g - y_ref) ** 2))
    err_pc = np.sqrt(np.mean((y_pc - y_ref) ** 2))
    assert err_g < 0.6 * err_pc, (err_g, err_pc)


def test_int4_grouped_matches_independent_numpy():
    """Cross-implementation oracle for the grouped path: an independent
    numpy replication of quantize (scales, rounding, clip) AND dequant
    matmul must match the JAX apply_linear output to f32 tolerance."""
    rng = np.random.RandomState(3)
    k, n, gs = 384, 48, 128
    w = rng.randn(k, n).astype(np.float32) / 8
    b = rng.randn(n).astype(np.float32)
    q = quantize_linear({"w": jnp.asarray(w), "b": jnp.asarray(b)}, bits=4)

    # independent numpy quantization
    g = k // gs
    wg = w.reshape(g, gs, n)
    scale = np.abs(wg).max(axis=1) / 7.0
    scale = np.where(scale > 0, scale, 1.0)
    wq = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
    np.testing.assert_array_equal(np.asarray(q["scale"]), scale.astype(np.float32))
    from go_pocket_tts_tpu.models.quantize import depack_int4_pairs

    qvals = np.asarray(depack_int4_pairs(q["w"])).reshape(k, n)
    np.testing.assert_array_equal(qvals.reshape(g, gs, n), wq.astype(np.int8))

    x = rng.randn(5, k).astype(np.float32)
    y_np = (
        np.einsum("mgk,gkn->mgn", x.reshape(5, g, gs), wq) * scale[None, :, :]
    ).sum(axis=1) + b
    y_jax = np.asarray(apply_linear(q, jnp.asarray(x)))
    np.testing.assert_allclose(y_jax, y_np, atol=2e-4, rtol=1e-5)


def test_int4_grouped_generation_end_to_end():
    """Generation through grouped int4 (flow_dim=256 → every flow-net linear
    group-quantized, incl. the fused adaLN concat of [G, out] scales)."""
    import dataclasses

    arch = dataclasses.replace(
        synthetic.tiny_arch(), flow_dim=256, d_model=256, ffn_dim=256
    )
    data = encode_tensors(synthetic.build_checkpoint(arch, seed=4))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=arch.num_heads)
    qparams = quantize_model_params(model.params, bits=4)
    lin = qparams["flow_lm"]["transformer"]["layers"][0]["in_proj"]
    assert lin["w"].dtype == jnp.uint8 and lin["scale"].ndim == 2

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=3)
    out = TPURuntime(model, seed=1, frame_bucket=64, quantize=4).generate_audio(
        [3, 7], cfg
    )
    assert len(out) == 3 * 1920
    assert np.all(np.isfinite(out))


def test_quantize_linear_rejects_bad_bits():
    p = {"w": jnp.ones((4, 4), jnp.float32)}
    with pytest.raises(ValueError, match="bits"):
        quantize_linear(p, bits=2)


def test_int4_generation_runs_and_tracks_f32():
    """bits=4 end-to-end: the AR trajectory may diverge more than int8 but
    must stay finite and produce the configured frame count."""
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=9))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)

    ref = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([3, 7], cfg)
    q4 = TPURuntime(model, seed=1, frame_bucket=64, quantize=4).generate_audio(
        [3, 7], cfg
    )
    assert len(q4) == len(ref)
    assert np.all(np.isfinite(q4))
    qparams = quantize_model_params(model.params, bits=4)
    assert qparams["flow_lm"]["transformer"]["layers"][0]["in_proj"]["w"].dtype == jnp.uint8


def test_quantized_bf16_runtime_runs():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=9))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    rt = TPURuntime(model, dtype=jnp.bfloat16, seed=1, frame_bucket=64, quantize=True)
    out = rt.generate_audio([3, 7], GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=3))
    assert len(out) == 3 * 1920
    assert np.all(np.isfinite(out))
