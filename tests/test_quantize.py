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


def test_quantize_linear_int4_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) / 8)
    p = {"w": w, "b": jnp.asarray(rng.randn(32).astype(np.float32))}
    q = quantize_linear(p, bits=4)
    assert q["w"].dtype == jnp.int4
    assert is_quantized(q)

    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    y_ref = np.asarray(apply_linear(p, x))
    y_q = np.asarray(apply_linear(q, x))
    # per-channel int4: 15 levels per channel range — ~16x coarser than int8
    err = np.abs(y_q - y_ref) / (np.abs(y_ref).max() + 1e-6)
    assert err.max() < 0.35
    # ...but it must still beat a zeroed weight by a wide margin
    assert np.abs(y_q - y_ref).max() < 0.5 * np.abs(y_ref).max()


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
    assert qparams["flow_lm"]["transformer"]["layers"][0]["in_proj"]["w"].dtype == jnp.int4


def test_quantized_bf16_runtime_runs():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=9))
    model = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    rt = TPURuntime(model, dtype=jnp.bfloat16, seed=1, frame_bucket=64, quantize=True)
    out = rt.generate_audio([3, 7], GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=3))
    assert len(out) == 3 * 1920
    assert np.all(np.isfinite(out))
