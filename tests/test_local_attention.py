"""Blocked local attention must equal the dense position-masked formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from go_pocket_tts_tpu.ops import attention_with_positions
from go_pocket_tts_tpu.ops.local_attention import local_windowed_attention

RNG = np.random.RandomState(7)


@pytest.mark.parametrize("t,block,window", [(512, 256, 250), (1024, 256, 256), (512, 128, 100)])
def test_local_equals_dense(t, block, window):
    b, h, d = 1, 2, 16
    q = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    pos = jnp.arange(t, dtype=jnp.int32)

    dense = attention_with_positions(q, k, v, pos, pos, window)
    local = local_windowed_attention(q, k, v, window, block=block)
    np.testing.assert_allclose(np.asarray(local), np.asarray(dense), atol=2e-4, rtol=2e-4)


def test_local_rejects_bad_shapes():
    q = jnp.zeros((1, 1, 100, 8))
    with pytest.raises(ValueError, match="T % block"):
        local_windowed_attention(q, q, q, 50, block=64)
    q = jnp.zeros((1, 1, 128, 8))
    with pytest.raises(ValueError, match="window"):
        local_windowed_attention(q, q, q, 300, block=128)


def test_mimi_decode_long_matches_short_concat():
    """End-to-end: the local-attention path (T=4096) must agree with the
    dense path on the shared causal prefix."""
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    arch = synthetic.tiny_arch()
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=8))),
        num_heads=arch.num_heads,
    )
    rng = np.random.RandomState(1)
    latent16 = rng.randn(1, arch.mimi_dim, 16).astype(np.float32) * 0.1

    # Dense path: 16 frames (T=256 → dense); local path: same frames padded
    # into a 256-frame buffer (T=4096 → blocked local attention).
    short = np.asarray(model.mimi_decode(jnp.asarray(latent16)))
    latent256 = np.zeros((1, arch.mimi_dim, 256), np.float32)
    latent256[:, :, :16] = latent16
    long = np.asarray(model.mimi_decode(jnp.asarray(latent256)))

    np.testing.assert_allclose(
        long[:, :, : 16 * 1920], short, atol=2e-4, rtol=1e-3
    )
