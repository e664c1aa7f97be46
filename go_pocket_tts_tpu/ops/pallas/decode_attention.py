"""Pallas TPU kernel: fused decode-step attention with KV-cache append.

The AR hot path (Tq = 1) in XLA is a chain of small ops per layer: RoPE on
q/k, two dynamic-update-slices into the cache, the masked QK^T, softmax, PV.
This kernel fuses them into one VMEM-resident pass per (batch, head):

    k_cache[b, h, offset] = rope(k_new)     (in-place, aliased output)
    v_cache[b, h, offset] = v_new
    scores = k_cache[b, h] · rope(q)        masked to slots ≤ offset
    out    = softmax(scores) · v_cache[b, h]

Equivalent to the XLA path in `models/flow_transformer.py` (tested in
interpreter mode on CPU; opt-in on TPU via ``TPURuntime(pallas=True)`` or
env ``POCKETTTS_PALLAS=1``).

The grid is (B, H); each program owns one [C, D] cache tile — C ≤ ~1k and
D = 64, comfortably inside VMEM (pallas_guide.md: keep tiles resident, build
masks from broadcasted_iota).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_step"]


def _kernel(
    off_ref,
    q_ref,
    k_ref,
    v_ref,
    cos_ref,
    sin_ref,
    kc_in_ref,
    vc_in_ref,
    out_ref,
    kc_ref,
    vc_ref,
):
    # kc/vc outputs are aliased to the inputs (input_output_aliases), so the
    # output refs already hold the cache contents; all reads/writes go
    # through them and the input refs are unused. Block shapes:
    # q/k/v/out [1,1,1,D], caches [1,1,1,C,D], trig rows [1,D/2].
    del kc_in_ref, vc_in_ref
    offset = off_ref[0]
    c = kc_ref.shape[3]
    d = q_ref.shape[3]
    half = d // 2

    cos = cos_ref[0, :]  # [half]
    sin = sin_ref[0, :]

    def rope(vec):  # [D] f32 -> [D] f32
        x = vec.reshape(half, 2)
        a, b = x[:, 0], x[:, 1]
        return jnp.stack([a * cos - b * sin, a * sin + b * cos], axis=-1).reshape(d)

    q = rope(q_ref[0, 0, 0, :].astype(jnp.float32))  # [D]
    k_new = rope(k_ref[0, 0, 0, :].astype(jnp.float32))

    kc_ref[0, 0, 0, pl.ds(offset, 1), :] = k_new.reshape(1, d).astype(kc_ref.dtype)
    vc_ref[0, 0, 0, pl.ds(offset, 1), :] = (
        v_ref[0, 0, 0, :].reshape(1, d).astype(vc_ref.dtype)
    )

    kc = kc_ref[0, 0, 0, :, :].astype(jnp.float32)  # [C, D]
    scores = jnp.sum(kc * q[None, :], axis=-1) * (1.0 / (d**0.5))  # [C]
    slot = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    mask = slot <= offset
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores)
    e = jnp.where(mask, jnp.exp(scores - m), 0.0)
    p = e / jnp.sum(e)

    vc = vc_ref[0, 0, 0, :, :].astype(jnp.float32)
    out_ref[0, 0, 0, :] = jnp.sum(vc * p[:, None], axis=0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "interpret"), donate_argnums=(2, 3)
)
def decode_attention_step(
    q: jax.Array,  # [B, H, 1, D] (pre-RoPE)
    k_new: jax.Array,  # [B, H, 1, D] (pre-RoPE)
    k_cache: jax.Array,  # [L, B, H, C, D] (RoPE'd keys; aliased output)
    v_cache: jax.Array,  # [L, B, H, C, D] (aliased output)
    v_new: jax.Array,  # [B, H, 1, D]
    offset: jax.Array,  # int32 scalar
    rope_cos: jax.Array,  # [S, D/2]
    rope_sin: jax.Array,
    layer: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attn_out [B, H, 1, D], k_cache, v_cache).

    The caches keep the stacked per-layer layout; ``layer`` selects the tile
    via the BlockSpec index map, so the aliased update never copies the
    buffer.
    """
    b, h, _, d = q.shape
    c = k_cache.shape[3]

    cos_row = jax.lax.dynamic_slice_in_dim(rope_cos, offset, 1, axis=0)  # [1, D/2]
    sin_row = jax.lax.dynamic_slice_in_dim(rope_sin, offset, 1, axis=0)
    off_arr = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (1,))

    bh_spec = pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0))
    cache_spec = pl.BlockSpec((1, 1, 1, c, d), lambda i, j: (layer, i, j, 0, 0))
    row_spec = pl.BlockSpec((1, d // 2), lambda i, j: (0, 0))

    out, kc, vc = pl.pallas_call(
        _kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
            bh_spec,  # q
            bh_spec,  # k_new
            bh_spec,  # v_new
            row_spec,  # cos row
            row_spec,  # sin row
            cache_spec,  # k_cache
            cache_spec,  # v_cache
        ],
        out_specs=(bh_spec, cache_spec, cache_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(off_arr, q, k_new, v_new, cos_row, sin_row, k_cache, v_cache)
    return out, kc, vc
