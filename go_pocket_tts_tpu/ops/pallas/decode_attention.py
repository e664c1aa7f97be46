"""Pallas TPU kernel: fused decode-step attention with KV-cache append.

The AR hot path (Tq = 1) in XLA is a chain of small ops per layer: RoPE on
q/k, two dynamic-update-slices into the cache, the masked QK^T, softmax, PV.
This kernel fuses them into one VMEM-resident pass per (batch, head):

    k_cache[b, h, offset] = rope(k_new)     (in-place, aliased output)
    v_cache[b, h, offset] = v_new
    scores = k_cache[b, h] · rope(q)        masked to slots ≤ offset
    out    = softmax(scores) · v_cache[b, h]

Equivalent to the XLA path in `models/flow_transformer.py` (tested in
interpret mode on CPU and compiled on hardware; opt-in on TPU via
``TPURuntime(pallas=True)`` or env ``POCKETTTS_PALLAS=1`` — the XLA path is
already at the HBM roofline for this step, see PERF.md).

Mosaic lowering notes (pallas_guide.md): every in-kernel value stays ≥2-D
and masks come from ``broadcasted_iota``. RoPE is expressed in its
"duplicated-trig + pair-swap" form so the kernel is pure elementwise math::

    rope(x)[2j]   = x[2j]·cos[j] − x[2j+1]·sin[j]
    rope(x)[2j+1] = x[2j+1]·cos[j] + x[2j]·sin[j]
    ⇒ rope(x) = x·cos_dup + swap_pairs(x)·sin_adj
      cos_dup[2j] = cos_dup[2j+1] = cos[j]
      sin_adj[2j] = −sin[j], sin_adj[2j+1] = +sin[j]

``swap_pairs`` of q/k and the trig rows are precomputed OUTSIDE the kernel
(tiny [1, D] tensors; the bandwidth-relevant cache tiles never leave VMEM).

The grid is (B, H); each program owns one [C, D] cache tile — C ≤ ~1k and
D = 64, comfortably inside VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.ops.pallas import pin_default_matmul_precision

__all__ = ["decode_attention_step"]


def _swap_pairs(x: jax.Array) -> jax.Array:
    """Swap interleaved pairs along the last axis: [..., 2j]↔[..., 2j+1]."""
    shape = x.shape
    half = shape[-1] // 2
    xr = x.reshape(*shape[:-1], half, 2)
    return jnp.flip(xr, axis=-1).reshape(shape)


def _kernel(
    off_ref,
    q_ref,
    qs_ref,
    k_ref,
    ks_ref,
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
    # q/qs/k/ks/v/out [1,1,1,D], caches [1,1,1,C,D], trig rows [1,D].
    del kc_in_ref, vc_in_ref
    offset = off_ref[0]
    c = kc_ref.shape[3]
    d = q_ref.shape[3]

    cos = cos_ref[...]  # [1, D] duplicated-pair cos
    sin = sin_ref[...]  # [1, D] sign-adjusted sin

    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [1, D]
    qs = qs_ref[0, 0, :, :].astype(jnp.float32)
    k = k_ref[0, 0, :, :].astype(jnp.float32)
    ks = ks_ref[0, 0, :, :].astype(jnp.float32)

    q_r = q * cos + qs * sin  # [1, D]
    k_r = k * cos + ks * sin

    kc_ref[0, 0, 0, pl.ds(offset, 1), :] = k_r.astype(kc_ref.dtype)
    vc_ref[0, 0, 0, pl.ds(offset, 1), :] = v_ref[0, 0, :, :].astype(vc_ref.dtype)

    kc = kc_ref[0, 0, 0, :, :].astype(jnp.float32)  # [C, D]
    scores = jnp.sum(kc * q_r, axis=-1, keepdims=True) * (1.0 / (d**0.5))  # [C, 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    mask = slot <= offset
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores)
    e = jnp.where(mask, jnp.exp(scores - m), 0.0)  # [C, 1]
    p = e / jnp.sum(e)

    vc = vc_ref[0, 0, 0, :, :].astype(jnp.float32)  # [C, D]
    out = jnp.sum(vc * p, axis=0, keepdims=True)  # [1, D]
    out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "interpret"), donate_argnums=(2, 3)
)
@pin_default_matmul_precision
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
    # Duplicated-pair trig rows + sign adjustment (see module docstring).
    cos_dup = jnp.repeat(cos_row, 2, axis=-1)  # [1, D]
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), d // 2)[None, :]
    sin_adj = jnp.repeat(sin_row, 2, axis=-1) * sign
    q_swap = _swap_pairs(q)
    k_swap = _swap_pairs(k_new)
    off_arr = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (1,))

    bh_spec = pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0))
    cache_spec = pl.BlockSpec((1, 1, 1, c, d), lambda i, j: (layer, i, j, 0, 0))
    row_spec = pl.BlockSpec((1, d), lambda i, j: (0, 0))

    out, kc, vc = pl.pallas_call(
        _kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
            bh_spec,  # q
            bh_spec,  # q pair-swapped
            bh_spec,  # k_new
            bh_spec,  # k_new pair-swapped
            bh_spec,  # v_new
            row_spec,  # cos_dup row
            row_spec,  # sin_adj row
            cache_spec,  # k_cache
            cache_spec,  # v_cache
        ],
        out_specs=(bh_spec, cache_spec, cache_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={8: 1, 9: 2},
        interpret=interpret,
    )(off_arr, q, q_swap, k_new, k_swap, v_new, cos_dup, sin_adj, k_cache, v_cache)
    return out, kc, vc
