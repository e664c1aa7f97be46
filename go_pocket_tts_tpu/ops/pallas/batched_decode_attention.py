"""Pallas TPU kernel: fused batched decode-step attention (per-lane offsets).

The continuous batcher's AR hot path (`models/flow_transformer.py
transformer_step_batched`) runs the same masked QK^T → softmax → PV chain as
the single-request step, but with a per-SLOT offset vector ([B] int32, one
generation depth per lane — the heterogeneous-EOS case). The single-path
fused kernel (`decode_attention.py`) was measured 10% faster whole-request
on hardware, so this is its batched sibling: one VMEM-resident pass per
(lane, head) tile, masked to that lane's offset.

Two variants share the structure:

- bf16/f32 caches (`batched_decode_attention(..., k_scale=None)`), and
- the INT8 KV cache with per-row scales (`--runtime-kv-quantize`,
  `ops/attention.py attention_with_positions_int8kv` semantics): the int8
  rows convert to f32 INSIDE the kernel — the HBM stream stays at the int8
  footprint and the row scales distribute over the dot products:

      scores = (k_int8 · q) * k_scale / sqrt(D)
      out    = Σ_t softmax(scores)_t * v_scale_t * v_int8_t

As in the single kernel, RoPE and the cache append stay in XLA (the
batched append is already ONE in-place scatter per layer, measured ~0.03 ms
per step at batch 8 — PERF.md r3 step anatomy), and the kernel takes the
STACKED [L, B, H, C, D] buffers with the layer selected by the BlockSpec
index map, so no layer slice is ever materialized.

Weight-stream caveat does NOT apply here: the r2/r5 lesson (per-linear
Pallas custom calls break XLA's cross-op weight prefetch) is about
WEIGHT-carrying matmuls; this kernel carries no weights — the in/out
projections stay XLA dots, exactly like the single-path kernel that won.

**Hardware verdict (r5, exp_batched_pallas.py): REJECTED as a default.**
Measured per step at batch 8 on v5e: bf16 0.394 (XLA) -> 1.503 ms, int8+KV
0.233 -> 2.645 ms. The (B, H) grid executes B×H tiny per-lane programs
SEQUENTIALLY on the TensorCore, while the XLA chain is ONE fused op over
[B, H, 1, C] with good utilization — the single-path kernel's win came
from XLA's poor utilization at B=1, which batching itself already fixes.
Kept as a parity-tested expert opt-in (``POCKETTTS_PALLAS=1`` /
``ContinuousBatcher(pallas=True)``); the batcher's auto default stays XLA.

Mosaic notes: every in-kernel value stays ≥2-D; masks come from
``broadcasted_iota``; per-row scales are passed pre-reshaped to
[L, B, H, C, 1] so the kernel sees a [C, 1] tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.ops.pallas import pin_default_matmul_precision

__all__ = ["batched_decode_attention"]


def _kernel(off_ref, q_ref, kc_ref, vc_ref, out_ref):
    # Grid (B, H); block shapes: q/out [1,1,1,D], caches [1,1,1,C,D]
    # (read-only). offsets live in SMEM as the full [B] vector.
    lane = pl.program_id(0)
    offset = off_ref[lane]
    c = kc_ref.shape[3]
    d = q_ref.shape[3]

    q_r = q_ref[0, 0, :, :].astype(jnp.float32)  # [1, D] (RoPE'd in XLA)
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


def _kernel_int8(off_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref, out_ref):
    # int8 cache tiles [1,1,1,C,D] + per-row scale tiles [1,1,1,C,1] (f32).
    lane = pl.program_id(0)
    offset = off_ref[lane]
    c = kc_ref.shape[3]
    d = q_ref.shape[3]

    q_r = q_ref[0, 0, :, :].astype(jnp.float32)  # [1, D]
    kc = kc_ref[0, 0, 0, :, :].astype(jnp.float32)  # [C, D] (int8 → f32)
    ks = ks_ref[0, 0, 0, :, :]  # [C, 1] f32
    scores = jnp.sum(kc * q_r, axis=-1, keepdims=True) * ks * (1.0 / (d**0.5))
    slot = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    mask = slot <= offset
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores)
    e = jnp.where(mask, jnp.exp(scores - m), 0.0)
    p = e / jnp.sum(e)  # [C, 1]

    vs = vs_ref[0, 0, 0, :, :]  # [C, 1]
    vc = vc_ref[0, 0, 0, :, :].astype(jnp.float32)  # [C, D]
    out = jnp.sum(vc * (p * vs), axis=0, keepdims=True)  # [1, D]
    out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
@pin_default_matmul_precision
def batched_decode_attention(
    q: jax.Array,  # [B, H, 1, D] (already RoPE'd)
    k_cache: jax.Array,  # [L, B, H, C, D] bf16/f32, or int8 with scales
    v_cache: jax.Array,  # [L, B, H, C, D]
    offsets: jax.Array,  # [B] int32 per-lane generation depth
    k_scale: Optional[jax.Array] = None,  # [L, B, H, C] f32 (int8-KV mode)
    v_scale: Optional[jax.Array] = None,
    layer: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Returns attn_out [B, H, 1, D] for one layer of the stacked cache.

    The caller appends the new K/V rows (one in-place scatter) BEFORE this
    call, exactly like the XLA path; the kernel only reads.
    """
    b, h, _, d = q.shape
    c = k_cache.shape[3]

    off_arr = offsets.astype(jnp.int32)
    bh_spec = pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0))
    cache_spec = pl.BlockSpec((1, 1, 1, c, d), lambda i, j: (layer, i, j, 0, 0))

    if k_scale is None:
        return pl.pallas_call(
            _kernel,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets [B]
                bh_spec,  # q
                cache_spec,  # k_cache (read-only)
                cache_spec,  # v_cache (read-only)
            ],
            out_specs=bh_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
            interpret=interpret,
        )(off_arr, q, k_cache, v_cache)

    scale_spec = pl.BlockSpec((1, 1, 1, c, 1), lambda i, j: (layer, i, j, 0, 0))
    ks = k_scale.astype(jnp.float32)[..., None]  # [L, B, H, C, 1]
    vs = v_scale.astype(jnp.float32)[..., None]
    return pl.pallas_call(
        _kernel_int8,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets [B]
            bh_spec,  # q
            cache_spec,  # k_cache int8 (read-only)
            scale_spec,  # k row scales
            cache_spec,  # v_cache int8 (read-only)
            scale_spec,  # v row scales
        ],
        out_specs=bh_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(off_arr, q, k_cache, ks, v_cache, vs)
