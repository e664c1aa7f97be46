"""Pallas TPU kernel: fused decode-step attention over the KV cache.

The AR hot path (Tq = 1) in XLA is a chain of small ops per layer: RoPE on
q/k, two dynamic-update-slices into the cache, the masked QK^T, softmax, PV
— and at session capacities (C up to 1024) the XLA chain runs far off the
cache-read roofline (r5: +0.35 ms/step at C=1024 vs 224 where the extra KV
bytes cost ~25 µs). This kernel fuses the bandwidth side into one
VMEM-resident pass per (batch, head):

    scores = k_cache[b, h] · q_r            masked to slots ≤ offset
    out    = softmax(scores) · v_cache[b, h]

The RoPE rotation and the cache APPEND stay in XLA: they are tiny
([B, H, 1, D] elementwise + an in-place dynamic-update-slice on the donated
cache), and a dynamic single-row ``vector_store`` inside Mosaic cannot be
proven sublane-aligned ("cannot statically prove that index in dimension 3
is a multiple of 8" — the r2-era in-kernel append stopped compiling on
current Mosaic, observed r5 on the real chip).

Equivalent to the XLA path in `models/flow_transformer.py` (tested in
interpret mode on CPU and compiled on hardware; DEFAULT-ON for TPU backends
at non-f32 dtypes since r5 — interleaved hardware A/B: bf16 single −10%,
TTFA −11%, capacity-1024 session −26%; f32 measured SLOWER (+11%, double
the VMEM-read bytes per cache tile) so the f32 parity path keeps XLA. See
PERF.md's continuity section. ``POCKETTTS_PALLAS=0`` or
``TPURuntime(pallas=False)`` forces the XLA path).

Mosaic lowering notes (pallas_guide.md): every in-kernel value stays ≥2-D
and masks come from ``broadcasted_iota``. RoPE (in XLA, duplicated-trig +
pair-swap form so no interleaved gather appears)::

    rope(x)[2j]   = x[2j]·cos[j] − x[2j+1]·sin[j]
    rope(x)[2j+1] = x[2j+1]·cos[j] + x[2j]·sin[j]
    ⇒ rope(x) = x·cos_dup + swap_pairs(x)·sin_adj
      cos_dup[2j] = cos_dup[2j+1] = cos[j]
      sin_adj[2j] = −sin[j], sin_adj[2j+1] = +sin[j]

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


def _kernel(off_ref, q_ref, kc_ref, vc_ref, out_ref):
    # Block shapes: q/out [1,1,1,D], caches [1,1,1,C,D] (read-only).
    offset = off_ref[0]
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


@functools.partial(
    jax.jit, static_argnames=("layer", "interpret"), donate_argnums=(2, 3)
)
@pin_default_matmul_precision
def decode_attention_step(
    q: jax.Array,  # [B, H, 1, D] (pre-RoPE)
    k_new: jax.Array,  # [B, H, 1, D] (pre-RoPE)
    k_cache: jax.Array,  # [L, B, H, C, D] (RoPE'd keys; donated, updated in place)
    v_cache: jax.Array,  # [L, B, H, C, D] (donated, updated in place)
    v_new: jax.Array,  # [B, H, 1, D]
    offset: jax.Array,  # int32 scalar
    rope_cos: jax.Array,  # [S, D/2]
    rope_sin: jax.Array,
    layer: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attn_out [B, H, 1, D], k_cache, v_cache).

    The caches keep the stacked per-layer layout; ``layer`` selects the tile
    via a static index, and the appends are XLA dynamic-update-slices on the
    donated buffers (in place, never copied).
    """
    b, h, _, d = q.shape
    c = k_cache.shape[3]

    cos_row = jax.lax.dynamic_slice_in_dim(rope_cos, offset, 1, axis=0)  # [1, D/2]
    sin_row = jax.lax.dynamic_slice_in_dim(rope_sin, offset, 1, axis=0)
    # Duplicated-pair trig rows + sign adjustment (see module docstring).
    cos_dup = jnp.repeat(cos_row, 2, axis=-1)  # [1, D]
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), d // 2)[None, :]
    sin_adj = jnp.repeat(sin_row, 2, axis=-1) * sign

    qf = q.astype(jnp.float32)
    kf = k_new.astype(jnp.float32)
    q_r = (qf * cos_dup + _swap_pairs(qf) * sin_adj).astype(q.dtype)
    k_r = (kf * cos_dup + _swap_pairs(kf) * sin_adj).astype(k_cache.dtype)

    zero = jnp.int32(0)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_r[None], (jnp.int32(layer), zero, zero, offset, zero)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache,
        v_new[None].astype(v_cache.dtype),
        (jnp.int32(layer), zero, zero, offset, zero),
    )

    off_arr = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (1,))
    bh_spec = pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0))
    cache_spec = pl.BlockSpec((1, 1, 1, c, d), lambda i, j: (layer, i, j, 0, 0))

    out = pl.pallas_call(
        _kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
            bh_spec,  # q (RoPE'd)
            cache_spec,  # k_cache (read-only)
            cache_spec,  # v_cache (read-only)
        ],
        out_specs=bh_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(off_arr, q_r, k_cache, v_cache)
    return out, k_cache, v_cache
