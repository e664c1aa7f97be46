"""Scaled dot-product attention with absolute position masking.

This is the TPU-native equivalent of the reference's fused CPU kernel
`internal/runtime/ops/attention.go`. The Go implementation streams one query
row at a time through pooled scratch to bound memory; on TPU the whole
``[Tq, Tk]`` score tile lives in registers/VMEM and XLA fuses the mask +
softmax + PV matmul, so a direct formulation is already near roofline for the
model's sizes (d=1024, T ≤ ~1k). The decode hot path (Tq = 1) additionally has
a Pallas kernel in ``ops.pallas``.

Masking semantics (upstream-parity, `attention.go:473-484`): a key with
absolute position ``pos_k`` is visible to a query at ``pos_q`` iff::

    pos_k >= 0                      # -1 marks unused/padded cache slots
    delta = pos_q - pos_k >= 0      # causal
    context < 0 or delta < context  # optional sliding window (Mimi: 250)

Queries with no visible key produce zero rows (cannot happen for real tokens;
keeps padded rows finite).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_with_positions", "position_mask"]


def position_mask(
    pos_q: jax.Array, pos_k: jax.Array, context: Optional[int] = None
) -> jax.Array:
    """Boolean visibility mask ``[Tq, Tk]`` (or batched with leading dims)."""
    pq = pos_q[..., :, None]
    pk = pos_k[..., None, :]
    delta = pq - pk
    mask = (pk >= 0) & (delta >= 0)
    if context is not None and context >= 0:
        mask = mask & (delta < context)
    return mask


def attention_with_positions(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos_q: jax.Array,
    pos_k: jax.Array,
    context: Optional[int] = None,
) -> jax.Array:
    """Masked SDPA over ``[B, H, T, Dh]`` tensors.

    ``pos_q``/``pos_k`` are int32 absolute positions, shape ``[Tq]``/``[Tk]``
    or ``[B, Tq]``/``[B, Tk]`` (per-request offsets in continuous batching).
    Softmax runs in float32; output matches the input dtype.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)

    mask = position_mask(pos_q, pos_k, context)  # [Tq,Tk] or [B,Tq,Tk]
    if mask.ndim == 2:
        mask = mask[None, None, :, :]
    elif mask.ndim == 3:
        mask = mask[:, None, :, :]

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    # Max-subtracted softmax; fully-masked rows yield zeros, not NaN.
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(denom > 0, denom, 1.0)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
