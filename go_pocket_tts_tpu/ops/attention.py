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

__all__ = [
    "attention_with_positions",
    "attention_with_positions_int8kv",
    "position_mask",
]


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


def attention_with_positions_int8kv(
    q: jax.Array,
    k_q: jax.Array,
    k_scale: jax.Array,
    v_q: jax.Array,
    v_scale: jax.Array,
    pos_q: jax.Array,
    pos_k: jax.Array,
    context: Optional[int] = None,
) -> jax.Array:
    """Masked SDPA over an int8-quantized KV cache with per-row scales.

    ``k_q``/``v_q`` are int8 ``[B, H, Tk, Dh]``; ``k_scale``/``v_scale`` are
    float32 ``[B, H, Tk]`` (one symmetric scale per cached position vector).
    The row scale distributes over the dot products, so nothing dequantizes
    to a materialized bf16 copy: ``scores = (q · k_int8) * k_scale`` and
    ``out = (p * v_scale) · v_int8`` — the int8 operands stream from HBM at
    half the bf16 footprint and convert in-flight, the same mixed-dtype
    ``dot_general`` the int8 weight path uses (``models/params.py
    apply_linear``). At batch 8+ the KV read rivals the (shared) weight
    stream, which is what makes this worth a quality knob (PERF.md).
    Masking/softmax semantics identical to :func:`attention_with_positions`.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)

    mask = position_mask(pos_q, pos_k, context)
    if mask.ndim == 2:
        mask = mask[None, None, :, :]
    elif mask.ndim == 3:
        mask = mask[:, None, :, :]

    batch_dims = ((0, 1), (0, 1))
    scores = jax.lax.dot_general(
        q,
        k_q,
        (((3,), (3,)), batch_dims),  # [B,H,Tq,Dh] · [B,H,Tk,Dh] -> [B,H,Tq,Tk]
        preferred_element_type=jnp.float32,
    )
    scores = scores * k_scale[:, :, None, :] * jnp.float32(scale)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(denom > 0, denom, 1.0)

    out = jax.lax.dot_general(
        (p * v_scale[:, :, None, :]).astype(q.dtype),
        v_q,
        (((3,), (2,)), batch_dims),  # [B,H,Tq,Tk] · [B,H,Tk,Dh] -> [B,H,Tq,Dh]
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
