"""Blocked local (sliding-window) attention.

The Mimi transformer attends with a causal sliding window of 250 positions
(`internal/native/mimi.go:417-418`, mask semantics `ops/attention.go:473-484`).
A dense formulation materializes ``[T, T]`` score tensors — 537 MB of f32 at
T=4096 — even though only ~6% of pairs are visible. This blocked form
computes scores only against the current and previous key blocks
(block ≥ window), an 8–16× cut in score traffic at decode lengths:

    q blocks:  [B, H, nb, W, D]
    k/v pairs: [B, H, nb, 2W, D]   (previous block ‖ current block)
    scores:    [B, H, nb, W, 2W]

Exactly equivalent to ``attention_with_positions(.., context=window)`` for
positions ``0..T-1`` whenever ``window <= block`` (verified in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["local_windowed_attention"]


def local_windowed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: int,
    block: int = 256,
) -> jax.Array:
    """Causal sliding-window SDPA over ``[B, H, T, D]``; T % block == 0,
    window <= block."""
    b, h, t, d = q.shape
    if t % block != 0:
        raise ValueError(f"local attention requires T % block == 0, got {t} % {block}")
    if window > block:
        raise ValueError(f"window {window} must be <= block {block}")
    nb = t // block
    scale = 1.0 / (d**0.5)

    qb = q.reshape(b, h, nb, block, d)
    kb = k.reshape(b, h, nb, block, d)
    vb = v.reshape(b, h, nb, block, d)

    # Previous block (zeros for block 0).
    kp = jnp.pad(kb, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]
    vp = jnp.pad(vb, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]
    kk = jnp.concatenate([kp, kb], axis=3)  # [B,H,nb,2W,D]
    vv = jnp.concatenate([vp, vb], axis=3)

    scores = jnp.einsum(
        "bhnqd,bhnkd->bhnqk", qb, kk, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    # delta = pos_q - pos_k = (block + r) - c for r in [0,W), c in [0,2W);
    # block 0's "previous" keys are the zero pad and must stay invisible.
    r = jnp.arange(block)[:, None]  # [W, 1]
    c = jnp.arange(2 * block)[None, :]  # [1, 2W]
    delta = block + r - c
    base_mask = (delta >= 0) & (delta < window)  # [W, 2W]
    is_prev = c < block  # [1, 2W]
    blk0 = (jnp.arange(nb) == 0)[:, None, None]  # [nb, 1, 1]
    mask = base_mask[None, :, :] & ~(blk0 & is_prev[None, :, :])  # [nb, W, 2W]

    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[None, None], scores, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(mask[None, None], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(denom > 0, denom, 1.0)

    out = jnp.einsum(
        "bhnqk,bhnkd->bhnqd", p.astype(vv.dtype), vv, preferred_element_type=jnp.float32
    )
    return out.reshape(b, h, t, d).astype(q.dtype)
