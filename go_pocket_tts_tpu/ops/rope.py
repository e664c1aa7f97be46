"""Rotary position embedding, interleaved-pair format.

Parity with `internal/runtime/ops/rope.go:13-105` and the table builder at
`internal/native/flow_transformer.go:797-832`:

- tables: ``inv_freq[i] = max_period^(-i/half)``, rows are absolute positions
- application: interleaved pairs ``(x[2j], x[2j+1])`` rotated by
  ``angle = pos * inv_freq[j]``
- the position offset may be a traced scalar (KV-cache offset under jit)

The rotation math runs in float32 regardless of the activation dtype so the
bf16 fast path keeps phase accuracy at long positions.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["build_rope_tables", "apply_rope"]

DEFAULT_MAX_SEQ = 8192  # flow_transformer.go:505
DEFAULT_MAX_PERIOD = 10000.0


def build_rope_tables(
    max_seq: int = DEFAULT_MAX_SEQ,
    head_dim: int = 64,
    max_period: float = DEFAULT_MAX_PERIOD,
) -> Tuple[jax.Array, jax.Array]:
    """Precompute cos/sin tables of shape ``[max_seq, head_dim // 2]``."""
    if head_dim % 2 != 0:
        raise ValueError(f"rope head dim must be even, got {head_dim}")
    half = head_dim // 2
    inv_freq = max_period ** (-jnp.arange(half, dtype=jnp.float32) / half)
    angles = jnp.arange(max_seq, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def rope_rows(
    cos: jax.Array, sin: jax.Array, pos: Union[int, jax.Array], t: int
) -> Tuple[jax.Array, jax.Array]:
    """Gather the cos/sin rows for positions ``pos .. pos+t-1`` once; the
    result feeds :func:`apply_rope_rows` for every layer of a step (the rows
    are identical across layers, so per-layer gathers are wasted ops)."""
    pos = jnp.asarray(pos, dtype=jnp.int32)
    if pos.ndim == 0:
        c = jax.lax.dynamic_slice_in_dim(cos, pos, t, axis=0)  # [T, half]
        s = jax.lax.dynamic_slice_in_dim(sin, pos, t, axis=0)
    else:
        idx = pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        c = jnp.take(cos, idx, axis=0)[:, None, :, :]  # [B, 1, T, half]
        s = jnp.take(sin, idx, axis=0)[:, None, :, :]
    return c, s


def apply_rope_rows(x: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """Rotate ``x[..., T, D]`` by pre-gathered trig rows (see :func:`rope_rows`)."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    xr = xf.reshape(*x.shape[:-1], half, 2)
    a, b = xr[..., 0], xr[..., 1]
    out = jnp.stack([a * c - b * s, a * s + b * c], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    pos: Union[int, jax.Array] = 0,
) -> jax.Array:
    """Rotate ``x[B, H, T, D]`` (or ``[..., T, D]``) by absolute positions.

    ``pos`` may be a traced int32 scalar (all batch elements share the
    offset; the trig rows are gathered with a dynamic slice so the AR loop
    stays one compiled program) or an int32 vector ``[B]`` of per-request
    offsets (continuous batching).
    """
    t, d = x.shape[-2], x.shape[-1]
    half = d // 2
    pos = jnp.asarray(pos, dtype=jnp.int32)

    if pos.ndim == 0:
        c = jax.lax.dynamic_slice_in_dim(cos, pos, t, axis=0)  # [T, half]
        s = jax.lax.dynamic_slice_in_dim(sin, pos, t, axis=0)
    else:
        # Per-batch offsets: gather rows [B, T, half] and broadcast over the
        # head axis of x[B, H, T, D].
        idx = pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        c = jnp.take(cos, idx, axis=0)[:, None, :, :]  # [B, 1, T, half]
        s = jnp.take(sin, idx, axis=0)[:, None, :, :]

    xf = x.astype(jnp.float32)
    xr = xf.reshape(*x.shape[:-1], half, 2)
    a, b = xr[..., 0], xr[..., 1]
    out_a = a * c - b * s
    out_b = a * s + b * c
    out = jnp.stack([out_a, out_b], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
