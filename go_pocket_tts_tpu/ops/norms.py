"""Normalization layers and adaLN modulation.

Parity quirks replicated from the reference:

- :func:`layer_norm`: last-dim LayerNorm with *population* variance
  (`internal/runtime/tensor/nn_ops.go:10-80`; reference accumulates in f64,
  we accumulate in f32 which stays inside the 1e-4 parity budget for the
  model's value ranges).
- :func:`rms_norm_bessel`: the flowNet timestep-embedder RMSNorm uses
  **Bessel-corrected variance of the values** — torch ``x.var(dim=-1)`` with
  the N−1 denominator and mean subtraction inside the variance but NOT in the
  output — (`internal/native/tensor_util.go:273-326`).
- :func:`modulate`: adaLN ``x * (1 + scale) + shift``
  (`internal/native/tensor_util.go:175-193`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["layer_norm", "rms_norm_bessel", "modulate"]


def layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last dim; mean/var in float32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def rms_norm_bessel(x: jax.Array, alpha: jax.Array, eps: float = 1e-5) -> jax.Array:
    """``x / sqrt(var(x, ddof=1) + eps) * alpha`` — the upstream `_rms_norm`.

    Note the quirk: variance is computed around the mean (with Bessel
    correction), but the mean is NOT subtracted from the output.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = x.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    sq = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True)
    var = sq / jnp.float32(max(n - 1, 1))
    out = xf * jax.lax.rsqrt(var + eps) * alpha.astype(jnp.float32)
    return out.astype(dtype)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: ``x * (1 + scale) + shift`` (broadcasting)."""
    return x * (1.0 + scale) + shift
