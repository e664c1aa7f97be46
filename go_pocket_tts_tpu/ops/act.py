"""Elementwise activations.

Parity notes (`internal/native/tensor_util.go:73-128`):

- GELU uses the **erf** form (not tanh approximation)
- ELU is the alpha=1 form ``x if x > 0 else exp(x) - 1``
- SiLU is ``x * sigmoid(x)``

These fuse into neighbouring matmuls under XLA; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gelu_erf", "silu", "elu"]


def gelu_erf(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def elu(x: jax.Array) -> jax.Array:
    # expm1 keeps precision near zero; reference computes exp(v)-1
    # (tensor_util.go:119-128) — identical within f32 tolerance.
    return jnp.where(x > 0, x, jnp.expm1(x))
