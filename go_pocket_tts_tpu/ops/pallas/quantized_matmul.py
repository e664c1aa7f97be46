"""Pallas TPU kernel: int8 weight-only matmul for the AR decode step.

The AR step is weight-bandwidth-bound (PERF.md): bf16 weights stream
~180 MB/step ≈ 0.22 ms at HBM speed; int8 weights halve that. XLA's
mixed-dtype ``dot_general(bf16, int8)`` reaches 0.16 ms/step — partway to
the ~0.11 ms int8 floor — because the int8→bf16 convert runs as its own
fusion stage. This kernel keeps the convert inside the matmul tile loop:

    o[M, TN] = (x[M, K] · w_q[K, TN].astype(bf16)) * scale[TN]

Grid over N tiles; each program holds the full ``x`` (M ≤ ~16 rows, the
AR/batch decode activations) and one ``[K, TN]`` int8 weight tile in VMEM
(pallas_guide.md: int8 min tile (32, 128); tiles double-buffer from HBM).

Replaces the asm-matvec role of the reference's SIMD kernels
(`internal/runtime/tensor/dot_amd64.s`, `nn_ops.go:268-347`) for the
quantized deployment (BASELINE config 5). Opt-in:
``TPURuntime(quantize=True, pallas=True)`` or env ``POCKETTTS_PALLAS=1``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.ops.pallas import pin_default_matmul_precision

__all__ = ["quantized_matmul", "supports"]


def supports(m: int, k: int, n: int) -> bool:
    """Shapes the kernel handles well; callers fall back to XLA otherwise."""
    return k % 128 == 0 and n % 256 == 0 and m <= 64


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]  # [M, K] bf16/f32
    w = w_ref[...].astype(x.dtype)  # [K, TN] int8 → activation dtype, in-tile
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)  # MXU, f32 acc
    o_ref[...] = acc * s_ref[...]  # per-output-channel dequant scale


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
@pin_default_matmul_precision
def quantized_matmul(
    x: jax.Array,  # [M, K] activations
    w_q: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N] f32
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns ``(x @ w_q) * scale`` as f32 ``[M, N]``."""
    m, k = x.shape
    kw, n = w_q.shape
    assert k == kw, (x.shape, w_q.shape)
    while n % block_n != 0:  # n is a multiple of 256 per `supports`
        block_n //= 2
    grid = (n // block_n,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n).astype(jnp.float32))
