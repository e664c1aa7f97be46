"""Pallas TPU kernel: fused depack + matmul for packed-INT4 weights.

Why this kernel exists (PERF.md r5 "INT4 serving: measured and REJECTED"):
XLA cannot keep the nibble depack inside the dot's operand stream — it
materializes the widened int8/f32 weight to HBM, so the int4 "split"
variant reads MORE bytes than int8 (0.369 ms/step vs 0.228 at batch 8).
Here the DMA'd operand IS the packed ``uint8 [K/2, N]`` buffer (half the
int8 footprint, a quarter of bf16); the two's-complement nibble extraction
runs on VPU registers between the tile DMA and the MXU dot, so the depack
never touches HBM:

    o[M, TN] += Σ_g (x_lo[:, g] · lo_g + x_hi[:, g] · hi_g) * scale[g, TN]

- Pairing follows ``models/quantize.pack_int4_rows``: byte ``[i, j]`` holds
  input row ``2i`` (low nibble) and ``2i+1`` (high nibble). The caller
  splits the activation into the matching even/odd K rows (a cheap reshape
  of the SMALL operand) so the weight needs no in-kernel interleave — only
  shifts (the Mosaic-unsupported ``[K/2, 2, N] → [K, N]`` sublane
  interleave never appears; same trick as the seanet_tail phase-space
  formulation).
- Scales are group-wise ``[G, N]`` with ``GROUP_SIZE = 128`` input rows per
  group (``models/quantize.py``): each group is 64 packed rows, its partial
  dot scales on the tiny ``[M, TN]`` output — never on the weight tile
  (scaling the depacked weight would put VPU work proportional to weight
  bytes back on the critical path, the same mistake as XLA's "dequant"
  variant).
- Grid: (N tiles) × (K tiles, ``GROUPS_PER_TILE`` groups each) with output
  revisiting along K ("arbitrary" dimension semantics); Pallas
  double-buffers the packed-weight tile DMAs across grid steps.

Replaces the reference's SIMD asm matvec role
(`internal/runtime/tensor/dot_amd64.s`) for the INT4 deployment tier.
Opt-in until hardware-validated: ``POCKETTTS_INT4_VARIANT=pallas`` or
``models.params.set_int4_matmul_variant("pallas")``; falls back to the XLA
split variant for shapes outside :func:`supports`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.ops.pallas import pin_default_matmul_precision

__all__ = ["int4_matmul", "supports"]

GROUP_ROWS_PACKED = 64  # GROUP_SIZE=128 logical input rows = 64 packed rows
GROUPS_PER_TILE = 8  # K-tile = 8 groups = 1024 logical rows (cap; see grid)


def supports(m: int, k: int, n: int, scale_shape: tuple) -> bool:
    """Shapes this kernel handles; callers fall back to the XLA variant.

    Requires the group-wise scale layout (``[K/128, N]``), lane-aligned N,
    and the small-M decode regime (prefill's big-M matmuls stay on XLA,
    which tiles those well already).
    """
    return (
        m <= 64
        and k % 128 == 0
        and n % 256 == 0
        and len(scale_shape) == 2
        and scale_shape[0] == k // 128
    )


def _kernel(x_ref, w_ref, s_ref, o_ref, *, groups: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # u8 tile -> sign-extended nibbles, in VMEM registers (never in HBM).
    ui = jax.lax.bitcast_convert_type(w_ref[...], jnp.int8).astype(jnp.int32)
    x_dt = x_ref.dtype
    lo = ((ui << 28) >> 28).astype(x_dt)  # input rows 2i   [Kp_t, TN]
    hi = (ui >> 4).astype(x_dt)  # input rows 2i+1 (i8->i32 sign-extended)

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(groups):  # static unroll; slices are register views
        sl = slice(g * GROUP_ROWS_PACKED, (g + 1) * GROUP_ROWS_PACKED)
        part = jnp.dot(
            x_ref[0, :, sl], lo[sl], preferred_element_type=jnp.float32
        )
        part += jnp.dot(
            x_ref[1, :, sl], hi[sl], preferred_element_type=jnp.float32
        )
        acc += part * s_ref[g, :][None, :]
    o_ref[...] += acc


@functools.partial(
    jax.jit, static_argnames=("block_n", "groups_per_tile", "interpret")
)
@pin_default_matmul_precision
def int4_matmul(
    x2: jax.Array,  # [2, M, K/2]: x2[p, :, i] = activation row 2i+p
    w_packed: jax.Array,  # [K/2, N] uint8, pack_int4_rows pairing
    scale: jax.Array,  # [G, N] f32, G = K/128
    block_n: int = 512,
    groups_per_tile: int = GROUPS_PER_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Returns ``(x @ depack(w_packed)) * groupwise(scale)`` as f32 [M, N]."""
    two, m, kp = x2.shape
    assert two == 2, x2.shape
    kpw, n = w_packed.shape
    assert kp == kpw, (x2.shape, w_packed.shape)
    g_total = scale.shape[0]
    assert g_total * GROUP_ROWS_PACKED == kp, (scale.shape, kp)
    while n % block_n != 0:  # n is a multiple of 256 per `supports`
        block_n //= 2
    gt = min(groups_per_tile, g_total)
    while g_total % gt != 0:
        gt -= 1
    block_kp = gt * GROUP_ROWS_PACKED
    grid = (n // block_n, g_total // gt)
    return pl.pallas_call(
        functools.partial(_kernel, groups=gt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2, m, block_kp), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_kp, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (gt, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x2, w_packed, scale.astype(jnp.float32))
