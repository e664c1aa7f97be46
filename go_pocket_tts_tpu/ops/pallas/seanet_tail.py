"""Pallas TPU kernel: fused SEANet decode tail (res3 → ELU → final conv).

The last Mimi decode stage runs at the full 24 kHz sample rate
(T = 1920·frames, the largest activation in the model): a 64→32 k3 causal
conv, k1 conv back to 64, residual add, ELU, then the 64→1 k7 causal output
conv (`internal/native/mimi.go:719-789`; reference shapes
`decoder.model.{9,11}`). XLA lowers each conv separately, materializing
three full-rate [64, T] intermediates in HBM; this kernel streams the chain
through VMEM once — the convs become per-tap [32,64]/[64,32] matmuls on the
MXU over a T-block, so the only HBM traffic is x in, PCM out.

Causal halo: each grid block needs 8 left samples of context (2 for conv1,
6 for the final k7). The input is passed twice — once as the current block,
once with the index map shifted one block left — and the kernel slices the
halo from the previous block's tail (zeros for block 0, matching the
reference's zero left-padding).

Replaces the SEANet slot in SURVEY.md §7.1's kernel list. Opt-in like the
other Pallas kernels; numerics are validated against the XLA path in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.ops.pallas import pin_default_matmul_precision  # noqa: F401  (memory spaces)

__all__ = [
    "fused_seanet_tail",
    "fused_seanet_up_tail",
    "fused_up2_res",
    "fused_up2_up3_tail",
    "supports",
    "supports_up",
    "supports_up2",
    "supports_cascade",
]

_HALO = 8  # conv1 (k3 causal: 2) + final conv (k7 causal: 6)
_BLOCK_T = 1920  # = samples per latent frame = 15 * 128 lanes; divides every
# decode bucket's T and keeps the minor dim lane-aligned.


def supports(t: int) -> bool:
    return t % _BLOCK_T == 0 and t >= _BLOCK_T


def _elu(v):
    # Mosaic has no expm1 lowering; exp(x)-1 loses ~1 ulp near 0, inside the
    # kernel's 2e-4 parity budget.
    return jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)


def _kernel(x_ref, prev_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref, o_ref):
    i = pl.program_id(1)
    tb = x_ref.shape[-1]

    cur = x_ref[0]  # [64, Tb]
    prev = prev_ref[0]  # [64, Tb] (block i-1; block 0 sees itself)
    halo = jnp.where(i == 0, 0.0, 1.0) * prev[:, tb - _HALO :]
    xb = jnp.concatenate([halo, cur], axis=-1)  # [64, Tb+8]

    f32 = jnp.float32
    h1 = _elu(xb.astype(f32))  # [64, Tb+8]

    # conv1: 64→32, k3 causal — per-tap matmuls on the MXU.
    w1 = w1_ref[...].astype(f32)  # [32, 64, 3]
    u = tb + 6
    c1 = b1_ref[...].astype(f32)[:, None]  # [32, 1] → broadcast
    for j in range(3):
        c1 = c1 + jax.lax.dot_general(
            w1[:, :, j],
            h1[:, j : j + u],
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    h2 = _elu(c1)  # [32, Tb+6]

    # conv2: 32→64, k1.
    w2 = w2_ref[...].astype(f32)  # [64, 32]
    c2 = (
        jax.lax.dot_general(w2, h2, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        + b2_ref[...].astype(f32)[:, None]
    )

    # residual + ELU; zero the columns that lie before t=0 (the reference
    # zero-pads the FINAL conv's input, not the resblock output).
    y = _elu(xb[:, 2:].astype(f32) + c2)  # [64, Tb+6]
    pos = i * tb - 6 + jax.lax.broadcasted_iota(jnp.int32, (1, u), 1)
    y = jnp.where(pos >= 0, y, 0.0)

    # final conv: 64→1, k7 causal.
    wf = wf_ref[...].astype(f32)  # [64, 7]
    out = jnp.zeros((1, tb), f32)
    for j in range(7):
        out = out + jnp.sum(wf[:, j][:, None] * y[:, j : j + tb], axis=0, keepdims=True)
    o_ref[0] = (out + bf_ref[...].astype(f32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
@pin_default_matmul_precision
def fused_seanet_tail(
    x: jax.Array,  # [B, 64, T] post-up3 activations
    w1: jax.Array,  # [32, 64, 3] res3.conv1 (torch layout)
    b1: jax.Array,  # [32]
    w2: jax.Array,  # [64, 32, 1] res3.conv2
    b2: jax.Array,  # [64]
    wf: jax.Array,  # [1, 64, 7] final_conv
    bf: jax.Array,  # [1]
    interpret: bool = False,
) -> jax.Array:
    """Fused ``final_conv(elu(x + res3(x)))`` → ``[B, 1, T]`` PCM."""
    b, c, t = x.shape
    assert c == 64 and supports(t), x.shape
    nb = t // _BLOCK_T

    grid = (b, nb)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 64, _BLOCK_T), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, 64, _BLOCK_T), lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0))),
            pl.BlockSpec((32, 64, 3), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((32,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 32), lambda bi, i: (0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 7), lambda bi, i: (0, 0)),
            pl.BlockSpec((1,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 1, _BLOCK_T), lambda bi, i: (bi, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, 1, t), x.dtype),
        interpret=interpret,
    )(x, x, w1, b1, w2.reshape(64, 32), b2, wf.reshape(64, 7), bf)
    return out


# -- up3 fused in: phase-space polyphase convT + tail -------------------------
#
# Fusing the stride-4 transposed conv (up3) into the tail removes the model's
# largest activation ([64, 24kHz·T] f32) from HBM entirely. A first attempt
# interleaved the 4 polyphase outputs in-kernel ([64, M, 4] → [64, 4M]), which
# Mosaic cannot lower ("unsupported shape cast"); this version therefore stays
# in PHASE SPACE end to end: every conv tap becomes a per-phase matmul with a
# static column shift (time index t = 4m + r ⇒ a k-tap conv mixes phases
# (r+e) mod 4 at column offsets ⌊e/4⌋), and the kernel writes its output
# phases-major [B, 4, T/4] — one cheap XLA transpose+reshape restores time
# order outside.

_UP_K, _UP_S = 8, 4  # the reference's up3 (decoder.model.8): k=8, stride=4
_QB = 512  # input columns per grid block (minor dim must divide by 128)


def supports_up(c_in: int, t_in: int, k: int) -> bool:
    return c_in == 128 and k == _UP_K and t_in % _QB == 0 and t_in >= _QB


def _phase_kernel(
    x_ref, prev_ref, wu_ref, bu_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref, o_ref
):
    i = pl.program_id(1)
    qb = x_ref.shape[-1]
    f32 = jnp.float32

    cur = x_ref[0]  # [128, Qb]
    prev = prev_ref[0]
    halo = jnp.where(i == 0, 0.0, 1.0) * prev[:, qb - 4 :]
    xh = jnp.concatenate([halo, cur], axis=-1).astype(f32)  # [128, Qb+4]

    wu = wu_ref[...].astype(f32)  # [64, 128, 8] repacked (conv-style, flipped)
    bu = bu_ref[...].astype(f32)[:, None]
    w1 = w1_ref[...].astype(f32)  # [32, 64, 3]
    b1 = b1_ref[...].astype(f32)[:, None]
    w2 = w2_ref[...].astype(f32)  # [64, 32]
    b2 = b2_ref[...].astype(f32)[:, None]
    wf = wf_ref[...].astype(f32)  # [64, 7]
    bf = bf_ref[...].astype(f32)

    mb = qb  # output columns per phase
    t0 = i * (mb * _UP_S)

    # up3 output phases y_r over logical columns m' ∈ [-3, Mb): phase r of
    # output sample t = t0 + 4m' + r mixes x[q0+m'-1] and x[q0+m'] through
    # sub-kernels A_r = W[:,:,(7-r)%4] and B_r = A-tap + 4.
    y = []
    for r in range(_UP_S):
        j1 = (7 - r) % 4
        yr = (
            jax.lax.dot_general(
                wu[:, :, j1], xh[:, 0 : mb + 3], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + jax.lax.dot_general(
                wu[:, :, j1 + 4], xh[:, 1 : mb + 4], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bu
        )
        # Causal zero padding: positions before t=0 are literal zeros.
        pos = t0 + 4 * (jax.lax.broadcasted_iota(jnp.int32, (1, mb + 3), 1) - 3) + r
        y.append(jnp.where(pos >= 0, yr, 0.0))

    h = [_elu(v) for v in y]  # [64, Mb+3] each, logical cols [-3, Mb)

    # res3.conv1 (k3 causal): c1_r[m''] over logical m'' ∈ [-2, Mb) —
    # tap d reads phase (r-2+d) mod 4 at column offset ⌊(r-2+d)/4⌋.
    c1 = []
    for r in range(_UP_S):
        acc = b1
        for d in range(3):
            e = r - 2 + d
            ph, off = e % 4, (e - e % 4) // 4  # off ∈ {-1, 0}
            acc = acc + jax.lax.dot_general(
                w1[:, :, d], h[ph][:, 1 + off : 1 + off + mb + 2],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        c1.append(acc)  # [32, Mb+2]

    y2 = []
    for r in range(_UP_S):
        h2 = _elu(c1[r])
        c2 = (
            jax.lax.dot_general(w2, h2, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            + b2
        )
        v = _elu(y[r][:, 1:] + c2)  # residual: y_r logical [-2, Mb)
        pos = t0 + 4 * (jax.lax.broadcasted_iota(jnp.int32, (1, mb + 2), 1) - 2) + r
        y2.append(jnp.where(pos >= 0, v, 0.0))

    # final conv (k7 causal): tap d reads phase (r-6+d) mod 4 at offset
    # ⌊(r-6+d)/4⌋ ∈ {-2, -1, 0}; output phases land in o_ref[0, r, :].
    for r in range(_UP_S):
        acc = jnp.zeros((1, mb), f32)
        for d in range(7):
            e = r - 6 + d
            ph, off = e % 4, (e - e % 4) // 4
            sl = y2[ph][:, 2 + off : 2 + off + mb]
            acc = acc + jnp.sum(wf[:, d][:, None] * sl, axis=0, keepdims=True)
        o_ref[0, r] = (acc[0] + bf).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
@pin_default_matmul_precision
def fused_seanet_up_tail(
    x: jax.Array,  # [B, 128, T/4] pre-up3 activations
    wu: jax.Array,  # [64, 128, 8] repacked up3 kernel
    bu: jax.Array,  # [64]
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    wf: jax.Array,
    bf: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``final_conv(elu(y + res3(y)))`` with ``y = up3(x)`` computed
    in-kernel (phase space) → ``[B, 1, 4·T_in]`` PCM."""
    b, c, t_in = x.shape
    assert supports_up(c, t_in, wu.shape[-1]), (x.shape, wu.shape)
    nb = t_in // _QB

    grid = (b, nb)
    out = pl.pallas_call(
        _phase_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128, _QB), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, 128, _QB), lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0))),
            pl.BlockSpec((64, 128, 8), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((32, 64, 3), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((32,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 32), lambda bi, i: (0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 7), lambda bi, i: (0, 0)),
            pl.BlockSpec((1,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, _UP_S, _QB), lambda bi, i: (bi, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, _UP_S, t_in), x.dtype),
        interpret=interpret,
    )(x, x, wu, bu, w1, b1, w2.reshape(64, 32), b2, wf.reshape(64, 7), bf)
    # Phases-major [B, 4, T/4] → time order [B, 1, T] (cheap XLA relayout).
    return jnp.swapaxes(out, 1, 2).reshape(b, 1, t_in * _UP_S)


# -- up2 + res2 + ELU, same phase-space treatment (stride 5) ------------------
#
# STATUS: interpret-validated prototype, NOT wired into mimi_decode — kept
# as the readable two-stage derivation. This environment's AOT buffer
# assignment parks pallas_call RESULTS in scoped VMEM (S(1)); the ~20 MB of
# up2 output blows the 16 MB limit whether emitted as one rank-4 buffer or
# as five per-phase tuple outputs. SUPERSEDED by ``fused_up2_up3_tail``
# below (r3): fusing the whole up2→up3→tail cascade makes the only kernel
# result the 1-channel PCM, which sidesteps the parking entirely.

_UP2_K, _UP2_S = 10, 5  # the reference's up2 (decoder.model.5): k=10, stride=5
# Smaller blocks than the up3 kernel: the 5-phase unroll holds ~20 live
# [128, Qb] f32 intermediates, and 512 columns blew the 16 MB scoped-VMEM
# limit (35 MB) on v5e. 128 columns ≈ 9 MB and still amortizes the grid.
_QB2 = 128


def supports_up2(c_in: int, t_in: int, k: int) -> bool:
    return c_in == 256 and k == _UP2_K and t_in % _QB2 == 0 and t_in >= _QB2


def _up2_kernel(x_ref, prev_ref, wu_ref, bu_ref, w1_ref, b1_ref, w2_ref, b2_ref, *o_refs):
    i = pl.program_id(1)
    qb = x_ref.shape[-1]
    f32 = jnp.float32

    cur = x_ref[0]  # [256, Qb]
    prev = prev_ref[0]
    halo = jnp.where(i == 0, 0.0, 1.0) * prev[:, qb - 4 :]
    xh = jnp.concatenate([halo, cur], axis=-1).astype(f32)  # [256, Qb+4]

    wu = wu_ref[...].astype(f32)  # [128, 256, 10] repacked
    bu = bu_ref[...].astype(f32)[:, None]
    w1 = w1_ref[...].astype(f32)  # [64, 128, 3]
    b1 = b1_ref[...].astype(f32)[:, None]
    w2 = w2_ref[...].astype(f32)  # [128, 64]
    b2 = b2_ref[...].astype(f32)[:, None]

    mb = qb
    t0 = i * (mb * _UP2_S)

    # Phase r of t = 5m + r mixes x[q-1] (A_r = W[:,:,(9-r)%5]) and x[q]
    # (B_r = A-tap + 5); columns carried with 3 left halo entries.
    y = []
    for r in range(_UP2_S):
        j1 = (9 - r) % 5
        yr = (
            jax.lax.dot_general(
                wu[:, :, j1], xh[:, 0 : mb + 3], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + jax.lax.dot_general(
                wu[:, :, j1 + 5], xh[:, 1 : mb + 4], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bu
        )
        pos = t0 + _UP2_S * (jax.lax.broadcasted_iota(jnp.int32, (1, mb + 3), 1) - 3) + r
        y.append(jnp.where(pos >= 0, yr, 0.0))

    h = [_elu(v) for v in y]

    # res2.conv1 (k3 causal) across 5 phases: tap d reads phase (r-2+d) mod 5
    # at column offset floor((r-2+d)/5).
    for r in range(_UP2_S):
        acc = b1
        for d in range(3):
            e = r - 2 + d
            ph, off = e % 5, (e - e % 5) // 5  # off ∈ {-1, 0}
            acc = acc + jax.lax.dot_general(
                w1[:, :, d], h[ph][:, 1 + off : 1 + off + mb + 2],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        h2 = _elu(acc)
        c2 = (
            jax.lax.dot_general(w2, h2, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            + b2
        )
        v = _elu(y[r][:, 1:] + c2)  # residual then the decode chain's ELU
        # Output phase: logical columns [0, Mb) = local [2, Mb+2). Five
        # separate refs (not one rank-4 buffer) so XLA's buffer assignment
        # doesn't try to park a single 20 MB result in scoped VMEM.
        o_refs[r][0] = v[:, 2 : 2 + mb].astype(o_refs[r].dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
@pin_default_matmul_precision
def fused_up2_res(
    x: jax.Array,  # [B, 256, T/20] pre-up2 activations (already ELU'd)
    wu: jax.Array,  # [128, 256, 10] repacked up2 kernel
    bu: jax.Array,  # [128]
    w1: jax.Array,  # [64, 128, 3] res2.conv1
    b1: jax.Array,
    w2: jax.Array,  # [128, 64, 1] res2.conv2
    b2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``elu(y + res2(y))`` with ``y = up2(x)`` → ``[B, 128, 5·T_in]``."""
    b, c, t_in = x.shape
    assert supports_up2(c, t_in, wu.shape[-1]), (x.shape, wu.shape)
    nb = t_in // _QB2

    grid = (b, nb)
    out = pl.pallas_call(
        _up2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 256, _QB2), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, 256, _QB2), lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0))),
            pl.BlockSpec((128, 256, 10), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((128,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 128, 3), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((128, 64), lambda bi, i: (0, 0)),
            pl.BlockSpec((128,), lambda bi, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, 128, _QB2), lambda bi, i: (bi, 0, i))
            for _ in range(_UP2_S)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 128, t_in), x.dtype) for _ in range(_UP2_S)
        ],
        interpret=interpret,
    )(x, x, wu, bu, w1, b1, w2.reshape(128, 64), b2)
    # Per-phase [B, 128, M] × 5 → time order [B, 128, 5M].
    return jnp.stack(out, axis=-1).reshape(b, 128, t_in * _UP2_S)


# -- full cascade: up2 → res2 → ELU → up3 → res3 → ELU → final conv -----------
#
# The r2 up2+res2 kernel (above) is blocked by this environment's AOT buffer
# assignment parking its ~20 MB result in scoped VMEM. The fix its status
# note proposed: fuse the WHOLE up2→up3→tail cascade so the up2 output never
# materializes anywhere — the only kernel result is the 1-channel PCM
# (~0.6 MB), which is exactly how the up3+tail kernel escapes the same trap.
#
# Everything stays in phase space: time t = 20c + j (j ∈ [0, 20)) composes
# the stride-5 up2 phases (u = 5a + s) with the stride-4 up3 phases
# (t = 4u + r₄ ⇒ r₄ = j mod 4, u-phase g = (j − r₄)/4). Every conv tap is a
# per-phase matmul with a static column shift; the 24 kHz activations
# ([64, T] and [128, 5·T/20] f32) never touch HBM.
#
# Left-halo bookkeeping (logical columns needed left of the block):
#   final conv reads z @ [-1, Mb)     → z  width Mb+1  (col = c+1)
#   z (res3+ELU) reads y3 @ [-2, Mb)  → y3 width Mb+2  (col = c+2)
#   y3 (up3) reads h2 @ [-3, Mb)      → h2 width Mb+3  (col = a+3)
#   h2 (res2+ELU) reads y2 @ [-4, Mb) → y2 width Mb+4  (col = a+4)
#   y2 (up2) reads x @ [-5, Mb)       → x halo = 5 columns from block i−1

_CB = 128  # input columns per grid block (minor dim lane-aligned)


def supports_cascade(c_in: int, t_in: int, k2: int, k3: int) -> bool:
    return c_in == 256 and k2 == _UP2_K and k3 == _UP_K and t_in % _CB == 0 and t_in >= _CB


def _cascade_kernel(
    x_ref, prev_ref,
    wu2_ref, bu2_ref, w1r2_ref, b1r2_ref, w2r2_ref, b2r2_ref,
    wu3_ref, bu3_ref, w1r3_ref, b1r3_ref, w2r3_ref, b2r3_ref,
    wf_ref, bf_ref, o_ref,
):
    # VMEM-stack discipline (the binding constraint — a naive 20-phase unroll
    # needed 42 MB against the 16 MB scoped limit): (1) inter-stage phase
    # buffers are stored in the INPUT dtype (bf16 on TPU — exactly where the
    # XLA chain also rounds, at stage boundaries) with f32 accumulation
    # inside each conv; (2) the two shifted column views each stage needs
    # (offset −1 / 0) are materialized ONCE per phase and reused by every
    # tap, instead of one slice per tap (the final conv alone otherwise
    # slices 140 buffers); (3) the k7 output conv is a [1,64]×[64,Mb] dot
    # per tap, not a broadcast-multiply-reduce (whose 140 [64, Mb] f32
    # products dominated the stack).
    i = pl.program_id(1)
    mb = x_ref.shape[-1]
    f32 = jnp.float32
    sdt = x_ref.dtype

    cur = x_ref[0]  # [256, Mb]
    prev = prev_ref[0]
    halo = (jnp.where(i == 0, 0.0, 1.0) * prev[:, mb - 5 :]).astype(sdt)
    xh = jnp.concatenate([halo, cur], axis=-1)  # [256, Mb+5], sdt

    wu2 = wu2_ref[...]  # [128, 256, 10] repacked, sdt
    bu2 = bu2_ref[...].astype(f32)[:, None]
    w1r2 = w1r2_ref[...]  # [64, 128, 3]
    b1r2 = b1r2_ref[...].astype(f32)[:, None]
    w2r2 = w2r2_ref[...]  # [128, 64]
    b2r2 = b2r2_ref[...].astype(f32)[:, None]
    wu3 = wu3_ref[...]  # [64, 128, 8] repacked
    bu3 = bu3_ref[...].astype(f32)[:, None]
    w1r3 = w1r3_ref[...]  # [32, 64, 3]
    b1r3 = b1r3_ref[...].astype(f32)[:, None]
    w2r3 = w2r3_ref[...]  # [64, 32]
    b2r3 = b2r3_ref[...].astype(f32)[:, None]
    wf = wf_ref[...]  # [64, 7]
    bf = bf_ref[...].astype(f32)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    # -- up2 (stride 5, k10): y2 phases s, logical cols a ∈ [-4, Mb) ----------
    # Phase s of u = 5a + s mixes x[a-1] (A_s = W[:,:,(9-s)%5]) and x[a].
    xh0, xh1 = xh[:, 0 : mb + 4], xh[:, 1 : mb + 5]
    y2, h = [], []
    for s in range(_UP2_S):
        j1 = (9 - s) % 5
        v = dot(wu2[:, :, j1], xh0) + dot(wu2[:, :, j1 + 5], xh1) + bu2
        # Causal zero padding over u (positions before u=0 are literal zeros).
        pos = 5 * (i * mb + jax.lax.broadcasted_iota(jnp.int32, (1, mb + 4), 1) - 4) + s
        keep = pos >= 0
        # ELU computed from the f32 accumulator here (Mosaic has no bf16
        # compare), both stored in sdt.
        y2.append(jnp.where(keep, v, 0.0).astype(sdt))
        h.append(jnp.where(keep, _elu(v), 0.0).astype(sdt))

    # h: elu(y2) [128, Mb+4], col = a+4, sdt
    hv = [(v[:, 0 : mb + 3], v[:, 1 : mb + 4]) for v in h]  # offsets −1 / 0

    # -- res2 + ELU: h2 phases s, cols a ∈ [-3, Mb) ---------------------------
    h2 = []
    for s in range(_UP2_S):
        acc = b1r2
        for d in range(3):
            e = s - 2 + d
            acc = acc + dot(w1r2[:, :, d], hv[e % 5][(e - e % 5) // 5 + 1])
        c2 = dot(w2r2, _elu(acc).astype(sdt)) + b2r2
        v = _elu(y2[s][:, 1 : mb + 4].astype(f32) + c2)  # [128, Mb+3], col = a+3
        pos = 5 * (i * mb + jax.lax.broadcasted_iota(jnp.int32, (1, mb + 3), 1) - 3) + s
        h2.append(jnp.where(pos >= 0, v, 0.0).astype(sdt))

    h2v = [(v[:, 0 : mb + 2], v[:, 1 : mb + 3]) for v in h2]  # offsets −1 / 0

    # -- up3 (stride 4, k8): y3 phases j ∈ [0, 20), cols c ∈ [-2, Mb) ---------
    # t = 20c + j = 4u + r₄: u = 5c + g with r₄ = j mod 4, g = (j − r₄)/4.
    # Phase r₄ mixes h2[u-1] (A'_{r₄} = W[:,:,(7-r₄)%4]) and h2[u].
    y3, h3 = [], []
    for j in range(20):
        r4, g = j % 4, (j - j % 4) // 4
        curp = h2v[g][1]  # u = 5c+g → phase g col c
        prevp = h2v[g - 1][1] if g > 0 else h2v[4][0]  # u-1 wraps to phase 4, col c-1
        v = dot(wu3[:, :, (7 - r4) % 4], prevp) + dot(wu3[:, :, (7 - r4) % 4 + 4], curp) + bu3
        pos = 20 * (i * mb + jax.lax.broadcasted_iota(jnp.int32, (1, mb + 2), 1) - 2) + j
        keep = pos >= 0
        y3.append(jnp.where(keep, v, 0.0).astype(sdt))
        h3.append(jnp.where(keep, _elu(v), 0.0).astype(sdt))

    # h3: elu(y3) [64, Mb+2], col = c+2, sdt
    h3v = [(v[:, 0 : mb + 1], v[:, 1 : mb + 2]) for v in h3]

    # -- res3 + ELU: z phases j, cols c ∈ [-1, Mb) ----------------------------
    z = []
    for j in range(20):
        acc = b1r3
        for d in range(3):
            e = j - 2 + d
            acc = acc + dot(w1r3[:, :, d], h3v[e % 20][(e - e % 20) // 20 + 1])
        c2 = dot(w2r3, _elu(acc).astype(sdt)) + b2r3
        v = _elu(y3[j][:, 1 : mb + 2].astype(f32) + c2)  # [64, Mb+1], col = c+1
        pos = 20 * (i * mb + jax.lax.broadcasted_iota(jnp.int32, (1, mb + 1), 1) - 1) + j
        z.append(jnp.where(pos >= 0, v, 0.0).astype(sdt))

    zv = [(v[:, 0:mb], v[:, 1 : mb + 1]) for v in z]

    # -- final conv (k7 causal): out phases j, cols c ∈ [0, Mb) ---------------
    for j in range(20):
        acc = jnp.zeros((1, mb), f32)
        for d in range(7):
            e = j - 6 + d
            acc = acc + dot(wf[:, d][None, :], zv[e % 20][(e - e % 20) // 20 + 1])
        o_ref[0, j] = (acc + bf).astype(o_ref.dtype)[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
@pin_default_matmul_precision
def fused_up2_up3_tail(
    x: jax.Array,  # [B, 256, T/20] pre-up2 activations (already ELU'd)
    wu2: jax.Array,  # [128, 256, 10] repacked up2 kernel
    bu2: jax.Array,
    w1r2: jax.Array,  # [64, 128, 3] res2.conv1
    b1r2: jax.Array,
    w2r2: jax.Array,  # [128, 64, 1] res2.conv2
    b2r2: jax.Array,
    wu3: jax.Array,  # [64, 128, 8] repacked up3 kernel
    bu3: jax.Array,
    w1r3: jax.Array,  # [32, 64, 3] res3.conv1
    b1r3: jax.Array,
    w2r3: jax.Array,  # [64, 32, 1] res3.conv2
    b2r3: jax.Array,
    wf: jax.Array,  # [1, 64, 7] final conv
    bf: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """``final(elu(res3(up3(elu(res2(up2(x)))))))`` fully in phase space →
    ``[B, 1, 20·T_in]`` PCM (the last two decode stages in one VMEM pass)."""
    b, c, t_in = x.shape
    assert supports_cascade(c, t_in, wu2.shape[-1], wu3.shape[-1]), (x.shape,)
    nb = t_in // _CB

    grid = (b, nb)
    out = pl.pallas_call(
        _cascade_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 256, _CB), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, 256, _CB), lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0))),
            pl.BlockSpec((128, 256, 10), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((128,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 128, 3), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((128, 64), lambda bi, i: (0, 0)),
            pl.BlockSpec((128,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 128, 8), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((32, 64, 3), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((32,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 32), lambda bi, i: (0, 0)),
            pl.BlockSpec((64,), lambda bi, i: (0,)),
            pl.BlockSpec((64, 7), lambda bi, i: (0, 0)),
            pl.BlockSpec((1,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 20, _CB), lambda bi, i: (bi, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, 20, t_in), x.dtype),
        interpret=interpret,
    )(
        x, x,
        wu2, bu2, w1r2, b1r2, w2r2.reshape(128, 64), b2r2,
        wu3, bu3, w1r3, b1r3, w2r3.reshape(64, 32), b2r3,
        wf.reshape(64, 7), bf,
    )
    # Phases-major [B, 20, T/20] → time order [B, 1, T].
    return jnp.swapaxes(out, 1, 2).reshape(b, 1, t_in * 20)
