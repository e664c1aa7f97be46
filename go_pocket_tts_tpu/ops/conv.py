"""1-D convolutions with the reference's streaming (causal) semantics.

The reference implements CPU im2col/scatter kernels
(`internal/runtime/ops/conv1d.go`, `convtranspose1d.go`); on TPU both map to
``lax.conv_general_dilated``, which XLA lowers onto the MXU. What we preserve
exactly is the *streaming arithmetic*:

- causal Conv1D: ``left_pad = (k-1)*dilation + 1 - stride`` (clamped at 0),
  right pad 0 (`internal/native/mimi.go:69-76`)
- ConvTranspose1D: full output then ``right_trim = k - stride`` samples cut
  from the tail, fused into the op rather than a post-copy
  (`internal/native/mimi.go:116-125`, `ops/convtranspose1d.go:16-148`)

ConvTranspose1D is expressed as an input-dilated forward convolution with a
kernel repacked once at load time (:func:`repack_conv_transpose_kernel` — the
TPU analogue of the reference's ``RepackConvTransposeKernel``).

Weight layouts follow torch:
- Conv1d: ``[out_ch, in_ch / groups, k]``
- ConvTranspose1d: ``[in_ch, out_ch / groups, k]``
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv1d",
    "causal_conv1d",
    "repack_conv_transpose_kernel",
    "conv_transpose1d_trim",
    "conv_transpose1d_phases",
]

_DN = ("NCH", "OIH", "NCH")


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    left_pad: int = 0,
    right_pad: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Conv1D over ``[B, C, T]`` with asymmetric explicit padding."""
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(stride,),
        padding=[(left_pad, right_pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None]
    return out


def causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Streaming-causal Conv1D: left pad = effective_kernel - stride."""
    k = weight.shape[-1]
    eff_k = (k - 1) * dilation + 1
    left_pad = max(eff_k - stride, 0)
    return conv1d(x, weight, bias, stride, left_pad, 0, dilation, groups)


def repack_conv_transpose_kernel(weight: jax.Array, groups: int = 1) -> jax.Array:
    """Repack a ConvTranspose1d weight ``[I, O/g, K]`` into the forward-conv
    weight ``[O, I/g, K]`` (kernel-flipped) used by the dilated-conv
    formulation. Do this once at model load.
    """
    i_total, o_g, k = weight.shape
    i_g = i_total // groups
    w = weight.reshape(groups, i_g, o_g, k)
    w = jnp.flip(w, axis=-1)
    w = jnp.transpose(w, (0, 2, 1, 3))  # [g, O/g, I/g, K]
    return w.reshape(groups * o_g, i_g, k)


def conv_transpose1d_trim(
    x: jax.Array,
    repacked_weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    groups: int = 1,
    right_trim: Optional[int] = None,
) -> jax.Array:
    """ConvTranspose1D over ``[B, C, T]`` with in-op right trim.

    ``repacked_weight`` must come from :func:`repack_conv_transpose_kernel`.
    Output length is ``(T-1)*stride + K - right_trim``; the default trim
    ``K - stride`` yields exactly ``T*stride`` (streaming semantics).
    """
    k = repacked_weight.shape[-1]
    if right_trim is None:
        right_trim = k - stride
    if groups == 1 and stride > 1 and right_trim == k - stride:
        # Phase-space matmul formulation: XLA's input-dilated 1-D conv
        # lowering is VPU/transpose-bound on TPU (measured ~2 ms for the
        # SEANet up2 at 160 frames vs ~50 µs of actual MXU work); the
        # per-phase dot_generals below are pure MXU. Identical arithmetic.
        return conv_transpose1d_phases(x, repacked_weight, bias, stride)
    out = lax.conv_general_dilated(
        x,
        repacked_weight.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1 - right_trim)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None]
    return out


def conv_transpose1d_phases(
    x: jax.Array,
    repacked_weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
) -> jax.Array:
    """ConvTranspose1D (streaming trim) as per-phase matmuls + interleave.

    For output time t = S·m + r, the input-dilated conv's taps collapse to
    ``d_j = ((K-1-r) mod S) + S·j`` reading ``x[m + j - ⌊(K-1-r)/S⌋]`` — so
    each of the S phases is a sum of ⌈K/S⌉ ``[O,I]×[I,T]`` dot_generals on
    shifted views of x, and one stack+reshape interleaves time order. This
    is the same phase algebra as the Pallas SEANet kernels
    (`ops/pallas/seanet_tail.py`), kept in XLA where the interleave reshape
    is legal; the MXU does all the work. Math is identical to
    :func:`conv_transpose1d_trim` with the default trim.
    """
    b, c_in, t = x.shape
    o, _, k = repacked_weight.shape
    s = stride
    w = repacked_weight.astype(x.dtype)

    def shifted(qoff: int) -> jax.Array:
        # xs[:, :, m] = x[:, :, m + qoff], zero outside [0, T).
        if qoff == 0:
            return x
        if qoff < 0:
            return jnp.pad(x, ((0, 0), (0, 0), (-qoff, 0)))[:, :, :t]
        return jnp.pad(x, ((0, 0), (0, 0), (0, qoff)))[:, :, qoff : qoff + t]

    shifts = {}
    phases = []
    for r in range(s):
        j1 = (k - 1 - r) % s
        base = (k - 1 - r) // s
        acc = None
        j, d = 0, j1
        while d < k:
            qoff = j - base
            if qoff not in shifts:
                shifts[qoff] = shifted(qoff)
            term = jax.lax.dot_general(
                w[:, :, d],
                shifts[qoff],
                (((1,), (1,)), ((), ())),  # [O,I]·[B,I,T] -> [O,B,T]
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
            j, d = j + 1, d + s
        if acc is None:
            # K < S leaves phases with no taps (every S-th output sample has
            # no contributing input): correct value is zero, not a crash.
            acc = jnp.zeros((o, b, t), jnp.float32)
        phases.append(acc)
    y = jnp.stack(phases, axis=-1)  # [O, B, T, S]
    y = jnp.transpose(y, (1, 0, 2, 3)).reshape(b, o, t * s).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)[None, :, None]
    return y
