"""Kernel parity tests vs a torch oracle.

The reference validates its CPU kernels against upstream PyTorch via ONNX
parity fixtures (`internal/native/python_parity_test.go`); here torch-CPU is
the oracle directly, with the per-kernel tolerances from
`internal/runtime/ops/tolerance.go`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from go_pocket_tts_tpu import ops

RNG = np.random.RandomState(42)


def _t(x):
    return torch.from_numpy(np.asarray(x))


# -- activations -------------------------------------------------------------


def test_gelu_erf_matches_torch():
    x = RNG.randn(64).astype(np.float32) * 3
    got = np.asarray(ops.gelu_erf(jnp.asarray(x)))
    want = F.gelu(_t(x), approximate="none").numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_silu_elu_match_torch():
    x = RNG.randn(64).astype(np.float32) * 3
    # atol 1e-5: TPU's vectorized exp differs from libm by ~1e-6 ulps.
    np.testing.assert_allclose(
        np.asarray(ops.silu(jnp.asarray(x))), F.silu(_t(x)).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ops.elu(jnp.asarray(x))), F.elu(_t(x)).numpy(), atol=1e-5
    )


# -- norms -------------------------------------------------------------------


def test_layer_norm_matches_torch():
    x = RNG.randn(3, 5, 32).astype(np.float32)
    w = RNG.randn(32).astype(np.float32)
    b = RNG.randn(32).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = F.layer_norm(_t(x), (32,), _t(w), _t(b), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rms_norm_bessel_matches_upstream_formula():
    # Upstream: x / sqrt(x.var(-1) + eps) * alpha, torch var => Bessel (N-1).
    x = RNG.randn(4, 16).astype(np.float32) + 0.7
    alpha = RNG.randn(16).astype(np.float32)
    xt = _t(x)
    want = (xt / torch.sqrt(xt.var(dim=-1, keepdim=True) + 1e-5) * _t(alpha)).numpy()
    got = np.asarray(ops.rms_norm_bessel(jnp.asarray(x), jnp.asarray(alpha), 1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_modulate():
    x = RNG.randn(2, 8).astype(np.float32)
    shift = RNG.randn(2, 8).astype(np.float32)
    scale = RNG.randn(2, 8).astype(np.float32)
    got = np.asarray(ops.modulate(jnp.asarray(x), jnp.asarray(shift), jnp.asarray(scale)))
    np.testing.assert_allclose(got, x * (1 + scale) + shift, atol=1e-6)


# -- RoPE --------------------------------------------------------------------


def _rope_oracle(x, cos, sin, pos):
    """Direct NumPy transcription of ops/rope.go:81-105."""
    out = x.copy()
    *prefix, t, d = x.shape
    half = d // 2
    flat = out.reshape(-1, t, d)
    for p in range(flat.shape[0]):
        for ti in range(t):
            for j in range(half):
                a, b = flat[p, ti, 2 * j], flat[p, ti, 2 * j + 1]
                c, s = cos[pos + ti, j], sin[pos + ti, j]
                flat[p, ti, 2 * j] = a * c - b * s
                flat[p, ti, 2 * j + 1] = a * s + b * c
    return flat.reshape(x.shape)


def test_rope_matches_go_semantics():
    cos, sin = ops.build_rope_tables(max_seq=64, head_dim=8, max_period=10000.0)
    cos_n, sin_n = np.asarray(cos), np.asarray(sin)
    x = RNG.randn(2, 3, 5, 8).astype(np.float32)
    for pos in (0, 7):
        got = np.asarray(ops.apply_rope(jnp.asarray(x), cos, sin, pos))
        want = _rope_oracle(x, cos_n, sin_n, pos)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_rope_traced_position():
    cos, sin = ops.build_rope_tables(max_seq=32, head_dim=4)
    x = jnp.asarray(RNG.randn(1, 2, 1, 4).astype(np.float32))
    f = jax.jit(lambda x, p: ops.apply_rope(x, cos, sin, p))
    np.testing.assert_allclose(
        np.asarray(f(x, jnp.int32(5))),
        np.asarray(ops.apply_rope(x, cos, sin, 5)),
        atol=1e-6,
    )


def test_rope_table_values():
    # inv_freq = max_period^(-i/half) (flow_transformer.go:797-832)
    cos, sin = ops.build_rope_tables(max_seq=4, head_dim=6, max_period=100.0)
    inv = 100.0 ** (-np.arange(3) / 3.0)
    for p in range(4):
        # atol 1e-5: TPU sin/cos differ from libm by ~1e-6.
        np.testing.assert_allclose(np.asarray(cos)[p], np.cos(p * inv), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin)[p], np.sin(p * inv), atol=1e-5)


# -- attention ---------------------------------------------------------------


def _attention_oracle(q, k, v, pos_q, pos_k, context):
    """NumPy transcription of attention.go:307-484."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    out = np.zeros_like(q)
    scale = 1.0 / np.sqrt(d)
    for bi in range(b):
        for hi in range(h):
            for qi in range(tq):
                scores = np.full(tk, -np.inf)
                for ki in range(tk):
                    if pos_k[ki] < 0:
                        continue
                    delta = pos_q[qi] - pos_k[ki]
                    if delta < 0:
                        continue
                    if context >= 0 and delta >= context:
                        continue
                    scores[ki] = np.dot(q[bi, hi, qi], k[bi, hi, ki]) * scale
                if np.all(np.isinf(scores)):
                    continue
                m = scores.max()
                e = np.exp(scores - m)
                e[np.isinf(scores)] = 0
                p = e / e.sum()
                out[bi, hi, qi] = p @ v[bi, hi]
    return out


@pytest.mark.parametrize("context", [-1, 4])
def test_attention_with_positions_matches_oracle(context):
    b, h, tq, tk, d = 2, 3, 5, 11, 8
    q = RNG.randn(b, h, tq, d).astype(np.float32)
    k = RNG.randn(b, h, tk, d).astype(np.float32)
    v = RNG.randn(b, h, tk, d).astype(np.float32)
    # Mixed valid/invalid cache slots, like a partially filled KV cache.
    pos_k = np.array([0, 1, 2, 3, 4, 5, 6, -1, -1, -1, -1], dtype=np.int32)
    pos_q = np.arange(3, 3 + tq, dtype=np.int32)

    got = np.asarray(
        ops.attention_with_positions(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(pos_q),
            jnp.asarray(pos_k),
            context if context >= 0 else None,
        )
    )
    want = _attention_oracle(q, k, v, pos_q, pos_k, context)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_attention_matches_torch_sdpa_causal():
    """Full causal self-attention (prefill path) vs torch SDPA."""
    b, h, t, d = 1, 4, 9, 16
    q = RNG.randn(b, h, t, d).astype(np.float32)
    k = RNG.randn(b, h, t, d).astype(np.float32)
    v = RNG.randn(b, h, t, d).astype(np.float32)
    pos = np.arange(t, dtype=np.int32)
    got = np.asarray(
        ops.attention_with_positions(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), jnp.asarray(pos)
        )
    )
    want = F.scaled_dot_product_attention(_t(q), _t(k), _t(v), is_causal=True).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# -- conv --------------------------------------------------------------------


@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,dilation,groups",
    [
        (8, 16, 7, 1, 1, 1),
        (8, 16, 3, 2, 1, 1),
        (8, 8, 3, 1, 2, 8),  # depthwise dilated
        (12, 6, 5, 1, 1, 3),
    ],
)
def test_causal_conv1d_matches_torch(in_ch, out_ch, k, stride, dilation, groups):
    t = 20
    x = RNG.randn(2, in_ch, t).astype(np.float32)
    w = (RNG.randn(out_ch, in_ch // groups, k) * 0.3).astype(np.float32)
    b = RNG.randn(out_ch).astype(np.float32)

    got = np.asarray(
        ops.causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, dilation, groups)
    )
    eff_k = (k - 1) * dilation + 1
    left = max(eff_k - stride, 0)
    xt = F.pad(_t(x), (left, 0))
    want = F.conv1d(xt, _t(w), _t(b), stride=stride, dilation=dilation, groups=groups).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,groups",
    [
        (16, 8, 12, 6, 1),
        (16, 8, 10, 5, 1),
        (16, 8, 8, 4, 1),
        (8, 8, 16, 16, 8),  # grouped (the 512-group Mimi upsample, scaled down)
        (6, 6, 2, 2, 6),
        # Non-multiple k/stride combos exercise the phase-space matmul
        # path's general tap loop (conv_transpose1d_phases).
        (16, 8, 7, 3, 1),
        (16, 8, 3, 2, 1),
        (16, 8, 5, 5, 1),
        # k < stride: some phases have zero taps (their output samples are
        # bias-only) — regression for the acc=None crash in the phases path.
        (16, 8, 2, 4, 1),
        (16, 8, 1, 5, 1),
    ],
)
def test_conv_transpose1d_trim_matches_torch(in_ch, out_ch, k, stride, groups):
    t = 9
    x = RNG.randn(2, in_ch, t).astype(np.float32)
    w = (RNG.randn(in_ch, out_ch // groups, k) * 0.3).astype(np.float32)
    b = RNG.randn(out_ch).astype(np.float32)

    packed = ops.repack_conv_transpose_kernel(jnp.asarray(w), groups)
    got = np.asarray(
        ops.conv_transpose1d_trim(jnp.asarray(x), packed, jnp.asarray(b), stride, groups)
    )
    full = F.conv_transpose1d(_t(x), _t(w), _t(b), stride=stride, groups=groups).numpy()
    trim = k - stride
    if trim > 0:
        want = full[:, :, : full.shape[2] - trim]
    elif trim == 0:
        want = full
    else:  # streaming output is T*stride: the tail past torch's length is bias
        want = np.tile(b[None, :, None], (2, 1, t * stride)).astype(np.float32)
        want[:, :, : full.shape[2]] = full
    assert got.shape == want.shape == (2, out_ch, t * stride)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
