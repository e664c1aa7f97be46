"""Pallas decode-attention kernel vs the XLA reference path (interpret mode
on CPU; the TPU compiled path is exercised by the runtime flag on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.ops import apply_rope, attention_with_positions, build_rope_tables
from go_pocket_tts_tpu.ops.pallas.decode_attention import decode_attention_step


@pytest.mark.parametrize("offset", [0, 5, 30])
@pytest.mark.parametrize("layer", [0, 1])
def test_decode_attention_matches_xla(offset, layer):
    n_layers, b, h, c, d = 2, 1, 4, 32, 16
    rng = np.random.RandomState(offset)
    q = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    k_new = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    v_new = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    k_cache = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    v_cache = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    cos, sin = build_rope_tables(64, d)
    off = jnp.int32(offset)

    # XLA reference: rope, DUS append, masked attention on the chosen layer.
    q_r = apply_rope(q, cos, sin, off)
    k_r = apply_rope(k_new, cos, sin, off)
    kc_ref = jax.lax.dynamic_update_slice(k_cache[layer], k_r, (0, 0, off, 0))
    vc_ref = jax.lax.dynamic_update_slice(v_cache[layer], v_new, (0, 0, off, 0))
    pos_q = off + jnp.arange(1, dtype=jnp.int32)
    pos_k = jnp.arange(c, dtype=jnp.int32)
    want = attention_with_positions(q_r, kc_ref, vc_ref, pos_q, pos_k)

    k_cache_np = np.asarray(k_cache)  # snapshot before donation
    got, kc, vc = decode_attention_step(
        q, k_new, k_cache, v_cache, v_new, off, cos, sin, layer=layer, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(kc[layer]), np.asarray(kc_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vc[layer]), np.asarray(vc_ref), atol=1e-5)
    # Untouched layers stay intact.
    other = 1 - layer
    np.testing.assert_array_equal(np.asarray(kc[other]), k_cache_np[other])


def test_pallas_runtime_end_to_end_matches_xla():
    """TPURuntime(pallas=True) must produce identical audio (interpret mode on
    CPU) to the XLA path."""
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    arch = synthetic.tiny_arch()
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=77))),
        num_heads=arch.num_heads,
    )
    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=4)
    ref = TPURuntime(model, seed=2, frame_bucket=64).generate_audio([3, 5], cfg)
    pal = TPURuntime(model, seed=2, frame_bucket=64, pallas=True).generate_audio([3, 5], cfg)
    np.testing.assert_allclose(pal, ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("layer", [0, 1])
def test_batched_decode_attention_matches_xla(layer):
    """Per-lane offsets (heterogeneous EOS case): the batched kernel must
    match attention_with_positions on every lane, incl. offset 0."""
    from go_pocket_tts_tpu.ops.pallas.batched_decode_attention import (
        batched_decode_attention,
    )

    n_layers, b, h, c, d = 2, 4, 2, 32, 16
    rng = np.random.RandomState(layer)
    q = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    k_cache = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    v_cache = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    offsets = jnp.asarray([0, 5, 17, 31], jnp.int32)

    pos_q = offsets[:, None]
    pos_k = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], (b, c))
    want = attention_with_positions(q, k_cache[layer], v_cache[layer], pos_q, pos_k)

    got = batched_decode_attention(
        q, k_cache, v_cache, offsets, layer=layer, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_batched_decode_attention_int8kv_matches_xla():
    """INT8-KV variant vs attention_with_positions_int8kv (per-row scales
    distribute over the dots; the kernel never materializes a dequantized
    cache)."""
    from go_pocket_tts_tpu.ops import attention as att
    from go_pocket_tts_tpu.models.quantize import quantize_kv_rows
    from go_pocket_tts_tpu.ops.pallas.batched_decode_attention import (
        batched_decode_attention,
    )

    n_layers, b, h, c, d = 2, 4, 2, 32, 16
    layer = 1
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    k_rows = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    v_rows = jnp.asarray(rng.randn(n_layers, b, h, c, d).astype(np.float32) * 0.3)
    kq, ks = quantize_kv_rows(k_rows)
    vq, vs = quantize_kv_rows(v_rows)
    offsets = jnp.asarray([2, 9, 0, 31], jnp.int32)

    pos_q = offsets[:, None]
    pos_k = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], (b, c))
    want = att.attention_with_positions_int8kv(
        q, kq[layer], ks[layer], vq[layer], vs[layer], pos_q, pos_k
    )

    got = batched_decode_attention(
        q, kq, vq, offsets, k_scale=ks, v_scale=vs, layer=layer, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3, rtol=5e-3)


def test_pallas_default_resolution(monkeypatch):
    """Tri-state ``pallas``: unset -> auto (decode-attention kernel on TPU
    backends and non-f32 dtypes only, never the quantized per-linear
    kernel); env "1" -> full opt-in; env "0" -> off even on TPU."""
    import jax.numpy as jnp

    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.runtime import TPURuntime
    from go_pocket_tts_tpu.runtime import generate as gen_mod
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    arch = synthetic.tiny_arch()
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=1))),
        num_heads=arch.num_heads,
    )

    def tcfg(rt):
        return rt.model.config.flow_lm.transformer.use_pallas

    monkeypatch.delenv("POCKETTTS_PALLAS", raising=False)
    # Auto on a CPU backend: off (interpret mode would be slower than XLA).
    assert tcfg(TPURuntime(model, dtype=jnp.bfloat16)) is False
    # Auto on a non-CPU backend: kernel on for bf16, off for the f32 parity
    # path (hardware-measured slower there, PERF.md r5).
    monkeypatch.setattr(gen_mod.jax, "default_backend", lambda: "tpu")
    assert tcfg(TPURuntime(model, dtype=jnp.bfloat16)) is True
    assert tcfg(TPURuntime(model)) is False
    # Env "0" forces off even on TPU; "1" forces on even on CPU/f32.
    monkeypatch.setenv("POCKETTTS_PALLAS", "0")
    assert tcfg(TPURuntime(model, dtype=jnp.bfloat16)) is False
    monkeypatch.setattr(gen_mod.jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("POCKETTTS_PALLAS", "1")
    assert tcfg(TPURuntime(model)) is True


# -- int8 quantized matmul kernel ---------------------------------------------


@pytest.mark.parametrize("m,k,n", [(1, 256, 512), (8, 128, 768), (4, 512, 1536)])
def test_quantized_matmul_matches_xla(m, k, n):
    from go_pocket_tts_tpu.ops.pallas.quantized_matmul import quantized_matmul, supports

    assert supports(m, k, n)
    rng = np.random.RandomState(n)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w_q = jnp.asarray(rng.randint(-127, 128, size=(k, n)).astype(np.int8))
    scale = jnp.asarray((rng.rand(n).astype(np.float32) + 0.5) * 0.01)

    want = (
        jax.lax.dot_general(
            x, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    got = quantized_matmul(x, w_q, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-4)


def test_quantized_matmul_supports_gate():
    from go_pocket_tts_tpu.ops.pallas.quantized_matmul import supports

    assert not supports(1, 100, 512)  # K not 128-multiple
    assert not supports(1, 256, 100)  # N not 256-multiple
    assert not supports(128, 256, 512)  # M too large (prefill shapes use XLA)


def test_quantized_pallas_runtime_end_to_end():
    """TPURuntime(quantize=True, pallas=True) routes int8 linears through the
    kernel (interpret on CPU) and matches the XLA int8 path bit-for-bit-ish."""
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.models.params import set_quantized_matmul_backend
    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    arch = synthetic.tiny_arch()
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=78))),
        num_heads=arch.num_heads,
    )
    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=4)
    try:
        ref = TPURuntime(model, seed=2, frame_bucket=64, quantize=True).generate_audio(
            [3, 5], cfg
        )
        pal = TPURuntime(
            model, seed=2, frame_bucket=64, quantize=True, pallas=True
        ).generate_audio([3, 5], cfg)
    finally:
        set_quantized_matmul_backend("xla")
    np.testing.assert_allclose(pal, ref, atol=1e-3, rtol=1e-3)


# -- int4 fused depack-matmul kernel ------------------------------------------


@pytest.mark.parametrize(
    "m,k,n", [(8, 256, 512), (8, 1024, 512), (4, 512, 256), (16, 384, 768), (1, 256, 256)]
)
def test_int4_matmul_matches_dequant_reference(m, k, n):
    """Kernel (interpret) == matmul against the dequantized float weight."""
    from go_pocket_tts_tpu.models.quantize import dequantize_weight, quantize_linear
    from go_pocket_tts_tpu.ops.pallas.int4_matmul import int4_matmul, supports

    rng = np.random.RandomState(k + n)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) / np.sqrt(k))
    q = quantize_linear({"w": w}, bits=4)
    assert q["w"].dtype == jnp.uint8 and q["scale"].ndim == 2, "needs group-wise int4"
    assert supports(m, k, n, q["scale"].shape)

    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    want = x @ dequantize_weight(q)
    x2 = jnp.moveaxis(x.reshape(m, k // 2, 2), -1, 0)
    got = int4_matmul(x2, q["w"], q["scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_int4_matmul_supports_gate():
    from go_pocket_tts_tpu.ops.pallas.int4_matmul import supports

    g = lambda k: (k // 128, 1)  # noqa: E731 - shape stub
    assert not supports(128, 256, 512, g(256))  # prefill M stays on XLA
    assert not supports(8, 100, 512, g(256))  # K not 128-multiple
    assert not supports(8, 256, 100, g(256))  # N not lane-aligned
    assert not supports(8, 256, 512, (256,))  # per-channel scale: XLA path
    assert not supports(8, 512, 512, (2, 1))  # scale rows != K/128


def test_int4_apply_linear_pallas_variant_matches_split():
    """apply_linear under POCKETTTS_INT4_VARIANT=pallas:interpret == the XLA
    split variant (same packed buffer, same group scales, f32 accumulation
    both sides — only the partial-sum order differs)."""
    from go_pocket_tts_tpu.models import params as P
    from go_pocket_tts_tpu.models.quantize import quantize_linear

    rng = np.random.RandomState(7)
    k, n, m = 512, 768, 8
    lin = quantize_linear(
        {
            "w": jnp.asarray(rng.randn(k, n).astype(np.float32) / np.sqrt(k)),
            "b": jnp.asarray(rng.randn(n).astype(np.float32) * 0.02),
        },
        bits=4,
    )
    x = jnp.asarray(rng.randn(2, m // 2, k).astype(np.float32))  # lead dims
    try:
        P.set_int4_matmul_variant("split")
        want = P.apply_linear(lin, x)
        P.set_int4_matmul_variant("pallas:interpret")
        got = P.apply_linear(lin, x)
    finally:
        P.set_int4_matmul_variant("split")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_kernel_dots_ignore_caller_matmul_precision():
    """Mosaic only lowers DEFAULT/HIGHEST dot precisions; the fp32 runtime's
    ``jax.default_matmul_precision("high")`` context must not leak into
    kernel jaxprs (observed crash: 'Unsupported dot precision: HIGH' in the
    seanet up-tail). Every kernel entry point pins "default" at trace time —
    verified here by walking the traced pallas_call's inner jaxpr."""
    from go_pocket_tts_tpu.models.quantize import quantize_linear
    from go_pocket_tts_tpu.ops.pallas.int4_matmul import int4_matmul

    m, k, n = 8, 256, 512
    rng = np.random.RandomState(0)
    q = quantize_linear(
        {"w": jnp.asarray(rng.randn(k, n).astype(np.float32) / 16.0)}, bits=4
    )
    x2 = jnp.asarray(rng.randn(2, m, k // 2).astype(np.float32))

    def dot_precisions(jaxpr, found):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                found.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", v)
                if hasattr(inner, "eqns"):
                    dot_precisions(inner, found)
        return found

    with jax.default_matmul_precision("high"):
        traced = jax.make_jaxpr(
            lambda a, w, s: int4_matmul(a, w, s, interpret=True)
        )(x2, q["w"], q["scale"])
    precisions = dot_precisions(traced.jaxpr, [])
    assert precisions, "expected dot_general eqns inside the kernel"
    for p in precisions:
        assert p is None or jax.lax.Precision.HIGH not in tuple(
            p if isinstance(p, (tuple, list)) else (p, p)
        ), precisions


# -- fused SEANet tail kernel -------------------------------------------------


@pytest.mark.parametrize("blocks,batch", [(1, 1), (3, 2)])
def test_fused_seanet_tail_matches_xla(blocks, batch):
    """Fused res3+ELU+final_conv (interpret mode) == the XLA conv chain,
    including block-boundary halos and the t<0 zero padding."""
    from go_pocket_tts_tpu.ops.conv import causal_conv1d
    from go_pocket_tts_tpu.ops.pallas.seanet_tail import _BLOCK_T, fused_seanet_tail

    rng = np.random.RandomState(blocks * 10 + batch)
    T = _BLOCK_T * blocks
    x = jnp.asarray(rng.randn(batch, 64, T).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(32, 64, 3).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(64, 32, 1).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    wf = jnp.asarray(rng.randn(1, 64, 7).astype(np.float32) * 0.1)
    bf = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    h = causal_conv1d(jax.nn.elu(x), w1, b1)
    h = causal_conv1d(jax.nn.elu(h), w2, b2)
    want = causal_conv1d(jax.nn.elu(x + h), wf, bf)

    got = fused_seanet_tail(x, w1, b1, w2, b2, wf, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_fused_seanet_tail_in_mimi_decode():
    """mimi_decode with use_pallas picks the fused tail when the shape
    qualifies and matches the XLA decode exactly at the audio level."""
    import dataclasses

    from go_pocket_tts_tpu.models import mimi as mimi_mod
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    arch = synthetic.real_arch()  # tail channels 64 → kernel qualifies
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=5))),
        num_heads=arch.num_heads,
    )
    rng = np.random.RandomState(0)
    latent = jnp.asarray(rng.randn(1, 512, 2).astype(np.float32) * 0.3)

    want = mimi_mod.mimi_decode(model.params["mimi"], model.config.mimi, latent)
    cfg_p = dataclasses.replace(model.config.mimi, use_pallas=True)
    got = mimi_mod.mimi_decode(model.params["mimi"], cfg_p, latent)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("blocks,batch", [(1, 1), (2, 2)])
def test_fused_seanet_up_tail_matches_xla(blocks, batch):
    """Polyphase up3 (convT s4 k8) fused with the tail == the XLA chain."""
    from go_pocket_tts_tpu.ops.conv import (
        causal_conv1d,
        conv_transpose1d_trim,
        repack_conv_transpose_kernel,
    )
    from go_pocket_tts_tpu.ops.pallas.seanet_tail import _QB, fused_seanet_up_tail

    rng = np.random.RandomState(blocks + batch)
    T_in = _QB * blocks
    x = jnp.asarray(rng.randn(batch, 128, T_in).astype(np.float32) * 0.5)
    wu = repack_conv_transpose_kernel(
        jnp.asarray(rng.randn(128, 64, 8).astype(np.float32) * 0.1)
    )
    bu = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(32, 64, 3).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(64, 32, 1).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    wf = jnp.asarray(rng.randn(1, 64, 7).astype(np.float32) * 0.1)
    bf = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    y = conv_transpose1d_trim(x, wu, bu, 4, 1)
    h = causal_conv1d(jax.nn.elu(y), w1, b1)
    h = causal_conv1d(jax.nn.elu(h), w2, b2)
    want = causal_conv1d(jax.nn.elu(y + h), wf, bf)

    got = fused_seanet_up_tail(x, wu, bu, w1, b1, w2, b2, wf, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("blocks,batch", [(1, 1), (2, 2)])
def test_fused_up2_res_matches_xla(blocks, batch):
    """Phase-space up2 (convT s5 k10) + res2 + ELU == the XLA chain."""
    from go_pocket_tts_tpu.ops.conv import (
        causal_conv1d,
        conv_transpose1d_trim,
        repack_conv_transpose_kernel,
    )
    from go_pocket_tts_tpu.ops.pallas.seanet_tail import _QB, fused_up2_res

    rng = np.random.RandomState(blocks + 7 * batch)
    T_in = _QB * blocks
    x = jnp.asarray(rng.randn(batch, 256, T_in).astype(np.float32) * 0.5)
    wu = repack_conv_transpose_kernel(
        jnp.asarray(rng.randn(256, 128, 10).astype(np.float32) * 0.05)
    )
    bu = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(64, 128, 3).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(128, 64, 1).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)

    y = conv_transpose1d_trim(x, wu, bu, 5, 1)
    h = causal_conv1d(jax.nn.elu(y), w1, b1)
    h = causal_conv1d(jax.nn.elu(h), w2, b2)
    want = jax.nn.elu(y + h)

    got = fused_up2_res(x, wu, bu, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("blocks,batch", [(1, 1), (3, 2)])
def test_fused_up2_up3_tail_matches_xla(blocks, batch):
    """Full phase-space cascade (up2→res2→ELU→up3→res3→ELU→final) == the
    five-stage XLA chain (the r3 kernel replacing the VMEM-blocked up2)."""
    from go_pocket_tts_tpu.ops.conv import (
        causal_conv1d,
        conv_transpose1d_trim,
        repack_conv_transpose_kernel,
    )
    from go_pocket_tts_tpu.ops.pallas.seanet_tail import _CB, fused_up2_up3_tail

    rng = np.random.RandomState(blocks + 13 * batch)
    T_in = _CB * blocks
    x = jnp.asarray(rng.randn(batch, 256, T_in).astype(np.float32) * 0.5)
    wu2 = repack_conv_transpose_kernel(
        jnp.asarray(rng.randn(256, 128, 10).astype(np.float32) * 0.05)
    )
    bu2 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w1r2 = jnp.asarray(rng.randn(64, 128, 3).astype(np.float32) * 0.1)
    b1r2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2r2 = jnp.asarray(rng.randn(128, 64, 1).astype(np.float32) * 0.1)
    b2r2 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    wu3 = repack_conv_transpose_kernel(
        jnp.asarray(rng.randn(128, 64, 8).astype(np.float32) * 0.1)
    )
    bu3 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w1r3 = jnp.asarray(rng.randn(32, 64, 3).astype(np.float32) * 0.1)
    b1r3 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    w2r3 = jnp.asarray(rng.randn(64, 32, 1).astype(np.float32) * 0.1)
    b2r3 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    wf = jnp.asarray(rng.randn(1, 64, 7).astype(np.float32) * 0.1)
    bf = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    y2 = conv_transpose1d_trim(x, wu2, bu2, 5, 1)
    h = causal_conv1d(jax.nn.elu(y2), w1r2, b1r2)
    h = causal_conv1d(jax.nn.elu(h), w2r2, b2r2)
    h2 = jax.nn.elu(y2 + h)
    y3 = conv_transpose1d_trim(h2, wu3, bu3, 4, 1)
    r = causal_conv1d(jax.nn.elu(y3), w1r3, b1r3)
    r = causal_conv1d(jax.nn.elu(r), w2r3, b2r3)
    want = causal_conv1d(jax.nn.elu(y3 + r), wf, bf)

    got = fused_up2_up3_tail(
        x, wu2, bu2, w1r2, b1r2, w2r2, b2r2,
        wu3, bu3, w1r3, b1r3, w2r3, b2r3, wf, bf, interpret=True,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4)
