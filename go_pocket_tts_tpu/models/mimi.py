"""Mimi codec: latent upsampling, windowed transformer, SEANet vocoder.

Weight prefix ``mimi.*`` (reference loader `internal/native/mimi.go:546-637`):

- ``quantizer.output_proj``: 1×1 conv 32→512 (no bias) — usually pre-fused
  into the latent→mimi projector (see :mod:`models.model`)
- ``upsample.convtr.convtr``: ConvTranspose1d stride=16 **groups=512**
  (depthwise; 12.5 Hz → 200 Hz)
- ``decoder_transformer.transformer.layers.N``: 2 layers, 8 heads,
  sliding context window 250, learned ``layer_scale_{1,2}.scale``, RoPE, GELU
  FFN (`mimi.go:180-239`)
- ``decoder.model.{0,2,3,5,6,8,9,11}``: SEANet — conv → convT(s6) → res →
  convT(s5) → res → convT(s4) → res → conv, ELU activations, causal
  streaming conv semantics (left-pad convs, right-trim convTs)
- 16·6·5·4 = 1920 output samples per 12.5 Hz latent frame @ 24 kHz

Every stage is causal, so decoding a right-padded latent bucket yields
sample-exact prefixes — the property both shape-bucketing and the streaming
block decoder rely on.

The whole chain is one XLA program: transposed convs become input-dilated
convs on the MXU (kernels pre-repacked at load), the transformer fuses per
layer, and ELUs fuse into the surrounding convolutions.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models.params import (
    VarBuilder,
    apply_linear,
    layer_norm_params,
    linear_params,
)
from go_pocket_tts_tpu.ops import (
    apply_rope,
    attention_with_positions,
    build_rope_tables,
    causal_conv1d,
    conv_transpose1d_trim,
    elu,
    gelu_erf,
    layer_norm,
    repack_conv_transpose_kernel,
)
from go_pocket_tts_tpu.ops.local_attention import local_windowed_attention

__all__ = ["MimiConfig", "load_mimi", "mimi_decode", "quantizer_project"]

Params = Dict


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24_000
    frame_rate: float = 12.5
    encoder_frame_rate: float = 200.0
    num_heads: int = 8
    max_period: float = 10000.0
    context: int = 250
    # Static conv metadata (part of the config, not the param pytree, so jit
    # sees them as compile-time constants). upsample_groups is read from the
    # checkpoint at load; SEANet strides are the reference's 6/5/4
    # (`mimi.go:582-602`).
    upsample_groups: int = 512
    seanet_strides: Tuple[int, int, int] = (6, 5, 4)
    # Fuse res3 + ELU + final_conv into one Pallas VMEM pass at the full
    # 24 kHz rate (ops/pallas/seanet_tail.py); falls back to the XLA chain
    # for shapes the kernel doesn't cover.
    use_pallas: bool = False

    @property
    def steps_per_latent(self) -> int:
        """Upsample factor 200/12.5 = 16 (`mimi.go:657-686`)."""
        if self.frame_rate <= 0 or self.encoder_frame_rate <= 0:
            return 1
        return max(int(self.encoder_frame_rate / self.frame_rate), 1)

    @property
    def samples_per_latent(self) -> int:
        """1920 samples per latent frame (16 × 6 × 5 × 4 upsampling)."""
        return int(round(self.sample_rate / self.frame_rate))


def _load_conv(vb: VarBuilder, with_bias: bool) -> Params:
    w = vb.tensor("weight")
    if w.ndim != 3:
        raise ValueError(f"conv1d weight must be rank-3, got {w.shape}")
    p = {"w": w}
    if with_bias:
        b = vb.tensor_maybe("bias")
        if b is not None:
            p["b"] = b
    return p


def _load_convtr(vb: VarBuilder, groups: int, with_bias: bool) -> Params:
    w = vb.tensor("weight")  # [I, O/g, K]
    if w.ndim != 3:
        raise ValueError(f"convtranspose1d weight must be rank-3, got {w.shape}")
    p = {
        # Pre-repacked once at load — the TPU analogue of the reference's
        # RepackConvTransposeKernel (ops/convtranspose1d.go:16-33).
        "w": repack_conv_transpose_kernel(w, groups),
    }
    if with_bias:
        b = vb.tensor_maybe("bias")
        if b is not None:
            p["b"] = b
    return p


def _load_resblock(vb: VarBuilder) -> Params:
    return {
        "conv1": _load_conv(vb.path("block", "1", "conv"), with_bias=True),
        "conv2": _load_conv(vb.path("block", "3", "conv"), with_bias=True),
    }


def _load_transformer_layer(vb: VarBuilder) -> Params:
    p = {
        "norm1": layer_norm_params(vb, "norm1"),
        "norm2": layer_norm_params(vb, "norm2"),
        "in_proj": linear_params(vb, "self_attn.in_proj", with_bias=False),
        "out_proj": linear_params(vb, "self_attn.out_proj", with_bias=False),
        "linear1": linear_params(vb, "linear1", with_bias=False),
        "linear2": linear_params(vb, "linear2", with_bias=False),
    }
    ls1 = vb.tensor_maybe("layer_scale_1.scale")
    ls2 = vb.tensor_maybe("layer_scale_2.scale")
    if ls1 is not None:
        p["layer_scale_1"] = ls1
    if ls2 is not None:
        p["layer_scale_2"] = ls2
    return p


def load_mimi(vb: VarBuilder, cfg: MimiConfig = MimiConfig()) -> Tuple[Params, MimiConfig]:
    mimi = vb.path("mimi")

    layers = []
    i = 0
    while mimi.path("decoder_transformer", "transformer", "layers", str(i)).has("norm1.weight"):
        layers.append(
            _load_transformer_layer(
                mimi.path("decoder_transformer", "transformer", "layers", str(i))
            )
        )
        i += 1
    if not layers:
        raise ValueError("mimi: no decoder transformer layers found")

    d_model = layers[0]["out_proj"]["w"].shape[1]
    if d_model % cfg.num_heads != 0:
        raise ValueError(f"mimi d_model {d_model} not divisible by heads {cfg.num_heads}")
    head_dim = d_model // cfg.num_heads
    cos, sin = build_rope_tables(8192, head_dim, cfg.max_period)

    upsample_groups = int(mimi.path("upsample", "convtr", "convtr").shape("weight")[0])
    cfg = replace(cfg, upsample_groups=upsample_groups)

    params = {
        "quantizer_out_proj": _load_conv(mimi.path("quantizer", "output_proj"), with_bias=False),
        "upsample": _load_convtr(
            mimi.path("upsample", "convtr", "convtr"),
            groups=upsample_groups,
            with_bias=False,
        ),
        "transformer": {"layers": layers, "rope_cos": cos, "rope_sin": sin},
        "init_conv": _load_conv(mimi.path("decoder", "model", "0", "conv"), with_bias=True),
        "up1": _load_convtr(mimi.path("decoder", "model", "2", "convtr"), 1, True),
        "res1": _load_resblock(mimi.path("decoder", "model", "3")),
        "up2": _load_convtr(mimi.path("decoder", "model", "5", "convtr"), 1, True),
        "res2": _load_resblock(mimi.path("decoder", "model", "6")),
        "up3": _load_convtr(mimi.path("decoder", "model", "8", "convtr"), 1, True),
        "res3": _load_resblock(mimi.path("decoder", "model", "9")),
        "final_conv": _load_conv(mimi.path("decoder", "model", "11", "conv"), with_bias=True),
    }
    return params, cfg


# -- forward ----------------------------------------------------------------


def quantizer_project(params: Params, latent_bct: jax.Array) -> jax.Array:
    """``[B, 32, T] → [B, 512, T]`` 1×1 conv (`mimi.go:689-695`); used only
    when the fused latent→mimi projector is bypassed."""
    p = params["quantizer_out_proj"]
    w = p["w"][:, :, 0]  # [O, I]
    out = jnp.einsum("oc,bct->bot", w, latent_bct, preferred_element_type=jnp.float32)
    out = out.astype(latent_bct.dtype)
    if "b" in p:
        out = out + p["b"][None, :, None]
    return out


def _convtr(p: Params, x: jax.Array, stride: int, groups: int = 1) -> jax.Array:
    return conv_transpose1d_trim(x, p["w"], p.get("b"), stride, groups)


def _conv(p: Params, x: jax.Array) -> jax.Array:
    return causal_conv1d(x, p["w"], p.get("b"))


def _resblock(p: Params, x: jax.Array) -> jax.Array:
    h = elu(x)
    h = _conv(p["conv1"], h)
    h = elu(h)
    h = _conv(p["conv2"], h)
    return x + h


def _transformer(params: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """Windowed-causal transformer over ``[B, C, T]`` (`mimi.go:241-441`)."""
    tp = params["transformer"]
    x = jnp.swapaxes(x, 1, 2)  # [B, T, C]
    b, t, d = x.shape
    head_dim = tp["rope_cos"].shape[1] * 2
    num_heads = d // head_dim
    pos = jnp.arange(t, dtype=jnp.int32)

    for layer in tp["layers"]:
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        q = apply_rope(q, tp["rope_cos"], tp["rope_sin"], 0)
        k = apply_rope(k, tp["rope_cos"], tp["rope_sin"], 0)
        # Blocked local attention avoids the dense [T,T] score tensor when the
        # sequence is long and block-divisible (window 250 <= block 256).
        if t % 256 == 0 and t > 256 and cfg.context <= 256:
            a = local_windowed_attention(q, k, v, cfg.context, block=256)
        else:
            a = attention_with_positions(q, k, v, pos, pos, cfg.context)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
        a = apply_linear(layer["out_proj"], a)
        if "layer_scale_1" in layer:
            a = a * layer["layer_scale_1"]
        x = x + a

        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = apply_linear(layer["linear1"], n2)
        ff = gelu_erf(ff)
        ff = apply_linear(layer["linear2"], ff)
        if "layer_scale_2" in layer:
            ff = ff * layer["layer_scale_2"]
        x = x + ff
    return jnp.swapaxes(x, 1, 2)


def mimi_decode(params: Params, cfg: MimiConfig, mimi_latent: jax.Array) -> jax.Array:
    """``[B, 512, T] → [B, 1, 1920·T]`` PCM (`mimi.go:719-789`)."""
    s1, s2, s3 = cfg.seanet_strides
    x = _convtr(params["upsample"], mimi_latent, cfg.steps_per_latent, cfg.upsample_groups)
    x = _transformer(params, cfg, x)
    x = _conv(params["init_conv"], x)
    x = elu(x)
    x = _convtr(params["up1"], x, s1)
    x = _resblock(params["res1"], x)
    x = elu(x)
    # (An up2→up3→tail Pallas cascade exists, interpret-validated —
    # `ops/pallas/seanet_tail.fused_up2_up3_tail` — but Mosaic's scoped-VMEM
    # accounting sums every temporary of its 20-phase unroll (42–102 MB vs
    # the 16 MB limit) so it cannot compile on v5e. The up2 win is delivered
    # instead by `ops.conv.conv_transpose1d_phases`: the same phase-space
    # matmul formulation in plain XLA, where the interleave reshape is legal
    # and the MXU does the work.)
    x = _convtr(params["up2"], x, s2)
    x = _resblock(params["res2"], x)
    x = elu(x)
    if cfg.use_pallas and s3 == 4 and x.shape[1] == 128:
        from go_pocket_tts_tpu.ops.pallas import seanet_tail as _st

        wu = params["up3"]["w"]
        if wu.shape[:2] == (64, 128) and _st.supports_up(x.shape[1], x.shape[-1], wu.shape[-1]):
            r, f = params["res3"], params["final_conv"]
            zeros = lambda n: jnp.zeros((n,), x.dtype)  # noqa: E731
            return _st.fused_seanet_up_tail(
                x,
                wu,
                params["up3"].get("b", zeros(64)),
                r["conv1"]["w"],
                r["conv1"].get("b", zeros(r["conv1"]["w"].shape[0])),
                r["conv2"]["w"],
                r["conv2"].get("b", zeros(r["conv2"]["w"].shape[0])),
                f["w"],
                f.get("b", zeros(1)),
                interpret=jax.default_backend() == "cpu",
            )
    x = _convtr(params["up3"], x, s3)
    if cfg.use_pallas and x.shape[1] == 64:
        from go_pocket_tts_tpu.ops.pallas import seanet_tail as _st

        if _st.supports(x.shape[-1]):
            r, f = params["res3"], params["final_conv"]
            zeros = lambda n: jnp.zeros((n,), x.dtype)  # noqa: E731
            return _st.fused_seanet_tail(
                x,
                r["conv1"]["w"],
                r["conv1"].get("b", zeros(r["conv1"]["w"].shape[0])),
                r["conv2"]["w"],
                r["conv2"].get("b", zeros(r["conv2"]["w"].shape[0])),
                f["w"],
                f.get("b", zeros(1)),
                interpret=jax.default_backend() == "cpu",
            )
    x = _resblock(params["res3"], x)
    x = elu(x)
    x = _conv(params["final_conv"], x)
    return x
