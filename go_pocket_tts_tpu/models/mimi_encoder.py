"""Mimi encoder: PCM → latent, for voice cloning.

The reference does NOT implement this natively — its `EncodeToLatent` returns
`ErrMimiEncoderNotImplemented` (`internal/native/mimi.go:14,791-794`) and
export-voice round-trips through an ONNX `mimi_encoder` graph
(`internal/onnx/voice_encode.go:23-117`). Here the encoder is built natively
in JAX, mirroring the decoder (`models/mimi.py`) in reverse:

    PCM [B,1,N] ──SEANet encoder (conv ↓4 ↓5 ↓6, ELU, res blocks)──> [B,C,N/120]
      ──encoder transformer (windowed 250)──> [B,C,200 Hz]
      ──downsample conv (stride 16, depthwise)──> [B,C,12.5 Hz]
      ──quantizer input_proj (1×1, C→latent)──> [B,L,T]

Weight naming mirrors the upstream Mimi module tree under ``mimi.encoder.*``,
``mimi.encoder_transformer.*``, ``mimi.downsample.*`` and
``mimi.quantizer.input_proj``; checkpoints with different key spellings can
be adapted with the store's ``key_mapper``. The speaker projection weight
lives at ``condition_provider.conditioners.speaker_wavs.output_proj.weight``
(`internal/onnx/voice_encode.go:173-181`).

All convs are causal (left-padded), matching the streaming arithmetic of the
decoder, so encoding is exact under right-padding too.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models.mimi import (
    MimiConfig,
    _load_conv,
    _load_resblock,
    _load_transformer_layer,
    _conv,
    _resblock,
)
from go_pocket_tts_tpu.models.params import VarBuilder
from go_pocket_tts_tpu.ops import (
    apply_rope,
    attention_with_positions,
    build_rope_tables,
    causal_conv1d,
    elu,
    gelu_erf,
    layer_norm,
)
from go_pocket_tts_tpu.models.params import apply_linear

__all__ = ["load_mimi_encoder", "mimi_encode", "load_speaker_projection"]

Params = Dict

# Encoder layer indices mirror the decoder's Sequential numbering
# (conv at 0; per downsample stage: res block then strided conv; final conv).
_ENC_RES_IDX = (1, 4, 7)
_ENC_DOWN_IDX = (3, 6, 9)
_ENC_FINAL_IDX = 11


def load_mimi_encoder(vb: VarBuilder, cfg: MimiConfig) -> Optional[Params]:
    """Load encoder weights; returns None when the checkpoint has no encoder
    (the ungated no-voice-cloning checkpoint)."""
    mimi = vb.path("mimi")
    if not mimi.path("encoder", "model", "0", "conv").has("weight"):
        return None

    layers = []
    i = 0
    while mimi.path("encoder_transformer", "transformer", "layers", str(i)).has(
        "norm1.weight"
    ):
        layers.append(
            _load_transformer_layer(
                mimi.path("encoder_transformer", "transformer", "layers", str(i))
            )
        )
        i += 1

    head_dim = None
    rope = {}
    if layers:
        d_model = layers[0]["out_proj"]["w"].shape[1]
        head_dim = d_model // cfg.num_heads
        cos, sin = build_rope_tables(8192, head_dim, cfg.max_period)
        rope = {"rope_cos": cos, "rope_sin": sin}

    params: Params = {
        "init_conv": _load_conv(mimi.path("encoder", "model", "0", "conv"), True),
        "final_conv": _load_conv(
            mimi.path("encoder", "model", str(_ENC_FINAL_IDX), "conv"), True
        ),
        "transformer": {"layers": layers, **rope},
        "downsample": _load_conv(mimi.path("downsample", "conv", "conv"), False),
    }
    if mimi.path("quantizer", "input_proj").has("weight"):
        params["quantizer_in_proj"] = _load_conv(mimi.path("quantizer", "input_proj"), False)
    for slot, (res_idx, down_idx) in enumerate(zip(_ENC_RES_IDX, _ENC_DOWN_IDX)):
        params[f"res{slot + 1}"] = _load_resblock(
            mimi.path("encoder", "model", str(res_idx))
        )
        params[f"down{slot + 1}"] = _load_conv(
            mimi.path("encoder", "model", str(down_idx), "conv"), True
        )
    return params


def _enc_transformer(params: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    tp = params["transformer"]
    if not tp["layers"]:
        return x
    x = jnp.swapaxes(x, 1, 2)
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


def mimi_encode(
    params: Params, cfg: MimiConfig, pcm: jax.Array, to_latent: bool = False
) -> jax.Array:
    """``[B, 1, N] PCM → [B, C, T]`` embedding at 12.5 Hz.

    The speaker-conditioning path consumes this C-dim (512) embedding
    directly (the ONNX ``mimi_encoder`` graph output,
    `voice_encode.go:42-66`); ``to_latent=True`` additionally applies the
    quantizer ``input_proj`` to produce the 32-dim flow latent.
    """
    strides = tuple(reversed(cfg.seanet_strides))  # encoder downsamples 4,5,6
    x = _conv(params["init_conv"], pcm)
    for slot, stride in enumerate(strides):
        x = _resblock(params[f"res{slot + 1}"], x)
        x = elu(x)
        p = params[f"down{slot + 1}"]
        x = causal_conv1d(x, p["w"], p.get("b"), stride=stride)
    x = elu(x)
    x = _conv(params["final_conv"], x)
    x = _enc_transformer(params, cfg, x)
    # Depthwise strided downsample 200 Hz → 12.5 Hz.
    p = params["downsample"]
    groups = p["w"].shape[0] if p["w"].shape[1] == 1 else 1
    x = causal_conv1d(x, p["w"], p.get("b"), stride=cfg.steps_per_latent, groups=groups)
    if not to_latent:
        return x
    # 1×1 projection C → flow latent dim.
    q = params["quantizer_in_proj"]
    w = q["w"][:, :, 0]
    out = jnp.einsum("oc,bct->bot", w, x, preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in q:
        out = out + q["b"][None, :, None]
    return out


def load_speaker_projection(vb: VarBuilder) -> Optional[jax.Array]:
    """Speaker conditioning projection ``[d_model, C]``
    (`internal/onnx/voice_encode.go:160-202`)."""
    name = "condition_provider.conditioners.speaker_wavs.output_proj.weight"
    if not vb.has(name):
        return None
    return vb.tensor(name)
