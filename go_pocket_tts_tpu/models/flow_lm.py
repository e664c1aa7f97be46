"""FlowLM: text conditioner + transformer + flow-matching head.

Weight prefix ``flow_lm.*`` (reference loader `internal/native/flow_lm.go:51-119`):

- ``conditioner.embed.weight`` ``[n_bins+1, D]`` LUT text conditioner
  (`internal/native/conditioner.go:11-53`)
- ``emb_std``/``emb_mean``/``bos_emb`` ``[32]`` latent stats + BOS vector
- ``input_linear`` (32→1024), ``out_norm`` LN, ``out_eos`` (1024→1)
- ``transformer.*`` (see :mod:`flow_transformer`), ``flow_net.*``
  (see :mod:`flow_net`)

The AR contract (`flow_lm.go:238-299`):
NaN-sentinel frames are replaced by ``bos_emb``, projected to d_model, pushed
through the cached transformer, normalized; the last hidden state yields the
EOS logit (``logit > threshold`` ⇒ EOS on the *raw* logit) and conditions the
LSD Euler decode from ``N(0, sqrt(temperature))`` noise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models import flow_net as fnet
from go_pocket_tts_tpu.models.flow_transformer import (
    TransformerConfig,
    load_flow_transformer,
    transformer_forward_cached,
    transformer_forward_stateless,
)
from go_pocket_tts_tpu.models.params import (
    VarBuilder,
    apply_linear,
    layer_norm_params,
    linear_params,
)
from go_pocket_tts_tpu.ops import layer_norm

__all__ = ["FlowLMConfig", "load_flow_lm", "text_embeddings", "ar_core", "flow_main"]

Params = Dict


@dataclass(frozen=True)
class FlowLMConfig:
    d_model: int = 1024
    latent_dim: int = 32
    transformer: TransformerConfig = None  # set by the loader


def load_flow_lm(vb: VarBuilder, num_heads: int = 16) -> Tuple[Params, FlowLMConfig]:
    flow = vb.path("flow_lm")

    embed = flow.tensor("conditioner.embed.weight")
    if embed.ndim != 2:
        raise ValueError(f"conditioner embed must be rank-2, got {embed.shape}")

    transformer, tcfg = load_flow_transformer(flow, num_heads=num_heads)
    flow_net = fnet.load_flow_net(flow.path("flow_net"))

    latent_dim = int(flow.shape("bos_emb")[0])
    params = {
        "conditioner_embed": embed,
        "transformer": transformer,
        "flow_net": flow_net,
        "emb_std": flow.tensor("emb_std", latent_dim),
        "emb_mean": flow.tensor("emb_mean", latent_dim),
        "bos_emb": flow.tensor("bos_emb", latent_dim),
        "input_linear": linear_params(flow, "input_linear", with_bias=True),
        "out_norm": layer_norm_params(flow, "out_norm"),
        "out_eos": linear_params(flow, "out_eos", with_bias=True),
    }
    cfg = FlowLMConfig(d_model=tcfg.d_model, latent_dim=latent_dim, transformer=tcfg)
    return params, cfg


def text_embeddings(params: Params, token_ids: jax.Array) -> jax.Array:
    """Token IDs ``[B, T]`` → embeddings ``[B, T, D]`` (LUT gather).

    Out-of-range IDs are the caller's error (checked host-side like
    `conditioner.go:40-45`); under jit the gather clamps.
    """
    return jnp.take(params["conditioner_embed"], token_ids, axis=0)


def _replace_nan_with_bos(frame: jax.Array, bos: jax.Array) -> jax.Array:
    """NaN sentinel → BOS vector (`tensor_util.go:242-271`)."""
    return jnp.where(jnp.isnan(frame), bos.astype(frame.dtype), frame)


def _hidden_and_eos(params: Params, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """out_norm → last token → eos logit. ``y``: [B,T,D] → ([B,D], [B])."""
    n = layer_norm(y, params["out_norm"]["weight"], params["out_norm"]["bias"])
    last = n[:, -1, :]
    eos = apply_linear(params["out_eos"], last)[:, 0]
    return last, eos


def ar_core(
    params: Params,
    cfg: FlowLMConfig,
    cache: Params,
    frame: jax.Array,
    noise: jax.Array,
    decode_steps: int = 1,
    time_cond: Optional[jax.Array] = None,
    fused_ada: Optional[Params] = None,
) -> Tuple[Params, jax.Array, jax.Array]:
    """One stateful AR step (`flow_lm.go:238-299`).

    ``frame``: [B,1,L] previous latent (NaN = BOS); ``noise``: [B,L] already
    scaled by sqrt(temperature). ``time_cond`` optionally carries the
    loop-invariant timestep embeddings (see `flow_net.precompute_time_cond`).
    Returns (new_cache, next_frame [B,1,L], eos_logit [B]). EOS thresholding
    is the caller's (the runtime keeps the countdown;
    `runtime_native_safetensors.go:178-191`).
    """
    seq = _replace_nan_with_bos(frame, params["bos_emb"])
    x = apply_linear(params["input_linear"], seq)
    y, cache = transformer_forward_cached(params["transformer"], cfg.transformer, cache, x)
    last, eos = _hidden_and_eos(params, y)
    decoded = fnet.lsd_decode(
        params["flow_net"], last, noise, decode_steps, time_cond, fused_ada
    )
    return cache, decoded[:, None, :], eos


def prompt(
    params: Params,
    cfg: FlowLMConfig,
    cache: Params,
    text_emb: jax.Array,
    valid_len: Optional[jax.Array] = None,
) -> Params:
    """Prefill the transformer cache with conditioning embeddings
    (`flow_lm.go:155-187`). ``text_emb``: [B, T, D], zero-padded to T with
    ``valid_len`` real tokens."""
    _, cache = transformer_forward_cached(
        params["transformer"], cfg.transformer, cache, text_emb, valid_len
    )
    return cache


def flow_main(
    params: Params, cfg: FlowLMConfig, sequence: jax.Array, text_emb: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Stateless full-resequence forward (`flow_lm.go:192-233`): concat text
    conditioning with projected latent frames, run the causal transformer,
    return (last_hidden [B,D], eos_logit [B])."""
    seq = _replace_nan_with_bos(sequence, params["bos_emb"])
    x = apply_linear(params["input_linear"], seq)
    x = jnp.concatenate([text_emb, x], axis=1)
    y = transformer_forward_stateless(params["transformer"], cfg.transformer, x)
    return _hidden_and_eos(params, y)


def sample_noise(key: jax.Array, batch: int, latent_dim: int, temperature: float) -> jax.Array:
    """``N(0, sqrt(temperature))`` (`flow_lm.go:386-408`; clamped at 0)."""
    sigma = jnp.sqrt(jnp.maximum(jnp.asarray(temperature, jnp.float32), 0.0))
    return jax.random.normal(key, (batch, latent_dim), dtype=jnp.float32) * sigma
