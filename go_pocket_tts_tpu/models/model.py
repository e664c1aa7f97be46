"""PocketTTS model facade: loads FlowLM + Mimi from one safetensors store.

Parity with `internal/native/model.go`:

- one store, weight prefixes ``flow_lm.*`` and ``mimi.*`` (`model.go:42-65`)
- **fused latent→mimi projector**: the per-frame denormalization
  ``latent·emb_std + emb_mean`` is folded into the 1×1 quantizer projection at
  load time (``w' = w·std``, ``b' = b + w·mean``) so the hot path is a single
  matmul (`model.go:169-250`); a non-fused fallback path is kept for
  checkpoints whose projection isn't a plain 1×1 conv (`model.go:349-407`)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import mimi as mimi_mod
from go_pocket_tts_tpu.models.params import VarBuilder
from go_pocket_tts_tpu.utils.safetensors import Store, open_store

__all__ = ["ModelConfig", "PocketTTSModel", "load_model", "load_model_from_store"]

Params = Dict


@dataclass(frozen=True)
class ModelConfig:
    flow_lm: flm.FlowLMConfig
    mimi: mimi_mod.MimiConfig


def auto_pallas_mimi(model: "PocketTTSModel") -> "PocketTTSModel":
    """Enable the fused SEANet-tail kernel when it pays.

    Default policy: ON for TPU backends (hardware-measured ~45% off the
    Mimi decode device time, 1-ulp bf16 parity), OFF on CPU (interpret mode
    would be slower than XLA). Env override: ``POCKETTTS_PALLAS_MIMI=1``
    forces on (interpret on CPU), ``=0`` forces off. The kernel itself
    still falls back per-shape via ``seanet_tail.supports``.
    """
    import dataclasses
    import os

    import jax

    env = os.environ.get("POCKETTTS_PALLAS_MIMI", "")
    if env == "0":
        enable = False
    elif env == "1":
        enable = True
    else:
        enable = jax.default_backend() not in ("cpu",)
    if not enable or model.config.mimi.use_pallas:
        return model
    mimi_cfg = dataclasses.replace(model.config.mimi, use_pallas=True)
    return PocketTTSModel(
        model.params, ModelConfig(flow_lm=model.config.flow_lm, mimi=mimi_cfg)
    )


def _fuse_latent_to_mimi(flow_params: Params, mimi_params: Params) -> Optional[Params]:
    """Fold latent denorm stats into the quantizer projection (`model.go:176-250`)."""
    proj = mimi_params.get("quantizer_out_proj")
    if proj is None:
        return None
    w = proj["w"]  # [O, I, K]
    if w.ndim != 3 or w.shape[2] != 1:
        return None
    std = flow_params["emb_std"]
    mean = flow_params["emb_mean"]
    if w.shape[1] != std.shape[0]:
        return None
    w2d = w[:, :, 0]  # [O, I]
    fused_w = w2d * std[None, :]
    fused_b = w2d @ mean
    if "b" in proj:
        fused_b = fused_b + proj["b"]
    # Stored transposed [I, O] so projection is latent[B,T,I] @ w.
    return {"w": fused_w.T, "b": fused_b}


class PocketTTSModel:
    """Loaded parameters + static configs for the full synthesis pipeline."""

    def __init__(self, params: Params, config: ModelConfig) -> None:
        self.params = params
        self.config = config

    # -- conversions -------------------------------------------------------

    def astype(self, dtype) -> "PocketTTSModel":
        """Cast all floating parameters (bf16 fast path); RoPE tables,
        quantization scales, and the fused projector stats stay f32."""
        keep_f32 = {"rope_cos", "rope_sin", "scale"}

        def cast(path, leaf):
            name = path[-1].key if path else ""
            if name in keep_f32:
                return leaf
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                return leaf.astype(dtype)
            return leaf

        new_params = jax.tree_util.tree_map_with_path(cast, self.params)
        return PocketTTSModel(new_params, self.config)

    # -- functional pieces (see runtime.generate for the jitted pipeline) --

    def text_embeddings(self, token_ids: jax.Array) -> jax.Array:
        return flm.text_embeddings(self.params["flow_lm"], token_ids)

    def latent_to_mimi(self, latent_btl: jax.Array) -> jax.Array:
        """``[B, T, 32] → [B, 512, T]`` fused denorm + projection
        (`model.go:141-167`)."""
        fused = self.params.get("latent_to_mimi")
        if fused is not None:
            out = jnp.matmul(
                latent_btl,
                fused["w"].astype(latent_btl.dtype),
                preferred_element_type=jnp.float32,
            ).astype(latent_btl.dtype)
            out = out + fused["b"].astype(latent_btl.dtype)
            return jnp.swapaxes(out, 1, 2)
        # Fallback: explicit denorm then 1×1 projection (`model.go:349-407`).
        flow = self.params["flow_lm"]
        denorm = latent_btl * flow["emb_std"] + flow["emb_mean"]
        return mimi_mod.quantizer_project(
            self.params["mimi"], jnp.swapaxes(denorm, 1, 2)
        )

    def mimi_decode(self, mimi_latent: jax.Array) -> jax.Array:
        return mimi_mod.mimi_decode(self.params["mimi"], self.config.mimi, mimi_latent)


def load_model_from_store(
    store: Store,
    num_heads: int = 16,
    mimi_cfg: mimi_mod.MimiConfig = mimi_mod.MimiConfig(),
) -> PocketTTSModel:
    vb = VarBuilder(store)
    flow_params, flow_cfg = flm.load_flow_lm(vb, num_heads=num_heads)
    mimi_params, mimi_cfg = mimi_mod.load_mimi(vb, mimi_cfg)
    params: Params = {"flow_lm": flow_params, "mimi": mimi_params}
    fused = _fuse_latent_to_mimi(flow_params, mimi_params)
    if fused is not None:
        params["latent_to_mimi"] = fused
    return PocketTTSModel(params, ModelConfig(flow_lm=flow_cfg, mimi=mimi_cfg))


def load_model(path: str, num_heads: int = 16) -> PocketTTSModel:
    return load_model_from_store(open_store(path), num_heads=num_heads)
