"""flowNet: the DiT-style adaLN flow-matching head and LSD Euler decode.

Architecture (weights under ``flow_lm.flow_net.*``; behaviour parity with
`internal/native/flow_net.go`):

- two timestep embedders (for times s and t): ``emb = [cos(t·freqs),
  sin(t·freqs)]`` → Linear → SiLU → Linear → RMSNorm(alpha, Bessel variance)
  (`flow_net.go:42-83`)
- conditioning ``y = 0.5·(emb_s + emb_t) + cond_embed(c)``
  (`flow_net.go:314-343`)
- N residual blocks: adaLN(SiLU(y)) → shift/scale/gate; LN(eps=1e-6) →
  modulate → Linear → SiLU → Linear → ·gate → +residual (`flow_net.go:116-172`)
- final layer: adaLN shift/scale → LN(no affine, eps=1e-6) → modulate →
  Linear (`flow_net.go:205-239`)
- LSD decode: Euler integration ``x += f(c, i/n, (i+1)/n, x) / n``
  (`flow_lm.go:311-353`)

All matmuls here are tiny (≤ 1024×1536); under jit the whole per-step chain
fuses into a handful of MXU calls, so no Pallas kernel is needed — measured
as part of the AR-step program.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models.params import VarBuilder, apply_linear, layer_norm_params, linear_params
from go_pocket_tts_tpu.ops import layer_norm, modulate, rms_norm_bessel, silu

__all__ = ["load_flow_net", "flow_direction", "lsd_decode"]

Params = Dict


def _load_timestep_embedder(vb: VarBuilder) -> Params:
    return {
        "freqs": vb.tensor("freqs"),
        "mlp0": linear_params(vb, "mlp.0", with_bias=True),
        "mlp2": linear_params(vb, "mlp.2", with_bias=True),
        "alpha": vb.tensor("mlp.3.alpha"),
    }


def load_flow_net(vb: VarBuilder) -> Params:
    """Load flowNet params from ``flow_lm.flow_net`` (res-block count probed
    by key presence, `flow_net.go:271-288`)."""
    res_blocks = []
    i = 0
    while vb.path("res_blocks", str(i)).has("in_ln.weight"):
        rb = vb.path("res_blocks", str(i))
        res_blocks.append(
            {
                "in_ln": layer_norm_params(rb, "in_ln"),
                "mlp0": linear_params(rb, "mlp.0", with_bias=True),
                "mlp2": linear_params(rb, "mlp.2", with_bias=True),
                "adaln": linear_params(rb, "adaLN_modulation.1", with_bias=True),
            }
        )
        i += 1
    if not res_blocks:
        raise ValueError("flow_net: no res blocks found")
    return {
        "time_embed_0": _load_timestep_embedder(vb.path("time_embed", "0")),
        "time_embed_1": _load_timestep_embedder(vb.path("time_embed", "1")),
        "cond_embed": linear_params(vb, "cond_embed", with_bias=True),
        "input_proj": linear_params(vb, "input_proj", with_bias=True),
        "res_blocks": res_blocks,
        "final_linear": linear_params(vb.path("final_layer"), "linear", with_bias=True),
        "final_adaln": linear_params(
            vb.path("final_layer"), "adaLN_modulation.1", with_bias=True
        ),
    }


def _timestep_embed(params: Params, t: jax.Array) -> jax.Array:
    """``t``: [B, 1] → [B, flow_dim]."""
    args = t * params["freqs"][None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    x = apply_linear(params["mlp0"], emb)
    x = silu(x)
    x = apply_linear(params["mlp2"], x)
    return rms_norm_bessel(x, params["alpha"], eps=1e-5)


def _res_block(params: Params, x: jax.Array, y: jax.Array) -> jax.Array:
    ada = apply_linear(params["adaln"], silu(y))
    shift, scale, gate = jnp.split(ada, 3, axis=-1)
    h = layer_norm(x, params["in_ln"]["weight"], params["in_ln"]["bias"], eps=1e-6)
    h = modulate(h, shift, scale)
    h = apply_linear(params["mlp0"], h)
    h = silu(h)
    h = apply_linear(params["mlp2"], h)
    return x + h * gate


def _flow_core(params: Params, y: jax.Array, x: jax.Array) -> jax.Array:
    """Res-block chain + final layer given the combined conditioning ``y``."""
    cur = apply_linear(params["input_proj"], x)
    for rb in params["res_blocks"]:
        cur = _res_block(rb, cur, y)
    ada = apply_linear(params["final_adaln"], silu(y))
    shift, scale = jnp.split(ada, 2, axis=-1)
    out = layer_norm(cur, eps=1e-6)
    out = modulate(out, shift, scale)
    return apply_linear(params["final_linear"], out)


def flow_direction(
    params: Params, c: jax.Array, s: jax.Array, t: jax.Array, x: jax.Array
) -> jax.Array:
    """Flow field for latent ``x`` [B, L] under condition ``c`` [B, D].

    ``s``/``t`` are [B, 1] integration times.
    """
    t0 = _timestep_embed(params["time_embed_0"], s)
    t1 = _timestep_embed(params["time_embed_1"], t)
    y = 0.5 * (t0 + t1) + apply_linear(params["cond_embed"], c)
    return _flow_core(params, y, x)


def precompute_fused_adaln(params: Params) -> Params:
    """Concatenate every res-block's adaLN projection plus the final layer's
    into one ``[flow_dim, (3·n_blocks+2)·flow_dim]`` weight.

    All of them consume the same ``silu(y)``, so per step the flowNet's
    3·depth+2 modulation matmuls collapse into ONE MXU call (the weight
    concat is hoisted out of the AR loop alongside the timestep embeddings).
    """
    sources = [rb["adaln"] for rb in params["res_blocks"]] + [params["final_adaln"]]
    # A quantized concat requires every source in the same form (dtype and
    # scale rank) — they share an input dim so quantize_linear's fallback
    # rules keep them uniform, but guard anyway and dequantize otherwise.
    quantized = all("scale" in src for src in sources) and (
        len({(src["w"].dtype, src["scale"].ndim) for src in sources}) == 1
    )
    ws, bs, scales = [], [], []
    for src in sources:
        ws.append(src["w"])
        if "b" in src:
            bs.append(src["b"])
        else:
            bs.append(jnp.zeros((src["w"].shape[1],), jnp.float32))
        if quantized:
            scales.append(src["scale"])
        elif "scale" in src:
            # Mixed quantization: dequantize this source so the concat is
            # uniform float (handles int8 and packed-int4 forms).
            from go_pocket_tts_tpu.models.quantize import dequantize_weight

            ws[-1] = dequantize_weight(src)
    fused = {"w": jnp.concatenate(ws, axis=1), "b": jnp.concatenate(bs)}
    if quantized:
        # Scales concatenate along the fused out dim — the LAST axis both
        # per-channel ([out]) and group-wise ([G, out]); every source shares
        # the same input dim, so group counts agree.
        fused["scale"] = jnp.concatenate(scales, axis=-1)
    return fused


def _flow_core_fused(
    params: Params, fused_ada: Params, y: jax.Array, x: jax.Array
) -> jax.Array:
    """Res-block chain + final layer with the batched adaLN projection."""
    n_blocks = len(params["res_blocks"])
    fd = params["input_proj"]["w"].shape[1]
    ada_all = apply_linear(fused_ada, silu(y))  # [B, (3n+2)·fd]

    cur = apply_linear(params["input_proj"], x)
    for i, rb in enumerate(params["res_blocks"]):
        base = i * 3 * fd
        shift = ada_all[:, base : base + fd]
        scale = ada_all[:, base + fd : base + 2 * fd]
        gate = ada_all[:, base + 2 * fd : base + 3 * fd]
        h = layer_norm(cur, rb["in_ln"]["weight"], rb["in_ln"]["bias"], eps=1e-6)
        h = modulate(h, shift, scale)
        h = apply_linear(rb["mlp0"], h)
        h = silu(h)
        h = apply_linear(rb["mlp2"], h)
        cur = cur + h * gate

    base = n_blocks * 3 * fd
    shift = ada_all[:, base : base + fd]
    scale = ada_all[:, base + fd : base + 2 * fd]
    out = layer_norm(cur, eps=1e-6)
    out = modulate(out, shift, scale)
    return apply_linear(params["final_linear"], out)


def precompute_time_cond(params: Params, steps: int) -> jax.Array:
    """``[steps, flow_dim]`` timestep-embedder outputs for the fixed Euler
    grid ``s=i/n, t=(i+1)/n``.

    With LSD steps fixed per request (default 1: s=0, t=1 —
    `internal/config/config.go:101`) these are **loop-invariant** across the
    AR while-loop; the runtime hoists them so each step skips two
    sin/cos-MLP-RMSNorm chains (`flow_net.go:42-83`)."""
    rows = []
    for i in range(steps):
        s = jnp.full((1, 1), i / steps, jnp.float32)
        t = jnp.full((1, 1), (i + 1) / steps, jnp.float32)
        t0 = _timestep_embed(params["time_embed_0"], s)
        t1 = _timestep_embed(params["time_embed_1"], t)
        rows.append((0.5 * (t0 + t1))[0])
    return jnp.stack(rows)


def lsd_decode(
    params: Params,
    cond: jax.Array,
    x0: jax.Array,
    steps: int,
    time_cond: Optional[jax.Array] = None,
    fused_ada: Optional[Params] = None,
) -> jax.Array:
    """Euler-integrate the flow from noise ``x0`` [B, L]; ``steps`` is static
    (default 1, `internal/config/config.go:101`). ``time_cond`` (from
    :func:`precompute_time_cond`) skips the per-step timestep embedders;
    ``fused_ada`` (from :func:`precompute_fused_adaln`) batches the adaLN
    projections."""
    if steps <= 0:
        raise ValueError("lsd decode steps must be > 0")
    inv = 1.0 / steps
    b = x0.shape[0]
    cond_y = apply_linear(params["cond_embed"], cond)

    def core(y, x):
        if fused_ada is not None:
            return _flow_core_fused(params, fused_ada, y, x)
        return _flow_core(params, y, x)

    def direction(i: int, x):
        if time_cond is not None:
            y = time_cond[i].astype(cond_y.dtype) + cond_y
            return core(y, x)
        s = jnp.full((b, 1), i * inv, dtype=x.dtype)
        t = jnp.full((b, 1), (i + 1) * inv, dtype=x.dtype)
        t0 = _timestep_embed(params["time_embed_0"], s)
        t1 = _timestep_embed(params["time_embed_1"], t)
        return core(0.5 * (t0 + t1) + cond_y, x)

    x = x0
    for i in range(steps):  # steps is small and static; unrolled
        x = x + direction(i, x) * inv
    return x
