"""FlowLM transformer: pre-norm layers with fused-QKV attention and a
static-capacity KV cache.

Reference behaviour (`internal/native/flow_transformer.go`):

- per layer: LN → fused in_proj (QKV) → split → ``[B,H,T,Dh]`` → RoPE(q,k at
  cache offset) → append KV → position-masked attention → out_proj → residual;
  LN → linear1 → GELU(erf) → linear2 → residual (`flow_transformer.go:326-389`)
- stateless full-sequence forward used by the legacy resequencing path
  (`flow_transformer.go:733-747`)
- voice model-state hydration from ``[2,B,T,H,Dh]`` caches + offset scalars
  (`flow_transformer.go:451-631`)
- RoPE tables: max_seq 8192, max_period 10000 (`flow_transformer.go:505-509`)
- head-count detection heuristic {16,8,4,2,1} (`flow_transformer.go:834-864`)

TPU-first design departures from the Go implementation:

- the KV cache is a **fixed-capacity** pytree ``[L,B,H,C,Dh]`` with a traced
  ``offset`` scalar, instead of a dynamically grown buffer; unwritten slots
  are excluded by the absolute-position mask, which is exactly the semantics
  the Go code encodes via posK = −1 padding (`flow_transformer.go:404-420`)
- all layers share one offset (the reference tracks per-layer offsets that
  are always advanced in lock-step; hydration validates they agree)
- cache writes are ``dynamic_update_slice`` at the offset, so prefill + the
  whole AR loop stay inside compiled programs
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models.params import (
    VarBuilder,
    apply_linear,
    layer_norm_params,
    linear_params,
)
from go_pocket_tts_tpu.ops import (
    apply_rope,
    attention_with_positions,
    attention_with_positions_int8kv,
    build_rope_tables,
    gelu_erf,
    layer_norm,
)
from go_pocket_tts_tpu.ops.rope import apply_rope_rows, rope_rows

__all__ = [
    "TransformerConfig",
    "detect_num_heads",
    "load_flow_transformer",
    "init_kv_cache",
    "kv_cache_from_voice_state",
    "transformer_forward_cached",
    "transformer_forward_stateless",
]

Params = Dict


@dataclass(frozen=True)
class TransformerConfig:
    num_layers: int
    num_heads: int
    head_dim: int
    d_model: int
    max_period: float = 10000.0
    max_seq: int = 8192
    context: Optional[int] = None  # sliding attention window (Mimi: 250)
    # Use the fused Pallas decode-attention kernel for Tq=1 steps
    # (ops/pallas/decode_attention.py); interpret-mode on CPU backends.
    use_pallas: bool = False


def detect_num_heads(d_model: int, fallback: int = 16) -> int:
    """Head-count heuristic from known PocketTTS configs
    (`flow_transformer.go:834-864`)."""
    for n in (16, 8, 4, 2, 1):
        if d_model % n == 0:
            return n
    return fallback


def _load_layer(vb: VarBuilder) -> Params:
    return {
        "norm1": layer_norm_params(vb, "norm1"),
        "norm2": layer_norm_params(vb, "norm2"),
        "in_proj": linear_params(vb, "self_attn.in_proj", with_bias=False),
        "out_proj": linear_params(vb, "self_attn.out_proj", with_bias=False),
        "linear1": linear_params(vb, "linear1", with_bias=False),
        "linear2": linear_params(vb, "linear2", with_bias=False),
    }


def load_flow_transformer(
    vb: VarBuilder, num_heads: int = 0, max_period: float = 10000.0
) -> Tuple[Params, TransformerConfig]:
    """Load layers under ``<vb>.transformer.layers.N`` (count probed by key
    presence, `flow_transformer.go:482-511`)."""
    layers: List[Params] = []
    i = 0
    while vb.path("transformer", "layers", str(i)).has("norm1.weight"):
        layers.append(_load_layer(vb.path("transformer", "layers", str(i))))
        i += 1
    if not layers:
        raise ValueError("flow transformer: no layers found")

    d_model = layers[0]["out_proj"]["w"].shape[1]
    if num_heads <= 0:
        num_heads = detect_num_heads(d_model)
    if d_model % num_heads != 0:
        raise ValueError(f"d_model {d_model} not divisible by num_heads {num_heads}")

    cfg = TransformerConfig(
        num_layers=len(layers),
        num_heads=num_heads,
        head_dim=d_model // num_heads,
        d_model=d_model,
        max_period=max_period,
    )
    cos, sin = build_rope_tables(cfg.max_seq, cfg.head_dim, cfg.max_period)
    params = {"layers": layers, "rope_cos": cos, "rope_sin": sin}
    return params, cfg


# -- KV cache ---------------------------------------------------------------


def init_kv_cache(
    cfg: TransformerConfig, batch: int, capacity: int, dtype=jnp.float32
) -> Params:
    """Zero cache ``{k,v: [L,B,H,C,Dh], offset: int32}``."""
    shape = (cfg.num_layers, batch, cfg.num_heads, capacity, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
        "offset": jnp.int32(0),
    }


def kv_cache_from_voice_state(
    cfg: TransformerConfig,
    modules: Dict[str, Dict[str, np.ndarray]],
    capacity: int,
    dtype=jnp.float32,
) -> Params:
    """Hydrate a cache from upstream voice model state.

    Upstream stores per-module ``cache [2,B,T,H,Dh]`` + ``offset`` under
    ``transformer.layers.N.self_attn`` (`flow_transformer.go:451-631`). The
    [2] axis is K/V; the layout is time-major ``[T,H,Dh]`` vs our head-major
    ``[H,T,Dh]``.
    """
    ks, vs = [], []
    offsets = []
    for i in range(cfg.num_layers):
        name = f"transformer.layers.{i}.self_attn"
        module = modules.get(name)
        if module is None:
            raise ValueError(f"voice model state missing module {name!r}")
        cache = np.asarray(module.get("cache"))
        off_t = module.get("offset")
        if cache is None or off_t is None:
            raise ValueError(f"voice model state module {name!r} missing cache/offset")
        if cache.ndim != 5 or cache.shape[0] != 2:
            raise ValueError(
                f"voice model state module {name!r} cache shape {cache.shape}, want [2,B,T,H,D]"
            )
        _, b, t, h, dh = cache.shape
        if h != cfg.num_heads or dh != cfg.head_dim:
            raise ValueError(
                f"voice model state module {name!r} heads/dim ({h},{dh}) != ({cfg.num_heads},{cfg.head_dim})"
            )
        off = float(np.asarray(off_t).reshape(-1)[0])
        if off != int(off) or off < 0:
            raise ValueError(f"voice model state module {name!r} offset {off} invalid")
        off = int(off)
        if off > t:
            raise ValueError(
                f"voice model state module {name!r} offset {off} exceeds cache length {t}"
            )
        if t > capacity:
            raise ValueError(
                f"voice cache length {t} exceeds KV capacity {capacity}; "
                f"raise the prompt bucket"
            )
        offsets.append(off)
        # [B,T,H,Dh] → [B,H,T,Dh], zero-pad time to capacity.
        k = np.moveaxis(cache[0], 2, 1)
        v = np.moveaxis(cache[1], 2, 1)
        pad = ((0, 0), (0, 0), (0, capacity - t), (0, 0))
        ks.append(np.pad(k, pad))
        vs.append(np.pad(v, pad))
    if len(set(offsets)) != 1:
        raise ValueError(f"voice model state has inconsistent per-layer offsets {offsets}")
    return {
        "k": jnp.asarray(np.stack(ks), dtype=dtype),
        "v": jnp.asarray(np.stack(vs), dtype=dtype),
        "offset": jnp.int32(offsets[0]),
    }


# -- forward ----------------------------------------------------------------


def _split_heads(x: jax.Array, num_heads: int, head_dim: int) -> jax.Array:
    b, t, _ = x.shape
    return x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def transformer_forward_cached(
    params: Params,
    cfg: TransformerConfig,
    cache: Params,
    x: jax.Array,
    valid_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Params]:
    """Prefill (T>1) or AR step (T=1) through all layers with cache update.

    ``x``: [B, T, D]; T is static. ``valid_len`` (traced, ≤ T) marks how many
    of the T tokens are real; the offset advances by ``valid_len`` and padded
    tokens are never visible to later queries (their cache slots sit beyond
    the new offset and are overwritten by subsequent writes).

    The stacked ``[L,B,H,C,Dh]`` cache buffers are updated with per-layer
    dynamic-update-slices (only the written token moves through HBM). Inside
    a donated jit / while_loop carry XLA aliases the buffer, so the AR step
    writes O(L·B·H·Dh) bytes instead of copying the whole cache.
    """
    t = x.shape[1]
    offset = cache["offset"]
    valid = jnp.asarray(valid_len if valid_len is not None else t, dtype=jnp.int32)
    capacity = cache["k"].shape[3]

    pos_q = offset + jnp.arange(t, dtype=jnp.int32)
    # Causal masking over absolute positions handles unwritten/padded slots:
    # a slot's position equals its index, and slots ahead of the current query
    # are excluded by delta >= 0 (attention.go:473-484 semantics).
    pos_k = jnp.arange(capacity, dtype=jnp.int32)

    # The Pallas kernel implements the causal mask only (the FlowLM has no
    # sliding window); windowed configs fall back to XLA.
    use_pallas = cfg.use_pallas and t == 1 and cfg.context is None
    if use_pallas:
        import jax as _jax

        from go_pocket_tts_tpu.ops.pallas.decode_attention import decode_attention_step

        interpret = _jax.default_backend() == "cpu"

    # Trig rows are identical across layers — gather once per call.
    cos_rows, sin_rows = rope_rows(params["rope_cos"], params["rope_sin"], offset, t)

    k_all, v_all = cache["k"], cache["v"]
    zero = jnp.int32(0)
    for i, layer in enumerate(params["layers"]):
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads, cfg.head_dim)
        k = _split_heads(k, cfg.num_heads, cfg.head_dim)
        v = _split_heads(v, cfg.num_heads, cfg.head_dim)

        if use_pallas:
            # Fused rope + cache append + masked attention (one kernel);
            # layer selection happens in the BlockSpec index map so the
            # stacked cache buffer is updated in place.
            attn, k_all, v_all = decode_attention_step(
                q,
                k,
                k_all,
                v_all,
                v,
                offset,
                params["rope_cos"],
                params["rope_sin"],
                layer=i,
                interpret=interpret,
            )
        else:
            q = apply_rope_rows(q, cos_rows, sin_rows)
            k = apply_rope_rows(k, cos_rows, sin_rows)

            # Append K/V at the offset (sequential slots == absolute positions).
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None], (i, zero, zero, offset, zero)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None], (i, zero, zero, offset, zero)
            )
            attn = attention_with_positions(q, k_all[i], v_all[i], pos_q, pos_k, cfg.context)

        x = x + apply_linear(layer["out_proj"], _merge_heads(attn))

        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = apply_linear(layer["linear1"], n2)
        ff = gelu_erf(ff)
        x = x + apply_linear(layer["linear2"], ff)

    new_cache = {"k": k_all, "v": v_all, "offset": offset + valid}
    return x, new_cache


def transformer_step_batched(
    params: Params,
    cfg: TransformerConfig,
    cache: Params,
    x: jax.Array,
) -> Tuple[jax.Array, Params]:
    """One AR step (Tq=1) with **per-slot** cache offsets — the continuous-
    batching variant of :func:`transformer_forward_cached`.

    ``cache['offset']`` is int32 ``[B]``; each request lane advances
    independently, so a batch can mix requests at different generation depths
    (the \"heterogeneous EOS\" case SURVEY.md §7.3 calls out). Cache writes
    are one in-place scatter per layer; RoPE and the position mask take the
    per-batch offset vectors directly.

    When the cache carries ``k_scale``/``v_scale`` the K/V buffers are INT8
    with per-row scales (``quantize_kv_rows``): new rows quantize before the
    scatter and attention runs the mixed-dtype int8 path — at batch 8+ the
    KV read rivals the shared weight stream, so halving it moves the step
    roofline (PERF.md).
    """
    assert x.shape[1] == 1, "batched step is Tq=1 only"
    offsets = cache["offset"]  # [B]
    capacity = cache["k"].shape[3]
    quantized = "k_scale" in cache

    # Fused batched decode-attention kernel (causal mask only; windowed
    # configs fall back to XLA) — the batched sibling of the single-path
    # kernel, see ops/pallas/batched_decode_attention.py.
    use_pallas = cfg.use_pallas and cfg.context is None
    if use_pallas:
        import jax as _jax

        from go_pocket_tts_tpu.ops.pallas.batched_decode_attention import (
            batched_decode_attention,
        )

        interpret = _jax.default_backend() == "cpu"

    pos_q = offsets[:, None]  # [B, 1]
    pos_k = jnp.broadcast_to(
        jnp.arange(capacity, dtype=jnp.int32)[None, :], (x.shape[0], capacity)
    )

    cos_rows, sin_rows = rope_rows(params["rope_cos"], params["rope_sin"], offsets, 1)

    k_all, v_all = cache["k"], cache["v"]
    ks_all = cache.get("k_scale")
    vs_all = cache.get("v_scale")
    for i, layer in enumerate(params["layers"]):
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads, cfg.head_dim)
        k = _split_heads(k, cfg.num_heads, cfg.head_dim)
        v = _split_heads(v, cfg.num_heads, cfg.head_dim)
        q = apply_rope_rows(q, cos_rows, sin_rows)
        k = apply_rope_rows(k, cos_rows, sin_rows)
        # Per-slot scatter of the new token into layer i of the stacked
        # cache, expressed as ONE in-place scatter on the stacked buffer.
        # (A vmapped dynamic-update-slice re-materializes the whole layer
        # slice twice per layer per step — ~130 MB/step of pure copy at
        # batch 8, measured 0.66 ms/step vs the ~0.33 ms roofline.)
        lanes = jnp.arange(x.shape[0], dtype=jnp.int32)
        if quantized:
            from go_pocket_tts_tpu.models.quantize import quantize_kv_rows

            kq, ks = quantize_kv_rows(k[:, :, 0, :])  # [B,H,Dh] / [B,H]
            vq, vs = quantize_kv_rows(v[:, :, 0, :])
            k_all = k_all.at[i, lanes, :, offsets, :].set(kq)
            v_all = v_all.at[i, lanes, :, offsets, :].set(vq)
            ks_all = ks_all.at[i, lanes, :, offsets].set(ks)
            vs_all = vs_all.at[i, lanes, :, offsets].set(vs)
            if use_pallas:
                attn = batched_decode_attention(
                    q,
                    k_all,
                    v_all,
                    offsets,
                    k_scale=ks_all,
                    v_scale=vs_all,
                    layer=i,
                    interpret=interpret,
                )
            else:
                attn = attention_with_positions_int8kv(
                    q,
                    k_all[i],
                    ks_all[i],
                    v_all[i],
                    vs_all[i],
                    pos_q,
                    pos_k,
                    cfg.context,
                )
        else:
            k_all = k_all.at[i, lanes, :, offsets, :].set(k[:, :, 0, :])
            v_all = v_all.at[i, lanes, :, offsets, :].set(v[:, :, 0, :])
            if use_pallas:
                attn = batched_decode_attention(
                    q, k_all, v_all, offsets, layer=i, interpret=interpret
                )
            else:
                attn = attention_with_positions(
                    q, k_all[i], v_all[i], pos_q, pos_k, cfg.context
                )
        x = x + apply_linear(layer["out_proj"], _merge_heads(attn))
        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = apply_linear(layer["linear1"], n2)
        ff = gelu_erf(ff)
        x = x + apply_linear(layer["linear2"], ff)

    new_cache = {"k": k_all, "v": v_all, "offset": offsets + 1}
    if quantized:
        new_cache["k_scale"] = ks_all
        new_cache["v_scale"] = vs_all
    return x, new_cache


def transformer_forward_stateless(
    params: Params, cfg: TransformerConfig, x: jax.Array
) -> jax.Array:
    """Full-sequence causal forward without a cache (the reference's
    ``FlowMain`` resequencing path, `flow_transformer.go:733-747`)."""
    t = x.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)
    for layer in params["layers"]:
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.num_heads, cfg.head_dim)
        k = _split_heads(k, cfg.num_heads, cfg.head_dim)
        v = _split_heads(v, cfg.num_heads, cfg.head_dim)
        q = apply_rope(q, params["rope_cos"], params["rope_sin"], 0)
        k = apply_rope(k, params["rope_cos"], params["rope_sin"], 0)
        attn = attention_with_positions(q, k, v, pos, pos, cfg.context)
        x = x + apply_linear(layer["out_proj"], _merge_heads(attn))
        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = apply_linear(layer["linear1"], n2)
        ff = gelu_erf(ff)
        x = x + apply_linear(layer["linear2"], ff)
    return x
