"""INT8 / INT4 weight-only quantization.

The reference's quantized deployment is INT8 dynamic-quantized ONNX export
(`scripts/export_onnx.py`, opset-17 quantize_dynamic; BASELINE config 5).
The TPU-native equivalent is weight-only symmetric per-output-channel INT8:

    w_q[i, o] = round(w[i, o] / scale[o]),   scale[o] = max_i |w[i, o]| / 127

Matmuls run ``(x @ w_q) * scale`` — the int8 operand halves HBM traffic (the
AR step is weight-bandwidth-bound), the scale folds into the output
elementwise, and activations stay bf16/f32. Gathers (the token embedding)
and the small conv kernels stay in floating point.

``bits=4`` stores weights as XLA ``s4`` (jnp.int4, levels −7…7, packed two
per byte in HBM) — beyond the reference. The weight stream is the batched
AR step's dominant HBM traffic even after INT8 (measured 0.238 ms/step at
batch 8 with int8 weights+KV), so halving it again targets the next chunk;
per-channel INT4 costs more quantization error than INT8 (RMS weight error
~9x), so it stays opt-in until validated against real checkpoints.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_linear",
    "quantize_model_params",
    "is_quantized",
    "model_quantized_bits",
    "quantize_kv_rows",
]


def model_quantized_bits(params: Dict) -> int | None:
    """4 or 8 if the param tree carries (pre-)quantized linears, else None.

    Mixed trees (an int4 export can hold int8 fallbacks for odd input dims)
    report the narrowest width — that is the artifact's headline format.
    """
    found: set = set()

    def walk(node):
        if isinstance(node, dict):
            if is_quantized(node):
                found.add(4 if node["w"].dtype == jnp.int4 else 8)
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return min(found) if found else None


def quantize_kv_rows(x: jax.Array):
    """Symmetric per-row INT8 for KV-cache vectors: ``x[..., Dh]`` →
    ``(int8[..., Dh], float32 scale[...])`` with ``scale = max|row| / 127``.

    One scale per cached position vector (per lane, head, position) keeps
    the quantization error relative to each row's own magnitude — RoPE'd
    keys vary widely across positions, so a coarser grain measurably hurts.
    Zero rows get scale 1 so empty cache slots stay exactly zero.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    scale = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


GROUP_SIZE = 128  # int4 scale granularity along the input dim


def quantize_linear(p: Dict, bits: int = 8) -> Dict:
    """Quantize one linear param dict {w[in,out], b?} → {w int8/int4, scale, b?}.

    INT8 uses one scale per output channel. INT4 is GROUP-WISE: one scale per
    (``GROUP_SIZE`` input rows × output channel), i.e. ``scale[G, out]`` —
    15 levels per whole column is too coarse (outlier rows swamp the range),
    while per-group scales bound the error to each 128-row slab; the scale
    table stays tiny (k/128 × out f32). Falls back to per-channel when the
    input dim isn't a multiple of ``GROUP_SIZE``.
    """
    if bits not in (8, 4):
        raise ValueError(f"quantize bits must be 8 or 4, got {bits}")
    w = p["w"]
    k = w.shape[0]
    if bits == 4 and k % 2 != 0:
        # An odd input dim cannot nibble-pack on disk; fall back to int8 here
        # too so load-time quantization stays leaf-exact with the exported
        # artifact (model_assets/quantize_export.py applies the same rule).
        bits = 8
    qmax = 127.0 if bits == 8 else 7.0
    qtype = jnp.int8 if bits == 8 else jnp.int4
    if bits == 4 and k % GROUP_SIZE == 0 and k > GROUP_SIZE:
        g = k // GROUP_SIZE
        wg = w.reshape(g, GROUP_SIZE, w.shape[1])
        scale = jnp.max(jnp.abs(wg), axis=1) / qmax  # [G, out]
        scale = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax, qmax)
        q = q.astype(qtype).reshape(k, w.shape[1])
    else:
        scale = jnp.max(jnp.abs(w), axis=0) / qmax  # [out]
        scale = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(qtype)
    out = {"w": q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def is_quantized(p: Dict) -> bool:
    return "scale" in p and p["w"].dtype in (jnp.int8, jnp.int4)


def _is_linear(node) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and getattr(node["w"], "ndim", 0) == 2
        and jnp.issubdtype(node["w"].dtype, jnp.floating)
        and "scale" not in node
    )


def quantize_model_params(params: Dict, bits: int = 8) -> Dict:
    """Recursively quantize every 2-D linear in the model param tree.

    RoPE tables, norms, embeddings, conv kernels (3-D), and latent stats are
    left in floating point. ``bits``: 8 (default) or 4.
    """

    # conditioner_embed is a gather table; latent_to_mimi is applied with a
    # raw matmul in the decode path (once per utterance — not traffic-bound).
    skip_keys = {"conditioner_embed", "latent_to_mimi"}

    def walk(node):
        if _is_linear(node):
            return quantize_linear(node, bits=bits)
        if isinstance(node, dict):
            return {k: (v if k in skip_keys else walk(v)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
