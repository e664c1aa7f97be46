"""INT8 / INT4 weight-only quantization.

The reference's quantized deployment is INT8 dynamic-quantized ONNX export
(`scripts/export_onnx.py`, opset-17 quantize_dynamic; BASELINE config 5).
The TPU-native equivalent is weight-only symmetric per-output-channel INT8:

    w_q[i, o] = round(w[i, o] / scale[o]),   scale[o] = max_i |w[i, o]| / 127

Matmuls run ``(x @ w_q) * scale`` — the int8 operand halves HBM traffic (the
AR step is weight-bandwidth-bound), the scale folds into the output
elementwise, and activations stay bf16/f32. Gathers (the token embedding)
and the small conv kernels stay in floating point.

``bits=4`` stores weights packed two two's-complement nibbles per byte in a
``uint8 [k/2, out]`` carrier (byte ``i`` holds input rows ``2i`` — low
nibble — and ``2i+1``), levels −7…7 — beyond the reference. The weight
stream is the batched AR step's dominant HBM traffic even after INT8
(measured 0.238 ms/step at batch 8 with int8 weights+KV), so halving it
again targets the next chunk; per-channel INT4 costs more quantization
error than INT8 (RMS weight error ~9x), so it stays opt-in until validated
against real checkpoints.

Why uint8 and not XLA's native ``s4`` dtype: on the axon TPU backend,
passing an ``int4`` array as a jit *argument* dies in an infinite
``device_put`` relayout recursion (r4 hardware session, S4 layout
``T(64,128)(8,1)``) — s4 works as a jit-internal value but not across
dispatch boundaries. The packed-u8 carrier has identical HBM bytes; the
nibble depack (two shifts) runs inside the consuming jit and fuses into
the matmul's operand stream (see ``params.apply_linear``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_linear",
    "quantize_model_params",
    "is_quantized",
    "is_int4_packed",
    "model_quantized_bits",
    "quantize_kv_rows",
    "pack_int4_rows",
    "depack_int4_pairs",
    "dequantize_weight",
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
                found.add(4 if node["w"].dtype == jnp.uint8 else 8)
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


def pack_int4_rows(q: jax.Array) -> jax.Array:
    """``int8 [k, n]`` values in [-8, 7] → packed ``uint8 [k/2, n]``.

    Byte ``[i, j]`` holds input row ``2i`` in the low nibble and ``2i+1``
    in the high nibble (two's complement) — the same pairing the on-disk
    pre-quantized format uses along its last axis
    (``utils/safetensors.pack_nibbles`` on ``[out, in]``), so a loaded
    artifact's ``[out, in/2]`` buffer transposes straight into this form.
    Pure int8/uint8 bit ops: safe to run eagerly (no s4 dispatch).
    """
    k, n = q.shape
    qp = q.reshape(k // 2, 2, n)
    byte = (qp[:, 0, :] & 0x0F) | (qp[:, 1, :] << 4)
    return jax.lax.bitcast_convert_type(byte, jnp.uint8)


def depack_int4_pairs(packed: jax.Array) -> jax.Array:
    """Packed ``uint8 [k/2, n]`` → sign-extended ``int8 [k/2, 2, n]``.

    ``out[i, p, j]`` is original input row ``2i + p``. Traceable; inside a
    jit the two shifts fuse into whatever consumes the weight, so the HBM
    read stays the packed buffer (half the int8 footprint).
    """
    ui = jax.lax.bitcast_convert_type(packed, jnp.int8)
    lo = (ui << 4) >> 4  # arithmetic shifts sign-extend the low nibble
    hi = ui >> 4
    return jnp.stack([lo, hi], axis=1)


def dequantize_weight(p: Dict) -> jax.Array:
    """Quantized linear params → float32 ``w [k, n]`` (scales folded in).

    Handles int8 per-channel and packed-int4 group-wise forms; used where a
    float view of a quantized weight is required (e.g. the fused adaLN
    concat when sources mix quantization forms).
    """
    w = p["w"]
    if w.dtype == jnp.uint8:
        wq = depack_int4_pairs(w).reshape(w.shape[0] * 2, w.shape[1])
    else:
        wq = w
    wf = wq.astype(jnp.float32)
    sc = p["scale"].astype(jnp.float32)
    if sc.ndim == 2:
        g = sc.shape[0]
        return (wf.reshape(g, -1, wf.shape[1]) * sc[:, None, :]).reshape(wf.shape)
    return wf * sc


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
    if bits == 4 and k % GROUP_SIZE == 0 and k > GROUP_SIZE:
        g = k // GROUP_SIZE
        wg = w.reshape(g, GROUP_SIZE, w.shape[1])
        scale = jnp.max(jnp.abs(wg), axis=1) / qmax  # [G, out]
        scale = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax, qmax)
        q = q.astype(jnp.int8).reshape(k, w.shape[1])
    else:
        scale = jnp.max(jnp.abs(w), axis=0) / qmax  # [out]
        scale = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        q = pack_int4_rows(q)
    out = {"w": q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def is_quantized(p: Dict) -> bool:
    return "scale" in p and p["w"].dtype in (jnp.int8, jnp.uint8)


def is_int4_packed(p: Dict) -> bool:
    return "scale" in p and p["w"].dtype == jnp.uint8


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
