"""Pre-quantized serving checkpoint export (host-side, NumPy).

The reference's quantized deployment artifact is an INT8 dynamic-quantized
ONNX export (`scripts/export_onnx.py:55-300`, BASELINE config 5) — a second
on-disk format the alternate backend consumes. The TPU-native analogue is a
safetensors checkpoint whose linear weights are stored already quantized
(`model export --quantize int8|int4`): the runtime loads it directly into
the quantized param form (`models/params.py::linear_params`), so serving
skips load-time quantization and the artifact is ~4x/~8x smaller for the
weight-dominant tensors (bf16 checkpoints: ~2x/~4x).

Numerics are bit-identical to load-time quantization
(`models/quantize.py::quantize_linear`): symmetric per-output-channel INT8,
group-wise (128 input rows) INT4 with per-channel fallback when the input
dim isn't a group multiple. The set of quantized tensors is derived by
RECORDING an actual model load (`record_linear_weight_names`) — the loader
is the ground truth for "what is a linear", not a name heuristic — so the
export always matches what ``--runtime-quantize`` would have quantized
(skip-set included: embedding gathers and conv kernels are never routed
through ``linear_params`` and pass through in float).

On-disk layout (names stay checkpoint-compatible; ``model verify`` and the
required-key check pass unchanged):

- INT8:  ``X.weight`` I8 [out, in] (torch orientation), ``X.weight_scale``
  F32 [out]
- INT4:  ``X.weight`` U8 [out, in/2] — two's-complement nibbles packed two
  per byte, little nibble = even input index — plus ``X.weight_scale`` F32
  [G, out] (grouped) or [out] (per-channel fallback)
- ``__metadata__["pockettts.quantize"]`` records the format.

Odd input dims cannot nibble-pack; those (nonexistent in real checkpoints)
fall back to INT8 within an INT4 export.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Optional, Set, Tuple

import numpy as np

from go_pocket_tts_tpu.utils.safetensors import Store, pack_nibbles, unpack_nibbles

__all__ = [
    "QUANT_METADATA_KEY",
    "linear_weight_names",
    "quantize_weight_np",
    "dequantize_weight_np",
    "build_quantized_checkpoint",
    "to_bf16",
    "reencode_tensor",
]

QUANT_METADATA_KEY = "pockettts.quantize"

_FLOAT_DTYPES = ("F32", "F16", "BF16")


def linear_weight_names(store: Store, num_heads: int = 16) -> Set[str]:
    """Full checkpoint names of every weight the loader treats as a linear."""
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.models.params import record_linear_weight_names

    with record_linear_weight_names() as names:
        load_model_from_store(store, num_heads=num_heads)
    return set(names)


def dequantize_weight_np(stored: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Reconstruct the float weight ``[out, in]`` from the on-disk pair.

    Used by float-math consumers of pre-quantized artifacts (the torch
    oracle): ``x @ (q·scale)`` equals the serving path's ``(x @ q)·scale``
    up to float association, so cross-engine parity holds on quantized
    checkpoints too.
    """
    scale = np.asarray(scale, dtype=np.float32)
    if stored.dtype == np.uint8:
        vals = unpack_nibbles(stored).astype(np.float32)  # [out, in]
        if scale.ndim == 2:  # grouped: scale [G, out]
            out_dim, k = vals.shape
            g = scale.shape[0]
            wg = vals.reshape(out_dim, g, k // g)
            return (wg * scale.T[:, :, None]).reshape(out_dim, k)
        return vals * scale[:, None]
    return stored.astype(np.float32) * scale[:, None]


def _group_size() -> int:
    # The runtime's grouping constant is the single source of truth; resolved
    # lazily so importing this module stays jax-free (the torch oracle pulls
    # in dequantize_weight_np only).
    from go_pocket_tts_tpu.models.quantize import GROUP_SIZE

    return GROUP_SIZE


def quantize_weight_np(
    w: np.ndarray, bits: int, group_size: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize a torch-orientation weight ``[out, in]``.

    Returns ``(stored_weight, stored_scale)`` in the on-disk layout above.
    Matches ``models/quantize.py::quantize_linear`` exactly (same reduction
    values, same round-half-even, same group rule) so a pre-quantized load
    equals a load-then-quantize tree leaf-for-leaf.
    """
    if bits not in (8, 4):
        raise ValueError(f"quantize bits must be 8 or 4, got {bits}")
    if group_size is None:
        group_size = _group_size()
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"expected rank-2 weight, got shape {w.shape}")
    out_dim, k = w.shape
    if bits == 4 and k % 2 != 0:
        bits = 8  # cannot nibble-pack an odd input dim
    if bits == 8:
        scale = np.abs(w).max(axis=1) / 127.0  # [out]
        scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        q = np.clip(np.rint(w / scale[:, None]), -127, 127).astype(np.int8)
        return q, scale
    if k % group_size == 0 and k > group_size:
        g = k // group_size
        wg = w.reshape(out_dim, g, group_size)
        scale = np.abs(wg).max(axis=2) / 7.0  # [out, G]
        scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        q = np.clip(np.rint(wg / scale[:, :, None]), -7, 7).astype(np.int8)
        return pack_nibbles(q.reshape(out_dim, k)), np.ascontiguousarray(scale.T)
    scale = np.abs(w).max(axis=1) / 7.0  # [out]
    scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale[:, None]), -7, 7).astype(np.int8)
    return pack_nibbles(q), scale


def to_bf16(a: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 → bf16 (ml_dtypes array; encodes as BF16)."""
    import ml_dtypes

    return np.asarray(a, dtype=ml_dtypes.bfloat16)


def reencode_tensor(store: Store, name: str, float_dtype: str = "f32") -> np.ndarray:
    """One tensor of a re-encode: bf16-convert float tensors when requested
    (never ``.weight_scale`` companions — those stay f32-exact), pass
    everything else through untouched. The single definition of the
    per-tensor storage-dtype decision, shared by the quantizing and plain
    export paths."""
    if (
        float_dtype == "bf16"
        and store.dtype(name) in _FLOAT_DTYPES
        and not name.endswith(".weight_scale")
    ):
        return to_bf16(store.tensor_f32(name))
    return store.tensor(name)


def build_quantized_checkpoint(
    store: Store,
    bits: int,
    num_heads: int = 16,
    keep_names: Optional[Iterable[str]] = None,
    float_dtype: str = "f32",
) -> Tuple[Dict[str, np.ndarray], Dict[str, str], List[str]]:
    """Produce ``(tensors, metadata, quantized_names)`` for writing.

    ``keep_names`` restricts the output (e.g. after --strip-voice-cloning);
    already-quantized or non-float tensors pass through untouched, so the
    export is idempotent. ``float_dtype="bf16"`` stores the remaining float
    tensors (biases, norms, conv kernels, embeddings) as BF16 — quantization
    scales stay F32 for exactness.
    """
    if float_dtype not in ("f32", "bf16"):
        raise ValueError(f"float_dtype must be f32 or bf16, got {float_dtype!r}")
    linears = linear_weight_names(store, num_heads=num_heads)
    keep = set(keep_names) if keep_names is not None else None
    tensors: Dict[str, np.ndarray] = {}
    quantized: List[str] = []
    for name in store.names():
        if keep is not None and name not in keep:
            continue
        if name in linears and store.dtype(name) in _FLOAT_DTYPES:
            q, scale = quantize_weight_np(store.tensor_f32(name), bits)
            tensors[name] = q
            tensors[name + "_scale"] = scale
            quantized.append(name)
        else:
            tensors[name] = reencode_tensor(store, name, float_dtype)
    metadata = dict(store.metadata)
    if quantized:
        metadata[QUANT_METADATA_KEY] = (
            "int8" if bits == 8 else f"int4-g{_group_size()}"
        )
    # else: nothing was (re-)quantized — keep the source's own stamp so an
    # int8 artifact re-exported with --quantize int4 stays labeled int8
    # instead of lying about its contents.
    return tensors, metadata, quantized
