"""Parameter-tree helpers: a thin VarBuilder over the safetensors store.

The reference walks checkpoints with a hierarchical dotted-prefix VarBuilder
(`internal/native/var_builder.go:13-110`). Here the analogous object loads
NumPy arrays (converted to JAX on demand), supports prefix scoping, optional
shape assertion, presence checks, and layer-count discovery by key probing —
the loader never hardcodes layer counts (`flow_transformer.go:482-511`).
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.utils.safetensors import Store

__all__ = [
    "VarBuilder",
    "linear_params",
    "layer_norm_params",
    "record_linear_weight_names",
]


class VarBuilder:
    """Dotted-prefix view over a safetensors Store yielding jnp arrays."""

    def __init__(self, store: Store, prefix: str = "", dtype=jnp.float32) -> None:
        self._store = store
        self._prefix = prefix
        self._dtype = dtype

    def path(self, *parts: str) -> "VarBuilder":
        joined = ".".join(parts)
        prefix = f"{self._prefix}.{joined}" if self._prefix else joined
        return VarBuilder(self._store, prefix, self._dtype)

    def full_name(self, name: str) -> str:
        return f"{self._prefix}.{name}" if self._prefix else name

    def has(self, name: str) -> bool:
        return self._store.has(self.full_name(name))

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._store.shape(self.full_name(name))

    def tensor(self, name: str, *shape: int) -> jnp.ndarray:
        full = self.full_name(name)
        arr = self._store.tensor_f32(full)
        if shape and tuple(arr.shape) != tuple(shape):
            raise ValueError(
                f"tensor {full!r} has shape {arr.shape}, expected {tuple(shape)}"
            )
        return jnp.asarray(arr, dtype=self._dtype)

    def tensor_maybe(self, name: str) -> Optional[jnp.ndarray]:
        if not self.has(name):
            return None
        return self.tensor(name)

    def stored_dtype(self, name: str) -> str:
        """The on-disk dtype string ("F32", "I8", "U8", ...)."""
        return self._store.dtype(self.full_name(name))

    def raw(self, name: str) -> np.ndarray:
        """Decode without widening/casting (int8 stays int8)."""
        return self._store.tensor(self.full_name(name))


# When set (via record_linear_weight_names), every linear_params call appends
# the full checkpoint name of its weight tensor. `model export --quantize`
# uses this to derive the exact set of linears the runtime would quantize —
# the loader itself is the ground truth, not a name heuristic.
_LINEAR_NAMES_RECORDER: Optional[List[str]] = None


@contextlib.contextmanager
def record_linear_weight_names():
    global _LINEAR_NAMES_RECORDER
    prev = _LINEAR_NAMES_RECORDER
    names: List[str] = []
    _LINEAR_NAMES_RECORDER = names
    try:
        yield names
    finally:
        _LINEAR_NAMES_RECORDER = prev


def _prequantized_linear_params(
    vb: VarBuilder, name: str, with_bias: bool
) -> Dict[str, jnp.ndarray]:
    """Load a pre-quantized linear written by ``model export --quantize``.

    On-disk layout keeps the torch orientation (``weight`` [out, in]) so the
    checkpoint stays name/shape-compatible with tooling; scales are stored in
    the runtime orientation (int8: [out]; grouped int4: [G, out]) so no
    transpose is needed for them. INT4 weights are packed two nibbles per
    byte (U8 [out, in/2], little nibble = even input index).
    """
    stored = vb.stored_dtype(name + ".weight")
    scale = np.asarray(vb.raw(name + ".weight_scale"), dtype=np.float32)
    if stored == "U8":
        # Disk packs nibbles along `in` ([out, in/2], little nibble = even
        # input index); the runtime form is the same bytes transposed
        # ([in/2, out], models/quantize.py::pack_int4_rows pairing) — a
        # plain u8 transpose, no nibble surgery, no s4 host conversion.
        w = jnp.asarray(np.ascontiguousarray(vb.raw(name + ".weight").T))
    else:
        w = jnp.asarray(vb.raw(name + ".weight").T)  # int8 [in, out]
    out_dim = w.shape[1]
    if scale.shape[-1] != out_dim:
        raise ValueError(
            f"linear {name!r}: scale shape {scale.shape} incompatible with "
            f"out dim {out_dim}"
        )
    params: Dict[str, jnp.ndarray] = {"w": w, "scale": jnp.asarray(scale)}
    if with_bias:
        b = vb.tensor_maybe(name + ".bias")
        if b is not None:
            if b.shape != (out_dim,):
                raise ValueError(
                    f"linear {name!r} bias shape {b.shape} incompatible with "
                    f"out dim {out_dim}"
                )
            params["b"] = b
    return params


def linear_params(vb: VarBuilder, name: str, with_bias: bool) -> Dict[str, jnp.ndarray]:
    """Load a torch-layout linear: weight ``[out, in]``, optional bias ``[out]``.

    Weights are stored **transposed** to ``[in, out]`` so the forward pass is
    a plain ``x @ w`` — the layout XLA prefers for feeding the MXU without an
    extra transpose fusion.

    Pre-quantized checkpoints (``model export --quantize``) store the weight
    as I8 (or nibble-packed U8 for int4) plus a ``.weight_scale`` companion;
    those load directly into the quantized param form consumed by
    :func:`apply_linear`, skipping load-time quantization entirely.
    """
    if _LINEAR_NAMES_RECORDER is not None:
        _LINEAR_NAMES_RECORDER.append(vb.full_name(name + ".weight"))
    if vb.has(name + ".weight") and vb.stored_dtype(name + ".weight") in ("I8", "U8"):
        return _prequantized_linear_params(vb, name, with_bias)
    w = vb.tensor(name + ".weight")
    if w.ndim != 2:
        raise ValueError(f"linear {name!r} weight must be rank-2, got {w.shape}")
    params = {"w": w.T}
    if with_bias:
        b = vb.tensor_maybe(name + ".bias")
        if b is not None:
            if b.shape != (w.shape[0],):
                raise ValueError(
                    f"linear {name!r} bias shape {b.shape} incompatible with weight {w.shape}"
                )
            params["b"] = b
    return params


def layer_norm_params(vb: VarBuilder, name: str) -> Dict[str, jnp.ndarray]:
    return {
        "weight": vb.tensor(name + ".weight"),
        "bias": vb.tensor(name + ".bias"),
    }


# Backend for int8 weight-only linears: "xla" (mixed-dtype dot_general) or
# "pallas" (ops/pallas/quantized_matmul — keeps the int8→bf16 convert inside
# the matmul tile loop). Set once by the runtime before tracing; "pallas"
# may carry an ":interpret" suffix for CPU testing.
_QUANT_BACKEND = "xla"

# INT4 grouped-matmul formulation (hardware A/B, scripts/exp_int4_step.py):
#   "split"   — G separate 128-row contractions, scale folded into f32
#               partials post-matmul (most precise; G-way split reduction)
#   "dequant" — dequantize the packed weight in-flight to one x.dtype
#               operand and run a single dot (XLA can fuse convert+scale
#               into the dot's operand stream; one full-K MXU contraction)
#   "pallas"  — ops/pallas/int4_matmul: the depack runs on VPU registers
#               between the packed-tile DMA and the MXU dot, so HBM traffic
#               stays the packed bytes (XLA materializes the widened weight
#               for both variants above — the r5 rejection's root cause);
#               ":interpret" suffix for CPU testing, XLA-split fallback for
#               unsupported shapes.
# All read the same packed u8 buffer from HBM; which formulation keeps it
# un-materialized is an empirical question — settled on hardware
# (PERF.md r5: split 0.369 ms vs int8's 0.228 at batch 8; pallas pending).
# Env override: POCKETTTS_INT4_VARIANT.
import os as _os

_INT4_VARIANT = _os.environ.get("POCKETTTS_INT4_VARIANT", "split")


def set_int4_matmul_variant(variant: str) -> None:
    global _INT4_VARIANT
    if variant.split(":")[0] not in ("split", "dequant", "pallas"):
        raise ValueError(f"unknown int4 matmul variant {variant!r}")
    _INT4_VARIANT = variant


def set_quantized_matmul_backend(backend: str) -> None:
    global _QUANT_BACKEND
    if backend.split(":")[0] not in ("xla", "pallas"):
        raise ValueError(f"unknown quantized matmul backend {backend!r}")
    _QUANT_BACKEND = backend


def apply_linear(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """``y = x @ w (+ b)`` with f32 accumulation on the MXU.

    INT8 weight-only quantized linears (``models/quantize.py``) carry a
    per-output-channel ``scale``; the int8 operand converts on load (half the
    HBM traffic of bf16) and the scale folds into the output.
    """
    w = params["w"]
    if "scale" in params and w.dtype in (jnp.int8, jnp.uint8):
        lead = x.shape[:-1]
        k = x.shape[-1]
        n = w.shape[1]
        m = 1
        for d in lead:
            m *= d

        if w.dtype == jnp.uint8:
            # Packed int4 (uint8 [k/2, n], models/quantize.py pairing). The
            # HBM read is the packed buffer (half the int8 footprint); the
            # nibble depack (two int8 shifts) runs in-flight. s4 itself is
            # unusable as a jit argument on this backend (device_put
            # relayout recursion — see quantize.py module docstring).
            from go_pocket_tts_tpu.models.quantize import depack_int4_pairs

            scale = params["scale"]
            if _INT4_VARIANT.startswith("pallas") and scale.ndim == 2:
                from go_pocket_tts_tpu.ops.pallas import int4_matmul as i4mm

                if i4mm.supports(m, k, n, scale.shape):
                    # [2, M, K/2]: plane p holds activation rows 2i+p, the
                    # pack_int4_rows nibble pairing — the interleave rides
                    # the small operand so the kernel depacks with shifts
                    # only (no sublane interleave).
                    x2 = jnp.moveaxis(x.reshape(m, k // 2, 2), -1, 0)
                    y = i4mm.int4_matmul(
                        x2,
                        w,
                        scale,
                        interpret=_INT4_VARIANT.endswith(":interpret"),
                    ).reshape(*lead, n)
                    y = y.astype(x.dtype)
                    if "b" in params:
                        y = y + params["b"].astype(x.dtype)
                    return y
            pairs = depack_int4_pairs(w)  # i8 [k/2, 2, n]; [i, p] = row 2i+p
            if _INT4_VARIANT == "dequant":
                wf = pairs.astype(jnp.float32).reshape(k, n)
                if scale.ndim == 2:
                    g = scale.shape[0]
                    wf = (
                        wf.reshape(g, k // g, n)
                        * scale[:, None, :].astype(jnp.float32)
                    ).reshape(k, n)
                else:
                    wf = wf * scale.astype(jnp.float32)
                y = jnp.matmul(
                    x, wf.astype(x.dtype), preferred_element_type=jnp.float32
                )
                y = y.astype(x.dtype)
                if "b" in params:
                    y = y + params["b"].astype(x.dtype)
                return y
            if scale.ndim == 2:
                # Group-wise scales [G, out] (models/quantize.py): contract
                # each 128-row input slab separately, fold its scale into the
                # partial, and sum. The nibble pair ordering rides the x side
                # (a free reshape of the small activation) so the weight
                # needs no interleave — only the depack shifts.
                g = scale.shape[0]
                xg = x.reshape(*lead, g, k // (2 * g), 2)
                wg = pairs.reshape(g, k // (2 * g), 2, n).astype(x.dtype)
                partial = jnp.einsum(
                    "...gjp,gjpn->...gn",
                    xg,
                    wg,
                    preferred_element_type=jnp.float32,
                )
                y = jnp.sum(partial * scale.astype(jnp.float32), axis=-2)
            else:
                xp = x.reshape(*lead, k // 2, 2)
                y = jnp.einsum(
                    "...jp,jpn->...n",
                    xp,
                    pairs.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                )
                y = y * scale.astype(jnp.float32)
            y = y.astype(x.dtype)
            if "b" in params:
                y = y + params["b"].astype(x.dtype)
            return y

        if _QUANT_BACKEND.startswith("pallas"):
            from go_pocket_tts_tpu.ops.pallas import quantized_matmul as qmm

            if qmm.supports(m, k, n):
                y = qmm.quantized_matmul(
                    x.reshape(m, k),
                    w,
                    params["scale"],
                    interpret=_QUANT_BACKEND.endswith(":interpret"),
                ).reshape(*lead, n)
                y = y.astype(x.dtype)
                if "b" in params:
                    y = y + params["b"].astype(x.dtype)
                return y

        import jax.lax as lax

        # Mixed-dtype dot: the int8 operand streams from HBM at half the
        # bf16 footprint and converts in-flight (no materialized copy).
        y = lax.dot_general(
            x,
            w,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y * params["scale"].astype(jnp.float32)
        y = y.astype(x.dtype)
    else:
        y = jnp.matmul(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y.astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y
