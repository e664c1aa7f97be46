"""safetensors reader/writer and voice-file loaders (pure host code, NumPy).

Capability parity with the reference store (`internal/safetensors/store.go`,
`internal/safetensors/reader.go`, `internal/safetensors/writer.go`):

- format: ``[8-byte LE header length][JSON header][raw tensor data]``
- supported dtypes on read: F32, F16 (incl. subnormals), BF16, I64
  (`store.go:14-18`, `store.go:339-429`); plus I8/U8, which the reference
  store never needs but this framework's pre-quantized serving checkpoints
  use (``model export --quantize``, int8 weights / packed-nibble int4)
- offset/shape validation against the payload (`store.go:140-200`)
- optional ``key_mapper`` renaming with lenient/strict modes
  (`store.go:21-31,100-125`)
- voice-file classification: legacy ``audio_prompt`` *embedding* files vs
  upstream *model-state* files whose tensors are named ``<module>/cache`` +
  ``<module>/offset`` (legacy ``current_end`` translated) (`reader.go:232-316`)
- header-only required-key validation (`reader.go:159-217`)
- F32 safetensors writer used by export-voice (`writer.go:14-98`)

Unlike the reference (which decodes everything to ``[]float32``), tensors are
returned as NumPy arrays in a *lossless* dtype (F16/BF16 widen to float32,
I64 stays int64); use :meth:`Store.tensor_f32` for the reference's behaviour.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "SafetensorsError",
    "Store",
    "open_store",
    "open_store_from_bytes",
    "encode_tensors",
    "write_file",
    "pack_nibbles",
    "unpack_nibbles",
    "VoiceFileKind",
    "VoiceModelState",
    "inspect_voice_file",
    "inspect_voice_file_bytes",
    "load_voice_embedding",
    "load_voice_embedding_from_bytes",
    "load_voice_model_state",
    "load_voice_model_state_from_bytes",
    "validate_model_keys",
    "read_header_metadata",
    "read_header",
    "REQUIRED_MODEL_KEYS",
]


class SafetensorsError(ValueError):
    """Raised for malformed safetensors payloads."""


_MAX_HEADER_BYTES = 100 * 1024 * 1024  # sanity limit, matches reader.go:186

_DTYPE_SIZES = {"F32": 4, "F16": 2, "BF16": 2, "I64": 8, "I8": 1, "U8": 1}

# KeyMapper: name -> (mapped_name, keep)
KeyMapper = Callable[[str], Tuple[str, bool]]


@dataclass(frozen=True)
class _Entry:
    dtype: str
    shape: Tuple[int, ...]
    start: int
    end: int


def _bf16_to_f32(raw: bytes, n: int) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype="<u2", count=n)
    return (u16.astype(np.uint32) << 16).view(np.float32).copy()


class Store:
    """Parsed safetensors payload with validated entries.

    The full payload is held in memory (the reference does the same; mmap was
    an open TODO there, `PLAN.md:7`).
    """

    def __init__(
        self,
        data: bytes,
        key_mapper: Optional[KeyMapper] = None,
        strict_remap: bool = False,
    ) -> None:
        if len(data) < 8:
            raise SafetensorsError("safetensors: payload too small for header length")
        (header_len,) = struct.unpack_from("<Q", data, 0)
        if header_len > _MAX_HEADER_BYTES:
            raise SafetensorsError(
                f"safetensors: header length {header_len} exceeds {_MAX_HEADER_BYTES} limit"
            )
        if 8 + header_len > len(data):
            raise SafetensorsError("safetensors: header length exceeds payload size")
        try:
            header = json.loads(data[8 : 8 + header_len].decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as exc:
            raise SafetensorsError(f"safetensors: invalid JSON header: {exc}") from exc
        if not isinstance(header, dict):
            raise SafetensorsError("safetensors: header must be a JSON object")

        payload = data[8 + header_len :]
        self._payload = payload
        self._entries: Dict[str, _Entry] = {}
        self._metadata: Dict[str, str] = {}

        for name, raw_entry in header.items():
            if name == "__metadata__":
                if isinstance(raw_entry, dict):
                    self._metadata = {str(k): str(v) for k, v in raw_entry.items()}
                continue
            entry = self._parse_entry(name, raw_entry, len(payload))
            mapped = name
            if key_mapper is not None:
                mapped, keep = key_mapper(name)
                if not keep:
                    continue
                if mapped in self._entries and strict_remap:
                    raise SafetensorsError(
                        f"safetensors: key mapper produced duplicate name {mapped!r}"
                    )
            self._entries[mapped] = entry

        if key_mapper is not None and strict_remap and not self._entries:
            raise SafetensorsError("safetensors: key mapper removed every tensor")

    @staticmethod
    def _parse_entry(name: str, raw_entry: object, payload_len: int) -> _Entry:
        if not isinstance(raw_entry, dict):
            raise SafetensorsError(f"safetensors: tensor {name!r} entry must be an object")
        dtype = str(raw_entry.get("dtype", "")).upper()
        if dtype not in _DTYPE_SIZES:
            raise SafetensorsError(
                f"safetensors: tensor {name!r} has unsupported dtype {dtype!r}"
            )
        shape_raw = raw_entry.get("shape")
        if not isinstance(shape_raw, list) or any(
            not isinstance(d, int) or d < 0 for d in shape_raw
        ):
            raise SafetensorsError(f"safetensors: tensor {name!r} has invalid shape")
        offsets = raw_entry.get("data_offsets")
        if (
            not isinstance(offsets, list)
            or len(offsets) != 2
            or any(not isinstance(o, int) or o < 0 for o in offsets)
        ):
            raise SafetensorsError(f"safetensors: tensor {name!r} has invalid data_offsets")
        start, end = offsets
        n_elems = int(np.prod(shape_raw, dtype=np.int64)) if shape_raw else 1
        want = n_elems * _DTYPE_SIZES[dtype]
        if end < start or end - start != want:
            raise SafetensorsError(
                f"safetensors: tensor {name!r} data range [{start},{end}) does not match "
                f"shape {shape_raw} dtype {dtype} ({want} bytes)"
            )
        if end > payload_len:
            raise SafetensorsError(
                f"safetensors: tensor {name!r} data range [{start},{end}) exceeds payload "
                f"size {payload_len}"
            )
        return _Entry(dtype=dtype, shape=tuple(shape_raw), start=start, end=end)

    # -- accessors ---------------------------------------------------------

    @property
    def metadata(self) -> Mapping[str, str]:
        return self._metadata

    def names(self) -> List[str]:
        return sorted(self._entries)

    def has(self, name: str) -> bool:
        return name in self._entries

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._require(name).shape

    def dtype(self, name: str) -> str:
        return self._require(name).dtype

    def _require(self, name: str) -> _Entry:
        entry = self._entries.get(name)
        if entry is None:
            sample = ", ".join(self.names()[:8]) or "none"
            raise KeyError(f"safetensors: tensor {name!r} not found (have: {sample}, ...)")
        return entry

    def tensor(self, name: str) -> np.ndarray:
        """Decode a tensor to NumPy, widening F16/BF16 to float32, I64 → int64."""
        entry = self._require(name)
        raw = self._payload[entry.start : entry.end]
        n = int(np.prod(entry.shape, dtype=np.int64)) if entry.shape else 1
        if entry.dtype == "F32":
            arr = np.frombuffer(raw, dtype="<f4", count=n).copy()
        elif entry.dtype == "F16":
            arr = np.frombuffer(raw, dtype="<f2", count=n).astype(np.float32)
        elif entry.dtype == "BF16":
            arr = _bf16_to_f32(raw, n)
        elif entry.dtype == "I64":
            arr = np.frombuffer(raw, dtype="<i8", count=n).copy()
        elif entry.dtype == "I8":
            arr = np.frombuffer(raw, dtype=np.int8, count=n).copy()
        elif entry.dtype == "U8":
            arr = np.frombuffer(raw, dtype=np.uint8, count=n).copy()
        else:  # pragma: no cover - guarded in _parse_entry
            raise SafetensorsError(f"unsupported dtype {entry.dtype!r}")
        return arr.reshape(entry.shape)

    def tensor_f32(self, name: str) -> np.ndarray:
        """Decode to float32 unconditionally (the reference store's behaviour,
        `store.go:339-394` — I64 is value-cast to float32)."""
        return self.tensor(name).astype(np.float32, copy=False)


def open_store(path: str | os.PathLike, **kwargs) -> Store:
    with open(path, "rb") as f:
        return Store(f.read(), **kwargs)


def open_store_from_bytes(data: bytes, **kwargs) -> Store:
    return Store(data, **kwargs)


# -- writer ---------------------------------------------------------------


def encode_tensors(
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
) -> bytes:
    """Encode named tensors as a safetensors payload.

    Float inputs are stored as F32 (the reference writer is F32-only,
    `writer.go:14-98`), except ``ml_dtypes.bfloat16`` arrays which are
    stored as BF16 (half the bytes; `model export --dtype bf16`); int64
    inputs are stored as I64 so model-state voice files round-trip;
    int8/uint8 are stored as I8/U8 (pre-quantized serving checkpoints).
    ``metadata`` becomes the standard ``__metadata__`` header entry
    (string→string).
    """
    if not tensors:
        raise SafetensorsError("safetensors: no tensors to encode")
    try:
        import ml_dtypes

        _bf16 = np.dtype(ml_dtypes.bfloat16)
    except ImportError:  # pragma: no cover - ml_dtypes ships with jax here
        _bf16 = None
    header: Dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    blobs: List[bytes] = []
    offset = 0
    for name, arr in tensors.items():
        a = np.asarray(arr)
        if a.dtype == np.int64:
            dtype, blob = "I64", a.astype("<i8").tobytes(order="C")
        elif a.dtype == np.int8:
            dtype, blob = "I8", a.tobytes(order="C")
        elif a.dtype == np.uint8:
            dtype, blob = "U8", a.tobytes(order="C")
        elif _bf16 is not None and a.dtype == _bf16:
            # bf16 bit pattern == high 16 bits of the f32; store little-endian.
            dtype = "BF16"
            blob = (
                np.ascontiguousarray(a).view(np.uint16).astype("<u2").tobytes()
            )
        else:
            dtype, blob = "F32", a.astype("<f4").tobytes(order="C")
        header[name] = {
            "dtype": dtype,
            "shape": [int(d) for d in a.shape],
            "data_offsets": [offset, offset + len(blob)],
        }
        blobs.append(blob)
        offset += len(blob)
    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(header_bytes)) + header_bytes + b"".join(blobs)


def write_file(
    path: str | os.PathLike,
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    payload = encode_tensors(tensors, metadata=metadata)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


# -- int4 nibble packing (pre-quantized checkpoints) -----------------------
#
# INT4 weights are stored as U8 with two two's-complement nibbles per byte
# along the last axis, little nibble = even index. Shared by the exporter
# (model export --quantize int4), the JAX loader, and the torch oracle.


def pack_nibbles(q: np.ndarray) -> np.ndarray:
    """``[..., n]`` int8 in [-8, 7] → ``[..., n/2]`` uint8."""
    if q.shape[-1] % 2 != 0:
        raise ValueError(f"cannot nibble-pack odd last dim {q.shape}")
    u = q.astype(np.uint8) & 0x0F
    return (u[..., 0::2] | (u[..., 1::2] << 4)).astype(np.uint8)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """``[..., n/2]`` uint8 → ``[..., n]`` int8 in [-8, 7]."""
    low = ((packed & 0x0F).astype(np.int8) ^ 0x8) - 0x8
    high = ((packed >> 4).astype(np.int8) ^ 0x8) - 0x8
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), dtype=np.int8)
    out[..., 0::2] = low
    out[..., 1::2] = high
    return out


# -- model-key validation -------------------------------------------------

# Keys the native loader actually requires (the reference's ValidateModelKeys
# list at reader.go:159-164 uses a different naming scheme than its own
# VarBuilder paths; SURVEY.md §2.3 flags this discrepancy and designates the
# VarBuilder paths — exercised by the real-checkpoint tests — as ground truth).
REQUIRED_MODEL_KEYS = (
    "flow_lm.conditioner.embed.weight",
    "flow_lm.transformer.layers.0.self_attn.in_proj.weight",
    "flow_lm.flow_net.input_proj.weight",
    "flow_lm.bos_emb",
    "mimi.quantizer.output_proj.weight",
    "mimi.decoder.model.0.conv.weight",
)


def read_header(path: str | os.PathLike) -> dict:
    """Parse and return the raw safetensors header dict (tensor name →
    {dtype, shape, data_offsets}, plus ``__metadata__``) without touching
    tensor data — instant on multi-GB files. Used by ``model dump-header``."""
    return _read_header(path)


def _read_header(path: str | os.PathLike) -> dict:
    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8:
            raise SafetensorsError("safetensors: file too small for header length")
        (header_len,) = struct.unpack("<Q", head)
        if header_len > _MAX_HEADER_BYTES:
            raise SafetensorsError(
                f"safetensors: header length {header_len} exceeds {_MAX_HEADER_BYTES} limit"
            )
        header_raw = f.read(header_len)
    if len(header_raw) != header_len:
        raise SafetensorsError("safetensors: truncated header")
    return json.loads(header_raw.decode("utf-8"))


def validate_model_keys(
    path: str | os.PathLike, required: Sequence[str] = REQUIRED_MODEL_KEYS
) -> None:
    """Header-only presence check of required model tensors (reader.go:166-217)."""
    header = _read_header(path)
    missing = [k for k in required if k not in header]
    if missing:
        raise SafetensorsError(f"safetensors: missing required tensors: {missing}")


def read_header_metadata(path: str | os.PathLike) -> Dict[str, str]:
    """Header-only ``__metadata__`` read (no tensor data touched) — cheap
    format detection, e.g. doctor reporting a pre-quantized checkpoint."""
    meta = _read_header(path).get("__metadata__")
    if not isinstance(meta, dict):
        return {}
    return {str(k): str(v) for k, v in meta.items()}


# -- voice files ----------------------------------------------------------


class VoiceFileKind:
    UNKNOWN = "unknown"
    EMBEDDING = "embedding"
    MODEL_STATE = "model_state"


@dataclass
class VoiceModelState:
    """Upstream voice model state: per-module cache/offset tensors.

    ``modules[module_name]`` maps tensor key (``cache``/``offset``) to NumPy
    arrays; cache is ``[2, B, T, H, Dh]`` (reader.go:127-155).
    """

    modules: Dict[str, Dict[str, np.ndarray]] = field(default_factory=dict)


def _is_model_state_tensor_name(name: str) -> bool:
    slash = name.rfind("/")
    if slash <= 0 or slash == len(name) - 1:
        return False
    return name[slash + 1 :] in ("cache", "offset", "current_end")


def _classify_voice_tensor_names(names: Iterable[str]) -> str:
    names = list(names)
    has_model_state = any(_is_model_state_tensor_name(n) for n in names)
    if has_model_state:
        return VoiceFileKind.MODEL_STATE
    if names:
        return VoiceFileKind.EMBEDDING
    return VoiceFileKind.UNKNOWN


def inspect_voice_file(path: str | os.PathLike) -> str:
    return _classify_voice_tensor_names(open_store(path).names())


def inspect_voice_file_bytes(data: bytes) -> str:
    return _classify_voice_tensor_names(open_store_from_bytes(data).names())


def _normalize_voice_embedding(arr: np.ndarray) -> np.ndarray:
    """Promote 2D ``[T, D]`` to 3D ``[1, T, D]`` (reader.go:219-230)."""
    if arr.ndim == 2:
        return arr[None, :, :]
    if arr.ndim == 3:
        return arr
    raise SafetensorsError(
        f"safetensors: voice embedding has {arr.ndim}D shape {arr.shape}, expected 2D or 3D"
    )


def _load_voice_embedding_from_store(store: Store) -> np.ndarray:
    kind = _classify_voice_tensor_names(store.names())
    if kind == VoiceFileKind.MODEL_STATE:
        raise SafetensorsError(
            "safetensors: voice file contains upstream model state, not a legacy "
            "audio_prompt embedding"
        )
    names = store.names()
    if not names:
        raise SafetensorsError("safetensors: no tensors found")
    name = "audio_prompt" if store.has("audio_prompt") else names[0]
    return _normalize_voice_embedding(store.tensor_f32(name))


def load_voice_embedding(path: str | os.PathLike) -> np.ndarray:
    """Load a legacy voice embedding as float32 ``[1, T, D]`` (reader.go:69-90)."""
    return _load_voice_embedding_from_store(open_store(path))


def load_voice_embedding_from_bytes(data: bytes) -> np.ndarray:
    return _load_voice_embedding_from_store(open_store_from_bytes(data))


def _load_voice_model_state_from_store(store: Store) -> VoiceModelState:
    kind = _classify_voice_tensor_names(store.names())
    if kind != VoiceFileKind.MODEL_STATE:
        raise SafetensorsError(
            f"safetensors: voice file kind {kind!r} is not upstream model state"
        )
    state = VoiceModelState()
    for name in store.names():
        slash = name.rfind("/")
        if slash <= 0 or slash == len(name) - 1:
            raise SafetensorsError(f"safetensors: invalid model-state tensor name {name!r}")
        module_name, tensor_key = name[:slash], name[slash + 1 :]
        arr = store.tensor_f32(name)
        if tensor_key == "current_end":
            # Legacy translation: offset := first dim of the current_end tensor
            # (reader.go:273-287).
            tensor_key = "offset"
            arr = np.array([float(arr.shape[0] if arr.ndim else 0)], dtype=np.float32)
        state.modules.setdefault(module_name, {})[tensor_key] = arr
    return state


def load_voice_model_state(path: str | os.PathLike) -> VoiceModelState:
    return _load_voice_model_state_from_store(open_store(path))


def load_voice_model_state_from_bytes(data: bytes) -> VoiceModelState:
    return _load_voice_model_state_from_store(open_store_from_bytes(data))
