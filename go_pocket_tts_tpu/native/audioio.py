"""ctypes loader for the native audioio kernels (with on-demand build)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libaudioio.so")

_lock = threading.Lock()
_loaded: Optional["_AudioIO"] = None
_load_failed = False


class _AudioIO:
    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib
        lib.pcm16_from_f32.restype = ctypes.c_size_t
        lib.pcm16_from_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_size_t,
        ]
        lib.peak_abs_f32.restype = ctypes.c_float
        lib.peak_abs_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        lib.f32_from_pcm16.restype = ctypes.c_size_t
        lib.f32_from_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t,
        ]
        lib.biquad_df1_f32.restype = ctypes.c_size_t
        lib.biquad_df1_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t,
        ] + [ctypes.c_double] * 5
        lib.crc16_8005.restype = ctypes.c_uint16
        lib.crc16_8005.argtypes = [ctypes.c_char_p, ctypes.c_size_t]

    def pcm16_from_f32(self, samples: np.ndarray) -> bytes:
        src = np.ascontiguousarray(samples, dtype=np.float32)
        out = np.empty(src.size, dtype=np.int16)
        self._lib.pcm16_from_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            src.size,
        )
        return out.tobytes()

    def peak_abs(self, samples: np.ndarray) -> float:
        src = np.ascontiguousarray(samples, dtype=np.float32)
        return float(
            self._lib.peak_abs_f32(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), src.size)
        )

    def f32_from_pcm16(self, pcm: np.ndarray) -> np.ndarray:
        src = np.ascontiguousarray(pcm, dtype=np.int16)
        out = np.empty(src.size, dtype=np.float32)
        self._lib.f32_from_pcm16(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            src.size,
        )
        return out

    def crc16_8005(self, data: bytes) -> int:
        return int(self._lib.crc16_8005(data, len(data)))

    def biquad_df1(
        self, samples: np.ndarray, b0: float, b1: float, b2: float, a1: float, a2: float
    ) -> np.ndarray:
        src = np.ascontiguousarray(samples, dtype=np.float32)
        out = np.empty(src.size, dtype=np.float32)
        self._lib.biquad_df1_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            src.size,
            b0, b1, b2, a1, a2,
        )
        return out


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[_AudioIO]:
    """Load (building if needed) the native library; None on failure."""
    global _loaded, _load_failed
    if _loaded is not None:
        return _loaded
    if _load_failed:
        return None
    with _lock:
        if _loaded is not None:
            return _loaded
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _load_failed = True
            return None
        try:
            _loaded = _AudioIO(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None
        except AttributeError:
            # Stale .so from an older source revision missing a newer symbol;
            # rebuild once (make tracks the .cpp dependency) and retry.
            if _try_build():
                try:
                    _loaded = _AudioIO(ctypes.CDLL(_LIB_PATH))
                    return _loaded
                except (OSError, AttributeError):
                    pass
            _load_failed = True
            return None
        return _loaded
