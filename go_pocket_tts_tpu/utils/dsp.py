"""Opt-in audio post-processing: peak normalize, DC block, fades.

Parity with `internal/audio/dsp.go:12-78` (applied by the `synth` command
behind flags, `cmd/pockettts/synth.go:361-390`):

- :func:`peak_normalize` — scale so the peak hits the target (default 0.95);
  no-op on silence
- :func:`dc_block` — 20 Hz biquad high-pass (Butterworth, matching the
  algo-dsp highpass the reference uses)
- :func:`fade_in` / :func:`fade_out` — linear fades over N milliseconds
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["peak_normalize", "dc_block", "fade_in", "fade_out"]


def peak_normalize(samples: np.ndarray, target: float = 0.95) -> np.ndarray:
    x = np.asarray(samples, dtype=np.float32)
    peak = float(np.max(np.abs(x))) if x.size else 0.0
    if peak <= 0.0 or target <= 0.0:
        return x.copy()
    return (x * (target / peak)).astype(np.float32)


def dc_block(samples: np.ndarray, sample_rate: int = 24_000, cutoff_hz: float = 20.0) -> np.ndarray:
    """Biquad high-pass (RBJ cookbook, Q=1/sqrt(2)) at ``cutoff_hz``."""
    x = np.asarray(samples, dtype=np.float32)
    if x.size == 0:
        return x.copy()
    w0 = 2.0 * math.pi * cutoff_hz / sample_rate
    cosw, sinw = math.cos(w0), math.sin(w0)
    q = 1.0 / math.sqrt(2.0)
    alpha = sinw / (2.0 * q)
    b0 = (1 + cosw) / 2
    b1 = -(1 + cosw)
    b2 = (1 + cosw) / 2
    a0 = 1 + alpha
    a1 = -2 * cosw
    a2 = 1 - alpha
    b = np.array([b0, b1, b2], dtype=np.float64) / a0
    a = np.array([a1, a2], dtype=np.float64) / a0

    y = np.empty_like(x, dtype=np.float64)
    x64 = x.astype(np.float64)
    x1 = x2 = y1 = y2 = 0.0
    for i in range(len(x64)):
        yi = b[0] * x64[i] + b[1] * x1 + b[2] * x2 - a[0] * y1 - a[1] * y2
        x2, x1 = x1, x64[i]
        y2, y1 = y1, yi
        y[i] = yi
    return y.astype(np.float32)


def fade_in(samples: np.ndarray, sample_rate: int = 24_000, ms: float = 10.0) -> np.ndarray:
    x = np.asarray(samples, dtype=np.float32).copy()
    n = min(len(x), int(sample_rate * ms / 1000.0))
    if n > 0:
        x[:n] *= np.linspace(0.0, 1.0, n, endpoint=False, dtype=np.float32)
    return x


def fade_out(samples: np.ndarray, sample_rate: int = 24_000, ms: float = 10.0) -> np.ndarray:
    x = np.asarray(samples, dtype=np.float32).copy()
    n = min(len(x), int(sample_rate * ms / 1000.0))
    if n > 0:
        x[len(x) - n :] *= np.linspace(1.0, 0.0, n, dtype=np.float32)
    return x
