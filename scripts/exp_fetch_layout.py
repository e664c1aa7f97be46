"""Why do PCM harvest fetches move ~7 MB/s when raw 1-D fetches do 21-30?

r5 burst profile: `drain_harvest` fetches ~4.2 MB of int16 PCM in ~600 ms
(~7 MB/s) while a 1-D int16 iota of the same size fetches in 131-190 ms
(21-30 MB/s) in the same tunnel regime. If the gap is the ARRAY LAYOUT
(the harvest fetches `pcm[:N]` of a [N, 1, T*1920] int16 array — sliced,
3-D, lane-dim huge) rather than the bytes, a device-side flatten/relayout
before the fetch is nearly free and would lift the batch-aggregate ceiling
(the PCM transfer is ~83% of a 16-request wave wall).

Times device_get for the same ~4.2 MB payload in different shapes/paths:

- 1d-iota       — jax.lax.iota int16 [N*T]                (the fast probe)
- 3d-computed   — int16 [8, 1, T] from a device op        (the harvest shape)
- 3d-sliced     — same, fetched as x[:8] like the drainer does
- 3d-asarray    — np.asarray(x[:8]) (the exact drainer call)
- flat-computed — the same values device-reshaped to [8*T] before fetch
- f32-computed  — [8, 1, T] float32 (is int16 itself the slow path?)

Run on the real chip: ``python scripts/exp_fetch_layout.py``.
CPU crash-smoke: ``POCKETTTS_EXP_SMOKE=1 REPS=1 python ...``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("POCKETTTS_EXP_SMOKE"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "5"))
N, T = 8, 138 * 1920  # the harvest-decode PCM shape at frame bucket 138


def timed(name, make, fetch):
    """Fresh device buffer per rep: JAX caches ``_npy_value`` on a fetched
    array (and ``x[:N]`` of an ``[N, ...]`` array IS ``x``), so re-fetching
    one buffer measures the client cache, not the tunnel — the first cut of
    this experiment read 300+ GB/s that way."""
    jax.block_until_ready(make(0))  # compile
    fetch(make(1))  # wake the fetch path
    best = float("inf")
    nbytes = None
    for i in range(REPS):
        x = make(2 + i)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out = fetch(x)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        nbytes = np.asarray(out).nbytes
    print(
        f"{name:14s} {best*1e3:7.1f} ms  {nbytes/1e6/best:6.1f} MB/s  ({nbytes/1e6:.1f} MB)",
        flush=True,
    )


i16 = jnp.int16
HALF = N // 2  # a PROPER slice (x[:4] of [8,...]) so slicing is not a no-op
timed(
    "1d-iota",
    jax.jit(lambda s: jax.lax.iota(i16, N * T) + s.astype(i16)),
    jax.device_get,
)


def make3d_fn():
    return jax.jit(lambda s: (jax.lax.iota(i16, N * T) + s.astype(i16)).reshape(N, 1, T))


timed("3d-computed", make3d_fn(), jax.device_get)
timed("3d-sliced", make3d_fn(), lambda x: jax.device_get(x[:HALF]))
timed("3d-asarray", make3d_fn(), lambda x: np.asarray(x[:HALF]))
timed(
    "flat-computed",
    jax.jit(lambda s: ((jax.lax.iota(i16, N * T) + s.astype(i16)).reshape(N, 1, T)).reshape(-1)),
    jax.device_get,
)
timed(
    "f32-computed",
    jax.jit(lambda s: (jax.lax.iota(jnp.float32, N * T) + s).reshape(N, 1, T)),
    jax.device_get,
)
