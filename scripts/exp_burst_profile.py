"""Where does a plain 16-request burst's wall go? (r3: aggregate is 149x at
8 slots / k=64 int8+KV, but the RTT-pacing arithmetic predicts ~2x more —
5 AR blocks + 2 prefill waves + 2 harvest decodes + 8 MB PCM should be
~0.5 s, measured ~1.2 s.)

Instruments the engine-loop phases host-side (no extra device syncs) during
the bench.py config4 workload: 16 plain requests, 8 slots, steps_per_sync
64. Run on the real chip after `python bench.py` has warmed the cache.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("POCKETTTS_EXP_SMOKE"):
    # CPU crash-smoke (sitecustomize ignores JAX_PLATFORMS — must pin via
    # config before backend init). Pair with ARCH=tiny SLOTS=2 N_REQ=4 K=8.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import PocketTTSModel, load_model_from_store
from go_pocket_tts_tpu.models.quantize import quantize_model_params
from go_pocket_tts_tpu.parallel import batching
from go_pocket_tts_tpu.runtime import GenerateConfig
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

QUANT = os.environ.get("Q", "1") != "0"  # int8 weights+KV (the batch config)
K = int(os.environ.get("K", "64"))
SLOTS = int(os.environ.get("SLOTS", "8"))
N_REQ = int(os.environ.get("N_REQ", str(2 * SLOTS)))

arch = (
    synthetic.tiny_arch()
    if os.environ.get("ARCH") == "tiny"
    else synthetic.real_arch()
)
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)

rng = np.random.RandomState(7)
n_bins = model.params["flow_lm"]["conditioner_embed"].shape[0]
tokens = list(rng.randint(0, int(n_bins) - 1, size=27))
cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=138)

b = batching.ContinuousBatcher(
    model, slots=SLOTS, prompt_capacity=64, max_frames=160,
    dtype=jnp.bfloat16, seed=42, steps_per_sync=K,
    quantize=QUANT, kv_quantize=QUANT,
)

phase_times = {}
events = []  # (t, name) timeline


def wrap(name, fn):
    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        t1 = time.perf_counter()
        phase_times.setdefault(name, []).append(t1 - t0)
        events.append((t0, t1, name))
        return out
    return inner


b._admit = wrap("admit", b._admit)
b._harvest = wrap("harvest", b._harvest)
b._drain_harvest = wrap("drain_harvest(fetch)", b._drain_harvest)
b._resolve_block = wrap("resolve_block(sync)", b._resolve_block)
batching._batched_ar_multi_step = wrap("ar_dispatch", batching._batched_ar_multi_step)
batching._harvest_decode_pcm16 = wrap("harvest_decode", batching._harvest_decode_pcm16)

b.start()
try:
    # Warm wave. This is where the r4 session timed out (600 s, cold
    # persistent cache → compile storm through the remote-compile tunnel):
    # log per-future progress so a recurrence is diagnosable from the
    # output alone instead of a bare TimeoutError.
    t_warm = time.perf_counter()
    futs = [b.submit(tokens, cfg) for _ in range(N_REQ)]
    for i, f in enumerate(futs):
        f.result(timeout=900)
        print(
            f"warm {i + 1}/{N_REQ} at {time.perf_counter() - t_warm:.1f}s",
            flush=True,
        )
    print(f"warm wave wall: {time.perf_counter() - t_warm:.1f}s", flush=True)
    phase_times.clear()
    events.clear()

    for trial in range(3):
        phase_times.clear()
        events.clear()
        t0 = time.perf_counter()
        futs = [b.submit(tokens, cfg) for _ in range(N_REQ)]
        done_at = [None] * N_REQ
        for i, f in enumerate(futs):
            f.add_done_callback(
                lambda _f, i=i: done_at.__setitem__(i, time.perf_counter() - t0)
            )
        total = sum(len(f.result(timeout=600)) for f in futs)
        wall = time.perf_counter() - t0
        agg = total / 24_000.0 / wall
        # result() waiters are released BEFORE done callbacks run; wait for
        # the callbacks so the tail samples (the stat's whole point) land.
        deadline = time.perf_counter() + 1.0
        while any(x is None for x in done_at) and time.perf_counter() < deadline:
            time.sleep(0.001)
        lat = sorted(x for x in done_at if x is not None)
        print(f"\ntrial {trial}: {N_REQ} reqs wall={wall*1e3:.0f}ms aggregate={agg:.1f}x")
        if lat:
            print(
                f"  delivery latency ms: p50={lat[len(lat)//2]*1e3:.0f} "
                f"p90={lat[int(len(lat)*0.9)]*1e3:.0f} max={lat[-1]*1e3:.0f}"
            )
        for name, vals in sorted(phase_times.items()):
            v = np.array(vals) * 1e3
            print(
                f"  {name:20s} n={len(v):3d} total={v.sum():7.1f}ms "
                f"mean={v.mean():6.2f} max={v.max():7.1f}"
            )
        # Timeline gaps: time not inside any instrumented phase = loop idle /
        # futures / GIL / dispatch-side stalls.
        ev = sorted(events)
        covered = 0.0
        last = t0
        for s, e, _n in ev:
            s = max(s, last)
            if e > s:
                covered += e - s
                last = e
        print(f"  uncovered loop time: {(wall - covered)*1e3:.0f}ms of {wall*1e3:.0f}ms")
finally:
    b.stop()
