"""Instrument the batcher engine loop phases on the real chip: where does
streaming-block time go? (r2 follow-up to the 2.4x streaming aggregate.)"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel import batching
from go_pocket_tts_tpu.runtime import GenerateConfig
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)

rng = np.random.RandomState(7)
n_bins = model.params["flow_lm"]["conditioner_embed"].shape[0]
tokens = list(rng.randint(0, int(n_bins) - 1, size=27))
cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=138)

b = batching.ContinuousBatcher(
    model, slots=8, prompt_capacity=64, max_frames=160,
    dtype=jnp.bfloat16, seed=42, steps_per_sync=16,
)

# Wrap the engine phases with timers.
phase_times = {}


def wrap(name, fn):
    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        phase_times.setdefault(name, []).append(time.perf_counter() - t0)
        return out
    return inner


b._admit = wrap("admit", b._admit)
b._fetch_flags = wrap("fetch_flags", b._fetch_flags)
b._emit_streams = wrap("emit_host_distribute", b._emit_streams)
b._harvest = wrap("harvest", b._harvest)

batching._batched_ar_multi_step = wrap("ar_dispatch", batching._batched_ar_multi_step)
batching._batched_stream_decode = wrap("decode_dispatch", batching._batched_stream_decode)
import jax as _j
batching.jax.device_get = wrap("device_get_sync", _j.device_get)

b.start()
try:
    # warm all programs (plain + streaming)
    b.generate(tokens, cfg, timeout=600)
    list(b.submit_stream(tokens, cfg, timeout=600))
    phase_times.clear()

    t0 = time.perf_counter()
    streams = [b.submit_stream(tokens, cfg, timeout=600) for _ in range(8)]
    import threading

    totals = [0] * 8

    def drain(i, g):
        for blk in g:
            totals[i] += len(blk)

    ts = [threading.Thread(target=drain, args=(i, g)) for i, g in enumerate(streams)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    agg = sum(totals) / 24_000.0 / wall
    print(f"8 streaming reqs: wall={wall:.2f}s aggregate={agg:.1f}x")
finally:
    b.stop()

for name, vals in sorted(phase_times.items()):
    v = np.array(vals) * 1e3
    print(
        f"{name:14s} n={len(v):4d} total={v.sum():8.1f}ms mean={v.mean():7.2f}ms "
        f"p90={np.percentile(v, 90):7.2f}ms max={v.max():8.1f}ms"
    )
