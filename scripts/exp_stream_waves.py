"""Which program compiles (or stalls) in wave N of repeated 8-stream waves?

bench.py's streaming_under_load measures wave 3 of identical waves and still
sees a uniform ~2.3 s TTFA stall (r3, post in-program-noise). jax_log_compiles
with wall timestamps pinpoints whether a compile fires inside a measured wave
and which phase eats the wall when none does.
"""

from __future__ import annotations

import logging
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_log_compiles", True)

logging.basicConfig(
    level=logging.WARNING,
    format="%(relativeCreated)8.0fms %(name)s %(message)s",
)
logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.WARNING)

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
b.start()


def wave(n):
    t0 = time.perf_counter()
    ttfas = [None] * 8
    totals = [0] * 8

    def drain(i, g):
        for blk in g:
            if ttfas[i] is None:
                ttfas[i] = time.perf_counter() - t0
            totals[i] += len(blk)

    gens = [b.submit_stream(tokens, cfg, timeout=600) for _ in range(8)]
    ts = [threading.Thread(target=drain, args=(i, g)) for i, g in enumerate(gens)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    agg = sum(totals) / 24_000.0 / wall
    srt = sorted(x for x in ttfas if x is not None)
    print(
        f"[{time.perf_counter():.3f}] wave {n}: wall={wall*1e3:.0f}ms agg={agg:.1f}x "
        f"ttfa p50={srt[len(srt)//2]*1e3:.0f}ms min={srt[0]*1e3:.0f} max={srt[-1]*1e3:.0f}",
        flush=True,
    )


try:
    for i in range(4):
        print(f"[{time.perf_counter():.3f}] --- wave {i} starting", flush=True)
        wave(i)
finally:
    b.stop()
