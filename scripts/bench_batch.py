"""Batch-serving benchmark: aggregate ×-real-time through the continuous
batcher on the real chip (PERF.md "Batch serving" numbers).

Usage:  python scripts/bench_batch.py [slots] [requests] [steps_per_sync]
"""

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
from go_pocket_tts_tpu.parallel.batching import ContinuousBatcher
from go_pocket_tts_tpu.runtime import GenerateConfig
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REQUESTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
FRAMES = 138  # the 20-word workload

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)

rng = np.random.RandomState(7)
n_bins = model.params["flow_lm"]["conditioner_embed"].shape[0]
tokens = list(rng.randint(0, int(n_bins) - 1, size=27))
cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=FRAMES)


def _burst(b, streaming: bool, n_requests: int) -> float:
    """Submit a burst, drain it, return aggregate ×-real-time."""
    t0 = time.perf_counter()
    if streaming:
        streams = [b.submit_stream(tokens, cfg, timeout=600) for _ in range(n_requests)]
        total = 0.0
        import threading

        lock = threading.Lock()

        def drain(g):
            nonlocal total
            s = sum(len(blk) for blk in g)
            with lock:
                total += s

        ts = [threading.Thread(target=drain, args=(g,)) for g in streams]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    else:
        futs = [b.submit(tokens, cfg) for _ in range(n_requests)]
        total = sum(len(f.result(timeout=600)) for f in futs)
    wall = time.perf_counter() - t0
    return (total / 24_000.0) / wall


def run(streaming: bool, n_requests: int):
    b = ContinuousBatcher(
        model, slots=SLOTS, prompt_capacity=64, max_frames=160,
        dtype=jnp.bfloat16, seed=42, steps_per_sync=K,
    )
    b.start()
    try:
        # Warm run compiles every program the measured burst will hit
        # (burst-size batched prefill, streaming decode, harvest decodes);
        # one-time compiles through the remote tunnel otherwise dominate.
        cold = _burst(b, streaming, n_requests)
        warm = _burst(b, streaming, n_requests)
        return cold, warm
    finally:
        b.stop()


kind = f"{REQUESTS} reqs / {SLOTS} slots / k={K}"
cold, warm = run(False, REQUESTS)
print(f"plain   {kind}: {warm:.1f}x aggregate (cold {cold:.1f}x)")
cold, warm = run(True, SLOTS)
print(f"stream  {SLOTS} reqs / {SLOTS} slots / k={K}: {warm:.1f}x aggregate (cold {cold:.1f}x)")
