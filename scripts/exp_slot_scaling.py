"""Aggregate throughput vs slot count (8/16/32), int8 weights+KV, k=64.

VERDICT r2 weak #1: slot scaling beyond 16 was unmeasured. Run on the real
chip AFTER `python bench.py` has warmed /tmp/jax_comp_cache; each new slot
count still compiles its own program variants (first run pays them).

    SLOTS_LIST=8,16,32 Q=1 K=64 python scripts/exp_slot_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("POCKETTTS_EXP_SMOKE"):
    # CPU crash-smoke (sitecustomize ignores JAX_PLATFORMS — must pin via
    # config before backend init). Pair with ARCH=tiny SLOTS_LIST=2 K=8.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel.batching import ContinuousBatcher
from go_pocket_tts_tpu.runtime import GenerateConfig
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

QUANT = os.environ.get("Q", "1") != "0"
K = int(os.environ.get("K", "64"))
SLOTS_LIST = [int(x) for x in os.environ.get("SLOTS_LIST", "8,16,32").split(",")]

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

for slots in SLOTS_LIST:
    b = ContinuousBatcher(
        model, slots=slots, prompt_capacity=64, max_frames=160,
        dtype=jnp.bfloat16, seed=42, steps_per_sync=K,
        quantize=QUANT, kv_quantize=QUANT,
    )
    b.start()
    try:
        n_req = 2 * slots
        # warm wave (compiles)
        t0 = time.perf_counter()
        futs = [b.submit(tokens, cfg) for _ in range(n_req)]
        for f in futs:
            f.result(timeout=900)
        warm_wall = time.perf_counter() - t0

        aggs = []
        for _trial in range(3):
            t0 = time.perf_counter()
            futs = [b.submit(tokens, cfg) for _ in range(n_req)]
            total = sum(len(f.result(timeout=900)) for f in futs)
            wall = time.perf_counter() - t0
            aggs.append(total / 24_000.0 / wall)
        aggs.sort()
        print(
            f"slots={slots:3d} reqs={n_req:3d} k={K} int8={QUANT}: "
            f"aggregate median={aggs[1]:.1f}x (runs {['%.1f' % a for a in aggs]}), "
            f"warm-wave wall {warm_wall:.1f}s"
        )
    finally:
        b.stop()
