"""Aggregate throughput vs steps_per_sync (r3: the block-sync pacing lever).

PERF.md r3: the batched AR block costs ~9 ms device at k=16 int8-both, but
each block ends in ONE host sync that costs the ~27-47 ms tunnel RTT — the
loop is RTT-paced, so aggregate throughput ≈ k frames per RTT. Raising k
amortizes the sync (admission/streaming latency grows with k; plain
throughput configs don't care). This sweeps k at 8 slots / 16 requests with
the measured-best quantization config (int8 weights + int8 KV).

Run on the real chip AFTER bench.py has warmed /tmp/jax_comp_cache:
``python scripts/exp_sync_sweep.py [k ...]`` (default 16 32 64).
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

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel.batching import ContinuousBatcher
from go_pocket_tts_tpu.runtime import GenerateConfig
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SR = 24_000
SLOTS = 8
N_REQ = 16
TOKENS = list(range(3, 30))  # 27 tokens = the 20-word headline utterance

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)

cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=138)


def burst(b) -> float:
    t0 = time.perf_counter()
    futs = [b.submit(TOKENS, cfg) for _ in range(N_REQ)]
    total = sum(len(f.result(timeout=1800)) for f in futs)
    return (total / SR) / (time.perf_counter() - t0)


QUANT = os.environ.get("SWEEP_QUANT", "1") != "0"
KVQ = os.environ.get("SWEEP_KVQ", "1") != "0"

for k in [int(a) for a in sys.argv[1:]] or (16, 32, 64):
    b = ContinuousBatcher(
        model,
        slots=SLOTS,
        prompt_capacity=64,
        max_frames=160,
        dtype=jnp.bfloat16,
        seed=42,
        steps_per_sync=k,
        quantize=QUANT,
        kv_quantize=KVQ,
    )
    b.start()
    try:
        burst(b)  # compile/warm wave
        agg = max(burst(b) for _ in range(2))
    finally:
        b.stop()
    print(
        f"k={k:3d} quant={QUANT} kvq={KVQ}: aggregate {agg:.1f}x real-time "
        f"({N_REQ} reqs / {SLOTS} slots)",
        flush=True,
    )
