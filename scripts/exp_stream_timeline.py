"""Per-block timeline of a warm 8-stream wave: when does each engine phase
run and how long does each block sync wait? (r3 streaming TTFA regression.)"""

from __future__ import annotations

import os
import sys
import threading
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

events = []
record = False
T0 = [0.0]


def wrap(name, fn):
    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        t1 = time.perf_counter()
        if record:
            events.append((t0 - T0[0], t1 - T0[0], name))
        return out
    return inner


b._admit = wrap("admit", b._admit)
b._harvest = wrap("harvest", b._harvest)
b._resolve_block = wrap("RESOLVE", b._resolve_block)
batching._batched_ar_multi_step = wrap("ar_disp", batching._batched_ar_multi_step)
batching._batched_stream_decode = wrap("dec_disp", batching._batched_stream_decode)
batching._harvest_decode_pcm16 = wrap("harv_dec", batching._harvest_decode_pcm16)

b.start()


def wave():
    t0 = time.perf_counter()
    T0[0] = t0
    ttfas = [None] * 8
    totals = [0] * 8

    def drain(i, g):
        for blk in g:
            if ttfas[i] is None:
                ttfas[i] = time.perf_counter() - t0
                if record:
                    events.append((ttfas[i], ttfas[i], f"FIRST_PCM[{i}]"))
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
    print(f"wave: wall={wall*1e3:.0f}ms agg={agg:.1f}x ttfa p50={srt[4]*1e3:.0f}ms", flush=True)


try:
    wave()  # compile/warm
    wave()  # settle
    record = True
    wave()
finally:
    record = False
    b.stop()

for s, e, name in sorted(events):
    print(f"  {s*1e3:8.1f} -> {e*1e3:8.1f}  ({(e-s)*1e3:7.1f}ms)  {name}")
