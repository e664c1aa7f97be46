"""Interleaved A/B for the decode-attention Pallas default (r5).

The driver7 A/B (bench.py with POCKETTTS_PALLAS=0/1, sequential runs)
showed bf16 wins everywhere (headline 118.6 -> 128.8/127.5, longform
137 -> 149/151, continuity 96.5 -> 118.7/110.3) but left two ambiguities
that sequential runs through a jittery tunnel cannot settle:

- config1 (fp32) read SLOWER with the kernel (73.5 -> 80.3/86.9 ms wall);
- streaming TTFA read worse (58.8 -> 69.2/93.9 ms p50) while the host
  load-average confound pointed the other way.

This script interleaves the arms rep-by-rep in ONE process (off, on,
off, on, ...) so tunnel drift hits both arms equally, and reports per-arm
medians for: bf16 single-utterance wall, streaming TTFA, fp32 single
short utterance wall (config1 shape), and a bf16 session chunk at
capacity 1024.

Decision rule (pre-registered): flip the auto-default ON for a
measurement iff its pallas arm median is >=3% faster; keep the XLA path
for any measurement where pallas is slower; TTFA must not regress >5%.

Run on the real chip: ``python scripts/exp_pallas_default.py``.
CPU crash-smoke: ``POCKETTTS_EXP_SMOKE=1 ARCH=tiny REPS=1 python ...``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

SMOKE = bool(os.environ.get("POCKETTTS_EXP_SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.runtime.streaming import stream_generate
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

REPS = int(os.environ.get("REPS", "7"))

arch = (
    synthetic.tiny_arch() if os.environ.get("ARCH") == "tiny" else synthetic.real_arch()
)
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)

TOKENS = list(range(2, 29))  # 27 tokens, the headline shape
SHORT = list(range(2, 8))  # config1's short utterance shape
STEPS = 8 if SMOKE else 138
SHORT_STEPS = 8 if SMOKE else 50
CFG = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=STEPS)
SHORT_CFG = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=SHORT_STEPS)

rts = {}
for name, kwargs in (
    ("bf16-xla", dict(dtype=jnp.bfloat16, pallas=False)),
    ("bf16-pallas", dict(dtype=jnp.bfloat16, pallas=True)),
    ("f32-xla", dict(dtype=jnp.float32, pallas=False)),
    ("f32-pallas", dict(dtype=jnp.float32, pallas=True)),
):
    rts[name] = TPURuntime(model, seed=3, **kwargs)


def wall_single(rt):
    t0 = time.perf_counter()
    rt.generate_audio(TOKENS, CFG)
    return time.perf_counter() - t0


def wall_short(rt):
    t0 = time.perf_counter()
    rt.generate_audio(SHORT, SHORT_CFG)
    return time.perf_counter() - t0


def ttfa(rt):
    t0 = time.perf_counter()
    gen = stream_generate(rt, TOKENS, CFG)
    next(gen)
    dt = time.perf_counter() - t0
    for _ in gen:
        pass
    return dt


def session_1024(rt):
    t0 = time.perf_counter()
    _, state = rt.generate_audio_session(TOKENS, CFG, None, session_capacity=1024)
    return time.perf_counter() - t0


MEASURES = [
    ("bf16-single", wall_single, "bf16-xla", "bf16-pallas"),
    ("ttfa", ttfa, "bf16-xla", "bf16-pallas"),
    ("f32-short", wall_short, "f32-xla", "f32-pallas"),
    ("session-1024", session_1024, "bf16-xla", "bf16-pallas"),
]

# Warm every program (compiles land in the persistent cache).
for name, fn, a, b in MEASURES:
    fn(rts[a])
    fn(rts[b])
    print(f"warm {name} ok", flush=True)

results = {name: {"xla": [], "pallas": []} for name, *_ in MEASURES}
for rep in range(REPS):
    for name, fn, a, b in MEASURES:
        results[name]["xla"].append(fn(rts[a]))
        results[name]["pallas"].append(fn(rts[b]))
    print(f"rep {rep + 1}/{REPS} done", flush=True)

for name, _, _, _ in MEASURES:
    xs = sorted(results[name]["xla"])
    ps = sorted(results[name]["pallas"])
    mx, mp = xs[len(xs) // 2], ps[len(ps) // 2]
    ratio = mp / mx if mx else float("inf")
    print(
        f"{name:14s} xla p50 {mx*1e3:7.1f} ms   pallas p50 {mp*1e3:7.1f} ms"
        f"   pallas/xla {ratio:.3f}",
        flush=True,
    )
