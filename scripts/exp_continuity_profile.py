"""Where does the continuity session's ~30% longform throughput gap go?

r5 hardware (config2, 520 tokens): plain per-chunk-reset loop 136.4x vs
94.1-95.5x with --continuity (capacity ladder 384/640/1024 already landed;
the gap was ~40% against a fixed 1024 capacity in r4). The static-shape KV
read model predicts only ~+10%: the AR step reads all `capacity` positions
(masked), weights dominate (~180 MB bf16 vs ~25 KB x capacity KV), and the
ladder keeps capacity near the session's used bound.

This script times the SAME chunk sequence three ways in one process:

- plain        — generate_audio per chunk (per-chunk reset, the 136x path)
- session      — generate_audio_session carrying ContinuationState (ladder)
- session-1024 — session with the ladder disabled via session_capacity
                 forcing max from chunk 1 (the r4 regime, for scale)

and prints per-chunk walls + the capacity each chunk ran at, so the gap
decomposes into (a) capacity-proportional AR cost, (b) ladder-growth
dispatches, (c) anything per-chunk-constant (extra syncs/fetches).

Run on the real chip: ``python scripts/exp_continuity_profile.py``.
CPU crash-smoke: ``POCKETTTS_EXP_SMOKE=1 ARCH=tiny CHUNKS=2 REPS=1 python ...``
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
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

CHUNKS = int(os.environ.get("CHUNKS", "6"))
REPS = int(os.environ.get("REPS", "3"))

arch = (
    synthetic.tiny_arch() if os.environ.get("ARCH") == "tiny" else synthetic.real_arch()
)
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
rt = TPURuntime(model, dtype=jnp.bfloat16, seed=11)
# The capacity-proportional cost vastly exceeds the KV-read roofline
# (first run: +0.35 ms/step at C=1024 vs 224 where 20 MB/step ≈ 25 µs), so
# the XLA attention op is the suspect — A/B the fused Pallas decode
# attention (rope+append+attention in one VMEM pass) on the same chunks.
rt_pallas = TPURuntime(model, dtype=jnp.bfloat16, seed=11, pallas=True)

n_bins = int(model.params["flow_lm"]["conditioner_embed"].shape[0])
# ~30-token chunks, the config2 chunker's typical output for 60-char budget.
chunk_tokens = [[(7 * i + j) % (n_bins - 1) for j in range(30)] for i in range(CHUNKS)]
cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=138)


def run_plain(runtime=None):
    runtime = runtime or rt
    walls = []
    for toks in chunk_tokens:
        t0 = time.perf_counter()
        audio = runtime.generate_audio(toks, cfg)
        walls.append(time.perf_counter() - t0)
    return walls, len(audio)


def run_session(fixed: int = 0, runtime=None):
    runtime = runtime or rt
    walls, caps = [], []
    cont = None
    orig = runtime._session_ladder
    if fixed:  # emulate the pre-ladder r4 regime: max capacity from chunk 1
        runtime._session_ladder = lambda max_capacity: (fixed,)
    try:
        for toks in chunk_tokens:
            t0 = time.perf_counter()
            audio, cont = runtime.generate_audio_session(toks, cfg, cont)
            walls.append(time.perf_counter() - t0)
            caps.append(cont.capacity)
    finally:
        runtime._session_ladder = orig
    return walls, caps


def fmt(walls):
    return " ".join(f"{w*1e3:6.1f}" for w in walls)


# Compile everything first (all ladder rungs + plain, both backends). The
# pallas arms are best-effort: if the kernel fails to compile on this
# backend the XLA arms must still report.
run_plain()
run_session()
run_session(1024)
pallas_ok = True
try:
    run_plain(rt_pallas)
    run_session(runtime=rt_pallas)
    run_session(1024, runtime=rt_pallas)
except Exception as exc:  # noqa: BLE001 - report and continue
    pallas_ok = False
    print(f"pallas arms unavailable: {type(exc).__name__}: {exc}", flush=True)

arms = [
    ("plain", run_plain),
    ("session-ladder", run_session),
    ("session-1024", lambda: run_session(1024)),
]
if pallas_ok:
    arms += [
        ("plain-pallas", lambda: run_plain(rt_pallas)),
        ("ladder-pallas", lambda: run_session(runtime=rt_pallas)),
        ("1024-pallas", lambda: run_session(1024, runtime=rt_pallas)),
    ]

for name, fn in arms:
    best = None
    caps = None
    for _ in range(REPS):
        out = fn()
        walls = out[0]
        if best is None or sum(walls) < sum(best):
            best = walls
            caps = out[1] if name != "plain" else None
    total = sum(best)
    print(
        f"{name:15s} total {total*1e3:7.1f} ms  per-chunk [{fmt(best)}]"
        + (f"  capacities {caps}" if isinstance(caps, list) else ""),
        flush=True,
    )
