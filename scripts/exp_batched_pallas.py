"""Batched AR step: fused Pallas decode-attention A/B (r5).

The single-path fused kernel won 10% whole-request on hardware and is now
default-on; this measures its batched sibling
(`ops/pallas/batched_decode_attention.py`) inside the full
``_batched_ar_multi_step`` via the K=16/64 differencing methodology
(device-bound, tunnel-immune — PERF.md "Methodology").

Arms: {bf16, int8-weights+int8-KV} × {XLA chain, Pallas kernel}. The
decision rule (pre-registered): default the batched kernel ON for the arms
where it is ≥3% faster per step; keep XLA where it is slower.

Run on the real chip: ``python scripts/exp_batched_pallas.py``.
CPU crash-smoke: ``POCKETTTS_EXP_SMOKE=1 ARCH=tiny python ...``
"""

from __future__ import annotations

import dataclasses
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
from go_pocket_tts_tpu.models.quantize import quantize_model_params
from go_pocket_tts_tpu.parallel.batching import (
    _batched_ar_multi_step,
    make_batched_state,
)
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = 8
CAPACITY = 224
MAXF = 176
BLOCKS = 2 if SMOKE else 8
REPS = 1 if SMOKE else 3
K_LO, K_HI = (4, 8) if SMOKE else (16, 64)

arch = (
    synthetic.tiny_arch() if os.environ.get("ARCH") == "tiny" else synthetic.real_arch()
)
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
cfg_xla = model.config.flow_lm
cfg_pallas = dataclasses.replace(
    cfg_xla, transformer=dataclasses.replace(cfg_xla.transformer, use_pallas=True)
)

params_bf16 = model.params["flow_lm"]
params_int8 = quantize_model_params(model.params)["flow_lm"]


def fresh_state(kv_quantize: bool):
    st = make_batched_state(
        cfg_xla, SLOTS, CAPACITY, MAXF, 64, jnp.bfloat16, kv_quantize=kv_quantize
    )
    return {
        **st,
        "active": jnp.ones((SLOTS,), bool),
        "max_steps": jnp.full((SLOTS,), 10_000, jnp.int32),
        "eos_threshold": jnp.full((SLOTS,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((SLOTS,), 3, jnp.int32),
        "sigma": jnp.full((SLOTS,), 0.84, jnp.float32),
    }


def run_blocks(params, cfg, kv_quantize: bool, k: int, n_blocks: int) -> float:
    state = fresh_state(kv_quantize)
    state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    jax.block_until_ready(state["n_frames"])

    state = fresh_state(kv_quantize)
    jax.device_get(state["n_frames"])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    nf, wsum = jax.device_get((n, w.sum()))
    assert int(nf[0]) > 0, nf
    return time.perf_counter() - t0


for name, params, cfg, kvq in (
    ("bf16-xla", params_bf16, cfg_xla, False),
    ("bf16-pallas", params_bf16, cfg_pallas, False),
    ("int8kv-xla", params_int8, cfg_xla, True),
    ("int8kv-pallas", params_int8, cfg_pallas, True),
):
    t_lo = min(run_blocks(params, cfg, kvq, K_LO, BLOCKS) for _ in range(REPS)) / BLOCKS
    t_hi = min(run_blocks(params, cfg, kvq, K_HI, BLOCKS) for _ in range(REPS)) / BLOCKS
    per_step = (t_hi - t_lo) / (K_HI - K_LO)
    print(
        f"{name:14s} per-step (batch {SLOTS}): {per_step*1e3:.3f} ms  "
        f"fixed/block: {(t_lo - K_LO*per_step)*1e3:.2f} ms",
        flush=True,
    )
