"""Batched AR step cost vs quantization config (r3: does int8 KV pay?).

PERF.md r3 anatomy: at batch 8 the step reads ~90 MB of weights (shared,
int8 halves it to ~45) and a KV stream that grows toward ~64 MB/step at
capacity 224 bf16 — int8 KV halves THAT. This script times
``_batched_ar_multi_step`` for the four configs
(bf16 / int8-weights / int8-KV / both) with the K=16 vs K=64 differencing
methodology from ``exp_batch_step.py`` (fixed dispatch overhead cancels;
see PERF.md "Methodology").

Run on the real chip: ``python scripts/exp_kv_step.py`` (no env pinning).
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
from go_pocket_tts_tpu.models.quantize import quantize_model_params
from go_pocket_tts_tpu.parallel.batching import (
    _batched_ar_multi_step,
    make_batched_state,
)
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = 8
CAPACITY = 224
MAXF = 176

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
cfg = model.config.flow_lm
L = cfg.latent_dim

params_bf16 = model.params["flow_lm"]
params_int8 = quantize_model_params(model.params)["flow_lm"]

def fresh_state(kv_quantize: bool):
    st = make_batched_state(
        cfg, SLOTS, CAPACITY, MAXF, 64, jnp.bfloat16, kv_quantize=kv_quantize
    )
    # All lanes live forever: no EOS, no cap — pure step cost.
    return {
        **st,
        "active": jnp.ones((SLOTS,), bool),
        "max_steps": jnp.full((SLOTS,), 10_000, jnp.int32),
        "eos_threshold": jnp.full((SLOTS,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((SLOTS,), 3, jnp.int32),
        "sigma": jnp.full((SLOTS,), 0.84, jnp.float32),
    }


def run_blocks(params, kv_quantize: bool, k: int, n_blocks: int) -> float:
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


for name, params, kvq in (
    ("bf16", params_bf16, False),
    ("int8-weights", params_int8, False),
    ("int8-kv", params_bf16, True),
    ("int8-both", params_int8, True),
):
    t16 = min(run_blocks(params, kvq, 16, 8) for _ in range(3)) / 8
    t64 = min(run_blocks(params, kvq, 64, 8) for _ in range(3)) / 8
    per_step = (t64 - t16) / 48
    print(
        f"{name:13s} per-step (batch {SLOTS}): {per_step*1e3:.3f} ms  "
        f"fixed/block: {(t16 - 16*per_step)*1e3:.2f} ms",
        flush=True,
    )
