"""Isolate the batched AR block's device cost (r2: is the batched step at
roofline like the single-lane while_loop, or off it?).

Times _batched_ar_multi_step alone (warm, donated chain) for K steps at
batch=SLOTS, then differencing K=16 vs K=64 to split fixed dispatch overhead
from per-step cost. Compare with the single-lane loop's 0.22 ms/step."""

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

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import flow_transformer as ftr
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel.batching import _batched_ar_multi_step
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = 8
CAPACITY = 224
MAXF = 176

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
params = model.params["flow_lm"]
cfg = model.config.flow_lm
tcfg = cfg.transformer
L = cfg.latent_dim


def fresh_state():
    cache_shape = (tcfg.num_layers, SLOTS, tcfg.num_heads, CAPACITY, tcfg.head_dim)
    cache = {
        "k": jnp.zeros(cache_shape, jnp.bfloat16),
        "v": jnp.zeros(cache_shape, jnp.bfloat16),
        "offset": jnp.zeros((SLOTS,), jnp.int32),
    }
    return {
        "cache": cache,
        "key": jax.random.PRNGKey(0),
        "frame": jnp.full((SLOTS, 1, L), jnp.nan, jnp.bfloat16),
        "frames": jnp.zeros((SLOTS, MAXF, L), jnp.bfloat16),
        "n_frames": jnp.zeros((SLOTS,), jnp.int32),
        "countdown": jnp.full((SLOTS,), -1, jnp.int32),
        "done": jnp.zeros((SLOTS,), bool),
        "active": jnp.ones((SLOTS,), bool),
        "max_steps": jnp.full((SLOTS,), 10_000, jnp.int32),
        "eos_threshold": jnp.full((SLOTS,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((SLOTS,), 3, jnp.int32),
        "sigma": jnp.full((SLOTS,), 0.84, jnp.float32),
    }


def run_blocks(k: int, n_blocks: int) -> float:
    """Wall seconds for n_blocks donated-chain blocks of k steps (excl. final
    fetch). Noise is drawn in-program off state["key"] (post-r3 API)."""
    state = fresh_state()
    # warm
    state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    jax.block_until_ready(state["n_frames"])

    state = fresh_state()
    jax.device_get(state["n_frames"])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    # A real data fetch of a compute-dependent output (block_until_ready on a
    # tiny leaf has measured unreliably early through the axon tunnel).
    nf, wsum = jax.device_get((n, w.sum()))
    assert int(nf[0]) > 0, nf
    return time.perf_counter() - t0


for k in (16, 64):
    walls = [run_blocks(k, 8) for _ in range(3)]
    best = min(walls)
    print(f"k={k}: 8 blocks best={best*1e3:.1f}ms -> {best/8*1e3:.2f}ms/block")

# differencing: per-step = (t64 - t16) / (64-16) per block
t16 = min(run_blocks(16, 8) for _ in range(3)) / 8
t64 = min(run_blocks(64, 8) for _ in range(3)) / 8
per_step = (t64 - t16) / 48
print(f"per-step (batch {SLOTS}): {per_step*1e3:.3f} ms  fixed/block: {(t16 - 16*per_step)*1e3:.2f} ms")
