"""Settle INT4: batched AR step cost for int4 variants vs the int8 champion.

VERDICT r3 ask #2: INT4 grouped weights halve the dominant HBM stream vs
int8 (predicted ~0.18 ms/step vs the measured 0.238 int8+KV at batch 8) IF
the compiler keeps the s4 dequant fused with the matmul. Two XLA
formulations exist (models/params.py):

- ``split``   — per-group contractions, scale folded post-matmul (f32)
- ``dequant`` — one in-flight dequantized x.dtype operand, single dot

This script times ``_batched_ar_multi_step`` for int8+KV (baseline),
int4-split+KV, and int4-dequant+KV with the K=16 vs K=64 differencing
methodology (fixed dispatch overhead cancels; PERF.md "Methodology").

Decision rule (record the outcome in PERF.md and close ROADMAP's int4
entry): best int4 < 0.9x int8 step time → make 4-bit the documented
max-MFU batch config; neither variant beats int8 → move INT4 to the
measured-and-REJECTED list (keep the export path for its artifact-size
win; serving stays int8).

Run on the real chip: ``python scripts/exp_int4_step.py`` (no env pinning).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("POCKETTTS_EXP_SMOKE"):
    # CPU crash-smoke (the axon sitecustomize ignores JAX_PLATFORMS; this
    # config update must land before any backend init). Pair with
    # ARCH=tiny SLOTS=2 BLOCKS=2 REPS=1 for a fast run.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.models.params import set_int4_matmul_variant
from go_pocket_tts_tpu.models.quantize import quantize_model_params
from go_pocket_tts_tpu.parallel.batching import (
    _batched_ar_multi_step,
    make_batched_state,
)
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = int(os.environ.get("SLOTS", "8"))
CAPACITY = 224
MAXF = 176
BLOCKS = int(os.environ.get("BLOCKS", "8"))
REPS = int(os.environ.get("REPS", "3"))

arch = (
    synthetic.tiny_arch()
    if os.environ.get("ARCH") == "tiny"
    else synthetic.real_arch()
)
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
cfg = model.config.flow_lm

params_int8 = quantize_model_params(model.params, bits=8)["flow_lm"]
params_int4 = quantize_model_params(model.params, bits=4)["flow_lm"]

# Mixed trees for gap decomposition (r5: the int4 step is 0.35 ms vs int8's
# 0.228 while the transformer's four weight matmuls TIE int8 in isolation —
# scripts/exp_int4_kernel_variants.py — so the cost hides in a subtree).
params_int4_tfm = {**params_int8, "transformer": params_int4["transformer"]}
params_int4_fnet = {**params_int8, "flow_net": params_int4["flow_net"]}
params_int4_misc = {
    **params_int4,
    "transformer": params_int8["transformer"],
    "flow_net": params_int8["flow_net"],
}


def fresh_state():
    st = make_batched_state(
        cfg, SLOTS, CAPACITY, MAXF, 64, jnp.bfloat16, kv_quantize=True
    )
    return {
        **st,
        "active": jnp.ones((SLOTS,), bool),
        "max_steps": jnp.full((SLOTS,), 10_000, jnp.int32),
        "eos_threshold": jnp.full((SLOTS,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((SLOTS,), 3, jnp.int32),
        "sigma": jnp.full((SLOTS,), 0.84, jnp.float32),
    }


def run_blocks(params, k: int, n_blocks: int) -> float:
    state = fresh_state()
    state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    jax.block_until_ready(state["n_frames"])

    state = fresh_state()
    jax.device_get(state["n_frames"])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state, w, n, _f = _batched_ar_multi_step(params, cfg, state, k, 1)
    nf, _wsum = jax.device_get((n, w.sum()))
    assert int(nf[0]) > 0, nf
    return time.perf_counter() - t0


for name, params, variant in (
    ("int8+kv (baseline)", params_int8, None),
    ("int4-split+kv", params_int4, "split"),
    ("int4-dequant+kv", params_int4, "dequant"),
    # r5: fused depack-matmul Pallas kernel — the depack runs on VPU
    # registers between the packed-tile DMA and the dot, so HBM traffic is
    # the packed bytes (the split/dequant rejections' root cause was XLA
    # materializing the widened weight; ops/pallas/int4_matmul.py).
    ("int4-pallas+kv", params_int4, "pallas"),
    # Gap decomposition: which subtree pays the int4 premium?
    ("int4-tfm-only", params_int4_tfm, "pallas"),
    ("int4-fnet-only", params_int4_fnet, "pallas"),
    ("int4-misc-only", params_int4_misc, "pallas"),
):
    if variant is not None:
        set_int4_matmul_variant(variant)
        # Distinct variants trace to distinct programs; clear jit caches so
        # the switch is honored even though params are pytree-identical.
        jax.clear_caches()
    t16 = min(run_blocks(params, 16, BLOCKS) for _ in range(REPS)) / BLOCKS
    t64 = min(run_blocks(params, 64, BLOCKS) for _ in range(REPS)) / BLOCKS
    per_step = (t64 - t16) / 48
    print(
        f"{name:20s} per-step (batch {SLOTS}): {per_step*1e3:.3f} ms  "
        f"fixed/block: {(t16 - 16*per_step)*1e3:.2f} ms",
        flush=True,
    )
