"""Isolate the batched AR step's per-lane KV-write cost (r3, VERDICT #1).

The batch-8 block runs at 0.40 ms/step vs a ~0.27 ms traffic floor
(180 MB weights + 44 MB KV reads at C=224). Hypotheses: (a) the per-lane
scatter `.at[i, lanes, :, offsets, :].set(...)` is not aliased in place
inside the scan (full 44 MB cache copy per step ≈ +0.11 ms), or (b) the
scatter lowering itself is slow, or (c) the attention read is the cost.

Times a transformer-only scan (the step body minus flowNet/EOS/frames
bookkeeping, built from the SAME helpers as `transformer_step_batched`)
for several KV-write strategies, differencing K=16 vs K=64 blocks.

Usage: python scripts/exp_scatter_variants.py [variant ...]
Variants: base hints onehot dus0 nowrite attn128
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.models.params import apply_linear
from go_pocket_tts_tpu.models.flow_transformer import _merge_heads, _split_heads
from go_pocket_tts_tpu.ops import attention_with_positions, gelu_erf, layer_norm
from go_pocket_tts_tpu.ops.rope import apply_rope_rows, rope_rows
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

B = int(os.environ.get("SLOTS", "8"))
CAP = int(os.environ.get("CAP", "224"))

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
params = model.params["flow_lm"]["transformer"]
tcfg = model.config.flow_lm.transformer
H, Dh, D = tcfg.num_heads, tcfg.head_dim, tcfg.d_model


def step(cache, x, mode):
    offsets = cache["offset"]
    capacity = cache["k"].shape[3]
    pos_q = offsets[:, None]
    attn_cap = 128 if mode == "attn128" else capacity
    pos_k = jnp.broadcast_to(
        jnp.arange(attn_cap, dtype=jnp.int32)[None, :], (x.shape[0], attn_cap)
    )
    cos_rows, sin_rows = rope_rows(params["rope_cos"], params["rope_sin"], offsets, 1)
    k_all, v_all = cache["k"], cache["v"]
    lanes = jnp.arange(x.shape[0], dtype=jnp.int32)
    for i, layer in enumerate(params["layers"]):
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, H, Dh)
        k = _split_heads(k, H, Dh)
        v = _split_heads(v, H, Dh)
        q = apply_rope_rows(q, cos_rows, sin_rows)
        k = apply_rope_rows(k, cos_rows, sin_rows)
        krow, vrow = k[:, :, 0, :], v[:, :, 0, :]
        if mode in ("base", "attn128"):
            k_all = k_all.at[i, lanes, :, offsets, :].set(krow)
            v_all = v_all.at[i, lanes, :, offsets, :].set(vrow)
        elif mode == "hints":
            k_all = k_all.at[i, lanes, :, offsets, :].set(
                krow, unique_indices=True, indices_are_sorted=True, mode="promise_in_bounds"
            )
            v_all = v_all.at[i, lanes, :, offsets, :].set(
                vrow, unique_indices=True, indices_are_sorted=True, mode="promise_in_bounds"
            )
        elif mode == "onehot":
            hit = (offsets[:, None] == jnp.arange(capacity)[None, :])[:, None, :, None]
            k_all = k_all.at[i].set(jnp.where(hit, krow[:, :, None, :], k_all[i]))
            v_all = v_all.at[i].set(jnp.where(hit, vrow[:, :, None, :], v_all[i]))
        elif mode == "dus0":
            # Shared scalar offset (lane 0's): wrong semantics, right traffic —
            # isolates scatter-vs-DUS lowering cost.
            z = jnp.int32(0)
            k_all = jax.lax.dynamic_update_slice(k_all, k[None], (i, z, z, offsets[0], z))
            v_all = jax.lax.dynamic_update_slice(v_all, v[None], (i, z, z, offsets[0], z))
        elif mode == "nowrite":
            pass
        else:
            raise ValueError(mode)
        attn = attention_with_positions(
            q, k_all[i][:, :, :attn_cap], v_all[i][:, :, :attn_cap], pos_q, pos_k, None
        )
        x = x + apply_linear(layer["out_proj"], _merge_heads(attn))
        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = gelu_erf(apply_linear(layer["linear1"], n2))
        x = x + apply_linear(layer["linear2"], ff)
    return {"k": k_all, "v": v_all, "offset": offsets + 1}, x


@partial(jax.jit, static_argnames=("mode",), donate_argnames=("cache",))
def block(cache, xs, mode):
    def body(c, x):
        c2, y = step(c, x, mode)
        return c2, y.sum()

    cache, ys = jax.lax.scan(body, cache, xs)
    return cache, ys.sum()


def fresh_cache():
    shape = (tcfg.num_layers, B, H, CAP, Dh)
    return {
        "k": jnp.zeros(shape, jnp.bfloat16),
        "v": jnp.zeros(shape, jnp.bfloat16),
        "offset": jnp.full((B,), 40, jnp.int32),
    }


key = jax.random.PRNGKey(0)


def run(mode, k, n_blocks=8):
    global key
    cache = fresh_cache()
    key, sub = jax.random.split(key)
    xs = jax.random.normal(sub, (k, B, 1, D), jnp.bfloat16)
    cache, s = block(cache, xs, mode)  # warm/compile
    jax.block_until_ready(s)
    cache = fresh_cache()
    packs = []
    for _ in range(n_blocks):
        key, sub = jax.random.split(key)
        packs.append(jax.random.normal(sub, (k, B, 1, D), jnp.bfloat16))
    jax.device_get(packs[-1])
    jax.device_get(cache["offset"])
    t0 = time.perf_counter()
    acc = None
    for xs in packs:
        cache, acc = block(cache, xs, mode)
    got = jax.device_get(acc)
    assert np.isfinite(float(got)) or True
    return (time.perf_counter() - t0) / n_blocks


variants = sys.argv[1:] or ["base", "hints", "onehot", "dus0", "nowrite", "attn128"]
for mode in variants:
    t16 = min(run(mode, 16) for _ in range(3))
    t64 = min(run(mode, 64) for _ in range(3))
    per = (t64 - t16) / 48
    print(
        f"{mode:8s}: per-step {per*1e3:6.3f} ms   (block16 {t16*1e3:6.2f} ms, "
        f"block64 {t64*1e3:6.2f} ms, fixed {t16*1e3 - 16*per*1e3:5.2f} ms)",
        flush=True,
    )
