"""Mimi-decode stage anatomy on the real chip + layout alternatives.

Methodology (PERF.md): per-stage cost via prefix-program differencing —
jit `decode up to stage k` for k = 1..N; wall(k) - wall(k-1) removes the
constant RTT. Then compare a channels-last (NHC) formulation of the conv
chain against the current NCH one: TPU vector lanes want channels on the
minor axis, and XLA inserts transposes around NCH 1-D convs.

Usage: python scripts/exp_decode_stages.py [frames] [dtype]
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
import numpy as np

from go_pocket_tts_tpu.models import mimi as mimi_mod
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 160
DTYPE = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(DTYPE)
params = model.params["mimi"]
cfg = model.config.mimi

rng = np.random.RandomState(0)
latent = jnp.asarray(rng.randn(1, 512, FRAMES).astype(np.float32) * 0.3).astype(DTYPE)


def stages(params, cfg, x, upto):
    s1, s2, s3 = cfg.seanet_strides
    seq = [
        lambda x: mimi_mod._convtr(params["upsample"], x, cfg.steps_per_latent, cfg.upsample_groups),
        lambda x: mimi_mod._transformer(params, cfg, x),
        lambda x: mimi_mod.elu(mimi_mod._conv(params["init_conv"], x)),
        lambda x: mimi_mod._convtr(params["up1"], x, s1),
        lambda x: mimi_mod.elu(mimi_mod._resblock(params["res1"], x)),
        lambda x: mimi_mod._convtr(params["up2"], x, s2),
        lambda x: mimi_mod.elu(mimi_mod._resblock(params["res2"], x)),
        lambda x: mimi_mod._convtr(params["up3"], x, s3),
        lambda x: mimi_mod.elu(mimi_mod._resblock(params["res3"], x)),
        lambda x: mimi_mod._conv(params["final_conv"], x),
    ]
    for f in seq[:upto]:
        x = f(x)
    return x


NAMES = [
    "upsample(g512,s16)",
    "transformer",
    "init_conv",
    "up1(s6)",
    "res1+elu",
    "up2(s5)",
    "res2+elu",
    "up3(s4)",
    "res3+elu",
    "final_conv",
]


def timed(fn, *args, reps=15):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


walls = []
for k in range(1, len(NAMES) + 1):
    w = timed(lambda x, k=k: stages(params, cfg, x, k), latent)
    walls.append(w)
    prev = walls[k - 2] if k >= 2 else None
    delta = (w - prev) if prev is not None else float("nan")
    print(f"prefix {k:2d} {NAMES[k-1]:20s} wall={w:7.2f} ms  stage≈{delta:6.2f} ms", flush=True)

print(f"\nfull decode wall {walls[-1]:.2f} ms (incl ~RTT {walls[0]:.2f} baseline)", flush=True)

# ---- channels-last alternative for the post-transformer conv chain --------
from jax import lax


def conv1d_nhc(x, w, b, stride=1, left_pad=0, groups=1):
    # x [B, T, C]; torch weight [out, in/groups, k] -> HIO [k, in/groups, out]
    w = jnp.transpose(w, (2, 1, 0)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w, (stride,), [(left_pad, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def convtr_nhc(x, p, stride, groups=1):
    # p["w"] is already repacked conv-style [out, in/groups, k]; mirror
    # conv_transpose1d_trim's padding/trim exactly, NHC dims.
    w, b = p["w"], p.get("b")
    k = w.shape[2]
    right_trim = k - stride
    out = lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)).astype(x.dtype),
        (1,), [(k - 1, k - 1 - right_trim)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def causal_nhc(x, p):
    k = p["w"].shape[2]
    return conv1d_nhc(x, p["w"], p.get("b"), 1, k - 1)


def resblock_nhc(p, x):
    h = mimi_mod.elu(x)
    h = causal_nhc(h, p["conv1"])
    h = mimi_mod.elu(h)
    h = causal_nhc(h, p["conv2"])
    return x + h


def tail_nch(x):  # current path, from post-transformer input [B, C, T]
    s1, s2, s3 = cfg.seanet_strides
    x = mimi_mod.elu(mimi_mod._conv(params["init_conv"], x))
    x = mimi_mod._convtr(params["up1"], x, s1)
    x = mimi_mod.elu(mimi_mod._resblock(params["res1"], x))
    x = mimi_mod._convtr(params["up2"], x, s2)
    x = mimi_mod.elu(mimi_mod._resblock(params["res2"], x))
    x = mimi_mod._convtr(params["up3"], x, s3)
    x = mimi_mod.elu(mimi_mod._resblock(params["res3"], x))
    return mimi_mod._conv(params["final_conv"], x)


def tail_nhc(x):  # x [B, C, T] -> transpose once, stay NHC
    s1, s2, s3 = cfg.seanet_strides
    x = jnp.swapaxes(x, 1, 2)
    x = mimi_mod.elu(causal_nhc(x, params["init_conv"]))
    x = convtr_nhc(x, params["up1"], s1)
    x = mimi_mod.elu(resblock_nhc(params["res1"], x))
    x = convtr_nhc(x, params["up2"], s2)
    x = mimi_mod.elu(resblock_nhc(params["res2"], x))
    x = convtr_nhc(x, params["up3"], s3)
    x = mimi_mod.elu(resblock_nhc(params["res3"], x))
    x = causal_nhc(x, params["final_conv"])
    return jnp.swapaxes(x, 1, 2)


pre = jax.jit(lambda l: stages(params, cfg, l, 2))(latent)
jax.block_until_ready(pre)

w_nch = timed(tail_nch, pre)
w_nhc = timed(tail_nhc, pre)
a = np.asarray(jax.jit(tail_nch)(pre), np.float32)
b = np.asarray(jax.jit(tail_nhc)(pre), np.float32)
err = float(np.max(np.abs(a - b)))
print(f"conv tail NCH {w_nch:.2f} ms | NHC {w_nhc:.2f} ms | max abs diff {err:.2e}", flush=True)
