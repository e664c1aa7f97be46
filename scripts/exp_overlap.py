"""r2 experiment: where does the non-compute wall of a 20-word utterance go,
and does splitting the Mimi decode into halves (so the first half's PCM
transfer overlaps the second half's compute) pay?

Run on the real chip:  python scripts/exp_overlap.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.runtime import generate as gen
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads)
rt = TPURuntime(model, dtype=jnp.bfloat16, seed=42)

rng = np.random.RandomState(7)
n_bins = model.params["flow_lm"]["conditioner_embed"].shape[0]
tokens = list(rng.randint(0, int(n_bins) - 1, size=27))
cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=138)

# Warmup / compile.
rt.generate_audio(tokens, cfg)
rt.generate_audio(tokens, cfg)


def timed_baseline():
    """Current path with host-side phase stamps."""
    t = {}
    t0 = time.perf_counter()
    pcm, n_frames, samples_per, max_steps, _ = rt._dispatch(tokens, cfg)
    t["dispatch_host"] = time.perf_counter() - t0
    t1 = time.perf_counter()
    audio = gen._fetch_trimmed(pcm, n_frames, samples_per)
    t["fetch"] = time.perf_counter() - t1
    t["total"] = time.perf_counter() - t0
    t["audio_s"] = len(audio) / 24_000.0
    return t


print("== baseline (3-program) ==")
for i in range(6):
    t = timed_baseline()
    print(
        f"run{i}: total={t['total']*1e3:7.1f}ms dispatch_host={t['dispatch_host']*1e3:6.1f}ms "
        f"fetch={t['fetch']*1e3:6.1f}ms x={t['audio_s']/t['total']:.1f}"
    )

# Fine-grained dispatch breakdown: time each of the three program dispatches
# (host-side enqueue cost only; device runs async).
from functools import partial

import go_pocket_tts_tpu.utils.buckets as bk
from go_pocket_tts_tpu.models import flow_lm as flm


def timed_dispatch_parts():
    flow_cfg = rt.model.config.flow_lm
    t = {}
    with jax.default_matmul_precision(rt.matmul_precision):
        tok_np = np.asarray(tokens, np.int32)
        max_steps = 138
        frame_bucket = bk.pick_bucket(max_steps + 1, (rt.frame_bucket, 512, 1024))
        token_bucket = bk.pick_bucket(len(tok_np), bk.PROMPT_BUCKETS)
        capacity = bk.round_up(token_bucket, 64) + frame_bucket
        tokens_padded = np.zeros((1, token_bucket), np.int32)
        tokens_padded[0, : len(tok_np)] = tok_np

        tA = time.perf_counter()
        cache = gen._embed_prefill(
            rt.model.params, flow_cfg, jnp.asarray(tokens_padded),
            jnp.int32(len(tok_np)), capacity, rt.dtype,
        )
        t["prefill_enqueue"] = time.perf_counter() - tA

        tA = time.perf_counter()
        frames, n_frames, _ = gen._ar_loop(
            rt.model.params["flow_lm"], flow_cfg, cache, rt._next_key(),
            jnp.int32(max_steps), jnp.float32(1e9), jnp.float32(0.7),
            jnp.int32(3), 1, frame_bucket,
        )
        t["ar_enqueue"] = time.perf_counter() - tA

        tA = time.perf_counter()
        pcm = gen._decode_pcm16(
            rt.model.params, rt.model.config.mimi, frames, n_frames,
            min(bk.round_up(max_steps, 32), frame_bucket),
        )
        t["decode_enqueue"] = time.perf_counter() - tA

        tA = time.perf_counter()
        audio = gen._fetch_trimmed(pcm, n_frames, rt.model.config.mimi.samples_per_latent)
        t["fetch"] = time.perf_counter() - tA
    return t


print("== dispatch breakdown ==")
for i in range(4):
    t = timed_dispatch_parts()
    print("  " + " ".join(f"{k}={v*1e3:.1f}ms" for k, v in t.items()))


# --- split-decode variant: decode halves, fetch halves together ------------
@partial(jax.jit, static_argnames=("mimi_cfg", "lo", "hi"))
def _decode_pcm16_range(params, mimi_cfg, frames, n_frames, lo: int, hi: int):
    """Decode frames [0:hi] (causal) and return pcm16 for samples of frames
    [lo:hi] only. First call (lo=0) returns the utterance head early."""
    frames = frames[:, :hi]
    mask = (jnp.arange(hi) < n_frames[:, None])[:, :, None]
    latent = jnp.where(mask, frames, 0.0)
    pcm = gen._decode_body(params, mimi_cfg, latent)
    spl = mimi_cfg.samples_per_latent
    pcm = pcm[:, :, lo * spl : hi * spl]
    return (jnp.clip(pcm.astype(jnp.float32), -1.0, 1.0) * 32767.0).astype(jnp.int16)


def timed_split():
    flow_cfg = rt.model.config.flow_lm
    t = {}
    t0 = time.perf_counter()
    with jax.default_matmul_precision(rt.matmul_precision):
        tok_np = np.asarray(tokens, np.int32)
        max_steps = 138
        frame_bucket = bk.pick_bucket(max_steps + 1, (rt.frame_bucket, 512, 1024))
        token_bucket = bk.pick_bucket(len(tok_np), bk.PROMPT_BUCKETS)
        capacity = bk.round_up(token_bucket, 64) + frame_bucket
        tokens_padded = np.zeros((1, token_bucket), np.int32)
        tokens_padded[0, : len(tok_np)] = tok_np
        cache = gen._embed_prefill(
            rt.model.params, flow_cfg, jnp.asarray(tokens_padded),
            jnp.int32(len(tok_np)), capacity, rt.dtype,
        )
        frames, n_frames, _ = gen._ar_loop(
            rt.model.params["flow_lm"], flow_cfg, cache, rt._next_key(),
            jnp.int32(max_steps), jnp.float32(1e9), jnp.float32(0.7),
            jnp.int32(3), 1, frame_bucket,
        )
        dec = min(bk.round_up(max_steps, 32), frame_bucket)
        mid = dec // 2
        pcm_a = _decode_pcm16_range(
            rt.model.params, rt.model.config.mimi, frames, n_frames, 0, mid
        )
        pcm_b = _decode_pcm16_range(
            rt.model.params, rt.model.config.mimi, frames, n_frames, mid, dec
        )
        a_np, b_np, n_np = jax.device_get((pcm_a, pcm_b, n_frames))
        n = int(n_np[0])
        spl = rt.model.config.mimi.samples_per_latent
        audio = np.concatenate([a_np[0, 0], b_np[0, 0]])[: n * spl]
    t["total"] = time.perf_counter() - t0
    t["audio_s"] = len(audio) / 24_000.0
    return t


print("== split-decode (2 halves, one combined fetch) ==")
for i in range(6):
    t = timed_split()
    print(f"run{i}: total={t['total']*1e3:7.1f}ms x={t['audio_s']/t['total']:.1f}")
