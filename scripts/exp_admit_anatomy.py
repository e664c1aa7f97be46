"""Time every host-side sub-step of an 8-request burst admission on the real
chip (r3: warm-wave `_admit` costs ~680 ms and paces streaming TTFA).

Replays _admit_batch's exact operations step by step, timing each, plus a
microbench of the suspected primitives (device_put latency, op-by-op jnp
calls on host data, reset_lane).
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

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import mimi_stream, synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel.batching import (
    _insert_lanes,
    _prefill_lanes,
    make_batched_state,
)
from go_pocket_tts_tpu.utils import buckets as bk
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

SLOTS = 8
arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
flow = model.params["flow_lm"]
flow_cfg = model.config.flow_lm
dtype = jnp.bfloat16

rng = np.random.RandomState(7)
n_bins = flow["conditioner_embed"].shape[0]
tokens_list = [rng.randint(0, int(n_bins) - 1, size=27).astype(np.int32) for _ in range(SLOTS)]

state = make_batched_state(flow_cfg, SLOTS, 224, 160, 64, dtype)
stream_state = mimi_stream.init_stream_state(
    model.params["mimi"], model.config.mimi, batch=SLOTS,
    max_steps=160 * model.config.mimi.steps_per_latent, dtype=dtype,
    per_lane_offsets=True,
)


def t(label, fn, n=1):
    outs = None
    t0 = time.perf_counter()
    for _ in range(n):
        outs = fn()
    el = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:44s} {el:8.2f} ms", flush=True)
    return outs


def admit_replay(tag):
    print(f"[{tag}] burst admission replay:", flush=True)
    t0 = time.perf_counter()
    embs_l = []
    for tk in tokens_list:
        e = flm.text_embeddings(flow, jnp.asarray(tk[None, :])).astype(dtype)
        embs_l.append(e)
    print(f"  {'8x text_embeddings (asarray+embed+astype)':44s} {(time.perf_counter()-t0)*1e3:8.2f} ms", flush=True)

    bucket = bk.pick_bucket(27, bk.PROMPT_BUCKETS)
    t1 = time.perf_counter()
    embs = jnp.concatenate(
        [jnp.pad(e, ((0, 0), (0, bucket - 27), (0, 0))) for e in embs_l], axis=0
    )
    print(f"  {'8x pad + concat':44s} {(time.perf_counter()-t1)*1e3:8.2f} ms", flush=True)

    t2 = time.perf_counter()
    lanes_k, lanes_v = _prefill_lanes(flow, flow_cfg.transformer, embs, 224)
    print(f"  {'_prefill_lanes dispatch':44s} {(time.perf_counter()-t2)*1e3:8.2f} ms", flush=True)

    t3 = time.perf_counter()
    st = _insert_lanes(
        state,
        jnp.asarray(np.arange(SLOTS), jnp.int32),
        lanes_k, lanes_v,
        jnp.asarray(np.full(SLOTS, 27), jnp.int32),
        jnp.asarray(np.full(SLOTS, 138), jnp.int32),
        jnp.asarray(np.full(SLOTS, 1e9), jnp.float32),
        jnp.asarray(np.full(SLOTS, 3), jnp.int32),
        np.sqrt(np.full(SLOTS, 0.7)).astype(np.float32),
    )
    print(f"  {'_insert_lanes (7 asarray + dispatch)':44s} {(time.perf_counter()-t3)*1e3:8.2f} ms", flush=True)

    t4 = time.perf_counter()
    ss = stream_state
    for s in range(SLOTS):
        ss = mimi_stream.reset_lane(ss, jnp.int32(s))
    print(f"  {'8x reset_lane':44s} {(time.perf_counter()-t4)*1e3:8.2f} ms", flush=True)

    t5 = time.perf_counter()
    jax.block_until_ready(st["n_frames"])
    jax.block_until_ready(ss["offset"] if "offset" in ss else list(ss.values())[0])
    print(f"  {'block_until_ready (device drain)':44s} {(time.perf_counter()-t5)*1e3:8.2f} ms", flush=True)
    return st


# First pass compiles/warms, second pass is the measurement.
admit_replay("cold")
admit_replay("warm")
admit_replay("warm2")

print("primitive microbench (warm):", flush=True)
tk = tokens_list[0]
t("device_put 27-int32 (jnp.asarray)", lambda: jax.block_until_ready(jnp.asarray(tk)), 5)
t("device_put async? (no block)", lambda: jnp.asarray(tk), 5)
e0 = flm.text_embeddings(flow, jnp.asarray(tk[None, :]))
t("text_embeddings on resident tokens", lambda: flm.text_embeddings(flow, jnp.asarray(tk[None, :])), 5)
t("jnp.int32 scalar put", lambda: jnp.int32(3), 5)
t("reset_lane single", lambda: mimi_stream.reset_lane(stream_state, jnp.int32(2)), 5)
t("pad+nothing op", lambda: jnp.pad(e0, ((0, 0), (0, 5), (0, 0))), 5)
