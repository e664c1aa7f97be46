"""Per-op device-time breakdown of the batched AR block (r3, VERDICT #1a).

Runs _batched_ar_multi_step under jax.profiler.trace and aggregates the
xplane's TPU op durations (via tensorboard_plugin_profile's proto parser),
to see where the ~0.08 ms/step of non-roofline time goes at batch 8.

Usage: python scripts/exp_batch_trace.py [k] [slots]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel.batching import (
    _batched_ar_multi_step,
    make_batched_state,
)
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CAP = 224

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(jnp.bfloat16)
params = model.params["flow_lm"]
cfg = model.config.flow_lm
tcfg = cfg.transformer
L = cfg.latent_dim


def fresh_state():
    state = make_batched_state(
        cfg, SLOTS, capacity=CAP, max_frames=160, steps_per_sync=16, dtype=jnp.bfloat16
    )
    state.update(
        active=jnp.ones((SLOTS,), bool),
        max_steps=jnp.full((SLOTS,), 10_000, jnp.int32),
        eos_threshold=jnp.full((SLOTS,), 1e9, jnp.float32),
        frames_after_eos=jnp.full((SLOTS,), 3, jnp.int32),
        sigma=jnp.full((SLOTS,), 0.84, jnp.float32),
    )
    return state


state = fresh_state()
state, w, n, _f = _batched_ar_multi_step(params, cfg, state, K, 1)  # compile
jax.block_until_ready(state["n_frames"])

trace_dir = "/tmp/batch_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, w, n, _f = _batched_ar_multi_step(params, cfg, state, K, 1)
    jax.block_until_ready(n)

# -- parse the xplane: sum device op durations by op category ----------------
# (the xplane proto ships inside tensorflow's tsl tree in this image)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
assert paths, f"no xplane under {trace_dir}"
import re

steps = 3 * K
for path in paths:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta[ev.metadata_id].name
                key = re.sub(r"[.\d]+$", "", name).split(" = ")[0]
                totals[key] += ev.duration_ps / 1e12
                counts[key] += 1
            # NB: enclosing while ops double-count their body's fusions;
            # the top-level while IS the true per-step wall.
            for k_, s_ in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
                print(f"  {s_/steps*1e6:9.2f} us/step  n={counts[k_]:6d}  {k_[:90]}")
