"""Hardware timing of the Mimi decode upsampling variants (r3).

Compares full mimi_decode wall time (160-frame bucket, min over repeats)
for the two SHIPPING variants — the pure-XLA chain (with the phase-space
convT) vs the up3+tail Pallas kernel (TPU default) — and checks numerics
on-chip. The fully-fused up2→up3→tail cascade kernel this script once
targeted is NOT measurable: Mosaic's scoped-VMEM accounting rejects it on
v5e (42–102 MB of unrolled temporaries vs the 16 MB limit; PERF.md
"Mosaic scoped-VMEM lesson"), so the cascade never gated mimi_decode and
was dropped.

Usage: python scripts/exp_cascade_hw.py [frames]
"""

from __future__ import annotations

import dataclasses
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
DTYPE = jnp.bfloat16

arch = synthetic.real_arch()
store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
model = load_model_from_store(store, num_heads=arch.num_heads).astype(DTYPE)
params = model.params["mimi"]
cfg = model.config.mimi

rng = np.random.RandomState(3)
latent = jnp.asarray(rng.randn(1, 512, FRAMES).astype(np.float32) * 0.3, DTYPE)


def decode_fn(use_pallas):
    c = dataclasses.replace(cfg, use_pallas=use_pallas)
    f = jax.jit(lambda lat: mimi_mod.mimi_decode(params, c, lat))
    out = f(latent)  # compile
    jax.block_until_ready(out)

    def run(n=8):
        t0 = time.perf_counter()
        accs = [f(latent) for _ in range(n)]
        jax.block_until_ready(accs[-1])
        return (time.perf_counter() - t0) / n

    return out, min(run() for _ in range(3))


out_xla, t_xla = decode_fn(False)
print(f"  xla(+phases convt) {t_xla*1e3:7.2f} ms", flush=True)
out_up3, t_up3 = decode_fn(True)
print(f"  up3+tail kernel    {t_up3*1e3:7.2f} ms", flush=True)

a = np.asarray(out_xla, np.float32)
b = np.asarray(out_up3, np.float32)
err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
print(f"up3+tail: max rel err vs XLA = {err:.2e}")
print(f"decode wall/call ({FRAMES} frames, incl. RTT) above")
