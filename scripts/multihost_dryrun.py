#!/usr/bin/env python3
"""Multi-host data-parallel dry-run over jax.distributed (DCN analogue).

SURVEY.md §2.11 names `jax.distributed` + XLA collectives as the TPU-native
scale-out path for the batch-serving config. Single-host DP is exercised by
the test suite's 8-virtual-device mesh; this script validates the MULTI-HOST
wiring: N processes (each with M virtual CPU devices) join one coordination
service, build a global dp mesh over N·M devices, replicate the weights,
shard the request batch across processes with
``jax.make_array_from_process_local_data``, and run one sharded
prefill + batched AR step + Mimi decode.

Run (two terminals, or see tests/test_multihost.py which spawns both):

    python scripts/multihost_dryrun.py --num-processes 2 --process-id 0
    python scripts/multihost_dryrun.py --num-processes 2 --process-id 1

Prints ``MULTIHOST_OK <global_devices>`` on success (process 0).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="127.0.0.1:9731")
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args()

    # Virtual CPU devices must be pinned before backend init (same recipe as
    # __graft_entry__.dryrun_multichip).
    flags = os.environ.get("XLA_FLAGS", "")
    token = "xla_force_host_platform_device_count"
    if token not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --{token}={args.local_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from go_pocket_tts_tpu.models import flow_lm as flm
    from go_pocket_tts_tpu.models import flow_transformer as ftr
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.parallel.batching import _batched_ar_step
    from go_pocket_tts_tpu.parallel.mesh import dp_mesh, replicate_params
    from go_pocket_tts_tpu.runtime.generate import _decode
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    arch = synthetic.tiny_arch()
    store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=1)))
    model = load_model_from_store(store, num_heads=arch.num_heads)
    flow = model.params["flow_lm"]
    cfg = model.config.flow_lm
    tcfg = cfg.transformer

    mesh = dp_mesh(n_global)
    B, T, capacity, L = n_global, 8, 32, cfg.latent_dim

    flow = replicate_params(flow, mesh)
    model_params = replicate_params(model.params, mesh)

    def shard_global(x_np, spec):
        """Assemble a globally sharded array from per-process local shards —
        the DCN-spanning data distribution pattern."""
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, x_np)

    rng = np.random.RandomState(0)
    tokens_global = rng.randint(0, arch.n_bins, size=(B, T)).astype(np.int32)
    per = B // args.num_processes
    local = tokens_global[args.process_id * per : (args.process_id + 1) * per]
    tokens = shard_global(local, P("dp", None))

    emb = flm.text_embeddings(flow, tokens)
    cache = ftr.init_kv_cache(tcfg, B, capacity)

    def prefill_fn(p, c, e):
        _, c = ftr.transformer_forward_cached(p["transformer"], tcfg, c, e)
        return {**c, "offset": jnp.broadcast_to(c["offset"], (e.shape[0],))}

    cache = jax.jit(prefill_fn)(flow, cache, emb)

    state = {
        "cache": cache,
        "frame": jnp.full((B, 1, L), jnp.nan, jnp.float32),
        "frames": jnp.zeros((B, 8, L), jnp.float32),
        "n_frames": jnp.zeros((B,), jnp.int32),
        "countdown": jnp.full((B,), -1, jnp.int32),
        "done": jnp.zeros((B,), bool),
        "active": jnp.ones((B,), bool),
        "max_steps": jnp.full((B,), 8, jnp.int32),
        "eos_threshold": jnp.full((B,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((B,), 3, jnp.int32),
        "sigma": jnp.zeros((B,), jnp.float32),
    }
    noise = jnp.zeros((B, L), jnp.float32)
    state = _batched_ar_step(flow, cfg, state, noise, 1)
    state = _batched_ar_step(flow, cfg, state, noise, 1)

    pcm = _decode(model_params, model.config.mimi, state["frames"][:, :8, :])
    # Each process owns its shard; fetch the addressable part and sanity it.
    local_pcm = np.concatenate(
        [np.asarray(s.data) for s in pcm.addressable_shards], axis=0
    )
    assert local_pcm.shape[-1] == 8 * 1920, local_pcm.shape
    assert np.all(np.isfinite(local_pcm))

    # Cross-host collective: a psum over the dp axis must see every lane.
    from jax.experimental.shard_map import shard_map

    total = jax.jit(
        shard_map(
            lambda nf: jax.lax.psum(jnp.sum(nf), "dp"),
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=P(),
        )
    )(state["n_frames"])
    assert int(total) == B * 2, int(total)

    if args.process_id == 0:
        print(f"MULTIHOST_OK {n_global}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
