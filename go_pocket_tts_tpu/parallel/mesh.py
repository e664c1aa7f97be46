"""Device-mesh data parallelism.

Scaling recipe (the only one this workload motivates — SURVEY.md §2.11):
pick a 1-D ``dp`` mesh, replicate the ~100M-param weights on every chip,
shard the request batch across the mesh, and let XLA insert the collectives.
There are none in the forward path (pure data parallel); the ICI only carries
the initial replication broadcast.

Used by the v5e-4 batch-serving config (BASELINE.json config 5) and by the
driver's multi-chip dry-run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["dp_mesh", "replicate_params", "shard_batch", "shard_state"]


def dp_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """Build a 1-D ``dp`` mesh over ``n_devices`` devices.

    Raises when fewer devices exist than requested — a ``--runtime-dp N``
    user must not silently run on fewer chips (ADVICE r1).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"dp_mesh: requested {n_devices} devices but only "
                    f"{len(devices)} available ({jax.default_backend()} backend)"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


def replicate_params(params, mesh: Mesh):
    """Replicate the weight pytree onto every chip in the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf's leading (batch) axis across ``dp``."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def shard_state(state, mesh: Mesh):
    """Shard the batched AR state: KV caches are ``[L, B, ...]`` (batch on
    axis 1), everything else is batch-leading."""
    def put_kv(x):
        return jax.device_put(x, NamedSharding(mesh, P(None, "dp", None, None, None)))

    def put(x):
        if x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    out = dict(state)
    out["cache"] = {
        "k": put_kv(state["cache"]["k"]),
        "v": put_kv(state["cache"]["v"]),
        "offset": put(state["cache"]["offset"]),
    }
    for key in state:
        if key != "cache":
            out[key] = jax.tree_util.tree_map(put, state[key])
    return out
