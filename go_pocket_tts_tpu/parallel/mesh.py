"""Device-mesh parallelism: data parallel (the default) + optional tensor
parallel.

Scaling recipe (SURVEY.md §2.11): pick a mesh, annotate shardings on params
and state, and let XLA's GSPMD insert the collectives.

- ``dp`` (the only strategy this ~100M-param workload *needs*): replicate
  the weights on every chip, shard the request batch. No collectives in the
  forward path; the ICI only carries the initial replication broadcast.
  Used by the v5e-4 batch-serving config (BASELINE.json config 5) and the
  driver's multi-chip dry-run.
- ``tp`` (capability for bigger FlowLM variants / tighter per-chip memory):
  Megatron-style sharding of the transformer blocks. QKV (``in_proj``) and
  ``linear1`` shard their OUTPUT axis, ``out_proj``/``linear2`` their INPUT
  axis, so every matmul runs fully parallel and GSPMD inserts one
  all-reduce per residual add (riding ICI). The KV cache shards on the
  heads axis — attention is embarrassingly parallel over heads — which also
  divides the dominant per-chip memory (cache, not weights) by ``tp``. The
  fused-QKV column order is q|k|v head-major, so the ``tp`` chunks of the
  projection output don't coincide with the per-head slices; GSPMD fixes
  that up with one small activation reshuffle per layer (B·T·d elements —
  bytes per AR step) rather than requiring a permuted weight layout.

Both axes compose: ``dp_tp_mesh(dp, tp)`` gives a 2-D mesh where the batch
shards over ``dp`` and each replica's transformer shards over ``tp``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "dp_mesh",
    "dp_tp_mesh",
    "replicate_params",
    "shard_batch",
    "shard_state",
    "shard_params_tp",
    "shard_state_tp",
]


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
        # [L, B, H, C, Dh] buffers and their [L, B, H, C] per-row scales
        # (int8 KV) both shard batch on axis 1.
        spec = P(None, "dp", *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put(x):
        if x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    out = dict(state)
    out["cache"] = {
        key: (put(val) if key == "offset" else put_kv(val))
        for key, val in state["cache"].items()
    }
    for key in state:
        if key == "cache":
            continue
        if key == "key":
            # The PRNG key is engine-global state, not per-lane — replicate.
            out[key] = jax.device_put(state[key], NamedSharding(mesh, P()))
            continue
        out[key] = jax.tree_util.tree_map(put, state[key])
    return out


def dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """Build a 2-D ``(dp, tp)`` mesh over ``dp * tp`` devices.

    The ``tp`` axis is innermost so tensor-parallel collectives (one
    all-reduce per transformer residual) ride adjacent-device ICI links;
    ``dp`` traffic is a one-time weight broadcast.
    """
    need = dp * tp
    if devices is None:
        devices = jax.devices()
        if len(devices) < need:
            raise ValueError(
                f"dp_tp_mesh: requested dp={dp} x tp={tp} = {need} devices "
                f"but only {len(devices)} available ({jax.default_backend()} backend)"
            )
        devices = devices[:need]
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names=("dp", "tp"))


# Transformer-block leaf names with a tensor-parallel layout (Megatron
# split): output-axis sharded for the up projections, input-axis for the
# down projections. Everything else (norms, embeddings, flowNet, Mimi, EOS
# head) replicates — together they are a small fraction of step FLOPs.
_TP_COL = ("in_proj", "linear1")   # w [in, out] -> P(None, "tp")
_TP_ROW = ("out_proj", "linear2")  # w [in, out] -> P("tp", None)


def shard_params_tp(params, mesh: Mesh):
    """Device-put a FlowLM (or whole-model) param pytree with tensor-parallel
    sharding on the transformer blocks and replication elsewhere.

    Works on any pytree that nests the transformer layer dicts produced by
    ``flow_transformer.transformer_params`` (keys ``in_proj``/``out_proj``/
    ``linear1``/``linear2``, each ``{"w": [in, out], ...}``). INT8-quantized
    linears shard their per-output-channel ``scale`` with the output axis.
    """

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        name = next((k for k in keys if k in _TP_COL + _TP_ROW), None)
        field = keys[-1]
        if name in _TP_COL:
            if field == "w":
                spec = P(None, "tp")
            elif field == "b":
                spec = P("tp")
            elif field == "scale":
                # Per-channel [out] OR group-wise int4 [G, out]: the output
                # axis (sharded with w's out axis) is always the LAST one.
                spec = P(*([None] * (leaf.ndim - 1)), "tp")
            else:
                spec = P()
        elif name in _TP_ROW:
            # Down projection: input axis sharded; bias/scale live on the
            # (replicated) output axis.
            spec = P("tp", None) if field == "w" else P()
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state_tp(state, mesh: Mesh):
    """Shard the batched AR state over ``(dp, tp)``: KV caches
    ``[L, B, H, cap, Dh]`` shard batch over ``dp`` AND heads over ``tp``
    (attention is embarrassingly parallel over heads, and the cache — not
    the weights — dominates per-chip memory); everything else shards its
    leading batch axis over ``dp``.
    """

    def put_kv(x):
        # [L, B, H, C, Dh] buffers and their [L, B, H, C] per-row scales
        # (int8 KV): batch over dp, heads over tp.
        spec = P(None, "dp", "tp", *([None] * (x.ndim - 3)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put(x):
        if x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    out = dict(state)
    out["cache"] = {
        key: (put(val) if key == "offset" else put_kv(val))
        for key, val in state["cache"].items()
    }
    for key in state:
        if key == "cache":
            continue
        if key == "key":
            # The PRNG key is engine-global state, not per-lane — replicate.
            out[key] = jax.device_put(state[key], NamedSharding(mesh, P()))
            continue
        out[key] = jax.tree_util.tree_map(put, state[key])
    return out
