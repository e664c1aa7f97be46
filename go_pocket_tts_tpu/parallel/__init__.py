"""Multi-request and multi-chip execution.

The reference's complete parallelism surface is a goroutine worker pool plus
an HTTP semaphore (SURVEY.md §2.11) — single host, single process. The TPU
replacements:

- intra-op parallelism: XLA's job (per-core vectorization, MXU tiling)
- request-level concurrency: :mod:`parallel.batching` — continuous batching
  of AR steps across concurrent requests on one chip
- scale-out: :mod:`parallel.mesh` — data-parallel replication over a
  ``jax.sharding.Mesh`` (ICI collectives inserted by XLA), with an optional
  Megatron-style ``tp`` axis over the transformer blocks + KV-cache heads
  for larger FlowLM variants (``dp_tp_mesh``/``shard_params_tp``)

PP/SP are intentionally absent: a ~100M-param model with ≤1k-step sequences
does not motivate them (SURVEY.md §2.11 row "DP/TP/PP/SP"); DP is the
strategy the published model actually needs, TP is wired so the framework
scales past it.
"""

from go_pocket_tts_tpu.parallel.mesh import (
    dp_mesh,
    dp_tp_mesh,
    replicate_params,
    shard_batch,
    shard_params_tp,
    shard_state_tp,
)
from go_pocket_tts_tpu.parallel.batching import (
    BatchContinuation,
    BatcherRuntime,
    ContinuousBatcher,
)

__all__ = [
    "dp_mesh",
    "dp_tp_mesh",
    "replicate_params",
    "shard_batch",
    "shard_params_tp",
    "shard_state_tp",
    "BatchContinuation",
    "BatcherRuntime",
    "ContinuousBatcher",
]
