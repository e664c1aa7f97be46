"""Persistent XLA compilation cache helpers.

Compiled executables survive process restarts, so repeat CLI invocations,
server restarts, and embedding hosts skip the multi-second first-compile of
every program variant. The persistence threshold is forced to 0 because
sub-second device compiles are NOT persisted at JAX's default threshold and
silently re-fire per process (~2-3 s of wall each through a remote-compile
tunnel; CLAUDE.md r3 pitfall a).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("pockettts.compile_cache")

__all__ = ["default_cache_dir", "enable_compile_cache"]


def default_cache_dir() -> str:
    """Per-user default — a fixed world-shared /tmp path would collide
    across users and is squattable."""
    return os.path.join(os.path.expanduser("~"), ".cache", "pockettts", "xla")


def enable_compile_cache(cache_dir: str) -> None:
    """Best-effort: cache failure must never block serving. No-op when
    ``cache_dir`` is empty. Note jax config is process-global — the last
    caller in a process wins."""
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # noqa: BLE001
        log.warning("compile cache unavailable: %s", exc)
