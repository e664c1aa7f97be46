"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh tests can exercise
multi-chip paths without TPU hardware (the driver validates the real
multi-chip path separately via ``__graft_entry__.dryrun_multichip``).

These env vars must be set before ``jax`` is first imported, which is why
they live at conftest import time.
"""

import os
import sys

# Force CPU (the session env/sitecustomize may pre-register a TPU platform
# and override JAX_PLATFORMS via jax.config); override with
# POCKETTTS_TEST_PLATFORM=tpu/axon to run the suite on hardware.
_platform = os.environ.get("POCKETTTS_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable when pytest is invoked from elsewhere.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# The axon sitecustomize re-registers the TPU platform via jax.config at
# interpreter start, ignoring JAX_PLATFORMS — pin it back here, before any
# test touches a backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# NOTE: a suite-wide persistent compile cache was measured and REJECTED
# (16:01 warm vs 16:19 cold — the in-process jit cache already dedupes
# within one pytest run, and the CLI subprocess tests get the product's own
# default cache via Service.from_config). Do not redo.

import pytest  # noqa: E402

# -- test tiers ---------------------------------------------------------------
# The full suite costs ~22 min on this 1-core host (measured r5); slow suites
# stop getting run, so the heavy tier (measured call time >= ~8 s, mostly
# real-dims compiles in the batcher/service/kernel tests) is marked `slow`
# from a checked-in manifest. `make test` deselects it; `make test-all` (and
# CI's nightly tier) runs everything. The manifest header documents
# regeneration; an id that no longer collects fails loudly below so renames
# can't silently un-tier a test.
_SLOW_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slow_tests.txt")


def _load_slow_ids():
    ids = set()
    try:
        with open(_SLOW_MANIFEST, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("#"):
                    ids.add(line)
    except OSError:
        pass
    return ids


def pytest_collection_modifyitems(config, items):
    slow_ids = _load_slow_ids()
    if not slow_ids:
        return
    seen = set()
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
            seen.add(item.nodeid)
    # Only enforce manifest hygiene when the whole suite was collected
    # (single-file runs legitimately miss most ids).
    if len(items) > 300:
        stale = slow_ids - seen
        assert not stale, (
            f"tests/slow_tests.txt lists node ids that no longer collect "
            f"(renamed/removed?): {sorted(stale)[:5]}"
        )


@pytest.fixture
def fresh_compile_cache(tmp_path):
    """Point the persistent compile cache at an EMPTY dir for this test.

    Tests asserting the zero-cold-compile prewarm contract observe
    "Finished XLA compilation" log events. Earlier tests in the suite may
    have enabled the product's default persistent cache (Service.from_config
    does), in which case an uncovered program variant would load from disk
    WITHOUT logging a compile and the assertion would pass vacuously."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "xla-cc"))
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


if _platform != "cpu":
    # On TPU, f32 matmuls default to bf16 passes; the suite's f32 parity
    # tolerances (e.g. batched-vs-single at 1e-4) assume true f32 — pin
    # highest precision for the hardware tier only. Production keeps the
    # default (serving runs bf16 anyway).
    jax.config.update("jax_default_matmul_precision", "highest")
