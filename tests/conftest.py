"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh tests can exercise
multi-chip paths without TPU hardware (the driver validates the real
multi-chip path separately via ``__graft_entry__.dryrun_multichip``).

These env vars must be set before ``jax`` is first imported, which is why
they live at conftest import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable when pytest is invoked from elsewhere.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
