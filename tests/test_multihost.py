"""Multi-host DP dryrun: two OS processes join one jax.distributed
coordination service and run a sharded step (VERDICT r1 #10; the DCN-path
analogue that single-process virtual-device tests cannot exercise)."""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_ROOT, "scripts", "multihost_dryrun.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_dryrun():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    coord = f"127.0.0.1:{_free_port()}"
    cmd = [
        sys.executable, _SCRIPT,
        "--coordinator", coord,
        "--num-processes", "2",
        "--local-devices", "4",
    ]
    worker = subprocess.Popen(
        cmd + ["--process-id", "1"],
        cwd=_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        lead = subprocess.run(
            cmd + ["--process-id", "0"],
            cwd=_ROOT, env=env,
            capture_output=True, text=True, timeout=600,
        )
        worker_out, _ = worker.communicate(timeout=120)
    finally:
        if worker.poll() is None:
            worker.kill()
    assert lead.returncode == 0, f"lead:\n{lead.stdout}\n{lead.stderr}"
    assert worker.returncode == 0, f"worker:\n{worker_out}"
    assert "MULTIHOST_OK 8" in lead.stdout
