"""Upstream-parity fixture tier (VERDICT r1 #4).

Mechanics are validated today against the in-repo torch oracle (an
independent implementation dumped through the same JSON schema the reference
uses for its upstream PyTorch dumps, `scripts/dump_python_parity.py` /
`internal/native/python_parity_test.go`). The day real assets land:

    python scripts/dump_parity.py --upstream <checkout> --output fx.json
    POCKETTTS_PARITY_FIXTURE=fx.json POCKETTTS_PARITY_MODEL=models/tts_b6369a24.safetensors \
        pytest tests/test_parity_fixture.py
"""

import json
import os
import subprocess
import sys

import pytest

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model, load_model_from_store
from go_pocket_tts_tpu.tts.parity_fixture import load_fixture, verify_fixture
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes, write_file

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("parity") / "model.safetensors"
    write_file(str(path), synthetic.build_checkpoint(ARCH, seed=11))
    return str(path)


@pytest.fixture(scope="module")
def fixture_path(ckpt_path, tmp_path_factory):
    """Dump a fixture from the independent torch oracle via the real script."""
    out = tmp_path_factory.mktemp("parity_fx") / "fixture.json"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "scripts", "dump_parity.py"),
            "--backend", "torch-oracle",
            "--model", ckpt_path,
            "--num-heads", str(ARCH.num_heads),
            "--flow-tokens", "1,2,3",
            "--mimi-frames", "1,2",
            "--output", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return str(out)


def test_fixture_verifies_against_jax_engine(ckpt_path, fixture_path):
    """Torch-oracle dump → JAX replay passes at the reference tolerances."""
    model = load_model_from_store(
        open_store_from_bytes(open(ckpt_path, "rb").read()), num_heads=ARCH.num_heads
    )
    fixture = load_fixture(fixture_path)
    assert fixture.flow is not None and len(fixture.mimi) == 2
    reports = verify_fixture(model, fixture)
    assert len(reports) >= 8  # offsets×2 + hidden + eos + 2×(l2m + decode)
    failing = [r for r in reports if not r.passed]
    assert not failing, [
        (r.name, r.max_abs_err, r.max_rel_err) for r in failing
    ]


def test_fixture_detects_divergence(ckpt_path, fixture_path):
    """A perturbed fixture must FAIL — guards against a vacuous comparator."""
    with open(fixture_path) as fh:
        raw = json.load(fh)
    raw["flow_lm_prefill_step"]["step_last_hidden"]["data"] = [
        v + 0.05 for v in raw["flow_lm_prefill_step"]["step_last_hidden"]["data"]
    ]
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump(raw, fh)
        bad_path = fh.name
    model = load_model_from_store(
        open_store_from_bytes(open(ckpt_path, "rb").read()), num_heads=ARCH.num_heads
    )
    reports = verify_fixture(model, load_fixture(bad_path))
    os.unlink(bad_path)
    assert any(
        not r.passed and r.name == "flow_lm_step_last_hidden" for r in reports
    )


def test_upstream_fixture_if_present():
    """The real tier: skips cleanly until upstream assets exist
    (`POCKETTTS_PARITY_FIXTURE` + `POCKETTTS_PARITY_MODEL`)."""
    fx = os.environ.get("POCKETTTS_PARITY_FIXTURE")
    model_path = os.environ.get(
        "POCKETTTS_PARITY_MODEL", os.path.join(_ROOT, "models", "tts_b6369a24.safetensors")
    )
    if not fx:
        pytest.skip("set POCKETTTS_PARITY_FIXTURE to an upstream parity dump")
    if not os.path.exists(model_path):
        pytest.skip(f"real checkpoint not found at {model_path}")
    model = load_model(model_path)
    reports = verify_fixture(model, load_fixture(fx))
    failing = [r for r in reports if not r.passed]
    assert not failing, [
        (r.name, r.max_abs_err, r.max_rel_err) for r in failing
    ]
