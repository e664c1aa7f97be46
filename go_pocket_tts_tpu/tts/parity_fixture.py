"""Upstream-parity fixture tier: load + verify reference-schema JSON dumps.

The reference's strongest oracle is JSON dumps of the actual upstream PyTorch
model (`/root/reference/scripts/dump_python_parity.py:106-196`), loaded by its
Go tests via ``POCKETTTS_NATIVE_PY_FIXTURE``
(`internal/native/python_parity_test.go:12-252`). This module implements the
same contract for the JAX engine:

- :func:`load_fixture` parses the reference dump schema
  (``flow_lm_prefill_step`` + ``mimi`` cases, ``{shape, data}`` tensors)
- :func:`verify_fixture` replays the dumped inputs through the JAX model and
  compares at the reference tolerances (`internal/runtime/ops/tolerance.go`,
  `python_parity_test.go:88,118-120`): hidden/eos abs 2e-4 / rel 5e-3,
  latent→mimi rel 1e-3, decoded audio rel 5e-2

``scripts/dump_parity.py`` produces fixtures in this schema — from the real
upstream ``pocket_tts`` package when available, or from the in-repo torch
oracle (which is how the loader is exercised in CI without assets).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from go_pocket_tts_tpu.tts.parity import TensorParityReport, compare_tensor

__all__ = ["ParityFixture", "load_fixture", "verify_fixture"]

# Reference tolerances (`python_parity_test.go:88,118-120`).
HIDDEN_TOL = dict(atol=2e-4, rtol=5e-3)
CONV_TOL = dict(atol=2e-4, rtol=1e-3)
DECONV_TOL = dict(atol=2e-4, rtol=5e-2)


def _tensor(obj: Optional[dict]) -> Optional[np.ndarray]:
    if obj is None:
        return None
    return np.asarray(obj["data"], np.float32).reshape(obj["shape"])


@dataclass
class ParityFixture:
    flow: Optional[dict] = None
    mimi: List[dict] = field(default_factory=list)
    source: dict = field(default_factory=dict)


def load_fixture(path: str) -> ParityFixture:
    with open(path, "r", encoding="utf-8") as fh:
        raw = json.load(fh)
    return ParityFixture(
        flow=raw.get("flow_lm_prefill_step"),
        mimi=raw.get("mimi", []),
        source=raw.get("source", {}),
    )


def _verify_flow(model, case: dict) -> List[TensorParityReport]:
    """Replay tokens → prefill → one transformer step at f32, compare the
    dumped last-hidden / eos-logit / per-layer offsets."""
    import jax.numpy as jnp

    from go_pocket_tts_tpu.models import flow_lm as flm
    from go_pocket_tts_tpu.models import flow_transformer as ftr
    from go_pocket_tts_tpu.models.params import apply_linear

    flow = model.params["flow_lm"]
    cfg = model.config.flow_lm
    tokens = [int(t) for t in case["tokens"]]
    reports: List[TensorParityReport] = []

    emb = flm.text_embeddings(flow, jnp.asarray([tokens], jnp.int32))
    cache = ftr.init_kv_cache(cfg.transformer, batch=1, capacity=len(tokens) + 8)
    cache = flm.prompt(flow, cfg, cache, emb)

    def check_offsets(name: str, want: Optional[list]) -> None:
        if not want:
            return
        # This engine advances all layers in lock-step behind one traced
        # offset; the upstream dump records one offset per stateful module.
        got = int(np.asarray(cache["offset"]))
        ok = all(int(o) == got for o in want)
        reports.append(
            TensorParityReport(
                name, True, 0.0 if ok else float("inf"), 0.0 if ok else float("inf"), ok
            )
        )

    check_offsets("flow_prompt_layer_offsets", case.get("prompt_layer_offsets"))

    latent = _tensor(case["step_latent"])  # [1, 1, L]
    x = apply_linear(flow["input_linear"], jnp.asarray(latent))
    y, cache = ftr.transformer_forward_cached(flow["transformer"], cfg.transformer, cache, x)
    check_offsets("flow_step_layer_offsets", case.get("step_layer_offsets"))
    last, eos = flm._hidden_and_eos(flow, y)

    want_last = _tensor(case.get("step_last_hidden"))
    if want_last is not None:
        reports.append(
            compare_tensor("flow_lm_step_last_hidden", np.asarray(last), want_last, **HIDDEN_TOL)
        )
    want_eos = _tensor(case.get("step_eos_logits"))
    if want_eos is not None:
        reports.append(
            compare_tensor(
                "flow_lm_step_eos_logits",
                np.asarray(eos).reshape(want_eos.shape),
                want_eos,
                **HIDDEN_TOL,
            )
        )
    return reports


def _verify_mimi(model, case: dict) -> List[TensorParityReport]:
    import jax.numpy as jnp

    name = case.get("name", "mimi")
    latent = _tensor(case["latent"])  # [1, T, L]
    reports: List[TensorParityReport] = []

    mimi_latent = model.latent_to_mimi(jnp.asarray(latent))
    want_l2m = _tensor(case.get("latent_to_mimi"))
    if want_l2m is not None:
        reports.append(
            compare_tensor(f"{name}/latent_to_mimi", np.asarray(mimi_latent), want_l2m, **CONV_TOL)
        )
    want_audio = _tensor(case.get("mimi_decode"))
    if want_audio is not None:
        audio = model.mimi_decode(mimi_latent)
        reports.append(
            compare_tensor(f"{name}/mimi_decode", np.asarray(audio), want_audio, **DECONV_TOL)
        )
    return reports


def verify_fixture(model, fixture: ParityFixture) -> List[TensorParityReport]:
    """Run every case in the fixture through ``model`` (a
    :class:`models.model.PocketTTSModel`, f32 params) and return the reports."""
    reports: List[TensorParityReport] = []
    if fixture.flow is not None:
        reports.extend(_verify_flow(model, fixture.flow))
    for case in fixture.mimi:
        reports.extend(_verify_mimi(model, case))
    return reports
