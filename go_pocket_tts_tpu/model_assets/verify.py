"""Model/tokenizer verification (parity with `internal/model/verify.go` and
`cmd/pockettts/model_verify.go:55-100`): file exists → header keys → smoke
load → tokenizer check."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List

from go_pocket_tts_tpu.utils.safetensors import validate_model_keys

__all__ = ["VerifyResult", "verify_native_model"]


@dataclass
class VerifyResult:
    ok: bool = True
    checks: List[str] = field(default_factory=list)
    failures: List[str] = field(default_factory=list)

    def record(self, name: str, ok: bool, detail: str = "") -> None:
        line = f"{'✓' if ok else '✗'} {name}" + (f": {detail}" if detail else "")
        self.checks.append(line)
        if not ok:
            self.ok = False
            self.failures.append(line)


def verify_native_model(
    model_path: str, tokenizer_path: str = "", smoke_load: bool = True
) -> VerifyResult:
    res = VerifyResult()

    exists = os.path.exists(model_path)
    res.record("model file exists", exists, model_path)
    if not exists:
        return res

    try:
        validate_model_keys(model_path)
        res.record("model header keys", True)
    except Exception as exc:  # noqa: BLE001
        res.record("model header keys", False, str(exc))
        return res

    if smoke_load:
        try:
            from go_pocket_tts_tpu.models.model import load_model

            model = load_model(model_path)
            d = model.config.flow_lm.d_model
            from go_pocket_tts_tpu.models.quantize import model_quantized_bits

            bits = model_quantized_bits(model.params)
            detail = f"d_model={d}" + (f", pre-quantized int{bits}" if bits else "")
            res.record("model smoke load", True, detail)
        except Exception as exc:  # noqa: BLE001
            res.record("model smoke load", False, str(exc))

    if tokenizer_path:
        if not os.path.exists(tokenizer_path):
            res.record("tokenizer file exists", False, tokenizer_path)
        else:
            try:
                from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer

                tok = load_tokenizer(tokenizer_path)
                ids = tok.encode("Hello world.")
                res.record("tokenizer encode", bool(ids), f"vocab={tok.vocab_size}")
            except Exception as exc:  # noqa: BLE001
                res.record("tokenizer encode", False, str(exc))
    return res
