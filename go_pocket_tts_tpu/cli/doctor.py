"""Preflight diagnostics (parity with `internal/doctor/doctor.go:60-183`).

Dependency-injected check functions (overridable in tests, like the
reference's ``VersionFunc`` seams), ✓/✗ output, aggregated failures. The
reference probes Python/pocket-tts/ONNX; the TPU build probes the JAX
backend, devices, model/tokenizer assets, voices, and the native helper lib.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, List, Optional, TextIO

from go_pocket_tts_tpu.config import Config

__all__ = ["DoctorResult", "run_doctor"]


@dataclass
class DoctorResult:
    ok: bool = True
    lines: List[str] = field(default_factory=list)
    failures: List[str] = field(default_factory=list)

    def record(self, name: str, ok: bool, detail: str = "") -> None:
        line = f"{'✓' if ok else '✗'} {name}" + (f" — {detail}" if detail else "")
        self.lines.append(line)
        if not ok:
            self.ok = False
            self.failures.append(name)


def _probe_jax() -> str:
    import jax

    devices = jax.devices()
    detail = f"jax {jax.__version__}, devices: {[str(d) for d in devices]}"
    try:
        stats = devices[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        used = stats.get("bytes_in_use")
        if limit:
            detail += f", hbm {used / 2**30:.1f}/{limit / 2**30:.1f} GiB"
    except Exception:  # noqa: BLE001 - memory stats are backend-optional
        pass
    return detail


def _probe_native() -> str:
    from go_pocket_tts_tpu.native import audioio

    lib = audioio.load()
    if lib is None:
        raise RuntimeError("libaudioio.so unavailable (build with make -C native)")
    return "libaudioio.so loaded"


def _probe_tokenizer_backend(tokenizer_path: str) -> tuple:
    """Which encode backend would serving use for this tokenizer file?

    Returns ``(ok, detail)``. The pure fallback applies the model's
    precompiled charsmap exactly (darts-clone reader, ``text/charsmap.py``),
    so ✗ only when the model carries a charsmap the reader could NOT parse
    and the fast backend is also unavailable: normalization then degrades to
    an NFKC approximation and non-ASCII text would tokenize differently from
    upstream — wrong tokens produce wrong speech with no error anywhere else
    in the pipeline (VERDICT r2 #6).
    """
    try:
        import tokenizers  # noqa: F401

        have_fast = True
    except Exception:  # noqa: BLE001 - optional dependency
        have_fast = False

    from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer

    tok = load_tokenizer(tokenizer_path)
    has_charsmap = bool(tok.model.precompiled_charsmap)
    charsmap_err = tok.charsmap_error
    detail = (
        f"backend={tok.backend}, hf-tokenizers "
        f"{'importable' if have_fast else 'MISSING'}, "
        f"precompiled charsmap {'present' if has_charsmap else 'absent'}"
    )
    if tok.backend == "pure" and charsmap_err is not None:
        return False, detail + (
            f" — charsmap failed to parse ({charsmap_err}); normalization "
            "degrades to NFKC (non-ASCII text may mis-tokenize); install "
            "`tokenizers`"
        )
    return True, detail


def run_doctor(
    cfg: Config,
    out: Optional[TextIO] = None,
    jax_probe: Callable[[], str] = _probe_jax,
    native_probe: Callable[[], str] = _probe_native,
    tokenizer_probe: Callable[[str], tuple] = _probe_tokenizer_backend,
) -> DoctorResult:
    res = DoctorResult()

    try:
        res.record("jax backend", True, jax_probe())
    except Exception as exc:  # noqa: BLE001
        res.record("jax backend", False, str(exc))

    try:
        res.record("native helpers", True, native_probe())
    except Exception as exc:  # noqa: BLE001
        res.record("native helpers", False, str(exc))

    # Persistent compile cache: a wrong dir silently degrades to cold
    # compiles on every process start — surface writability up front.
    cache_dir = getattr(cfg.runtime, "compile_cache_dir", "")
    if not cache_dir:
        res.record("compile cache", True, "disabled (--runtime-compile-cache-dir)")
    else:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            probe_path = os.path.join(cache_dir, ".doctor-probe")
            with open(probe_path, "w") as f:
                f.write("ok")
            os.unlink(probe_path)
            res.record("compile cache", True, f"{cache_dir} (writable)")
        except OSError as exc:
            res.record("compile cache", False, f"{cache_dir}: {exc}")

    # Voice upload (POST /voices): a bad dir or a no-voice-cloning
    # checkpoint would otherwise only surface as a 500 on the first upload.
    upload_dir = getattr(cfg.server, "voice_upload_dir", "")
    if upload_dir:
        try:
            os.makedirs(upload_dir, exist_ok=True)
            probe_path = os.path.join(upload_dir, ".doctor-probe")
            with open(probe_path, "w") as f:
                f.write("ok")
            os.unlink(probe_path)
            detail = f"{upload_dir} (writable)"
            ok = True
        except OSError as exc:
            detail, ok = f"{upload_dir}: {exc}", False
        if ok and os.path.exists(cfg.paths.model_path):
            try:
                from go_pocket_tts_tpu.utils.safetensors import _read_header

                header = _read_header(cfg.paths.model_path)
                if not any(k.startswith("mimi.encoder.") for k in header):
                    ok = False
                    detail = (
                        "checkpoint has no Mimi encoder weights (voice "
                        "cloning needs the full checkpoint)"
                    )
            except Exception as exc:  # noqa: BLE001
                ok, detail = False, str(exc)
        res.record("voice upload", ok, detail)

    # External-binary probe for the cli backend (`cmd/pockettts/doctor.go:110-118`
    # runs `pocket-tts --version`).
    from go_pocket_tts_tpu.config import BACKEND_CLI, normalize_backend

    if normalize_backend(cfg.tts.backend) == BACKEND_CLI:
        import subprocess

        exe = cfg.tts.cli_path or "pocket-tts"
        try:
            proc = subprocess.run(
                [exe, "--version"], capture_output=True, timeout=10, text=True
            )
            version = (proc.stdout or proc.stderr).strip().splitlines()
            res.record(
                "pocket-tts binary",
                proc.returncode == 0,
                version[0] if version else f"rc={proc.returncode}",
            )
        except Exception as exc:  # noqa: BLE001
            res.record("pocket-tts binary", False, f"{exe}: {exc}")

    model_ok = os.path.exists(cfg.paths.model_path)
    res.record("model file", model_ok, cfg.paths.model_path)
    if model_ok:
        try:
            from go_pocket_tts_tpu.utils.safetensors import (
                read_header_metadata,
                validate_model_keys,
            )

            validate_model_keys(cfg.paths.model_path)
            fmt = read_header_metadata(cfg.paths.model_path).get(
                "pockettts.quantize", ""
            )
            res.record("model keys", True, f"pre-quantized {fmt}" if fmt else "")
        except Exception as exc:  # noqa: BLE001
            res.record("model keys", False, str(exc))

    tok_ok = os.path.exists(cfg.paths.tokenizer_model)
    res.record("tokenizer file", tok_ok, cfg.paths.tokenizer_model)
    if tok_ok:
        try:
            ok, detail = tokenizer_probe(cfg.paths.tokenizer_model)
            res.record("tokenizer backend", ok, detail)
        except Exception as exc:  # noqa: BLE001
            res.record("tokenizer backend", False, str(exc))

    # Serving-config sanity: continuity sessions under batch serving carry
    # KV history in each lane; a small prompt capacity makes every chunk
    # reset the session (silently defeating --continuity).
    if getattr(cfg.tts, "continuity", False) and cfg.runtime.batch_slots > 1:
        cap = cfg.runtime.batch_prompt_capacity
        ok = cap >= 256
        res.record(
            "continuity capacity",
            ok,
            f"batch_prompt_capacity={cap}"
            + (
                " (a session carries roughly capacity/(prompt bucket + chunk"
                " frames) chunks; >=512 recommended for multi-chunk sessions)"
                if ok
                else " — sessions will reset nearly every chunk; raise "
                "--runtime-batch-prompt-capacity (>=512 recommended)"
            ),
        )

    # Serve-time autotune preview: show what `serve` will flip to the
    # measured-best batch-serving settings (PERF.md) so operators see the
    # effective configuration before starting traffic.
    if cfg.runtime.batch_slots > 1:
        from copy import deepcopy

        from go_pocket_tts_tpu.config import apply_serving_autotune

        preview = deepcopy(cfg)
        changes = apply_serving_autotune(preview)
        if changes:
            note = ""
            try:
                from go_pocket_tts_tpu.utils.safetensors import read_header_metadata

                fmt = read_header_metadata(cfg.paths.model_path).get(
                    "pockettts.quantize", ""
                )
                if fmt and any("runtime.quantize=" in c for c in changes):
                    # Weights arrive already quantized; the walk is a no-op
                    # and the artifact's width is what actually serves.
                    note = f" [checkpoint pre-quantized {fmt}: weight walk is a no-op]"
            except Exception:  # noqa: BLE001 - preview only; missing file etc.
                pass
            res.record(
                "serving autotune",
                True,
                "serve will apply: " + "; ".join(changes)
                + " (explicit flags override; --runtime-autotune false disables)"
                + note,
            )
        else:
            res.record(
                "serving autotune",
                True,
                "no changes (all batch-serving knobs set explicitly or "
                "autotune disabled)",
            )

    if cfg.paths.voices_manifest and os.path.exists(cfg.paths.voices_manifest):
        try:
            from go_pocket_tts_tpu.tts.voices import VoiceManager

            mgr = VoiceManager(cfg.paths.voices_manifest)
            res.record("voices manifest", True, f"{len(mgr.list_voices())} voices")
        except Exception as exc:  # noqa: BLE001
            res.record("voices manifest", False, str(exc))
    else:
        res.record("voices manifest", True, "not configured (optional)")

    if out is not None:
        for line in res.lines:
            print(line, file=out)
        if not res.ok:
            print(f"\n{len(res.failures)} check(s) failed", file=out)
    return res
