"""CLI + config + doctor + model-assets + bench harness tests (mock-seam
style, mirroring `cmd/pockettts/*_test.go`)."""

import io
import json
import os
import urllib.error

import numpy as np
import pytest

from go_pocket_tts_tpu import config as cfgmod
from go_pocket_tts_tpu.bench import check_rtf_threshold, compute_stats, RunResult, run_bench
from go_pocket_tts_tpu.cli.doctor import run_doctor
from go_pocket_tts_tpu.cli.main import build_parser, main
from go_pocket_tts_tpu.model_assets import download as dl
from go_pocket_tts_tpu.model_assets import manifest as mf
from go_pocket_tts_tpu.model_assets.verify import verify_native_model
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.utils.safetensors import write_file


# -- config ------------------------------------------------------------------


def test_config_defaults():
    cfg = cfgmod.load_config()
    assert cfg.tts.temperature == 0.7
    assert cfg.tts.eos_threshold == -4.0
    assert cfg.tts.max_steps == 256
    assert cfg.tts.lsd_decode_steps == 1
    assert cfg.server.workers == 2
    assert cfg.server.max_text_bytes == 4096
    assert cfg.paths.model_path.endswith("tts_b6369a24.safetensors")


def test_malformed_config_file_clean_cli_error(tmp_path, capsys):
    """A corrupt config file exits rc=2 with one clean error line — no
    traceback (the reference's Cobra/Viper behavior)."""
    bad = tmp_path / "bad.yaml"
    bad.write_text("tts:\n  temperature: [unclosed")
    rc = main(["doctor", "--config", str(bad)])
    assert rc == 2
    err = capsys.readouterr().err
    assert "error:" in err and "Traceback" not in err


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("POCKETTTS_TEMPERATURE", "0.5")
    monkeypatch.setenv("POCKETTTS_WORKERS", "7")
    cfg = cfgmod.load_config()
    assert cfg.tts.temperature == 0.5
    assert cfg.server.workers == 7


def test_config_file_and_flag_precedence(tmp_path, monkeypatch):
    f = tmp_path / "pockettts.yaml"
    f.write_text("tts:\n  temperature: 0.3\nserver:\n  workers: 9\n")
    monkeypatch.chdir(tmp_path)
    cfg = cfgmod.load_config()
    assert cfg.tts.temperature == 0.3 and cfg.server.workers == 9

    # env beats file
    monkeypatch.setenv("POCKETTTS_TEMPERATURE", "0.4")
    assert cfgmod.load_config().tts.temperature == 0.4

    # flags beat env
    parser = build_parser()
    args = parser.parse_args(["doctor", "--temperature", "0.9"])
    assert cfgmod.load_config(args).tts.temperature == 0.9


def test_serving_autotune_applies_measured_best():
    parser = build_parser()
    cfg = cfgmod.load_config(parser.parse_args(["doctor", "--runtime-batch-slots", "8"]))
    changes = cfgmod.apply_serving_autotune(cfg)
    assert cfg.runtime.quantize is True
    assert cfg.runtime.kv_quantize is True
    assert cfg.runtime.steps_per_sync_burst == cfgmod.AUTOTUNE_BURST_STEPS
    assert len(changes) == 3


def test_serving_autotune_respects_explicit_flags():
    parser = build_parser()
    # Explicitly setting quantize=false (even though it's the default value)
    # opts that knob — and the dependent KV knob — out of autotune.
    cfg = cfgmod.load_config(
        parser.parse_args(
            ["doctor", "--runtime-batch-slots", "8", "--runtime-quantize", "false"]
        )
    )
    cfgmod.apply_serving_autotune(cfg)
    assert cfg.runtime.quantize is False
    assert cfg.runtime.kv_quantize is False  # measured as a pair with int8 weights
    assert cfg.runtime.steps_per_sync_burst == cfgmod.AUTOTUNE_BURST_STEPS


def test_serving_autotune_never_silently_enables_int4():
    # --runtime-quantize-bits 4 with quantize unset must keep serving bf16:
    # autotune only knows the measured int8 width, and flipping quantize on
    # here would silently switch the server to the unmeasured INT4 path
    # while the log claims "int8 weights".
    parser = build_parser()
    cfg = cfgmod.load_config(
        parser.parse_args(
            ["doctor", "--runtime-batch-slots", "8", "--runtime-quantize-bits", "4"]
        )
    )
    changes = cfgmod.apply_serving_autotune(cfg)
    assert cfg.runtime.quantize is False
    assert cfg.runtime.kv_quantize is False
    assert cfg.runtime.steps_per_sync_burst == cfgmod.AUTOTUNE_BURST_STEPS
    assert all("quantize=true" not in c for c in changes)

    # Explicit int4 weights (quantize set by the user) still get int8 KV —
    # the KV cache width is independent of the weight width.
    cfg = cfgmod.load_config(
        parser.parse_args(
            [
                "doctor",
                "--runtime-batch-slots",
                "8",
                "--runtime-quantize",
                "true",
                "--runtime-quantize-bits",
                "4",
            ]
        )
    )
    cfgmod.apply_serving_autotune(cfg)
    assert cfg.runtime.quantize_bits == 4
    assert cfg.runtime.kv_quantize is True


def test_serving_autotune_respects_env_and_off_switch(monkeypatch):
    monkeypatch.setenv("POCKETTTS_RUNTIME_STEPS_PER_SYNC_BURST", "0")
    parser = build_parser()
    cfg = cfgmod.load_config(parser.parse_args(["doctor", "--runtime-batch-slots", "8"]))
    cfgmod.apply_serving_autotune(cfg)
    assert cfg.runtime.steps_per_sync_burst == 0  # env counts as explicit
    assert cfg.runtime.quantize is True

    monkeypatch.delenv("POCKETTTS_RUNTIME_STEPS_PER_SYNC_BURST")
    cfg = cfgmod.load_config(
        parser.parse_args(
            ["doctor", "--runtime-batch-slots", "8", "--runtime-autotune", "false"]
        )
    )
    assert cfgmod.apply_serving_autotune(cfg) == []
    assert cfg.runtime.quantize is False


def test_serving_autotune_skips_single_request_serving():
    cfg = cfgmod.load_config()
    assert cfg.runtime.batch_slots == 0
    assert cfgmod.apply_serving_autotune(cfg) == []
    assert cfg.runtime.quantize is False and cfg.runtime.kv_quantize is False


def test_backend_normalization():
    assert cfgmod.normalize_backend("native") == "tpu"
    assert cfgmod.normalize_backend("native-safetensors") == "tpu"
    assert cfgmod.normalize_backend("native-onnx") == "torch"
    assert cfgmod.normalize_backend("cli") == "cli"
    with pytest.raises(ValueError):
        cfgmod.normalize_backend("bogus")


# -- doctor ------------------------------------------------------------------


def test_doctor_all_green(tmp_path):
    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(synthetic.tiny_arch(), 1))
    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(b"stub")
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.paths.voices_manifest = ""
    out = io.StringIO()
    res = run_doctor(
        cfg,
        out=out,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert res.ok, res.lines
    assert "✓ model keys" in out.getvalue()
    assert "✓ tokenizer backend" in out.getvalue()


def test_doctor_probes_voice_upload(tmp_path):
    """With --voice-upload-dir set, doctor checks writability and that the
    checkpoint carries Mimi encoder weights (a no-voice-cloning checkpoint
    would otherwise 500 on the first upload)."""
    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(synthetic.tiny_arch(), 1))
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = ""
    cfg.paths.voices_manifest = ""
    cfg.server.voice_upload_dir = str(tmp_path / "uploads")
    kw = dict(
        jax_probe=lambda: "jax", native_probe=lambda: "lib",
        tokenizer_probe=lambda p: (True, ""),
    )
    out = io.StringIO()
    run_doctor(cfg, out=out, **kw)
    assert "✓ voice upload" in out.getvalue()

    # No-voice-cloning checkpoint → ✗ with a pointed message.
    stripped = {
        k: v
        for k, v in synthetic.build_checkpoint(synthetic.tiny_arch(), 1).items()
        if not k.startswith("mimi.encoder")
    }
    write_file(model_path, stripped)
    out = io.StringIO()
    res = run_doctor(cfg, out=out, **kw)
    assert not res.ok
    assert "✗ voice upload" in out.getvalue()
    assert "no Mimi encoder" in out.getvalue()

    # Unset → probe absent entirely.
    cfg.server.voice_upload_dir = ""
    out = io.StringIO()
    run_doctor(cfg, out=out, **kw)
    assert "voice upload" not in out.getvalue()


def test_doctor_probes_cli_binary_version(tmp_path):
    """With --backend cli, doctor runs `<binary> --version` like the
    reference (`cmd/pockettts/doctor.go:110-118`)."""
    fake = tmp_path / "pocket-tts"
    fake.write_text("#!/bin/sh\necho pocket-tts 9.9.9\n")
    fake.chmod(0o755)
    cfg = cfgmod.Config()
    cfg.tts.backend = "cli"
    cfg.tts.cli_path = str(fake)
    cfg.paths.model_path = str(tmp_path / "missing")
    out = io.StringIO()
    run_doctor(
        cfg,
        out=out,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert "pocket-tts binary" in out.getvalue()
    assert "pocket-tts 9.9.9" in out.getvalue()

    cfg.tts.cli_path = str(tmp_path / "nonexistent")
    out2 = io.StringIO()
    res = run_doctor(
        cfg,
        out=out2,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert "✗ pocket-tts binary" in out2.getvalue()
    assert not res.ok


def test_doctor_previews_serving_autotune(tmp_path):
    """Batch serving: doctor shows what `serve` will autotune so operators
    see the effective config before traffic (VERDICT r3 #3)."""
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(tmp_path / "missing.safetensors")
    cfg.paths.tokenizer_model = str(tmp_path / "missing.model")
    cfg.paths.voices_manifest = ""
    cfg.runtime.batch_slots = 8
    out = io.StringIO()
    run_doctor(
        cfg,
        out=out,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    text = out.getvalue()
    assert "✓ serving autotune" in text
    assert "quantize" in text and "steps_per_sync_burst" in text
    # Doctor only previews — the cfg itself is untouched.
    assert cfg.runtime.quantize is False

    cfg.runtime.autotune = False
    out2 = io.StringIO()
    run_doctor(
        cfg,
        out=out2,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert "no changes" in out2.getvalue()


def test_doctor_flags_undersized_continuity_capacity(tmp_path):
    """continuity + batch serving with a small per-lane KV capacity resets
    the session nearly every chunk — doctor must call it out."""
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(tmp_path / "missing.safetensors")
    cfg.paths.tokenizer_model = str(tmp_path / "missing.model")
    cfg.paths.voices_manifest = ""
    cfg.tts.continuity = True
    cfg.runtime.batch_slots = 4
    cfg.runtime.batch_prompt_capacity = 128
    out = io.StringIO()
    res = run_doctor(
        cfg,
        out=out,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert "✗ continuity capacity" in out.getvalue()
    assert "continuity capacity" in res.failures

    cfg.runtime.batch_prompt_capacity = 512
    out2 = io.StringIO()
    res2 = run_doctor(
        cfg,
        out=out2,
        jax_probe=lambda: "jax x.y",
        native_probe=lambda: "lib ok",
        tokenizer_probe=lambda p: (True, "backend=hf"),
    )
    assert "✓ continuity capacity" in out2.getvalue()


def test_doctor_flags_degraded_tokenizer_backend(tmp_path, monkeypatch):
    """A model with a precompiled charsmap served by the pure fallback must
    fail doctor (wrong tokens -> wrong speech with no error; VERDICT r2 #6)."""
    from go_pocket_tts_tpu.text import sentencepiece as spm
    from test_tokenizer import _toy_model

    m = _toy_model()
    m.precompiled_charsmap = b"\x01\x02\x03"
    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(m.serialize())

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(synthetic.tiny_arch(), 1))
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.paths.voices_manifest = ""

    # Force the pure fallback regardless of whether HF tokenizers is in the
    # image (the charsmap bytes are fake, so HF would reject them anyway).
    monkeypatch.setattr(spm, "_build_hf_backend", lambda model: None)
    res = run_doctor(cfg, jax_probe=lambda: "jax", native_probe=lambda: "ok")
    assert "tokenizer backend" in res.failures
    assert not res.ok

    # Without a charsmap the pure backend is exact -> green.
    m2 = _toy_model()
    tok_path.write_bytes(m2.serialize())
    res2 = run_doctor(cfg, jax_probe=lambda: "jax", native_probe=lambda: "ok")
    assert "tokenizer backend" not in res2.failures


def test_doctor_reports_failures(tmp_path):
    cfg = cfgmod.Config()
    cfg.paths.model_path = str(tmp_path / "missing.safetensors")
    cfg.paths.tokenizer_model = str(tmp_path / "missing.model")
    res = run_doctor(
        cfg,
        jax_probe=lambda: (_ for _ in ()).throw(RuntimeError("no jax")),
        native_probe=lambda: "ok",
    )
    assert not res.ok
    assert "jax backend" in res.failures
    assert "model file" in res.failures


# -- model assets ------------------------------------------------------------


def test_pinned_manifests():
    m = mf.pinned_manifest(mf.UNGATED_REPO)
    assert len(m.files) == 2
    assert m.files[0].sha256.startswith("58aa704a")
    v = mf.voice_manifest()
    assert len(v.files) == 8
    assert v.files[0].save_name == "alba.safetensors"
    with pytest.raises(ValueError):
        mf.pinned_manifest("unknown/repo")


class _FakeResponse(io.BytesIO):
    def __init__(self, data=b"", headers=None):
        super().__init__(data)
        self.headers = headers or {}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_download_manifest_hf_token_header(tmp_path):
    """--hf-token adds a Bearer Authorization header to every request
    (`cmd/pockettts-tools/model_download.go:74`)."""
    import hashlib
    import urllib.request

    payload = b"gated-bytes"
    digest = hashlib.sha256(payload).hexdigest()
    manifest = mf.Manifest(
        repo="test/gated",
        files=[mf.ModelFile("g.bin", "rev", sha256=digest)],
    )
    seen = []

    def opener(req):
        assert isinstance(req, urllib.request.Request)
        seen.append(req.get_header("Authorization"))
        return _FakeResponse(payload, {"Content-Length": str(len(payload))})

    dl.download_manifest(manifest, str(tmp_path), opener=opener, token="tok123")
    assert seen and all(h == "Bearer tok123" for h in seen)


def test_model_download_fallback_flags(tmp_path, monkeypatch, capsys):
    """CLI fallback semantics: token dropped on the ungated retry;
    --fallback-ungated false disables the retry; --hf-repo alias parses
    (`cmd/pockettts-tools/model_download.go:72-76`)."""
    calls = []

    def fake_dl(manifest, dest, progress=None, token=""):
        calls.append((manifest.repo, token))
        if len(calls) == 1:
            raise dl.AccessDeniedError("denied")
        return {"file.bin": "abc"}

    monkeypatch.setattr(dl, "download_manifest", fake_dl)
    rc = main(
        ["model", "download", "--hf-repo", mf.GATED_REPO,
         "--out-dir", str(tmp_path), "--hf-token", "tok"]
    )
    assert rc == 0
    capsys.readouterr()
    assert calls[0] == (mf.GATED_REPO, "tok")
    assert calls[1][1] == ""  # fallback retries without the token

    calls.clear()
    with pytest.raises(dl.AccessDeniedError):
        main(
            ["model", "download", "--hf-repo", mf.GATED_REPO,
             "--dest", str(tmp_path), "--fallback-ungated", "false"]
        )
    assert len(calls) == 1  # no retry


def test_download_manifest_checksum_and_lock(tmp_path):
    import hashlib

    payload = b"model-bytes"
    digest = hashlib.sha256(payload).hexdigest()
    manifest = mf.Manifest(
        repo="test/repo",
        files=[mf.ModelFile("file.bin", "rev", sha256=digest)],
    )

    def opener(req):
        return _FakeResponse(payload, {"Content-Length": str(len(payload))})

    resolved = dl.download_manifest(manifest, str(tmp_path), opener=opener)
    assert resolved["file.bin"] == digest
    assert (tmp_path / "file.bin").read_bytes() == payload
    lock = json.loads((tmp_path / dl.LOCK_FILENAME).read_text())
    assert lock["files"][0]["sha256"] == digest

    # Second call skips (we poison the opener to prove no network hit).
    def explode(req):
        raise AssertionError("should not re-download")

    resolved2 = dl.download_manifest(manifest, str(tmp_path), opener=explode)
    assert resolved2 == resolved


def test_download_checksum_mismatch_rejected(tmp_path):
    manifest = mf.Manifest(
        repo="test/repo", files=[mf.ModelFile("f.bin", "rev", sha256="0" * 64)]
    )

    def opener(req):
        return _FakeResponse(b"wrong", {})

    with pytest.raises(ValueError, match="checksum mismatch"):
        dl.download_manifest(manifest, str(tmp_path), opener=opener)
    assert not (tmp_path / "f.bin").exists()


def test_download_access_denied(tmp_path):
    manifest = mf.Manifest(repo="gated/repo", files=[mf.ModelFile("f.bin", "rev", "a" * 64)])

    def opener(req):
        raise urllib.error.HTTPError(getattr(req, "full_url", "u"), 403, "forbidden", {}, None)

    with pytest.raises(dl.AccessDeniedError):
        dl.download_manifest(manifest, str(tmp_path), opener=opener)


def test_verify_native_model(tmp_path):
    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(synthetic.tiny_arch(), 2))
    res = verify_native_model(str(model_path), smoke_load=False)
    assert res.ok, res.checks

    res2 = verify_native_model(str(tmp_path / "nope.safetensors"), smoke_load=False)
    assert not res2.ok


# -- bench harness -----------------------------------------------------------


def test_bench_stats_and_threshold():
    runs = [
        RunResult(0, synth_seconds=2.0, audio_seconds=1.0, cold=True),
        RunResult(1, synth_seconds=0.5, audio_seconds=1.0),
        RunResult(2, synth_seconds=0.25, audio_seconds=1.0),
    ]
    stats = compute_stats(runs)
    # cold run excluded from aggregates
    assert stats.rtf_mean == pytest.approx(0.375)
    assert stats.rtf_min == 0.25
    check_rtf_threshold(stats, 0.0)  # disabled
    check_rtf_threshold(stats, 0.5)
    with pytest.raises(RuntimeError, match="exceeds threshold"):
        check_rtf_threshold(stats, 0.1)


def test_run_bench_with_stub_service():
    from go_pocket_tts_tpu.tts.service import PCMChunk

    class _Svc:
        def synthesize_stream(self, text, voice_path=""):
            yield PCMChunk(np.zeros(24000, np.float32), 0, True)

    stats = run_bench(_Svc(), "hello", runs=2)
    assert len(stats.runs) == 3  # cold + 2
    assert stats.runs[0].cold
    assert all(r.audio_seconds == 1.0 for r in stats.runs)
    assert stats.ttfa_p50 >= 0


# -- CLI ---------------------------------------------------------------------


@pytest.fixture
def synth_env(tmp_path, monkeypatch):
    """Full on-disk environment for CLI runs: model + tokenizer + voices."""
    arch = synthetic.tiny_arch()
    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(arch, 3))

    from go_pocket_tts_tpu.text.sentencepiece import SentencePieceModel

    m = SentencePieceModel()
    pieces = [("<unk>", 0.0, 2)] + [
        (p, -1.0, 1)
        for p in ("▁the", "▁quick", "▁brown", "▁fox", "▁hello", "▁world", ".", "▁a")
    ] + [(c, -5.0, 1) for c in "abcdefghijklmnopqrstuvwxyz▁ABCDEFGHIJKLMNOPQRSTUVWXYZ"]
    for p, s, t in pieces:
        m.pieces.append(p)
        m.scores.append(s)
        m.types.append(t)
    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(m.serialize())

    monkeypatch.setenv("POCKETTTS_PATHS_MODEL_PATH", str(model_path))
    monkeypatch.setenv("POCKETTTS_PATHS_TOKENIZER_MODEL", str(tok_path))
    monkeypatch.setenv("POCKETTTS_MAX_STEPS", "3")
    monkeypatch.setenv("POCKETTTS_EOS_THRESHOLD", "1000000")
    monkeypatch.setenv("POCKETTTS_RUNTIME_SEED", "7")
    return tmp_path


def test_cli_synth_writes_wav(synth_env, tmp_path):
    out = tmp_path / "out.wav"
    rc = main(["synth", "--text", "hello world", "--out", str(out)])
    assert rc == 0
    from go_pocket_tts_tpu.utils import wav as wavmod

    samples, rate = wavmod.decode_wav(out.read_bytes())
    assert rate == 24000
    assert len(samples) > 0


def test_cli_synth_stdout(synth_env, capsysbinary):
    rc = main(["synth", "--text", "hello", "--out", "-"])
    assert rc == 0
    data = capsysbinary.readouterr().out
    assert data[:4] == b"RIFF"


def test_cli_doctor_runs(synth_env, capsys):
    rc = main(["doctor"])
    captured = capsys.readouterr().out
    assert "model file" in captured
    assert rc == 0


def test_cli_model_verify(synth_env, capsys):
    rc = main(["model", "verify"])
    assert rc == 0
    assert "✓" in capsys.readouterr().out


def test_cli_bench_json(synth_env, capsys):
    rc = main(["bench", "--text", "hello world", "--runs", "1", "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "rtf_mean" in out


def test_cli_export_voice(synth_env, tmp_path, capsys):
    from go_pocket_tts_tpu.utils import wav as wavmod

    speaker = tmp_path / "speaker.wav"
    speaker.write_bytes(
        wavmod.encode_wav((np.random.RandomState(1).randn(1920 * 2) * 0.1).astype(np.float32))
    )
    out = tmp_path / "voice.safetensors"
    rc = main(["export-voice", "--input", str(speaker), "--output", str(out)])
    assert rc == 0
    assert out.exists()


def test_cli_model_export_strip(synth_env, tmp_path, capsys):
    out = tmp_path / "stripped.safetensors"
    rc = main(["model", "export", "--output", str(out), "--strip-voice-cloning"])
    assert rc == 0
    from go_pocket_tts_tpu.utils.safetensors import open_store

    store = open_store(out)
    names = store.names()
    assert not any(n.startswith("mimi.encoder") for n in names)
    assert not any(n.startswith("condition_provider") for n in names)
    assert any(n.startswith("mimi.decoder") for n in names)
    # Still a loadable model.
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.models import synthetic as _synth

    load_model_from_store(store, num_heads=_synth.tiny_arch().num_heads)


def test_compare_tensor_report():
    from go_pocket_tts_tpu.tts.parity import compare_tensor

    a = np.ones((2, 3), np.float32)
    rep = compare_tensor("x", a, a)
    assert rep.passed and rep.shape_match and rep.max_abs_err == 0.0
    rep2 = compare_tensor("x", a, a + 1.0)
    assert not rep2.passed and rep2.max_abs_err == 1.0
    rep3 = compare_tensor("x", a, np.ones((3, 2), np.float32))
    assert not rep3.shape_match and not rep3.passed
