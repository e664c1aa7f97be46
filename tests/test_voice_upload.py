"""Runtime voice upload (POST /voices): bucketed encoding, uploader flow,
HTTP route, and the prewarm contract for uploaded voices.

Beyond reference parity — the Go server's voice list is immutable after
start (`internal/server/server.go:160-167`)."""

import base64
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from go_pocket_tts_tpu.config import TTSConfig
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import TPURuntime
from go_pocket_tts_tpu.server import Server
from go_pocket_tts_tpu.tts.service import Service
from go_pocket_tts_tpu.tts.voice_export import VoiceEncoder
from go_pocket_tts_tpu.tts.voice_upload import DuplicateVoice, VoiceUploader
from go_pocket_tts_tpu.tts.voices import VoiceManager
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.safetensors import (
    encode_tensors,
    load_voice_embedding,
    open_store_from_bytes,
    write_file,
)

ARCH = synthetic.tiny_arch()


class _WordTokenizer:
    def encode(self, s):
        return [(abs(hash(w)) % ARCH.n_bins) for w in s.split()]


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ckpt") / "model.safetensors"
    write_file(p, synthetic.build_checkpoint(ARCH, seed=44))
    return str(p)


@pytest.fixture(scope="module")
def store(ckpt_path):
    with open(ckpt_path, "rb") as f:
        return open_store_from_bytes(f.read())


def _wav_bytes(seconds: float = 0.5, rate: int = 24000, seed: int = 0) -> bytes:
    n = int(seconds * rate)
    samples = (np.random.RandomState(seed).randn(n) * 0.1).astype(np.float32)
    return wav.encode_wav(samples, rate)


# -- VoiceManager runtime registration ---------------------------------------


def test_manager_in_memory_register_and_resolve(tmp_path):
    mgr = VoiceManager.in_memory(str(tmp_path))
    path = tmp_path / "a.safetensors"
    path.write_bytes(b"x")
    v = mgr.register("alice", str(path), license="cc0")
    assert [x.id for x in mgr.list_voices()] == ["alice"]
    assert mgr.resolve_path("alice") == str(path)
    assert v.license == "cc0"
    with pytest.raises(ValueError, match="duplicate"):
        mgr.register("alice", str(path))
    with pytest.raises(ValueError, match="id is required"):
        mgr.register("", str(path))
    with pytest.raises(ValueError, match="empty path"):
        mgr.register("bob", "")


def test_manifest_manager_accepts_runtime_registration(tmp_path):
    manifest = tmp_path / "manifest.json"
    base = tmp_path / "base.safetensors"
    base.write_bytes(b"x")
    manifest.write_text(
        json.dumps({"voices": [{"id": "base", "path": "base.safetensors"}]})
    )
    mgr = VoiceManager(str(manifest))
    extra = tmp_path / "extra.safetensors"
    extra.write_bytes(b"y")
    mgr.register("extra", str(extra))
    assert [x.id for x in mgr.list_voices()] == ["base", "extra"]
    with pytest.raises(ValueError, match="duplicate"):
        mgr.register("base", str(extra))


# -- bucketed encoding -------------------------------------------------------


def test_encode_pad_to_bucket_matches_direct(store):
    """The SEANet encoder is causal, so padding audio to a frame bucket and
    trimming the latent frames must equal the direct encode — this is what
    lets uploads key the encode program on ≤4 shapes instead of one per
    audio length."""
    enc = VoiceEncoder(store)
    spf = enc.cfg.samples_per_latent
    n = spf * 5 + 777  # deliberately not frame-aligned
    samples = (np.random.RandomState(3).randn(n) * 0.1).astype(np.float32)
    direct = enc.encode_samples(samples, enc.cfg.sample_rate)
    bucketed = enc.encode_samples(samples, enc.cfg.sample_rate, pad_to_bucket=True)
    assert bucketed.shape == (1, n // spf, direct.shape[2])
    np.testing.assert_allclose(bucketed, direct[:, : n // spf], atol=1e-5)


def test_encode_pad_to_bucket_rejects_sub_frame_audio(store):
    enc = VoiceEncoder(store)
    samples = np.zeros(enc.cfg.samples_per_latent - 1, np.float32)
    with pytest.raises(ValueError, match="shorter than one latent frame"):
        enc.encode_samples(samples, enc.cfg.sample_rate, pad_to_bucket=True)


# -- uploader flow -----------------------------------------------------------


def test_uploader_flow(ckpt_path, tmp_path):
    mgr = VoiceManager.in_memory(str(tmp_path))
    up = VoiceUploader(ckpt_path, str(tmp_path / "voices"), mgr)
    record = up.upload("narrator", _wav_bytes(0.5), license="test")
    assert record["id"] == "narrator"
    # Must register ABSOLUTE: a manifest-backed manager resolves relative
    # paths against the manifest dir, not the server cwd.
    import os

    assert os.path.isabs(record["path"])
    assert record["frames"] == int(0.5 * 24000) // 1920
    assert record["license"] == "test"
    # Registered and loadable as a [1, T, D] embedding voice.
    path = mgr.resolve_path("narrator")
    emb = load_voice_embedding(path)
    assert emb.shape == (1, record["frames"], ARCH.d_model)
    with pytest.raises(DuplicateVoice):
        up.upload("narrator", _wav_bytes(0.5))


def test_upload_resolves_with_manifest_manager_elsewhere(
    ckpt_path, tmp_path, monkeypatch
):
    """Regression: with a relative --voice-upload-dir and a voices manifest
    living in another directory, resolve_path() must still find the uploaded
    file (the manager resolves relative paths against the MANIFEST dir, so
    the uploader must register absolute paths)."""
    import os

    mdir = tmp_path / "manifest_home"
    mdir.mkdir()
    (mdir / "manifest.json").write_text(json.dumps({"voices": []}))
    mgr = VoiceManager(str(mdir / "manifest.json"))
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    up = VoiceUploader(ckpt_path, "uploads", mgr)
    up.upload("rel", _wav_bytes(0.2))
    assert os.path.exists(mgr.resolve_path("rel"))


def test_uploader_rejects_bad_input(ckpt_path, tmp_path):
    mgr = VoiceManager.in_memory(str(tmp_path))
    up = VoiceUploader(ckpt_path, str(tmp_path / "voices"), mgr, max_audio_bytes=10_000)
    for bad_id in ("", "../evil", "a/b", "x" * 65, ".hidden"):
        with pytest.raises(ValueError, match="voice id"):
            up.upload(bad_id, _wav_bytes(0.1))
    with pytest.raises(ValueError, match="maximum size"):
        up.upload("big", _wav_bytes(1.0))  # 48000 samples > 10 kB cap
    with pytest.raises(ValueError):
        up.upload("garbage", b"not a wav file at all")
    assert mgr.list_voices() == []


def test_uploader_without_encoder_weights_is_server_error(tmp_path):
    """A no-voice-cloning checkpoint is an operator problem (HTTP 500), not
    a bad request."""
    ckpt = {
        k: v
        for k, v in synthetic.build_checkpoint(ARCH, seed=1).items()
        if not k.startswith(("mimi.encoder", "mimi.downsample", "condition_provider"))
    }
    p = tmp_path / "novc.safetensors"
    write_file(p, ckpt)
    up = VoiceUploader(str(p), str(tmp_path / "voices"), VoiceManager.in_memory())
    with pytest.raises(RuntimeError, match="no Mimi encoder"):
        up.upload("v", _wav_bytes(0.2))


# -- HTTP route --------------------------------------------------------------


@pytest.fixture(scope="module")
def upload_server(ckpt_path, store, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    model = load_model_from_store(store, num_heads=ARCH.num_heads)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    svc = Service(
        rt,
        _WordTokenizer(),
        TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=4),
    )
    mgr = VoiceManager.in_memory(str(tmp))
    uploader = VoiceUploader(
        ckpt_path,
        str(tmp / "voices"),
        mgr,
        service=svc,
        max_audio_bytes=1 << 20,
        prewarm=False,
    )
    srv = Server(
        svc,
        mgr,
        listen_addr="127.0.0.1:0",
        request_timeout=120,
        voice_uploader=uploader,
    )
    srv.start()
    yield srv
    srv.shutdown()


def _post(port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=timeout)


def _post_err(port, path, obj):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, path, obj)
    return ei.value.code, json.loads(ei.value.read().decode())


def test_post_voices_roundtrip(upload_server):
    port = upload_server.port
    audio = base64.b64encode(_wav_bytes(0.5, seed=7)).decode()
    with _post(port, "/voices", {"id": "cloned", "audio": audio}) as r:
        rec = json.loads(r.read().decode())["voice"]
    assert rec["id"] == "cloned" and rec["frames"] >= 1
    # Listed.
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/voices", timeout=30
    ) as r:
        ids = [v["id"] for v in json.loads(r.read().decode())["voices"]]
    assert "cloned" in ids
    # Usable by id in synthesis.
    with _post(port, "/tts", {"text": "hello there", "voice": "cloned"}) as r:
        samples, rate = wav.decode_wav(r.read())
    assert rate == 24000 and len(samples) > 0
    # Duplicate → 409.
    code, body = _post_err(port, "/voices", {"id": "cloned", "audio": audio})
    assert code == 409 and "duplicate" in body["error"]


def test_post_voices_validation_errors(upload_server):
    port = upload_server.port
    code, body = _post_err(port, "/voices", {"id": "v1", "audio": "!!notb64!!"})
    assert code == 400 and "base64" in body["error"]
    code, body = _post_err(port, "/voices", {"id": "v1"})
    assert code == 400 and "audio" in body["error"]
    code, body = _post_err(
        port, "/voices", {"id": "../evil", "audio": base64.b64encode(b"RIFF").decode()}
    )
    assert code == 400
    code, body = _post_err(port, "/voices", {"id": "v1", "audio": 7})
    assert code == 400
    # Oversize rejected from Content-Length, before the body is read.
    big = base64.b64encode(b"\0" * (2 << 20)).decode()
    code, body = _post_err(port, "/voices", {"id": "v1", "audio": big})
    assert code == 413


def test_post_voices_disabled_is_403(ckpt_path, store):
    model = load_model_from_store(store, num_heads=ARCH.num_heads)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    svc = Service(
        rt, _WordTokenizer(), TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=2)
    )
    srv = Server(svc, listen_addr="127.0.0.1:0", request_timeout=60)
    srv.start()
    try:
        code, body = _post_err(
            srv.port, "/voices", {"id": "v", "audio": base64.b64encode(b"x").decode()}
        )
        assert code == 403 and "--voice-upload-dir" in body["error"]
    finally:
        srv.shutdown()


# -- prewarm contract for uploaded voices ------------------------------------


def test_uploaded_voice_serves_with_zero_cold_compiles(
    ckpt_path, store, tmp_path, fresh_compile_cache
):
    """After `prewarm()` + an upload (which prewarms the new voice), a voiced
    request must trigger ZERO new XLA compiles — the upload path joins the
    same contract `serve --prewarm` establishes for manifest voices
    (`tests/test_batching.py::test_prewarm_covers_every_live_program`)."""
    import logging

    import jax

    model = load_model_from_store(store, num_heads=ARCH.num_heads)
    rt = TPURuntime(model, seed=5, frame_bucket=64)
    svc = Service(
        rt,
        _WordTokenizer(),
        TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=3, lsd_decode_steps=1),
    )
    mgr = VoiceManager.in_memory(str(tmp_path))
    up = VoiceUploader(
        ckpt_path, str(tmp_path / "voices"), mgr, service=svc, prewarm=True
    )
    compiles = []

    class _Handler(logging.Handler):
        def emit(self, record):
            if "Finished XLA compilation" in record.getMessage():
                compiles.append(record.getMessage())

    handler = _Handler(level=logging.DEBUG)
    dispatch_log = logging.getLogger("jax._src.dispatch")
    prev_level = dispatch_log.level
    prev_flag = jax.config.jax_log_compiles
    try:
        svc.prewarm(token_lengths=(10, 30, 50))
        record = up.upload("warmvoice", _wav_bytes(0.5, seed=9))
        assert record["prewarmed"] is True
        voice_path = mgr.resolve_path("warmvoice")

        dispatch_log.addHandler(handler)
        dispatch_log.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)
        audio = svc.synthesize(" ".join(["word"] * 40), voice_path=voice_path)
        assert len(audio) > 0
    finally:
        jax.config.update("jax_log_compiles", prev_flag)
        dispatch_log.removeHandler(handler)
        dispatch_log.setLevel(prev_level)
    assert compiles == [], f"uploaded voice hit cold programs: {compiles}"
