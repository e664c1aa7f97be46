"""HTTP server tests with stub synthesizers (mirrors the reference's
httptest-based tiers: worker pool saturation, limits, timeouts, streaming
framing, health/voices)."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from go_pocket_tts_tpu.server import Server, probe_http
from go_pocket_tts_tpu.tts.service import PCMChunk
from go_pocket_tts_tpu.utils import wav


class _StubService:
    """Synthesizes 100 samples per word, optionally slowly."""

    def __init__(self, delay=0.0, chunks=1, fail=False):
        self.delay = delay
        self.chunks = chunks
        self.fail = fail
        self.calls = 0

    def synthesize_stream(self, text, voice_path="", cancel=None):
        self.calls += 1
        if self.fail:
            raise RuntimeError("boom")
        for i in range(self.chunks):
            if self.delay:
                time.sleep(self.delay)
            if cancel is not None and cancel():
                from go_pocket_tts_tpu.tts.service import CancelledError

                raise CancelledError("cancelled")
            yield PCMChunk(
                samples=np.full(100, 0.1, np.float32),
                chunk_index=i,
                final=i == self.chunks - 1,
            )


class _StubVoices:
    def list_voices(self):
        from go_pocket_tts_tpu.tts.voices import Voice

        return [Voice(id="alba", path="alba.safetensors", license="CC-BY-4.0")]

    def resolve_path(self, vid):
        if vid == "alba":
            return "/tmp/alba.safetensors"
        raise KeyError(vid)


def _post(url, obj, timeout=10):
    req = urllib.request.Request(
        url,
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=timeout)


@pytest.fixture
def server():
    svc = _StubService()
    srv = Server(svc, _StubVoices(), listen_addr="127.0.0.1:0", workers=2,
                 max_text_bytes=64, request_timeout=2.0)
    srv.start()
    yield srv, svc
    srv.shutdown()


def test_health_and_probe(server):
    srv, _ = server
    out = probe_http(f"http://127.0.0.1:{srv.port}")
    assert out["status"] == "ok"
    assert "version" in out


def test_voices_endpoint(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/voices") as resp:
        data = json.load(resp)
    assert data["voices"][0]["id"] == "alba"


def test_tts_returns_wav(server):
    srv, _ = server
    with _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "hello"}) as resp:
        assert resp.headers["Content-Type"] == "audio/wav"
        body = resp.read()
    samples, rate = wav.decode_wav(body)
    assert rate == 24000
    assert len(samples) == 100


def _parse_sse(body: bytes):
    events = []
    for block in body.decode("utf-8").split("\n\n"):
        if not block.strip():
            continue
        ev, data = None, None
        for line in block.splitlines():
            if line.startswith("event: "):
                ev = line[7:]
            elif line.startswith("data: "):
                data = json.loads(line[6:])
        events.append((ev, data))
    return events


def test_tts_progress_sse():
    """POST /tts with progress:true → SSE progress events per PCM block,
    then an audio event whose base64 body equals the plain response
    (VERDICT r3 #7)."""
    import base64

    class _FramesService(_StubService):
        def synthesize_stream(self, text, voice_path="", cancel=None):
            self.calls += 1
            for i in range(3):  # 2 latent frames of PCM per block
                yield PCMChunk(
                    samples=np.full(3840, 0.1, np.float32),
                    chunk_index=i,
                    final=i == 2,
                )

    svc = _FramesService()
    srv = Server(svc, _StubVoices(), listen_addr="127.0.0.1:0", workers=2,
                 max_text_bytes=64, request_timeout=5.0)
    srv.start()
    try:
        with _post(
            f"http://127.0.0.1:{srv.port}/tts",
            {"text": "hello world", "progress": True},
        ) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "text/event-stream"
            events = _parse_sse(resp.read())
    finally:
        srv.shutdown()

    progress = [d for ev, d in events if ev == "progress"]
    audio = [d for ev, d in events if ev == "audio"]
    assert [p["frames_done"] for p in progress] == [2, 4, 6]
    assert all(p["frames_total"] >= p["frames_done"] for p in progress)
    assert progress[-1]["seconds_done"] == pytest.approx(3 * 3840 / 24000, abs=1e-3)
    assert len(audio) == 1 and audio[0]["format"] == "wav"
    body = base64.b64decode(audio[0]["audio_b64"])
    pcm, sr = wav.decode_wav(body)
    assert sr == 24000 and len(pcm) == 3 * 3840
    assert audio[0]["seconds"] == pytest.approx(len(pcm) / 24000, abs=1e-3)


def test_tts_progress_error_mid_stream():
    """A synthesis failure after the SSE header is already out becomes an
    error event (the plain path's 500), not a truncated stream."""

    class _FailAfterOne(_StubService):
        def synthesize_stream(self, text, voice_path="", cancel=None):
            yield PCMChunk(samples=np.full(1920, 0.1, np.float32),
                           chunk_index=0, final=False)
            raise RuntimeError("boom mid-stream")

    svc = _FailAfterOne()
    srv = Server(svc, _StubVoices(), listen_addr="127.0.0.1:0", workers=2,
                 max_text_bytes=64, request_timeout=5.0)
    srv.start()
    try:
        with _post(
            f"http://127.0.0.1:{srv.port}/tts",
            {"text": "hello", "progress": True},
        ) as resp:
            events = _parse_sse(resp.read())
    finally:
        srv.shutdown()
    kinds = [ev for ev, _ in events]
    assert kinds == ["progress", "error"]
    err = events[-1][1]
    assert err["status"] == 500 and "boom" in err["error"]


def test_tts_empty_text_400(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "   "})
    assert exc_info.value.code == 400


def test_tts_oversize_413(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "x" * 100})
    assert exc_info.value.code == 413


def test_tts_invalid_json_400(server):
    srv, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/tts", data=b"{nope", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=5)
    assert exc_info.value.code == 400


def test_tts_error_500(server):
    srv, _ = server
    svc = _StubService(fail=True)
    srv2 = Server(svc, listen_addr="127.0.0.1:0")
    srv2.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"http://127.0.0.1:{srv2.port}/tts", {"text": "hello"})
        assert exc_info.value.code == 500
        assert json.loads(exc_info.value.read())["error"] == "boom"
    finally:
        srv2.shutdown()


def test_tts_timeout_504():
    svc = _StubService(delay=0.4, chunks=3)
    srv = Server(svc, listen_addr="127.0.0.1:0", request_timeout=0.5)
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "hello"}, timeout=10)
        assert exc_info.value.code == 504
    finally:
        srv.shutdown()


class _DeadlineAwareStub:
    """Stub exposing the full Service signature: records the deadline the
    handler passes and raises like a clamped single-chunk request would."""

    def __init__(self):
        self.deadline = None

    def synthesize_stream(self, text, voice_path="", cancel=None,
                          frame_streaming=False, deadline=None):
        self.deadline = deadline
        from go_pocket_tts_tpu.tts.service import CancelledError

        # Single chunk whose pre-dispatch budget check fails (deadline in the
        # past by the time the chunk dispatches).
        if deadline is not None and time.monotonic() > deadline:
            raise CancelledError("request deadline exceeded before dispatch")
        yield PCMChunk(samples=np.zeros(10, np.float32), chunk_index=0, final=True)


def test_tts_single_chunk_deadline_504():
    """A single-chunk request must 504 via the deadline handed to the
    Service (max_steps clamping path), not only between chunks."""
    svc = _DeadlineAwareStub()
    srv = Server(svc, listen_addr="127.0.0.1:0", request_timeout=-0.1)
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "hello"}, timeout=10)
        assert exc_info.value.code == 504
        assert svc.deadline is not None  # the handler passed the deadline through
    finally:
        srv.shutdown()


def test_streaming_wav_framing(server):
    srv, _ = server
    svc = _StubService(chunks=3)
    srv2 = Server(svc, listen_addr="127.0.0.1:0")
    srv2.start()
    try:
        with _post(f"http://127.0.0.1:{srv2.port}/tts/stream", {"text": "hello"}) as resp:
            body = resp.read()  # urllib de-chunks
        # streaming header + 3 chunks of 100 samples
        assert body[:4] == b"RIFF"
        samples, rate = wav.decode_wav(body)
        assert len(samples) == 300
    finally:
        srv2.shutdown()


def test_worker_pool_saturation_503():
    svc = _StubService(delay=1.0)
    srv = Server(svc, listen_addr="127.0.0.1:0", workers=1, request_timeout=5.0)
    # Shrink the queue wait so the test is fast.
    srv._httpd.RequestHandlerClass = None  # replaced below
    from go_pocket_tts_tpu.server.http import make_handler

    srv._httpd.RequestHandlerClass = make_handler(
        svc, None, max_text_bytes=4096, request_timeout=5.0, workers=1, queue_timeout=0.2
    )
    srv.start()
    try:
        results = {}

        def call(name):
            try:
                with _post(f"http://127.0.0.1:{srv.port}/tts", {"text": "hi"}, timeout=10) as r:
                    results[name] = r.status
            except urllib.error.HTTPError as e:
                results[name] = e.code

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.1)
        for t in threads:
            t.join()
        codes = sorted(results.values())
        assert 503 in codes  # at least one rejected while the pool is busy
        assert 200 in codes
    finally:
        srv.shutdown()


def test_stats_endpoint(server):
    srv, svc = server
    base = f"http://127.0.0.1:{srv.port}"
    with urllib.request.urlopen(f"{base}/stats", timeout=5) as r:
        fresh = json.loads(r.read())
    assert fresh["requests_total"] == 0
    assert fresh["in_flight"] == 0
    assert fresh["aggregate_x_realtime"] is None

    with _post(f"{base}/tts", {"text": "hi"}) as r:
        assert r.status == 200
    with _post(f"{base}/tts/stream", {"text": "hi"}) as r:
        assert r.status == 200
        r.read()

    with urllib.request.urlopen(f"{base}/stats", timeout=5) as r:
        after = json.loads(r.read())
    assert after["requests_total"] == 2
    assert after["ok_total"] == 2
    assert after["in_flight"] == 0
    assert after["audio_seconds_total"] > 0
    assert after["error_total"] == 0


def test_metrics_endpoint_prometheus_format(server):
    """GET /metrics renders the /stats counters in Prometheus text
    exposition format (TYPE line per series, `name value` samples)."""
    srv, _svc = server
    base = f"http://127.0.0.1:{srv.port}"
    with _post(f"{base}/tts", {"text": "hi"}) as r:
        assert r.status == 200
    with urllib.request.urlopen(f"{base}/metrics", timeout=5) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    metrics = {}
    for line in body.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.split()
        metrics[name] = float(val)
    assert metrics["pockettts_requests_total"] == 1
    assert metrics["pockettts_ok_total"] == 1
    assert metrics["pockettts_in_flight"] == 0
    assert metrics["pockettts_audio_seconds_total"] > 0
    assert "# TYPE pockettts_in_flight gauge" in body
    assert "# TYPE pockettts_requests_total counter" in body


def test_stats_counts_errors(server):
    srv, svc = server
    svc.fail = True
    base = f"http://127.0.0.1:{srv.port}"
    with pytest.raises(urllib.error.HTTPError):
        _post(f"{base}/tts", {"text": "hi"})
    with urllib.request.urlopen(f"{base}/stats", timeout=5) as r:
        after = json.loads(r.read())
    assert after["error_total"] == 1
    assert after["ok_total"] == 0
    assert after["in_flight"] == 0


def test_oversize_content_length_rejected_before_read(server):
    """Attacker-controlled Content-Length is rejected with 413 BEFORE the
    body is buffered (the reference caps at the reader)."""
    srv, _svc = server
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    conn.putrequest("POST", "/tts")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", str(2**31 - 1))
    conn.endheaders()
    # Send only a few bytes — the server must answer without waiting for 2 GB.
    conn.send(b'{"text":')
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_non_object_json_body_400(server):
    srv, _svc = server
    for body in (b'"hello"', b"[1,2]", b"42", b'{"text": 7}'):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/tts",
            data=body,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError(f"expected 400 for {body!r}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (body, e.code)


def test_web_demo_served_at_root(server):
    """GET / serves web/index.html same-origin — without this (and CORS) the
    bundled page cannot call the API from a browser at all."""
    srv, _ = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/", timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/html")
        body = r.read()
    assert b"/tts" in body and b"voice" in body


def test_cors_headers_on_api_responses(server):
    srv, _ = server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/voices", timeout=10
    ) as r:
        assert r.headers["Access-Control-Allow-Origin"] == "*"
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/tts", method="OPTIONS"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 204
        assert "POST" in r.headers["Access-Control-Allow-Methods"]
