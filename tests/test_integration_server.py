"""Server + real (tiny) model integration: the full seam from HTTP socket to
the jitted pipeline, including frame streaming (the reference's `-tags
integration` tier, run here with synthetic weights)."""

import json
import urllib.request

import numpy as np
import pytest

from go_pocket_tts_tpu.config import TTSConfig
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import TPURuntime
from go_pocket_tts_tpu.server import Server
from go_pocket_tts_tpu.tts.service import Service
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

ARCH = synthetic.tiny_arch()


class _Tok:
    def encode(self, s):
        return [(abs(hash(w)) % ARCH.n_bins) for w in s.split()]


@pytest.fixture(scope="module")
def server():
    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(ARCH, seed=77))),
        num_heads=ARCH.num_heads,
    )
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    svc = Service(rt, _Tok(), TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=6))
    srv = Server(svc, listen_addr="127.0.0.1:0", request_timeout=120)
    srv.start()
    yield srv
    srv.shutdown()


def _post(url, obj, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST"
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_tts_through_real_pipeline(server):
    with _post(f"http://127.0.0.1:{server.port}/tts", {"text": "hello world again"}) as r:
        body = r.read()
    samples, rate = wav.decode_wav(body)
    assert rate == 24000
    assert len(samples) == 6 * 1920
    assert np.all(np.isfinite(samples))


def test_per_request_continuity(server):
    """{"continuity": true} carries prosody state across the text chunks of
    THIS request even though the server default is off: at temp 0 the second
    chunk is conditioned on the first, so the audio differs from the
    independent-chunks default; omitting the field equals continuity:false."""
    base = f"http://127.0.0.1:{server.port}/tts"
    # Two sentences of ~30 words each: the greedy chunker merges sentences
    # while under the 50-token budget, so each sentence must be large enough
    # that together they exceed it → exactly two chunks.
    sentence = " ".join(f"word{i}" for i in range(30))
    two_chunks = f"{sentence}. {sentence}."

    def synth(body):
        with _post(base, body) as r:
            return wav.decode_wav(r.read())[0]

    plain = synth({"text": two_chunks})
    off = synth({"text": two_chunks, "continuity": False})
    on = synth({"text": two_chunks, "continuity": True})
    np.testing.assert_array_equal(plain, off)
    assert len(on) == len(plain)
    assert not np.array_equal(on, plain), (
        "continuity:true produced identical audio — the override never "
        "reached the session path"
    )
    # First chunk unaffected (no history yet): both runs start identically.
    head = 6 * 1920
    np.testing.assert_allclose(on[:head], plain[:head], atol=1e-5)

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        synth({"text": "hi", "continuity": "yes"})
    assert exc_info.value.code == 400


@pytest.fixture(scope="module")
def batch_server():
    """Continuous batcher behind the HTTP server — the production serving
    shape (config 4/5), here at 2 slots on the tiny arch."""
    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime

    model = load_model_from_store(
        open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(ARCH, seed=77))),
        num_heads=ARCH.num_heads,
    )
    rt = BatcherRuntime(
        model, slots=2, seed=11, prompt_capacity=64,
        quantize=True, kv_quantize=True,
    )
    svc = Service(rt, _Tok(), TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=4))
    srv = Server(svc, listen_addr="127.0.0.1:0", workers=8, request_timeout=180)
    srv.start()
    yield srv
    srv.shutdown()
    rt.close()


def test_mixed_protocol_concurrency_through_batcher(batch_server):
    """Plain /tts, chunked /tts/stream, SSE progress, and FLAC requests all
    in flight at once against the 2-slot batcher: every response valid, and
    identical-input plain/stream/SSE bodies decode to the same audio."""
    import base64
    import concurrent.futures

    port = batch_server.port

    def plain():
        with _post(f"http://127.0.0.1:{port}/tts", {"text": "hello world again"}) as r:
            assert r.headers["Content-Type"].startswith("audio/wav")
            return wav.decode_wav(r.read())[0]

    def stream():
        with _post(
            f"http://127.0.0.1:{port}/tts/stream", {"text": "hello world again"}
        ) as r:
            return wav.decode_wav(r.read())[0]

    def sse():
        with _post(
            f"http://127.0.0.1:{port}/tts",
            {"text": "hello world again", "progress": True},
        ) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = r.read().decode()
        events = [b for b in raw.strip().split("\n\n") if b]
        kinds = [e.splitlines()[0].split(": ", 1)[1] for e in events]
        assert "audio" in kinds and "progress" in kinds, kinds
        datum = json.loads(events[kinds.index("audio")].splitlines()[1].split(": ", 1)[1])
        return wav.decode_wav(base64.b64decode(datum["audio_b64"]))[0]

    def flac():
        with _post(
            f"http://127.0.0.1:{port}/tts", {"text": "other words", "format": "flac"}
        ) as r:
            assert r.headers["Content-Type"].startswith("audio/flac")
            body = r.read()
        from go_pocket_tts_tpu.utils.flac import decode_flac

        pcm16, rate = decode_flac(body)
        assert rate == 24000
        return pcm16

    jobs = [plain, stream, sse, flac, plain, stream, sse, flac]
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = [f.result(timeout=300) for f in [ex.submit(j) for j in jobs]]

    a_plain, a_stream, a_sse = results[0], results[1], results[2]
    assert len(a_plain) == 4 * 1920
    np.testing.assert_allclose(a_stream, a_plain, atol=2e-3)
    np.testing.assert_allclose(a_sse, a_plain, atol=2e-3)
    # Temp-0 determinism under load, to the int16 quantization bound:
    # identical requests may harvest in different decode-bucket / lane-count
    # program variants depending on what else shares the wave, and XLA's
    # per-shape codegen rounds the final float PCM up to 1 int16 LSB apart
    # (~3e-5, measured; latents are bitwise identical). Exact equality here
    # flaked roughly once per few full-suite runs.
    np.testing.assert_allclose(results[0], results[4], atol=2.5 / 32767.0)


def test_tts_stream_frame_level(server):
    """/tts/stream uses frame streaming with the TPU runtime: the de-chunked
    stream must equal the non-streamed synthesis (temp=0, same seed stream —
    both paths split the same per-request RNG)."""
    with _post(f"http://127.0.0.1:{server.port}/tts/stream", {"text": "hello world again"}) as r:
        stream_body = r.read()
    s_stream, _ = wav.decode_wav(stream_body)
    assert len(s_stream) == 6 * 1920
    with _post(f"http://127.0.0.1:{server.port}/tts", {"text": "hello world again"}) as r:
        s_whole, _ = wav.decode_wav(r.read())
    np.testing.assert_allclose(s_stream, s_whole, atol=2e-3)
