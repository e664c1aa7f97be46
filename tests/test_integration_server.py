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
