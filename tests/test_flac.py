"""FLAC codec tests.

No external FLAC implementation exists in this environment (zero egress, no
flac/ffmpeg binaries), so the oracle is the module's own *decoder*: an
independent bit-level parser that verifies the CRC-8 of every frame header
and the CRC-16 of every frame. Round-trips therefore check every emitted
bit against the format's own redundancy, plus structural assertions on the
container fields."""

import json
import urllib.request

import numpy as np
import pytest

from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.flac import (
    FlacError,
    FlacStreamEncoder,
    decode_flac,
    encode_flac,
)


def _roundtrip(x, **kw):
    out, rate = decode_flac(encode_flac(x, **kw))
    return out, rate


# -- round-trips ---------------------------------------------------------------


def test_roundtrip_random_noise():
    rng = np.random.RandomState(0)
    x = rng.randint(-32768, 32768, 5000).astype(np.int16)
    out, rate = _roundtrip(x)
    assert rate == 24_000
    np.testing.assert_array_equal(out, x)


def test_roundtrip_sine_compresses():
    t = np.arange(48_000)
    s = (0.4 * np.sin(2 * np.pi * 220 * t / 24_000)).astype(np.float32)
    enc = encode_flac(s)
    out, _ = decode_flac(enc)
    want = (np.clip(s, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(out, want)
    # Tonal audio must compress well below half of PCM16 size.
    assert len(enc) < len(s)  # < 0.5 × (2 bytes/sample)


def test_roundtrip_speechlike_random_walk():
    rng = np.random.RandomState(7)
    x = np.cumsum(rng.randn(60_000) * 300.0)
    x = np.clip(x - x.mean(), -30_000, 30_000).astype(np.int16)
    enc = encode_flac(x)
    out, _ = decode_flac(enc)
    np.testing.assert_array_equal(out, x)
    assert len(enc) < 2 * len(x) * 0.7  # correlated signal beats 70% of PCM


@pytest.mark.parametrize(
    "x",
    [
        np.zeros(0, np.int16),
        np.array([7], np.int16),
        np.zeros(1000, np.int16),
        np.full(100, -5, np.int16),
        np.array([-32768, 32767] * 50, np.int16),  # full-scale alternation
    ],
    ids=["empty", "one", "silence", "constant", "fullscale"],
)
def test_roundtrip_edge_cases(x):
    out, _ = _roundtrip(x)
    np.testing.assert_array_equal(out, x)


def test_roundtrip_odd_block_boundary():
    """Last frame shorter than the block size; block size not a power of 2."""
    rng = np.random.RandomState(3)
    x = rng.randint(-500, 500, 10_001).astype(np.int16)
    out, _ = _roundtrip(x, block_size=1920)
    np.testing.assert_array_equal(out, x)


def test_float_input_matches_wav_pcm16_truncation():
    """float32 → int16 must use the same truncation as the WAV encoder, so a
    client decoding either format gets bit-identical samples."""
    x = np.array([-1.5, -1.0, -0.5, -1 / 32767.0, 0.0, 0.3, 0.99999, 1.0, 2.0], np.float32)
    out, _ = _roundtrip(x)
    want = np.frombuffer(wav.pcm16_bytes(x), np.int16)
    np.testing.assert_array_equal(out, want)


# -- structure -----------------------------------------------------------------


def test_container_structure():
    enc = encode_flac(np.zeros(100, np.int16), sample_rate=24_000)
    assert enc[:4] == b"fLaC"
    assert enc[4] & 0x80  # last-metadata-block flag
    assert enc[4] & 0x7F == 0  # STREAMINFO
    assert int.from_bytes(enc[5:8], "big") == 34  # STREAMINFO length
    # sample rate: 20 bits starting at STREAMINFO byte 10
    body = enc[8 : 8 + 34]
    rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    assert rate == 24_000
    channels = ((body[12] >> 1) & 0x7) + 1
    bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
    assert channels == 1 and bps == 16


def test_decoder_rejects_garbage():
    with pytest.raises(FlacError):
        decode_flac(b"RIFFxxxx")
    with pytest.raises(FlacError):
        decode_flac(b"fLaC")  # truncated metadata


@pytest.mark.parametrize("flip_at", [40, 100, 180])
def test_corruption_detected_by_crc(flip_at):
    rng = np.random.RandomState(1)
    x = rng.randint(-2000, 2000, 4000).astype(np.int16)
    enc = bytearray(encode_flac(x))
    enc[min(flip_at + 42, len(enc) - 3)] ^= 0x10  # +42: stay past the header
    with pytest.raises(FlacError):
        decode_flac(bytes(enc))


# -- streaming encoder -----------------------------------------------------------


def test_stream_encoder_variable_blocks():
    rng = np.random.RandomState(5)
    se = FlacStreamEncoder()
    blocks = [
        rng.randint(-1000, 1000, n).astype(np.int16) for n in (7680, 1920, 30720, 123)
    ]
    data = se.header() + b"".join(se.encode_block(b) for b in blocks)
    out, rate = decode_flac(data)
    assert rate == 24_000
    np.testing.assert_array_equal(out, np.concatenate(blocks))


def test_stream_encoder_empty_block_emits_nothing():
    se = FlacStreamEncoder()
    assert se.encode_block(np.zeros(0, np.float32)) == b""


def test_stream_encoder_splits_oversize_block():
    se = FlacStreamEncoder(max_block=4096)
    x = np.arange(10_000, dtype=np.int16)
    data = se.header() + se.encode_block(x)
    out, _ = decode_flac(data)
    np.testing.assert_array_equal(out, x)


# -- HTTP integration ------------------------------------------------------------


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
    import time

    from go_pocket_tts_tpu.server import Server
    from go_pocket_tts_tpu.tts.service import PCMChunk

    class _StubService:
        def synthesize_stream(self, text, voice_path="", cancel=None):
            for i in range(3):
                yield PCMChunk(
                    samples=np.full(1920, 0.25, np.float32), chunk_index=i, final=i == 2
                )

    srv = Server(_StubService(), listen_addr="127.0.0.1:0", workers=2)
    srv.start()
    yield srv
    srv.shutdown()


def test_http_tts_flac(server):
    with _post(f"http://127.0.0.1:{server.port}/tts", {"text": "hi", "format": "flac"}) as r:
        assert r.headers["Content-Type"] == "audio/flac"
        body = r.read()
    out, rate = decode_flac(body)
    assert rate == 24_000
    want = np.frombuffer(wav.pcm16_bytes(np.full(3 * 1920, 0.25, np.float32)), np.int16)
    np.testing.assert_array_equal(out, want)


def test_http_tts_stream_flac(server):
    with _post(
        f"http://127.0.0.1:{server.port}/tts/stream", {"text": "hi", "format": "flac"}
    ) as r:
        assert r.headers["Content-Type"] == "audio/flac"
        body = r.read()
    out, _ = decode_flac(body)
    want = np.frombuffer(wav.pcm16_bytes(np.full(3 * 1920, 0.25, np.float32)), np.int16)
    np.testing.assert_array_equal(out, want)


def test_http_tts_wav_still_default(server):
    with _post(f"http://127.0.0.1:{server.port}/tts", {"text": "hi"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        samples, rate = wav.decode_wav(r.read())
    assert rate == 24_000 and len(samples) == 3 * 1920


def test_http_bad_format_rejected(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(f"http://127.0.0.1:{server.port}/tts", {"text": "hi", "format": "mp3"})
    assert exc.value.code == 400


def test_native_crc_path_byte_identical(monkeypatch):
    """The native C CRC-16 (`native/audioio.cpp: crc16_8005`) must produce
    exactly the bytes the pure-Python table loop does — the fallback is the
    correctness oracle, the native path is only a speedup (33.6→62× realtime
    measured, PERF.md)."""
    from go_pocket_tts_tpu.utils import flac as flacmod

    rs = np.random.RandomState(5)
    x = (rs.randn(24_000) * 0.1).astype(np.float32)
    with_native = encode_flac(x, sample_rate=24_000)
    monkeypatch.setattr(flacmod, "_AUDIOIO_CACHE", [None])
    forced_python = encode_flac(x, sample_rate=24_000)
    assert with_native == forced_python
