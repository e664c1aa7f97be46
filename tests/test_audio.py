"""WAV codec + DSP tests (mirrors `internal/audio/*_test.go` coverage)."""

import numpy as np
import pytest

from go_pocket_tts_tpu.utils import dsp, wav


def test_wav_roundtrip():
    x = (np.sin(np.linspace(0, 40 * np.pi, 2400)) * 0.5).astype(np.float32)
    data = wav.encode_wav(x, 24000)
    y, rate = wav.decode_wav(data)
    assert rate == 24000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_wav_clamps():
    x = np.array([2.0, -2.0, 0.0], dtype=np.float32)
    y, _ = wav.decode_wav(wav.encode_wav(x))
    assert abs(y[0] - 1.0) < 1e-3
    assert abs(y[1] + 1.0) < 1e-3


def test_streaming_header_and_decode():
    header = wav.streaming_wav_header()
    assert len(header) == 44
    x = np.zeros(100, dtype=np.float32)
    x[0] = 0.5
    data = header + wav.pcm16_bytes(x)
    y, rate = wav.decode_wav(data)
    assert rate == 24000
    assert len(y) == 100
    assert abs(y[0] - 0.5) < 1e-3


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav.decode_wav(b"not a wav file at all, definitely not 44 bytes of riff")


def test_stereo_downmix():
    import struct

    pcm = np.array([1000, 3000, -500, -1500], dtype="<i2").tobytes()  # 2 frames stereo
    header = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 24000, 96000, 4, 16)
    header += b"data" + struct.pack("<I", len(pcm))
    y, _ = wav.decode_wav(header + pcm)
    assert len(y) == 2
    np.testing.assert_allclose(y, [2000 / 32768, -1000 / 32768], atol=1e-6)


def test_wav_duration():
    x = np.zeros(24000, dtype=np.float32)
    assert wav.wav_duration_seconds(wav.encode_wav(x)) == pytest.approx(1.0)


# -- DSP ---------------------------------------------------------------------


def test_peak_normalize():
    x = np.array([0.1, -0.2, 0.05], dtype=np.float32)
    y = dsp.peak_normalize(x, 0.95)
    assert np.max(np.abs(y)) == pytest.approx(0.95, abs=1e-6)
    np.testing.assert_array_equal(dsp.peak_normalize(np.zeros(4, np.float32)), np.zeros(4))


def test_dc_block_removes_offset():
    rng = np.random.RandomState(0)
    x = (rng.randn(24000) * 0.1 + 0.5).astype(np.float32)
    y = dsp.dc_block(x, 24000)
    # steady-state mean of the tail should be near zero
    assert abs(float(np.mean(y[12000:]))) < 0.01


def test_fades():
    x = np.ones(24000, dtype=np.float32)
    y = dsp.fade_in(x, 24000, ms=10)
    assert y[0] == 0.0
    assert y[-1] == 1.0
    z = dsp.fade_out(x, 24000, ms=10)
    assert z[0] == 1.0
    assert z[-1] == pytest.approx(0.0, abs=1e-6)


def test_native_audioio_matches_numpy_if_available():
    from go_pocket_tts_tpu.native import audioio

    lib = audioio.load()
    if lib is None:
        pytest.skip("native audioio unavailable")
    x = np.array([0.25, -0.75, 2.0, -2.0, 0.0], dtype=np.float32)
    native = np.frombuffer(lib.pcm16_from_f32(x), dtype="<i2")
    ref = np.frombuffer(wav.pcm16_bytes(x), dtype="<i2")
    np.testing.assert_allclose(native, ref, atol=1)  # lrintf vs trunc rounding
    assert lib.peak_abs(x) == pytest.approx(2.0)
