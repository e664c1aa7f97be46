"""Seeded mutation fuzzing of every untrusted-input parser.

The reference treats checkpoint/voice/audio files as untrusted input and
validates them defensively (`/root/reference/internal/safetensors/store.go:14-456`,
`internal/audio/decode.go:12-53`). These tests enforce the equivalent
contract here as a *property*: for any byte-level corruption of a valid
input — flips, truncations, length-field tampering, or pure noise — the
parser either succeeds or raises its documented ValueError family. It must
never escape with an uncontrolled exception type (IndexError, KeyError,
struct.error, OverflowError, UnicodeDecodeError, ...), hang, or attempt an
attacker-sized allocation.

All mutations are seeded (numpy RandomState) so failures reproduce exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from go_pocket_tts_tpu.text.charsmap import PrecompiledCharsmap, build_charsmap
from go_pocket_tts_tpu.text.sentencepiece import SentencePieceModel
from go_pocket_tts_tpu.utils.flac import FlacError, decode_flac, encode_flac
from go_pocket_tts_tpu.utils.safetensors import (
    SafetensorsError,
    encode_tensors,
    inspect_voice_file_bytes,
    load_voice_embedding_from_bytes,
    load_voice_model_state_from_bytes,
    open_store_from_bytes,
)
from go_pocket_tts_tpu.utils.wav import decode_wav, encode_wav

N_MUTATIONS = 200


def _mutations(valid: bytes, seed: int, n: int = N_MUTATIONS):
    """Yield deterministic corruptions of a valid payload: byte flips
    (single and burst), truncations, extensions, and length-field-heavy
    early-byte tampering (headers live up front in every format here)."""
    rng = np.random.RandomState(seed)
    data = np.frombuffer(valid, dtype=np.uint8)
    for i in range(n):
        kind = i % 5
        buf = data.copy()
        if kind == 0 and len(buf):  # single byte flip anywhere
            pos = int(rng.randint(len(buf)))
            buf[pos] ^= int(rng.randint(1, 256))
        elif kind == 1 and len(buf):  # burst flip (up to 8 bytes)
            pos = int(rng.randint(len(buf)))
            end = min(len(buf), pos + int(rng.randint(1, 9)))
            buf[pos:end] ^= rng.randint(1, 256, size=end - pos).astype(np.uint8)
        elif kind == 2:  # truncate
            buf = buf[: int(rng.randint(len(buf) + 1))]
        elif kind == 3:  # tamper the first 16 bytes (length fields, magics)
            pos = int(rng.randint(min(16, max(1, len(buf)))))
            buf = buf.copy()
            buf[pos] = int(rng.randint(256))
        else:  # random noise of a random (small) size
            buf = rng.randint(0, 256, size=int(rng.randint(512))).astype(np.uint8)
        yield i, buf.tobytes()


def _assert_controlled(parse, valid: bytes, seed: int, allowed=(ValueError,)):
    """Run the parser over all mutations; any escape outside `allowed`
    (ValueError covers SafetensorsError/FlacError) is a real bug."""
    for i, payload in _mutations(valid, seed):
        try:
            parse(payload)
        except allowed:
            pass
        except Exception as exc:  # pragma: no cover - the failure we hunt
            raise AssertionError(
                f"mutation {i} (seed {seed}) escaped with "
                f"{type(exc).__name__}: {exc!r}"
            ) from exc


# ---------------------------------------------------------------- safetensors


def _tiny_checkpoint_bytes() -> bytes:
    rng = np.random.RandomState(0)
    return encode_tensors(
        {
            "a.weight": rng.randn(4, 6).astype(np.float32),
            "a.bias": rng.randn(6).astype(np.float32),
            "ids": np.arange(5, dtype=np.int64),
            "h": rng.randn(3, 3).astype(np.float16),
        }
    )


def test_fuzz_safetensors_store():
    valid = _tiny_checkpoint_bytes()

    def parse(data: bytes):
        store = open_store_from_bytes(data)
        for name in store.names():
            store.tensor(name)

    _assert_controlled(parse, valid, seed=101)


def test_fuzz_safetensors_header_length_cannot_allocate():
    """A tampered 8-byte header length must be rejected by comparing against
    the payload size, not trusted as an allocation size."""
    valid = bytearray(_tiny_checkpoint_bytes())
    for hdr_len in (2**62, 2**40, 2**31 - 1):
        buf = valid.copy()
        buf[:8] = int(hdr_len).to_bytes(8, "little")
        with pytest.raises(SafetensorsError):
            open_store_from_bytes(bytes(buf))


def test_fuzz_voice_files():
    emb = encode_tensors({"audio_prompt": np.random.RandomState(1).randn(1, 3, 8).astype(np.float32)})
    cache = np.random.RandomState(2).randn(2, 1, 4, 2, 3).astype(np.float32)
    state = encode_tensors(
        {
            "transformer.layers.0.self_attn/cache": cache,
            "transformer.layers.0.self_attn/offset": np.array([2], dtype=np.int64),
        }
    )

    def parse_any(data: bytes):
        kind = inspect_voice_file_bytes(data)
        if kind == "embedding":
            load_voice_embedding_from_bytes(data)
        else:
            load_voice_model_state_from_bytes(data)

    _assert_controlled(parse_any, emb, seed=202)
    _assert_controlled(parse_any, state, seed=203)


# ----------------------------------------------------------------------- wav


def test_fuzz_wav_decode():
    samples = (np.sin(np.linspace(0, 40, 480)) * 0.3).astype(np.float32)
    _assert_controlled(decode_wav, encode_wav(samples), seed=303)


# ---------------------------------------------------------------------- flac


def test_fuzz_flac_decode():
    rng = np.random.RandomState(4)
    samples = (rng.randn(2000) * 0.1).astype(np.float32)
    valid = encode_flac(samples)

    def parse(data: bytes):
        decode_flac(data)

    _assert_controlled(parse, valid, seed=404, allowed=(FlacError,))


# -------------------------------------------------------------- sentencepiece


def _tiny_tokenizer_bytes() -> bytes:
    m = SentencePieceModel()
    for piece, score, typ in (
        [("<unk>", 0.0, 2)]
        + [(w, -1.0, 1) for w in ("▁hello", "▁world", ".")]
        + [(c, -6.0, 1) for c in "aeiou▁"]
    ):
        m.pieces.append(piece)
        m.scores.append(score)
        m.types.append(typ)
    return m.serialize()


def test_sentencepiece_out_of_range_unk_id_rejected():
    """A forged TrainerSpec unk_id beyond the piece table must be a
    ValueError at parse time, not a downstream backend crash or a silent
    wrong-row gather."""
    m = SentencePieceModel()
    for piece, score, typ in [("<unk>", 0.0, 2), ("▁a", -1.0, 1)]:
        m.pieces.append(piece)
        m.scores.append(score)
        m.types.append(typ)
    blob = bytearray(m.serialize())
    # TrainerSpec (field 2, wire 2) containing unk_id (field 40, wire 0).
    # Tag 40<<3|0 = 320 needs two varint bytes: 0xC0 0x02.
    trainer = bytes([0xC0, 0x02, 99])  # unk_id = 99
    blob += bytes([2 << 3 | 2, len(trainer)]) + trainer
    with pytest.raises(ValueError, match="unk_id"):
        SentencePieceModel.parse(bytes(blob))


def test_fuzz_sentencepiece_parse():
    valid = _tiny_tokenizer_bytes()

    def parse(data: bytes):
        model = SentencePieceModel.parse(data)
        # Exercise the parsed model a little: tokenization must not crash on
        # whatever pieces survived the corruption.
        model  # parse-only; encoding lives behind the tokenizer facade

    _assert_controlled(parse, valid, seed=505)


# -------------------------------------------------- voices manifest + config


def test_fuzz_voices_manifest(tmp_path):
    """Corrupt/adversarial manifest JSON → ValueError family, never
    AttributeError/TypeError (json.JSONDecodeError is a ValueError)."""
    from go_pocket_tts_tpu.tts.voices import VoiceManager

    valid = (
        b'{"voices": [{"id": "a", "path": "a.safetensors"},'
        b' {"id": "b", "path": "b.safetensors", "license": "x"}]}'
    )
    path = tmp_path / "manifest.json"

    def parse(data: bytes):
        path.write_bytes(data)
        VoiceManager(str(path))

    _assert_controlled(parse, valid, seed=707, allowed=(ValueError, UnicodeDecodeError))
    # Structurally-valid JSON with wrong shapes (mutation rarely forges these).
    for bad in (b"[1,2]", b'{"voices": 5}', b'{"voices": ["x"]}', b'{"voices": [{}]}', b"null"):
        path.write_bytes(bad)
        with pytest.raises(ValueError):
            VoiceManager(str(path))


def test_fuzz_config_files(tmp_path):
    """Corrupt config files in all three formats → ValueError family (the
    CLI shows the message instead of a traceback)."""
    from go_pocket_tts_tpu.config import _read_config_file

    cases = [
        ("pockettts.json", b'{"tts": {"temperature": 0.5}, "server": {"workers": 3}}', 801),
        ("pockettts.yaml", b"tts:\n  temperature: 0.5\nserver:\n  workers: 3\n", 802),
        ("pockettts.toml", b"[tts]\ntemperature = 0.5\n[server]\nworkers = 3\n", 803),
    ]
    for name, valid, seed in cases:
        path = tmp_path / name

        def parse(data: bytes, path=path):
            path.write_bytes(data)
            _read_config_file(str(path))

        _assert_controlled(parse, valid, seed=seed)
    # Valid syntax, wrong top-level shape.
    for name, bad in (
        ("pockettts.json", b"[1, 2]"),
        ("pockettts.yaml", b"- just\n- a\n- list\n"),
        ("pockettts.json", b'"a string"'),
    ):
        path = tmp_path / name
        path.write_bytes(bad)
        with pytest.raises(ValueError):
            _read_config_file(str(path))


# -------------------------------------------------------------------- charsmap


def test_fuzz_charsmap_parse_and_normalize():
    valid = build_charsmap({"Å": "A", "ﬁ": "fi", " ": " "})
    probe = "cafÉ   ﬁne Ångström \U0001f600"

    def parse(data: bytes):
        cm = PrecompiledCharsmap(data)
        # A structurally-valid-but-corrupt trie must still terminate and
        # return *some* string for arbitrary text (garbage-in tolerated,
        # crashes and hangs are not).
        out = cm.normalize(probe)
        assert isinstance(out, str)

    _assert_controlled(parse, valid, seed=606)


def test_fuzz_charsmap_pure_noise_blobs():
    rng = np.random.RandomState(7)
    probe = "hello Å world"
    for _ in range(100):
        blob = rng.randint(0, 256, size=int(rng.randint(4, 400))).astype(np.uint8).tobytes()
        try:
            cm = PrecompiledCharsmap(blob)
            assert isinstance(cm.normalize(probe), str)
        except ValueError:
            pass
