"""Precompiled-charsmap normalizer tests: darts-clone reader vs the HF
`tokenizers` Rust oracle, builder round-trips, sentencepiece longest-match
semantics, and exact pure-backend tokenization through a charsmap model.

The reference consumes the charsmap inside ``tokenizer.model`` via its
vendored Go encoder (`internal/tokenizer/sentencepiece.go:13-46`); no real
model file exists in this environment, so blobs are minted with
``build_charsmap`` and cross-checked against HF's independent reader.
"""

import unicodedata

import pytest

from go_pocket_tts_tpu.text.charsmap import (
    PrecompiledCharsmap,
    build_charsmap,
    nfkc_charsmap,
)
from go_pocket_tts_tpu.text.sentencepiece import SentencePieceTokenizer

try:
    from tokenizers import normalizers as hf_normalizers
except ImportError:  # pragma: no cover
    hf_normalizers = None

needs_hf = pytest.mark.skipif(hf_normalizers is None, reason="HF tokenizers absent")


_SMALL_MAP = {
    "Ａ": "A",      # fullwidth
    "ﬁ": "fi",      # ligature expansion
    "…": "...",     # 1 -> 3 chars
    "²": "2",
    "ｶ": "カ",      # halfwidth katakana
    "​": "",         # zero-width space deletion
    "①": "1",
    "Ⅳ": "IV",
    "㎒": "MHz",
    "ñ": "ñ",       # identity rule
}

_CORPUS = [
    "hello world",
    "Ａﬁ…², plain",
    "ｶ①Ⅳ㎒",
    "mix Ａ and ﬁ x",
    " lead and trail ",
    "zero​width gone",
    "ñ stays ñ",
    "ASCII only 123 !?",
    "",
    "emoji 🎉 passthrough",
    "日本語テキスト и кириллица",
]


def test_reader_basic_rules():
    cm = PrecompiledCharsmap(build_charsmap(_SMALL_MAP))
    assert cm.normalize("Ａﬁ…") == "Afi..."
    assert cm.normalize("zero​width") == "zerowidth"
    assert cm.normalize("untouched") == "untouched"
    assert cm.normalize("") == ""
    # unmapped multi-byte chars pass through whole
    assert cm.normalize("🎉日") == "🎉日"


@needs_hf
def test_reader_matches_hf_oracle_small():
    blob = build_charsmap(_SMALL_MAP)
    cm = PrecompiledCharsmap(blob)
    hf = hf_normalizers.Precompiled(blob)
    for s in _CORPUS:
        assert cm.normalize(s) == hf.normalize_str(s), repr(s)


@needs_hf
def test_reader_matches_hf_oracle_nfkc_scale():
    """Realistic-scale blob (every NFKC-changing codepoint < 0x3000, ~1.3k
    rules) against HF's independent Rust reader on random text. Combining
    marks are excluded: HF's grapheme-chunked variant drops a mark when its
    base has a rule (see test_hf_grapheme_divergence_is_ours_to_keep)."""
    import random

    blob = nfkc_charsmap(0x2FFF)
    cm = PrecompiledCharsmap(blob)
    hf = hf_normalizers.Precompiled(blob)
    rng = random.Random(7)
    for _ in range(200):
        s = "".join(chr(rng.randint(0x20, 0x2FFF)) for _ in range(24))
        s = "".join(
            c for c in s if unicodedata.category(c) not in ("Cs", "Cn", "Mn", "Mc", "Me")
        )
        assert cm.normalize(s) == hf.normalize_str(s), repr(s)


def test_longest_match_semantics():
    """sentencepiece ``NormalizePrefix``: longest key at each position."""
    cm = PrecompiledCharsmap(build_charsmap({"a": "1", "ab": "2", "abc": "3", "b": "B"}))
    assert cm.normalize("abc") == "3"
    assert cm.normalize("ab") == "2"
    assert cm.normalize("abx") == "2x"
    assert cm.normalize("aab") == "12"
    assert cm.normalize("ba") == "B1"
    assert cm.normalize("abcabca") == "331"


def test_hf_grapheme_divergence_is_ours_to_keep():
    """A combining mark on a mapped base: sentencepiece (and this reader)
    rewrites the base and KEEPS the mark; HF's spm_precompiled replaces the
    whole grapheme, dropping the mark. We follow upstream sentencepiece —
    the semantics the published tokenizer.model encodes. (The Go reference
    never reads the charsmap at all; it approximates with NFKC,
    `internal/tokenizer/sentencepiece_bytes_wasm.go:225-276`.)"""
    cm = PrecompiledCharsmap(build_charsmap({"⼓": "勹"}))
    assert cm.normalize("⼓̏") == "勹̏"


def test_empty_mapping_is_identity():
    cm = PrecompiledCharsmap(build_charsmap({}))
    for s in _CORPUS:
        assert cm.normalize(s) == s


def test_bad_blobs_raise():
    with pytest.raises(ValueError):
        PrecompiledCharsmap(b"\x01\x02\x03")  # shorter than the size header
    with pytest.raises(ValueError):
        PrecompiledCharsmap(b"\xff\xff\xff\x7f rest")  # trie size > blob
    with pytest.raises(ValueError):
        PrecompiledCharsmap(b"\x06\x00\x00\x00abcdef")  # size not a multiple of 4
    with pytest.raises(ValueError):
        PrecompiledCharsmap(b"\x00\x00\x00\x00")  # empty trie


def test_blob_is_256_unit_padded():
    """Readers that skip bounds checks (darts-clone, HF) rely on bases and
    ``pos ^ byte`` staying inside the array — guaranteed by 256-unit blocks."""
    import struct

    blob = build_charsmap(_SMALL_MAP)
    (trie_size,) = struct.unpack("<I", blob[:4])
    assert trie_size % (256 * 4) == 0


_BMP_CHARSMAP = None


def _charsmap_model():
    from test_tokenizer import _rich_model

    global _BMP_CHARSMAP
    if _BMP_CHARSMAP is None:
        # Full-BMP NFKC rules (~4.6k) so ligatures (U+FB01) and full/half
        # width forms (U+FFxx) are covered, not just the CJK-symbol range.
        _BMP_CHARSMAP = nfkc_charsmap(0xFFFF)
    m = _rich_model()
    m.precompiled_charsmap = _BMP_CHARSMAP
    return m


def test_pure_backend_applies_charsmap_exactly(caplog):
    """With a parseable charsmap the pure backend normalizes exactly (no
    degradation warning) and NFKC-sensitive inputs tokenize as upstream."""
    import logging

    with caplog.at_level(logging.WARNING, logger="pockettts.tokenizer"):
        tok = SentencePieceTokenizer(_charsmap_model(), backend="pure")
    assert not caplog.records
    assert tok.charsmap_error is None
    assert [tok.model.pieces[i] for i in tok.encode("ﬁ")] == ["▁fi"]
    assert [tok.model.pieces[i] for i in tok.encode("①")] == ["▁", "1"]


@needs_hf
def test_backends_agree_through_charsmap_model():
    """Pure Viterbi + charsmap reader vs HF Unigram + Precompiled end to end
    on multilingual text — token IDs, not just normalized strings."""
    from test_tokenizer import _HARD_CORPUS

    m = _charsmap_model()
    pure = SentencePieceTokenizer(m, backend="pure")
    hf = SentencePieceTokenizer(m, backend="hf")
    corpus = _HARD_CORPUS + ["ﬁsh ①②③", "ＡＢＣ ｶﾀ", "m² of … space"]
    for text in corpus:
        assert pure.encode(text) == hf.encode(text), repr(text)


def test_charsmap_error_surfaces_and_degrades(caplog):
    """Unparseable blob: warning fires, charsmap_error is set, NFKC fallback
    still tokenizes (the doctor probe keys off charsmap_error)."""
    import logging

    m = _charsmap_model()
    m.precompiled_charsmap = b"\x01\x02\x03"
    with caplog.at_level(logging.WARNING, logger="pockettts.tokenizer"):
        tok = SentencePieceTokenizer(m, backend="pure")
    assert tok.charsmap_error is not None
    assert any("NFKC" in r.message for r in caplog.records)
    assert [tok.model.pieces[i] for i in tok.encode("ﬁ")] == ["▁fi"]  # NFKC agrees here
