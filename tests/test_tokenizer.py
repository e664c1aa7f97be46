"""SentencePiece tokenizer tests: proto round-trip, Viterbi segmentation,
HF-vs-pure backend agreement, byte fallback."""

import pytest

from go_pocket_tts_tpu.text.sentencepiece import (
    SentencePieceModel,
    SentencePieceTokenizer,
    load_tokenizer_from_bytes,
)


def _toy_model(byte_fallback=False, remove_extra_ws=True) -> SentencePieceModel:
    """Tiny UNIGRAM model: score design makes 'hello'/'world' win over chars."""
    pieces = [
        ("<unk>", 0.0, 2),
        ("<s>", 0.0, 3),
        ("</s>", 0.0, 3),
        ("▁hello", -1.0, 1),
        ("▁world", -1.2, 1),
        ("▁", -3.0, 1),
        ("h", -4.0, 1),
        ("e", -4.0, 1),
        ("l", -4.0, 1),
        ("o", -4.0, 1),
        ("w", -4.0, 1),
        ("r", -4.0, 1),
        ("d", -4.0, 1),
        ("lo", -3.5, 1),
        ("▁he", -2.9, 1),
    ]
    if byte_fallback:
        pieces += [(f"<0x{i:02X}>", -10.0, 6) for i in range(256)]
    m = SentencePieceModel()
    for p, s, t in pieces:
        m.pieces.append(p)
        m.scores.append(s)
        m.types.append(t)
    m.unk_id = 0
    m.byte_fallback = byte_fallback
    m.remove_extra_whitespaces = remove_extra_ws
    return m


def test_proto_roundtrip():
    m = _toy_model(byte_fallback=True)
    data = m.serialize()
    m2 = SentencePieceModel.parse(data)
    assert m2.pieces == m.pieces
    assert m2.types == m.types
    assert m2.unk_id == m.unk_id
    assert m2.byte_fallback is True
    assert [round(s, 4) for s in m2.scores] == [round(s, 4) for s in m.scores]


def test_viterbi_picks_best_segmentation():
    tok = SentencePieceTokenizer(_toy_model(), backend="pure")
    ids = tok.encode("hello world")
    pieces = [tok.model.pieces[i] for i in ids]
    assert pieces == ["▁hello", "▁world"]


def test_viterbi_falls_back_to_chars():
    tok = SentencePieceTokenizer(_toy_model(), backend="pure")
    ids = tok.encode("hold")
    pieces = [tok.model.pieces[i] for i in ids]
    # "▁he" is a better start than "▁"+"h"; then chars.
    assert "".join(pieces) == "▁hold"


def test_unknown_char_without_byte_fallback():
    tok = SentencePieceTokenizer(_toy_model(), backend="pure")
    ids = tok.encode("héllo")
    assert tok.model.unk_id in ids


def test_byte_fallback():
    tok = SentencePieceTokenizer(_toy_model(byte_fallback=True), backend="pure")
    ids = tok.encode("hé")
    pieces = [tok.model.pieces[i] for i in ids]
    # é (U+00E9) → 0xC3 0xA9 byte pieces
    assert "<0xC3>" in pieces and "<0xA9>" in pieces
    assert tok.model.unk_id not in ids


def test_decode_roundtrip():
    tok = SentencePieceTokenizer(_toy_model(), backend="pure")
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_hf_backend_matches_pure_on_ascii():
    m = _toy_model()
    pure = SentencePieceTokenizer(m, backend="pure")
    try:
        hf = SentencePieceTokenizer(m, backend="hf")
    except RuntimeError:
        pytest.skip("tokenizers unavailable")
    for text in ["hello world", "hold", "hello", "world hello hello", "ol"]:
        assert hf.encode(text) == pure.encode(text), text


def test_loader_from_bytes():
    data = _toy_model().serialize()
    tok = load_tokenizer_from_bytes(data)
    assert tok.vocab_size == 15
    assert tok.encode("hello")  # non-empty


def test_empty_encode():
    tok = SentencePieceTokenizer(_toy_model(), backend="pure")
    assert tok.encode("") == []
