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


# -- hardening tier (VERDICT r1 #6) ------------------------------------------


def _rich_model() -> SentencePieceModel:
    """Multilingual UNIGRAM model: word pieces across scripts + full char
    coverage + byte fallback; distinct scores (no tie-break ambiguity)."""
    words = [
        "▁the", "▁quick", "▁brown", "▁fox", "▁jumps", "▁over", "▁lazy", "▁dog",
        "▁bonjour", "▁le", "▁monde", "▁école", "▁straße", "▁grün",
        "▁привет", "▁мир", "▁こんにちは", "▁世界", "▁你好", "▁día", "▁mañana",
        "▁fi", "▁office", "ing", "ed", "s", "▁", "'", ",", ".", "!", "?", ";", ":",
        "-", "(", ")", '"', "…",
    ]
    chars = sorted(
        set(
            "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "àâäéèêëïîôöùûüçñáíóúабвгдеёжзийклмнопрстуфхцчшщъыьэюя"
            "こんにちは世界你好日本語0123456789"
        )
    )
    m = SentencePieceModel()
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    seen = set()
    for i, w in enumerate(words):
        if w not in seen:
            seen.add(w)
            pieces.append((w, -1.0 - 0.01 * i, 1))
    for i, c in enumerate(chars):
        if c not in seen:
            seen.add(c)
            pieces.append((c, -5.0 - 0.003 * i, 1))
    pieces += [(f"<0x{i:02X}>", -12.0, 6) for i in range(256)]
    for p, s, t in pieces:
        m.pieces.append(p)
        m.scores.append(s)
        m.types.append(t)
    m.unk_id = 0
    m.byte_fallback = True
    return m


_HARD_CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Bonjour le monde! L'école était grün, straße...",
    "Привет мир, как дела?",
    "こんにちは世界。你好！",
    "Office ﬁles (ligature ﬁ) — em-dash; ①②③ numbers.",
    "Ｆｕｌｌｗｉｄｔｈ text and ½ fractions",
    "Mixed:  double  spaces\tand tabs",
    "¿Qué día es mañana?",
    "quotes \"inside\" and 'apostrophes', ellipsis…",
    "emoji 🙂 stays byte-fallback",
]


def test_backends_agree_on_multilingual_corpus():
    """Pure Viterbi and the HF `tokenizers` Unigram must produce identical IDs
    on a multilingual/punctuation corpus (both are independent constructions
    over the same proto)."""
    m = _rich_model()
    pure = SentencePieceTokenizer(m, backend="pure")
    try:
        hf = SentencePieceTokenizer(m, backend="hf")
    except RuntimeError:
        pytest.skip("tokenizers unavailable")
    for text in _HARD_CORPUS:
        assert pure.encode(text) == hf.encode(text), repr(text)


def test_golden_vectors_rich_model():
    """Frozen IDs for NFKC-sensitive inputs — a change in segmentation or
    normalization (either backend) breaks these loudly."""
    m = _rich_model()
    tok = SentencePieceTokenizer(m, backend="pure")
    # NFKC: ﬁ → fi (matches ▁fi after space), ① → 1, full-width F → F.
    golden = {
        "The quick brown fox": tok.encode("The quick brown fox"),
        "ﬁ": tok.encode("ﬁ"),
        "①": tok.encode("①"),
    }
    # The assertions that matter: normalization collapsed to expected pieces.
    assert [m.pieces[i] for i in golden["ﬁ"]] == ["▁fi"]
    assert [m.pieces[i] for i in golden["①"]] == ["▁", "1"]
    assert [m.pieces[i] for i in tok.encode("hello")][0] == "▁"
    # Byte-level determinism of the whole corpus (regression fingerprint).
    import hashlib

    blob = ";".join(
        ",".join(map(str, tok.encode(t))) for t in _HARD_CORPUS
    ).encode()
    assert hashlib.sha256(blob).hexdigest() == (
        "d07996336076e35427d80415292cd91b1dbb293a2a206809d840ab7a5972eed1"
    )


def test_pure_fallback_warns_on_precompiled_charsmap(caplog):
    import logging

    m = _toy_model()
    m.precompiled_charsmap = b"\x01\x02\x03"  # pretend a real charsmap exists
    with caplog.at_level(logging.WARNING, logger="pockettts.tokenizer"):
        SentencePieceTokenizer(m, backend="pure")
    assert any("NFKC" in r.message for r in caplog.records)


def test_real_tokenizer_backends_agree_if_present():
    """Skip-unless tier: when the real tokenizer.model exists, the two
    backends must agree on the corpus (the closest offline analogue of
    published-SPM golden vectors; no egress in this environment)."""
    import os

    path = os.environ.get("POCKETTTS_BENCH_TOKENIZER", "models/tokenizer.model")
    if not os.path.exists(path):
        pytest.skip("real tokenizer.model not present")
    from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer

    pure = load_tokenizer(path, backend="pure")
    try:
        hf = load_tokenizer(path, backend="hf")
    except RuntimeError:
        pytest.skip("tokenizers unavailable")
    for text in _HARD_CORPUS:
        assert pure.encode(text) == hf.encode(text), repr(text)
