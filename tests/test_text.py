"""Text front-end behavioural contracts (mirrors `internal/text/*_test.go`)."""

import pytest

from go_pocket_tts_tpu import text as T


class _WordTokenizer:
    """Fake tokenizer: one token per whitespace word (like the reference's
    orchestration-test fakes)."""

    def encode(self, s):
        return [hash(w) % 1000 for w in s.split()]


# -- normalize --------------------------------------------------------------


def test_normalize_crlf_and_trim():
    assert T.normalize("  hello\r\nworld\r!  ") == "hello\nworld\n!"


def test_normalize_empty_rejected():
    with pytest.raises(T.EmptyTextError):
        T.normalize("   \n ")


# -- prepare_text ------------------------------------------------------------


def test_prepare_capitalizes_and_appends_period():
    assert T.prepare_text("hello world how are you today") == "Hello world how are you today."


def test_prepare_short_text_padded_8_spaces():
    out = T.prepare_text("hello world")
    assert out == "        Hello world."
    assert out.startswith(" " * 8)


def test_prepare_collapses_whitespace():
    assert (
        T.prepare_text("one  two\nthree\r\nfour  five")
        == "One two three four five."
    )


def test_prepare_no_period_after_punctuation():
    assert T.prepare_text("is this a question for you?") == "Is this a question for you?"


def test_prepare_five_words_no_pad():
    out = T.prepare_text("one two three four five")
    assert not out.startswith(" ")


# -- estimate_max_frames ------------------------------------------------------


@pytest.mark.parametrize(
    "tokens,expected",
    [
        (0, 25),  # ceil(2 * 12.5)
        (3, 38),  # ceil((1+2)*12.5) = ceil(37.5)
        (50, 234),  # ceil((16.667+2)*12.5) = ceil(233.33)
    ],
)
def test_estimate_max_frames(tokens, expected):
    assert T.estimate_max_frames(tokens) == expected


def test_estimate_max_frames_bad_rate_falls_back():
    assert T.estimate_max_frames(3, 0.0) == 38
    assert T.estimate_max_frames(3, float("nan")) == 38


# -- frames_after_eos ---------------------------------------------------------


def test_frames_after_eos():
    assert T.ChunkMetadata(text="", num_words=4).frames_after_eos() == 5
    assert T.ChunkMetadata(text="", num_words=5).frames_after_eos() == 3


# -- sentence splitting -------------------------------------------------------


def test_split_sentences_keeps_terminator():
    got = T.split_sentences("Hello there. How are you? Fine!")
    assert got == ["Hello there.", "How are you?", "Fine!"]


def test_split_sentences_ellipsis_no_empties():
    got = T.split_sentences("Hello... world")
    assert got
    assert all(s.strip() for s in got)


def test_split_sentences_trailing_text():
    assert T.split_sentences("One. two")[-1] == "two"


def test_chunk_by_sentence_budget():
    text = "Aaaa. Bbbb. Cccc."
    got = T.chunk_by_sentence(text, 11)
    assert got == ["Aaaa. Bbbb.", "Cccc."]
    assert T.chunk_by_sentence(text, 0) == [text]


# -- prepare_chunks ----------------------------------------------------------


def test_prepare_chunks_single():
    chunks = T.prepare_chunks("hello world how are you today", _WordTokenizer())
    assert len(chunks) == 1
    c = chunks[0]
    assert c.text == "Hello world how are you today."
    assert c.num_tokens == 6
    assert c.num_words == 6


def test_prepare_chunks_splits_on_budget():
    text = "one two three four five. six seven eight nine ten."

    class _Tok:
        def encode(self, s):
            return list(range(len(s.split())))

    chunks = T.prepare_chunks(text, _Tok(), max_tokens=6)
    assert len(chunks) == 2
    assert chunks[0].text.strip().startswith("One")
    assert chunks[1].text.strip().startswith("Six")


def test_prepare_chunks_empty_raises():
    with pytest.raises(ValueError):
        T.prepare_chunks("   ", _WordTokenizer())
