"""Chunker + tokenizer contracts (reference: tests/test_utils.py:24-91)."""

import pytest

from raptor_rag_spark.kernels.chunker import DefaultTextSplitter, split_text
from raptor_rag_spark.kernels.tokenizer import RegexTokenizer, tokenize

TOK = RegexTokenizer()


def test_tokenizer_basic():
    assert tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert tokenize("") == []
    assert tokenize("   ") == []
    assert TOK.count("one two three") == 3
    assert len(TOK.encode("a b")) == 2


def test_tokenizer_deterministic():
    assert TOK.encode("spark engine") == TOK.encode("spark engine")


def test_split_empty_text():
    assert split_text("", TOK, 10) == []


def test_split_whitespace_only():
    assert split_text("   \n  \n ", TOK, 10) == []


def test_split_single_sentence():
    chunks = split_text("The quick brown fox.", TOK, 100)
    assert chunks == ["The quick brown fox"]


def test_split_respects_max_tokens(sample_text):
    max_tokens = 10
    chunks = split_text(sample_text, TOK, max_tokens)
    assert len(chunks) > 1
    # each chunk ≤ max_tokens with small slack (reference allows slack ≤ 20)
    for c in chunks:
        assert TOK.count(c) <= max_tokens + 20


def test_split_preserves_content(sample_text):
    chunks = split_text(sample_text, TOK, 12)
    joined = " ".join(chunks)
    for word in ["quick", "wizard", "zebras", "Sphinx", "boxing"]:
        assert word in joined


def test_split_newline_delimiter():
    chunks = split_text("alpha beta\ngamma delta", TOK, 2)
    assert chunks == ["alpha beta", "gamma delta"]


def test_split_long_sentence_subsplit():
    # one "sentence" (no .!?\n) longer than max_tokens, with sub-delimiters
    text = "aaa bbb ccc, ddd eee fff; ggg hhh iii"
    chunks = split_text(text, TOK, 4)
    assert len(chunks) == 3
    assert chunks[0].startswith("aaa")


def test_split_overlap():
    text = "one two. three four. five six. seven eight."
    no_overlap = split_text(text, TOK, 4, overlap=0)
    with_overlap = split_text(text, TOK, 4, overlap=1)
    assert len(no_overlap) >= 2
    # with overlap=1 each later chunk repeats the previous chunk's last sentence
    assert any(
        with_overlap[i].split(".")[0].strip() in with_overlap[i - 1] for i in range(1, len(with_overlap))
    ) or len(with_overlap) >= len(no_overlap)


def test_split_unicode():
    chunks = split_text("héllo wörld. ünïcode tèxt.", TOK, 100)
    assert len(chunks) == 1


def test_default_text_splitter_delegates(sample_text):
    splitter = DefaultTextSplitter()
    assert splitter.split_text(sample_text, TOK, 10) == split_text(sample_text, TOK, 10)


def test_splitter_abc():
    from raptor_rag_spark.kernels.chunker import BaseTextSplitter

    with pytest.raises(NotImplementedError):
        BaseTextSplitter().split_text("x", TOK, 5)
