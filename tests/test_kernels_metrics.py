"""Metric kernel exact values (reference: tests/test_benchmark_metrics.py)."""

import pytest

from raptor_rag_spark.kernels.metrics import accuracy, max_token_f1, normalize_answer, rouge_l, token_f1


def test_normalize_answer():
    assert normalize_answer("The Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("A man, a plan") == "man plan"
    assert normalize_answer("") == ""


def test_token_f1_exact_match():
    assert token_f1("the cat sat", "the cat sat") == pytest.approx(1.0)


def test_token_f1_no_overlap():
    assert token_f1("dog runs fast", "cat sits still") == 0.0


def test_token_f1_partial():
    # pred: {cat, sat}; gold: {cat, ran} after normalization → overlap 1
    f1 = token_f1("the cat sat", "the cat ran")
    assert f1 == pytest.approx(0.5)


def test_token_f1_empty():
    assert token_f1("", "") == 1.0
    assert token_f1("a", "") in (0.0, 1.0)  # 'a' normalizes to '' → both empty
    assert token_f1("word", "") == 0.0


def test_max_token_f1():
    assert max_token_f1("cat", ["dog", "cat", "bird"]) == 1.0
    assert max_token_f1("cat", []) == 0.0


def test_accuracy():
    assert accuracy("The Answer", "answer") == 1.0
    assert accuracy("yes", "no") == 0.0


def test_rouge_l():
    assert rouge_l("the cat sat on the mat", "the cat sat on the mat") == pytest.approx(1.0)
    assert rouge_l("completely different", "no overlap here") == 0.0
    partial = rouge_l("the cat sat", "the cat ran")
    assert 0.0 < partial < 1.0
