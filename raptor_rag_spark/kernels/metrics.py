"""Evaluation-metric kernels (reference: benchmarks/_metrics.py).

SQuAD-style normalization / token-F1 / accuracy and the LCS ROUGE-L fallback,
re-implemented from the published algorithm definitions. The exact-value test
fixtures from the reference suite (e.g. normalize("The Quick, Brown Fox!") ==
"quick brown fox") are asserted in tests/test_metrics.py. ``normalize_answer``
is also generated as pure Spark/DuckDB SQL in functions/sqlgen.py (F7).
"""

from __future__ import annotations

import re
import string
from collections import Counter

_ARTICLES = re.compile(r"\b(a|an|the)\b")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def normalize_answer(s: str) -> str:
    s = _ARTICLES.sub(" ", s.lower())
    s = s.translate(_PUNCT_TABLE)
    return " ".join(s.split())


def token_f1(prediction: str, gold: str) -> float:
    pred = normalize_answer(prediction).split()
    gold_t = normalize_answer(gold).split()
    if not gold_t and not pred:
        return 1.0
    if not gold_t or not pred:
        return 0.0
    overlap = sum((Counter(pred) & Counter(gold_t)).values())
    if overlap == 0:
        return 0.0
    p = overlap / len(pred)
    r = overlap / len(gold_t)
    return 2 * p * r / (p + r)


def max_token_f1(prediction: str, golds: list[str]) -> float:
    if not golds:
        return 0.0
    return max(token_f1(prediction, g) for g in golds)


def accuracy(predicted: str, correct: str) -> float:
    return 1.0 if normalize_answer(predicted) == normalize_answer(correct) else 0.0


def rouge_l(prediction: str, gold: str) -> float:
    """LCS-based ROUGE-L F1 (numpy-free DP)."""
    pred = normalize_answer(prediction).split()
    gold_t = normalize_answer(gold).split()
    if not gold_t and not pred:
        return 1.0
    if not gold_t or not pred:
        return 0.0
    m, n = len(pred), len(gold_t)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        pi = pred[i - 1]
        for j in range(1, n + 1):
            cur[j] = prev[j - 1] + 1 if pi == gold_t[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    lcs = prev[n]
    if lcs == 0:
        return 0.0
    p = lcs / m
    r = lcs / n
    return 2 * p * r / (p + r)


def meteor(prediction: str, gold: str) -> float:
    """Exact-unigram METEOR (reference wrapper: benchmarks/_metrics.py:100-121).

    The reference delegates to nltk's meteor_score (WordNet stem/synonym
    stages unavailable here); this is the published METEOR formula restricted
    to the exact-match stage, which is also what nltk computes when WordNet
    finds no extra matches: greedy positional unigram alignment, harmonic
    mean F = P*R / (alpha*P + (1-alpha)*R) with alpha = 0.9, fragmentation
    penalty gamma * (chunks / matches)^beta with gamma = 0.5, beta = 3.
    """
    pred = prediction.split()
    ref = gold.split()
    if not pred or not ref:
        return 0.0
    # greedy alignment: each pred position matched to the first unused
    # identical ref position (nltk's exact-match enumeration order)
    used: set[int] = set()
    pairs: list[tuple[int, int]] = []
    for i, tok in enumerate(pred):
        for j, rtok in enumerate(ref):
            if j not in used and tok == rtok:
                used.add(j)
                pairs.append((i, j))
                break
    m = len(pairs)
    if m == 0:
        return 0.0
    p = m / len(pred)
    r = m / len(ref)
    fmean = p * r / (0.9 * p + 0.1 * r)
    # chunks: maximal runs contiguous in BOTH sequences (pairs are sorted by
    # pred position by construction)
    chunks = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    # explicit cube, not **3: the SQL oracle twin multiplies (c*c)*c, and C
    # pow() is not guaranteed bit-identical to repeated multiplication
    c = chunks / m
    penalty = 0.5 * ((c * c) * c)
    return fmean * (1.0 - penalty)
