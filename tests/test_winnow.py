"""Winnowing fingerprints (MOSS): reference-python vs DuckDB vs Spark twins,
plus the winnowing guarantee (shared k+w-1 token run ⇒ shared fingerprint)."""

from __future__ import annotations

import hashlib
import re

import duckdb

from raptor_rag_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_matches,
    winnow_matches_sql,
)

WORD_RE = re.compile(r"[a-z0-9]+")


def _hash63(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    toks = WORD_RE.findall(text.lower())
    if not toks:
        return set()
    grams = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else [" ".join(toks)]
    )
    hs = [_hash63(g) for g in grams]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2, "completely different words describing some other topic entirely here now"),
    # doc 3 shares a long run with doc 1 (the first 12 words)
    (3, "the quick brown fox jumps over the lazy dog and runs far but then it stops"),
    (4, ""),
    (5, "short text"),
]


def _duck(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return con.execute(sql).fetchall()


def test_sql_matches_reference_python():
    rows = _duck(winnow_fingerprints_sql("SELECT doc_id, text FROM documents"))
    got: dict[int, set[int]] = {}
    for d, fp in rows:
        got.setdefault(d, set()).add(fp)
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _winnow_py(text), doc_id


def test_guarantee_shared_run_yields_shared_fp():
    """Docs 1 and 3 share a run of 12 >= k + w - 1 = 11 tokens."""
    a, b = _winnow_py(DOCS[0][1]), _winnow_py(DOCS[2][1])
    assert a & b
    pairs = _duck(winnow_matches_sql("SELECT doc_id, text FROM documents", min_shared=1))
    assert any(p[:2] == (1, 3) for p in pairs)


def test_spark_twins(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r["doc_id"], r["fp"]) for r in winnow_fingerprints(df).collect()}
    want = set(map(tuple, _duck(winnow_fingerprints_sql("SELECT doc_id, text FROM documents"))))
    assert got == want

    gm = {tuple(r) for r in winnow_matches(df, min_shared=1).collect()}
    wm = set(map(tuple, _duck(winnow_matches_sql("SELECT doc_id, text FROM documents", min_shared=1))))
    assert gm == wm


def test_simhash_near_exact_vs_bruteforce(spark):
    """Multi-probe simhash pairs == brute-force hamming<=1 over fingerprints
    (completeness of the 1-bit probe neighborhood)."""
    from raptor_rag_spark.operators.dedup import simhash_fingerprints, simhash_near_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dogs today"),
        (3, "completely different words on another topic entirely"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "numbers 123 and symbols only 456 789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 1
    }
    got = {tuple(r) for r in simhash_near_pairs(df).collect()}
    assert got == want
    assert (1, 4, 0) in got  # the exact dup pair survives at distance 0


from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=30),
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=30),
    st.lists(st.sampled_from(_VOCAB), min_size=WINNOW_K + WINNOW_W - 1, max_size=WINNOW_K + WINNOW_W + 4),
)
def test_winnow_guarantee_property(prefix_a, prefix_b, shared):
    """ANY two docs sharing a k+w-1 token run share >=1 winnowed fingerprint
    (the MOSS guarantee), regardless of surrounding context."""
    a = " ".join(prefix_a + shared)
    b = " ".join(prefix_b + shared)
    fa, fb = _winnow_py(a), _winnow_py(b)
    assert fa & fb, (a, b)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=40))
def test_winnow_density_property(tokens):
    """The fingerprint set is never larger than the k-gram count and never
    empty for non-empty docs (window-min always selects something)."""
    text = " ".join(tokens)
    fps = _winnow_py(text)
    if not tokens:
        assert fps == set()
    else:
        n_grams = max(len(tokens) - WINNOW_K + 1, 1)
        assert 1 <= len(fps) <= n_grams


def test_cdc_edit_locality(spark):
    """The CDC property: editing one token changes only chunks near the
    edit — chunk hashes before the edit's neighborhood are identical."""
    from raptor_rag_spark.operators.dedup import CDC_GRAM, cdc_chunks

    base_toks = [f"w{i % 23}x{i % 7}" for i in range(120)]
    edited = list(base_toks)
    edited[80] = "EDITED"
    df = spark.createDataFrame(
        [(1, " ".join(base_toks)), (2, " ".join(edited))], "doc_id long, text string"
    )
    out = cdc_chunks(df).collect()
    a = sorted((r["chunk_idx"], r["chunk_hash"], r["n_tokens"]) for r in out if r["doc_id"] == 1)
    b = sorted((r["chunk_idx"], r["chunk_hash"], r["n_tokens"]) for r in out if r["doc_id"] == 2)
    # token masses match the input
    assert sum(t[2] for t in a) == 120 and sum(t[2] for t in b) == 120
    # all chunks fully before the edit neighborhood are bit-identical
    pre_a = [t for t in a if sum(x[2] for x in a[: t[0]]) + t[2] <= 80 - CDC_GRAM]
    assert pre_a and all(t in b for t in pre_a)
    # and the docs differ somewhere after it
    assert a != b
