"""ql_rank (Dirichlet query-likelihood) and rrf_fuse vs hand-rolled math."""

import math

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.ranking import bm25_rank, ql_rank, rrf_fuse

DOCS = [
    (1, "spark joins data with merge sort strategies"),
    (2, "customer orders arrive daily and spark processes orders"),
    (3, "a window function filters and aggregates parts"),
    (4, "spark spark spark merge merge join"),
    (5, "completely unrelated text about gardening and tulips"),
]


def _ref_ql(docs, qtext, mu=2000.0):
    toks = {d: t.lower().split() for d, t in docs}
    dl = {d: len(ws) for d, ws in toks.items()}
    c_len = sum(dl.values())
    cf = {}
    for ws in toks.values():
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
    q = [w for w in qtext.lower().split() if w in cf]
    scores = {}
    for d, ws in toks.items():
        matched = [t for t in set(q) if t in ws]
        if not matched:
            continue
        s = 0.0
        for t in set(q):
            tf = ws.count(t)
            if tf:
                s += q.count(t) * math.log(1.0 + tf / (mu * cf[t] / c_len))
        s += len(q) * math.log(mu / (dl[d] + mu))
        scores[d] = s
    return scores


def test_ql_rank_matches_handrolled(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "spark merge join")], "query_id INT, qtext STRING")
    got = {r["doc_id"]: r["score"] for r in ql_rank(docs, qs, top_k=10).collect()}
    ref = _ref_ql(DOCS, "spark merge join")
    assert set(got) == set(ref)  # only docs matching >=1 in-vocab term
    for d in ref:
        assert got[d] == pytest.approx(ref[d], rel=1e-9)
    # doc 4 repeats the query terms most and is shortest-ish: must rank first
    assert max(got, key=got.get) == 4


def test_ql_oov_terms_dropped(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    qs = spark.createDataFrame(
        [(0, "spark zzzunseen"), (1, "spark")], "query_id INT, qtext STRING"
    )
    out = ql_rank(docs, qs, top_k=10)
    a = {r["doc_id"]: r["score"] for r in out.where(F.col("query_id") == 0).collect()}
    b = {r["doc_id"]: r["score"] for r in out.where(F.col("query_id") == 1).collect()}
    assert a == b  # the OOV term contributes nothing to either sum


def test_rrf_fuse_math_and_outer_union(spark):
    a = spark.createDataFrame(
        [(0, 10, 1.0, 1), (0, 11, 0.9, 2)], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    b = spark.createDataFrame(
        [(0, 11, 5.0, 1), (0, 12, 4.0, 2)], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    out = {r["doc_id"]: (r["score"], r["rank"]) for r in rrf_fuse(a, b, top_k=10).collect()}
    # doc 11 appears in both lists -> sum of both reciprocal ranks, rank 1
    assert out[11][0] == pytest.approx(1 / 62 + 1 / 61)
    assert out[11][1] == 1
    # docs only in one list still surface (full-outer semantics)
    assert out[10][0] == pytest.approx(1 / 61) and out[12][0] == pytest.approx(1 / 62)
    # equal scores tie-break by doc_id: 10 (1/61) > 12 (1/62)
    assert out[10][1] == 2 and out[12][1] == 3


def test_rrf_hybrid_improves_on_single_system_shape(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "spark merge join")], "query_id INT, qtext STRING")
    fused = rrf_fuse(
        bm25_rank(docs, qs, top_k=3), ql_rank(docs, qs, top_k=3), top_k=10
    ).collect()
    assert len(fused) >= 3
    ranks = sorted(r["rank"] for r in fused)
    assert ranks == list(range(1, len(fused) + 1))
