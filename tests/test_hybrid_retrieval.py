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


def _ref_mmr(cands, wsets, k=3, lam=0.7):
    """cands: {doc_id: rel}; wsets: {doc_id: set(words)}."""
    sel, out = [], []
    for i in range(1, k + 1):
        best = None
        for d, rel in cands.items():
            if d in sel:
                continue
            pen = max((len(wsets[d] & wsets[s]) / len(wsets[d] | wsets[s]) for s in sel), default=0.0)
            m = lam * rel - (1 - lam) * pen
            if best is None or (m, -d) > (best[1], -best[0]):
                best = (d, m)
        if best is None:
            break
        sel.append(best[0])
        out.append((best[0], i, best[1]))
    return out


def test_mmr_select_matches_handrolled(spark):
    from raptor_rag_spark.operators.rerank import mmr_select

    docs_rows = [
        (1, "apple banana cherry"),
        (2, "apple banana cherry dates"),  # near-dup of 1
        (3, "quantum flux capacitors"),
        (4, "apple quantum banana flux"),
    ]
    cands = {1: 1.0, 2: 0.95, 3: 0.5, 4: 0.6}
    docs = spark.createDataFrame(docs_rows, "doc_id LONG, text STRING")
    cand = spark.createDataFrame(
        [(0, d, r) for d, r in cands.items()], "query_id INT, doc_id LONG, rel DOUBLE"
    )
    got = {
        r["doc_id"]: (r["pick"], r["mmr"])
        for r in mmr_select(cand, docs, k=3, lam=0.5).collect()
    }
    wsets = {d: set(t.split()) for d, t in docs_rows}
    ref = _ref_mmr(cands, wsets, k=3, lam=0.5)
    assert len(got) == 3
    for doc_id, pick, mmr in ref:
        assert got[doc_id][0] == pick
        assert got[doc_id][1] == pytest.approx(mmr, rel=1e-12)
    # diversity: the near-duplicate of pick 1 must NOT be pick 2
    picks = sorted(got.items(), key=lambda kv: kv[1][0])
    assert picks[0][0] == 1 and picks[1][0] != 2


def test_mmr_fewer_candidates_than_k(spark):
    from raptor_rag_spark.operators.rerank import mmr_select

    docs = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id LONG, text STRING")
    cand = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.9)], "query_id INT, doc_id LONG, rel DOUBLE"
    )
    out = mmr_select(cand, docs, k=5, lam=0.7).collect()
    assert sorted(r["pick"] for r in out) == [1, 2]  # stops when exhausted


def test_rm3_expansion_recalls_docs_without_query_terms(spark):
    from raptor_rag_spark.operators.ranking import ql_rank, rm3_rank

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta gamma delta"),  # shares NO original query term
            (3, "alpha alpha epsilon"),
            (4, "zeta eta theta"),
        ],
        "doc_id LONG, text STRING",
    )
    qs = spark.createDataFrame([(0, "alpha")], "query_id INT, qtext STRING")
    ql_docs = {r["doc_id"] for r in ql_rank(docs, qs, top_k=10).collect()}
    rm3 = rm3_rank(docs, qs, top_k=10, fb_docs=2, fb_terms=5).collect()
    rm3_docs = {r["doc_id"] for r in rm3}
    assert 2 not in ql_docs  # first-pass models can't see doc 2
    assert 2 in rm3_docs  # expansion terms (beta/gamma from feedback) recall it
    # ranks are a contiguous 1..n permutation
    assert sorted(r["rank"] for r in rm3) == list(range(1, len(rm3) + 1))


def test_snippet_extract_picks_densest_window(spark):
    from raptor_rag_spark.operators.ranking import snippet_extract

    # query terms x,y: the densest 5-token window is "x q y" at pos 6
    docs = spark.createDataFrame(
        [(1, "x a b c d e x q y z w"), (2, "nothing relevant here")],
        "doc_id LONG, text STRING",
    )
    qs = spark.createDataFrame([(0, "x y")], "query_id INT, qtext STRING")
    out = snippet_extract(docs, qs, window=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1  # doc 2 has no hits
    r = out[0]
    assert r["n_hits"] == 2 and r["start"] == 6
    assert r["snippet"] == "x q y z w"


def test_snippet_window_ties_break_earliest(spark):
    from raptor_rag_spark.operators.ranking import snippet_extract

    docs = spark.createDataFrame([(1, "x a a a x")], "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "x")], "query_id INT, qtext STRING")
    r = snippet_extract(docs, qs, window=3).collect()[0]
    assert r["start"] == 0 and r["n_hits"] == 1  # both hits cover 1 term; earliest wins
    assert r["snippet"] == "x a a"


def test_snippet_candidate_restriction(spark):
    from raptor_rag_spark.operators.ranking import snippet_extract

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y w")], "doc_id LONG, text STRING"
    )
    qs = spark.createDataFrame([(0, "x")], "query_id INT, qtext STRING")
    cand = spark.createDataFrame([(0, 2)], "query_id INT, doc_id LONG")
    out = snippet_extract(docs, qs, window=3, cand=cand).collect()
    assert [r["doc_id"] for r in out] == [2]
