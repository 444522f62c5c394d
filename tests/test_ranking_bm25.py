"""Twin ln + distributed BM25 ranking.

The ln twin must be bit-identical across Spark, DuckDB, and the Python
scalar reference over positive doubles; bm25_rank must reproduce a plain
single-machine BM25 (math.log idf, per-doc loop) to float tolerance and
honour the relative document-frequency guard exactly.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.functions import sqlgen as G
from raptor_rag_spark.operators.ranking import bm25_rank

# ------------------------------------------------------------------- ln twin


@pytest.fixture(scope="module")
def xs():
    rng = np.random.default_rng(11)
    return np.concatenate(
        [
            rng.exponential(5.0, 500),
            rng.uniform(1e-6, 1e6, 300),
            10.0 ** rng.uniform(-300, 300, 200),
            np.array([1.0, 2.0, 0.5, 1.0000001, 0.9999999, 1e308, 2.2250738585072014e-308]),
        ]
    )


def test_ln_twin_duckdb_bits(xs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [xs.tolist()])
    duck = next(iter(con.execute(f"SELECT {G.ln_sql('x')} FROM t").fetchnumpy().values()))
    py = np.array([G.ln_py(float(x)) for x in xs])
    assert (duck.view(np.uint64) == py.view(np.uint64)).all()


def test_ln_twin_spark_bits(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    out = np.array([r[0] for r in df.select(G.ln_col(F.col("x")).alias("l")).collect()])
    py = np.array([G.ln_py(float(x)) for x in xs])
    assert (out.view(np.uint64) == py.view(np.uint64)).all()


def test_ln_twin_accuracy(xs):
    vals = np.array([G.ln_py(float(x)) for x in xs])
    true = np.log(xs)
    err = np.abs(vals - true)
    # relative where ln is large, absolute near x=1 (ln→0 cancellation)
    tol = np.maximum(np.abs(true) * 5e-16, 5e-16)
    assert (err <= tol).all()


# ------------------------------------------------------------------- bm25

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lazy dogs sleep all day the dog"),
    (3, "quick thinking wins the day"),
    (4, "a completely unrelated sentence about spark shuffles"),
]
QS = [(0, "quick fox"), (1, "lazy dog day")]


def _ref_bm25(docs, queries, k1=1.2, b=0.75, max_df_frac=None):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, q in queries:
        for d, ws in toks.items():
            s = 0.0
            for t in set(q.lower().split()):
                if t not in df:
                    continue
                if max_df_frac is not None and df[t] > n * max_df_frac:
                    continue
                tf = ws.count(t)
                if tf == 0:
                    continue
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
            if s != 0.0:
                out[(qid, d)] = s
    return out


def test_bm25_matches_reference_scores(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QS, "query_id int, qtext string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_rank(docs, qs, top_k=10).collect()
    }
    ref = _ref_bm25(DOCS, QS)
    assert set(got) == set(ref)
    for key, s in ref.items():
        assert got[key] == pytest.approx(s, rel=1e-12)


def test_bm25_rank_order_and_topk(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QS, "query_id int, qtext string")
    rows = bm25_rank(docs, qs, top_k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    ref = _ref_bm25(DOCS, QS)
    for qid, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        assert len(rs) <= 2
        # top-1 is the argmax of the reference scores
        best = max((s, -d) for (q, d), s in ref.items() if q == qid)
        top = min(rs, key=lambda r: r["rank"])
        assert top["doc_id"] == -best[1]


def test_bm25_max_df_ratio_drops_stopwords(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "the fox")], "query_id int, qtext string")
    # 'the' is in 4/5 docs; ratio (1,2) keeps only df*2 <= 5 → 'fox' (df=2)
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_rank(docs, qs, top_k=10, max_df_ratio=(1, 2)).collect()
    }
    ref = _ref_bm25(DOCS, [(0, "the fox")], max_df_frac=0.5)
    assert set(got) == set(ref)
    for key, s in ref.items():
        assert got[key] == pytest.approx(s, rel=1e-12)


def test_doc_top_terms_matches_reference(spark):
    from raptor_rag_spark.operators.ranking import doc_top_terms

    toks = {d: t.lower().split() for d, t in DOCS}
    n = len([d for d, ws in toks.items() if ws])
    dfm: dict[str, int] = {}
    for ws in toks.values():
        for t in set(ws):
            dfm[t] = dfm.get(t, 0) + 1
    ref = {}
    for d, ws in toks.items():
        scores = sorted(
            ((ws.count(t) * math.log(n / dfm[t]), t) for t in set(ws)),
            key=lambda p: (-p[0], p[1]),
        )[:3]
        ref[d] = [(t, s) for s, t in scores]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = doc_top_terms(df, top_k=3).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rank"])):
        got.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    assert set(got) == set(ref)
    for d in ref:
        assert [t for t, _ in got[d]] == [t for t, _ in ref[d]]
        for (_, s_got), (_, s_ref) in zip(got[d], ref[d]):
            assert s_got == pytest.approx(s_ref, rel=1e-12, abs=1e-12)


def test_collocations_match_reference(spark):
    from raptor_rag_spark.operators.textops import collocations

    docs = [
        (i, "new york city has a new mayor in new york today") for i in range(5)
    ] + [(100 + i, "old town road and old town square") for i in range(4)]
    toks = {d: t.lower().split() for d, t in docs}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    n_tok = 0
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
            n_tok += 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    ref = {
        p: (c, math.log(c * n_tok / (uni[p[0]] * uni[p[1]])))
        for p, c in big.items()
        if c >= 5
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = collocations(df, top_k=50, min_count=5).collect()
    got = {(r["term_a"], r["term_b"]): (r["n_ab"], r["pmi"]) for r in rows}
    assert set(got) == set(ref)
    for p, (c, pmi) in ref.items():
        assert got[p][0] == c
        assert got[p][1] == pytest.approx(pmi, rel=1e-12)
    # ranks ordered by pmi desc
    by_rank = sorted(rows, key=lambda r: r["rank"])
    pmis = [r["pmi"] for r in by_rank]
    assert pmis == sorted(pmis, reverse=True)
