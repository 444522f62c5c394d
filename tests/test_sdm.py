"""sdm_rank (sequential dependence model) vs hand-rolled Metzler-Croft math."""

import math

import pytest

from raptor_rag_spark.operators.ranking import (
    SDM_LO,
    SDM_LT,
    SDM_LU,
    sdm_rank,
)

DOCS = [
    (1, "the merge join runs after the shuffle stage completes"),
    (2, "join merge was reordered so the words stay apart merge then join"),
    (3, "spark executes a merge join plan with sorted partitions merge join"),
    (4, "unrelated gardening prose about tulips and compost heaps"),
    (5, "merge strategies and join strategies differ widely across engines"),
]

MU = 2000.0
W = 8


def _sdm_ref(docs, qtext, mu=MU, window=W):
    toks = {d: t.lower().split() for d, t in docs}
    dl = {d: len(ws) for d, ws in toks.items()}
    c_len = float(sum(dl.values()))
    c2_len = float(sum(max(v - 1, 0) for v in dl.values()))
    q = qtext.lower().split()

    # unigram stats
    cf = {}
    for ws in toks.values():
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
    qterms = [w for w in q if w in cf]
    qlen = float(len(qterms))

    # gram extraction per doc
    def ordered(ws):
        out = {}
        for a, b in zip(ws, ws[1:]):
            out[(a, b)] = out.get((a, b), 0) + 1
        return out

    def unordered(ws):
        out = {}
        for i in range(len(ws)):
            for j in range(i + 1, min(i + window, len(ws))):
                k = tuple(sorted((ws[i], ws[j])))
                out[k] = out.get(k, 0) + 1
        return out

    qbi = {}
    for a, b in zip(q, q[1:]):
        qbi[(a, b)] = qbi.get((a, b), 0) + 1
    qbi_u = {}
    for (a, b), n in qbi.items():
        k = tuple(sorted((a, b)))
        qbi_u[k] = qbi_u.get(k, 0) + n

    ob = {d: ordered(ws) for d, ws in toks.items()}
    uw = {d: unordered(ws) for d, ws in toks.items()}
    cf_o = {g: sum(o.get(g, 0) for o in ob.values()) for g in qbi}
    cf_u = {g: sum(u.get(g, 0) for u in uw.values()) for g in qbi_u}
    qlen_o = float(sum(n for g, n in qbi.items() if cf_o[g] > 0))
    qlen_u = float(sum(n for g, n in qbi_u.items() if cf_u[g] > 0))

    scores = {}
    for d, ws in toks.items():
        if not any(t in ws for t in set(qterms)):
            continue
        dlo = float(max(dl[d] - 1, 0))
        s_t = sum(
            q.count(t) * math.log(1.0 + ws.count(t) / (mu * cf[t] / c_len))
            for t in set(qterms)
            if t in ws
        ) + qlen * math.log(mu / (dl[d] + mu))
        s_o = sum(
            n * math.log(1.0 + ob[d].get(g, 0) / (mu * cf_o[g] / c2_len))
            for g, n in qbi.items()
            if cf_o[g] > 0 and ob[d].get(g, 0)
        ) + qlen_o * math.log(mu / (dlo + mu))
        s_u = sum(
            n * math.log(1.0 + uw[d].get(g, 0) / (mu * cf_u[g] / c2_len))
            for g, n in qbi_u.items()
            if cf_u[g] > 0 and uw[d].get(g, 0)
        ) + qlen_u * math.log(mu / (dlo + mu))
        scores[d] = SDM_LT * s_t + SDM_LO * s_o + SDM_LU * s_u
    return scores


def test_sdm_matches_handrolled(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "merge join")], "query_id INT, qtext STRING")
    got = {r["doc_id"]: r["score"] for r in sdm_rank(docs, qs, top_k=10).collect()}
    ref = _sdm_ref(DOCS, "merge join")
    assert set(got) == set(ref)
    for d in ref:
        assert got[d] == pytest.approx(ref[d], rel=1e-9)


def test_sdm_rewards_adjacency_over_bag(spark):
    # same unigram bag, different order: the exact-phrase doc must outrank
    # the scrambled doc under SDM (they tie under pure QL)
    docs = spark.createDataFrame(
        [
            (1, "alpha merge join beta gamma delta"),
            (2, "alpha join beta merge gamma delta"),
        ],
        "doc_id LONG, text STRING",
    )
    qs = spark.createDataFrame([(0, "merge join")], "query_id INT, qtext STRING")
    rows = {r["doc_id"]: r for r in sdm_rank(docs, qs, top_k=10).collect()}
    assert rows[1]["score"] > rows[2]["score"]
    assert rows[1]["rank"] == 1


def test_sdm_single_term_query_degenerates_to_ql(spark):
    # no query bigrams -> ordered/unordered components are exactly zero
    from raptor_rag_spark.operators.ranking import ql_rank

    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "merge")], "query_id INT, qtext STRING")
    got = {r["doc_id"]: r["score"] for r in sdm_rank(docs, qs, top_k=10).collect()}
    ql = {r["doc_id"]: r["score"] for r in ql_rank(docs, qs, top_k=10).collect()}
    assert set(got) == set(ql)
    for d in ql:
        assert got[d] == pytest.approx(SDM_LT * ql[d], rel=1e-12)
