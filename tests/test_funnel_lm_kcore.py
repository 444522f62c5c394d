"""Independent-reference tests for bigram-LM scoring, funnel conversion,
cohort retention, and k-core peeling (round-2 tranche 3)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np
import pytest


def test_bigram_lm_matches_handrolled(spark):
    from raptor_rag_spark.operators.textops import bigram_lm_scores

    docs = [
        (0, "a b a b c"),
        (1, "a b c d"),
        (2, "c a c a"),
        (3, "z"),  # single token → no bigrams → absent from output
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    alpha = 0.5
    # reference model
    toks = {d: t.split() for d, t in docs}
    bigrams: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    ctx: dict[str, int] = {}
    for (a, _), c in bigrams.items():
        ctx[a] = ctx.get(a, 0) + c
    vocab = len({w for ws in toks.values() for w in ws})
    got = {r["doc_id"]: r for r in bigram_lm_scores(df, alpha=alpha).collect()}
    assert set(got) == {0, 1, 2}
    for d in (0, 1, 2):
        ws = toks[d]
        lps = [
            math.log((bigrams[(a, b)] + alpha) / (ctx[a] + alpha * vocab))
            for a, b in zip(ws, ws[1:])
        ]
        avg = sum(lps) / len(lps)
        assert got[d]["n_bigrams"] == len(ws) - 1
        assert got[d]["avg_logprob"] == pytest.approx(avg, rel=1e-9)
        assert got[d]["ppl"] == pytest.approx(math.exp(-avg), rel=1e-9)
    # the repetitive doc 0 is more predictable than the one-off doc 1
    assert got[0]["ppl"] < got[1]["ppl"]


def _ev(uid, etype, minutes):
    return (uid, etype, datetime(2024, 1, 1) + timedelta(minutes=minutes))


def test_funnel_ordering_and_window(spark):
    from raptor_rag_spark.operators.funnel import funnel

    events = [
        # u1 converts all three in order
        _ev(1, "view", 0), _ev(1, "click", 10), _ev(1, "purchase", 20),
        # u2 clicks BEFORE viewing → click doesn't count (strict order)
        _ev(2, "click", 0), _ev(2, "view", 10),
        # u3 views and clicks; purchase outside the window
        _ev(3, "view", 0), _ev(3, "click", 5), _ev(3, "purchase", 120),
        # u4 only views
        _ev(4, "view", 0),
        # u5 never views → not even step 1
        _ev(5, "purchase", 0),
    ]
    df = spark.createDataFrame(events, "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r for r in funnel(df, ["view", "click", "purchase"], window_s=3600).collect()}
    assert got[1]["users"] == 4  # u1 u2 u3 u4
    assert got[2]["users"] == 2  # u1 u3 (u2 clicked before view)
    assert got[3]["users"] == 1  # u1 only (u3 outside window)
    assert got[1]["conv_rate"] == 1.0
    assert got[2]["conv_rate"] == pytest.approx(0.5)
    assert got[3]["conv_rate"] == pytest.approx(0.25)
    assert [got[i]["event_type"] for i in (1, 2, 3)] == ["view", "click", "purchase"]


def test_cohort_retention_matches_handrolled(spark):
    from raptor_rag_spark.operators.funnel import cohort_retention

    base = datetime(2024, 1, 4)  # thursday = epoch-week boundary day
    events = []
    # cohort A: 3 users first seen week 0; two return week 1, one week 2
    for u in (1, 2, 3):
        events.append((u, base))
    events += [(1, base + timedelta(days=7)), (2, base + timedelta(days=8)),
               (1, base + timedelta(days=15))]
    # cohort B: 1 user first seen week 1
    events.append((9, base + timedelta(days=7)))
    df = spark.createDataFrame(events, "user_id long, ts timestamp")
    rows = cohort_retention(df).collect()
    wk0 = min(r["cohort_week"] for r in rows)
    got = {(r["cohort_week"] - wk0, r["week_offset"]): (r["users"], r["retention"]) for r in rows}
    assert got[(0, 0)] == (3, 1.0)
    assert got[(0, 1)][0] == 2 and got[(0, 1)][1] == pytest.approx(2 / 3)
    assert got[(0, 2)][0] == 1
    assert got[(1, 0)] == (1, 1.0)
    assert (1, 1) not in got


def test_kcore_matches_peeling(spark):
    from raptor_rag_spark.operators.graph import kcore

    rng = np.random.default_rng(13)
    hosts = [f"h{i:02d}" for i in range(14)]
    links = []
    # a clique of 5 (3-core) + random tree-ish fringe
    for i in range(5):
        for j in range(i + 1, 5):
            links.append((hosts[i], hosts[j], 1))
    for i in range(5, 14):
        links.append((hosts[i], hosts[int(rng.integers(0, i))], 1))
    df = spark.createDataFrame(links, "src_host string, dst_host string, n_links long")
    for k in (2, 3):
        nbrs: dict[str, set[str]] = {}
        for a, b, _ in links:
            if a != b:
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
        # reference peel to fixpoint
        alive = set(nbrs)
        while True:
            drop = {h for h in alive if len(nbrs[h] & alive) < k}
            if not drop:
                break
            alive -= drop
        got = {r["host"]: r["deg"] for r in kcore(df, k=k, rounds=12).collect()}
        assert set(got) == alive, k
        for h in alive:
            assert got[h] == len(nbrs[h] & alive)
    # the 5-clique is exactly the 3-core here
    got3 = {r["host"] for r in kcore(df, k=3, rounds=12).collect()}
    assert got3 == set(hosts[:5])
