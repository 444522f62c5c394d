"""Independent-reference tests for the grid-pruned skyline and the Markov
event-transition matrix."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest


def _brute_skyline(pts):
    out = []
    for i, (ix, x, y) in enumerate(pts):
        dominated = any(
            (ox <= x and oy <= y and (ox < x or oy < y)) for _, ox, oy in pts
        )
        if not dominated:
            out.append((ix, x, y))
    return out


def test_skyline_matches_bruteforce(spark):
    from raptor_rag_spark.operators.spatial import skyline

    rng = np.random.default_rng(21)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(rng.uniform(0, 1, (300, 2)))]
    # add an exact duplicate of a frontier point — both must survive
    ref = _brute_skyline(pts)
    dup_id, dup_x, dup_y = ref[0]
    pts.append((9999, dup_x, dup_y))
    ref = _brute_skyline(pts)
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    got = sorted((r["vec_id"], r["x"], r["y"]) for r in skyline(df, res=5).collect())
    assert got == sorted(ref)
    assert any(r[0] == 9999 for r in got) and any(r[0] == dup_id for r in got)
    # frontier is an anti-chain: sorted by x, the ys strictly decrease
    # (except exact duplicates)
    seq = sorted(set((x, y) for _, x, y in got))
    for (x1, y1), (x2, y2) in zip(seq, seq[1:]):
        assert x2 > x1 and y2 < y1


def test_skyline_pruning_is_lossless_on_clusters(spark):
    from raptor_rag_spark.operators.spatial import skyline

    # a dense blob far from origin plus a tight frontier near origin —
    # the blob's cells are all dominated and must be pruned without loss
    rng = np.random.default_rng(22)
    blob = [(i, float(a), float(b)) for i, (a, b) in enumerate(rng.uniform(0.6, 1.0, (500, 2)))]
    frontier = [(1000 + i, 0.01 * i, 0.01 * (10 - i)) for i in range(11)]
    pts = blob + frontier
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    got = sorted(r["vec_id"] for r in skyline(df, res=4).collect())
    assert got == sorted(p[0] for p in _brute_skyline(pts))
    assert all(g >= 1000 for g in got)


def test_event_transitions_matches_handrolled(spark):
    from raptor_rag_spark.operators.funnel import event_transitions

    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    seqs = {1: "abcab", 2: "aab", 3: "ccc", 4: "b"}
    for u, s in seqs.items():
        for k, t in enumerate(s):
            rows.append((eid, base + timedelta(minutes=k), u, t))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    exp: dict[tuple[str, str], int] = {}
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in exp.items():
        tot[a] = tot.get(a, 0) + n
    got = {(r["prev_type"], r["event_type"]): (r["n"], r["p"]) for r in event_transitions(df).collect()}
    assert set(got) == set(exp)
    for k, n in exp.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(n / tot[k[0]], rel=1e-12)
    # probabilities sum to 1 per source state
    for a in tot:
        assert sum(p for (s, _), (_, p) in got.items() if s == a) == pytest.approx(1.0)
