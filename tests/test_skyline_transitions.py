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


def _seg_cross(s1, s2):
    (x1, y1, x2, y2), (x3, y3, x4, y4) = s1, s2
    d1 = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    d2 = (x2 - x1) * (y4 - y1) - (y2 - y1) * (x4 - x1)
    d3 = (x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)
    d4 = (x4 - x3) * (y2 - y3) - (y4 - y3) * (x2 - x3)
    if d1 * d2 < 0 and d3 * d4 < 0:
        t = d3 / ((x4 - x3) * (y2 - y1) - (y4 - y3) * (x2 - x1))
        return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
    return None


def test_segment_intersections_match_bruteforce(spark):
    from raptor_rag_spark.operators.spatial import segment_intersections

    rng = np.random.default_rng(31)
    segs = []
    for i in range(120):
        ax, ay = rng.uniform(0, 0.9, 2)
        bx, by = ax + rng.uniform(-0.15, 0.15), ay + rng.uniform(-0.15, 0.15)
        segs.append((i, i % 7, float(ax), float(ay), float(min(max(bx, 0), 1)), float(min(max(by, 0), 1))))
    df = spark.createDataFrame(segs, "seg_id long, traj_id long, ax double, ay double, bx double, by double")
    exp = {}
    for i, (ia, ta, *c1) in enumerate(segs):
        for ib, tb, *c2 in segs[i + 1:]:
            if ta == tb:
                continue
            p = _seg_cross(tuple(c1), tuple(c2))
            if p is not None:
                exp[(ia, ib)] = p
    got = {(r["seg_a"], r["seg_b"]): (r["px"], r["py"]) for r in segment_intersections(df, res=4).collect()}
    assert set(got) == set(exp)
    for k, (px, py) in exp.items():
        assert got[k][0] == pytest.approx(px, abs=1.1e-6)
        assert got[k][1] == pytest.approx(py, abs=1.1e-6)
    assert len(exp) > 20  # the scene actually has crossings


def test_segment_touching_endpoints_excluded(spark):
    from raptor_rag_spark.operators.spatial import segment_intersections

    segs = [
        (0, 0, 0.1, 0.1, 0.5, 0.5),
        (1, 1, 0.5, 0.5, 0.9, 0.1),   # shares an endpoint → NOT proper
        (2, 2, 0.1, 0.5, 0.5, 0.1),   # crosses seg 0 properly
        (3, 0, 0.3, 0.1, 0.3, 0.6),   # same traj as 0 → excluded even if crossing
    ]
    df = spark.createDataFrame(segs, "seg_id long, traj_id long, ax double, ay double, bx double, by double")
    got = {(r["seg_a"], r["seg_b"]) for r in segment_intersections(df, res=3).collect()}
    assert (0, 1) not in got
    assert (0, 2) in got
    assert (0, 3) not in got
    assert (2, 3) in got  # different trajs, proper crossing
