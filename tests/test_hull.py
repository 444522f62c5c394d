"""Tests for the monotone-chain kernel and the per-tile hull operator."""

from __future__ import annotations

import numpy as np
import pytest

from raptor_rag_spark.kernels.geometry import hull_edges


def _brute_hull_edges(pts):
    """All-points-right O(m^3) directed-edge test (the oracle algorithm)."""
    out = set()
    for i, (ix, x1, y1) in enumerate(pts):
        for j, (jx, x2, y2) in enumerate(pts):
            if i == j:
                continue
            if all(
                (x2 - x1) * (oy - y1) - (y2 - y1) * (ox - x1) <= 0
                for k, (_, ox, oy) in enumerate(pts)
                if k not in (i, j)
            ):
                out.add((ix, jx))
    return out


def test_hull_kernel_matches_bruteforce():
    rng = np.random.default_rng(41)
    for trial in range(5):
        m = int(rng.integers(3, 40))
        xs = rng.uniform(0, 1, m)
        ys = rng.uniform(0, 1, m)
        ids = np.arange(100, 100 + m)
        got = set(hull_edges(xs, ys, ids))
        exp = _brute_hull_edges(list(zip(ids.tolist(), xs.tolist(), ys.tolist())))
        assert got == exp, trial
        # the edge set is a single cycle: out-degree 1 per hull vertex
        outdeg: dict[int, int] = {}
        for a, _ in got:
            outdeg[a] = outdeg.get(a, 0) + 1
        assert all(v == 1 for v in outdeg.values())


def test_hull_kernel_degenerate_sizes():
    assert hull_edges(np.array([0.5]), np.array([0.5]), np.array([7])) == []
    e = hull_edges(np.array([0.1, 0.9]), np.array([0.2, 0.8]), np.array([3, 4]))
    assert set(e) == {(3, 4), (4, 3)}


def test_hull_clockwise_square():
    xs = np.array([0.0, 1.0, 1.0, 0.0, 0.5])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 0.5])  # center point must vanish
    e = hull_edges(xs, ys, np.array([0, 1, 2, 3, 9]))
    assert set(e) == {(3, 2), (2, 1), (1, 0), (0, 3)}  # clockwise ring
    assert all(9 not in edge for edge in e)


def test_tile_hulls_operator(spark):
    from raptor_rag_spark.operators.hull import tile_hulls

    rng = np.random.default_rng(43)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(rng.uniform(0, 1, (200, 2)))]
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    res = 1  # 4 tiles
    rows = tile_hulls(df, res=res).collect()
    # group expected per tile and compare against the brute-force edge set
    tiles: dict[int, list] = {}
    n = 1 << res
    for i, x, y in pts:
        t = (min(int(x * n), n - 1), min(int(y * n), n - 1))
        tiles.setdefault(t[0] * n + t[1], []).append((i, x, y))
    got_by_tile: dict[int, set] = {}
    for r in rows:
        from raptor_rag_spark.kernels.grid import COORD_BITS

        key = ((r["tile"] >> COORD_BITS) & ((1 << COORD_BITS) - 1)) * n + (
            r["tile"] & ((1 << COORD_BITS) - 1)
        )
        got_by_tile.setdefault(key, set()).add((r["a_id"], r["b_id"]))
        # coordinates round-trip exactly
        assert pts[r["a_id"]][1] == r["ax"] and pts[r["a_id"]][2] == r["ay"]
    for key, members in tiles.items():
        assert got_by_tile[key] == _brute_hull_edges(members), key
