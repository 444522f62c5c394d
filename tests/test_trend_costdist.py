"""trend_surface vs numpy lstsq; cost_distance family vs Dijkstra."""

import heapq
import math

import numpy as np
import pytest

from raptor_rag_spark.operators.costdist import (
    _OFFS,
    cost_backlink,
    cost_corridor,
    cost_distance,
    isochrones,
)
from raptor_rag_spark.operators.geostats import trend_surface


def test_trend_surface_recovers_plane(spark):
    rng = np.random.RandomState(12)
    xs, ys = rng.rand(300), rng.rand(300)
    zs = 2.0 + 3.0 * xs - 1.5 * ys + rng.randn(300) * 0.01
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(xs, ys, zs)],
        "x DOUBLE, y DOUBLE, z DOUBLE",
    )
    r = trend_surface(df).collect()[0]
    A = np.column_stack([np.ones_like(xs), xs, ys])
    coef, *_ = np.linalg.lstsq(A, zs, rcond=None)
    assert r["n"] == 300
    assert r["a"] == pytest.approx(coef[0], abs=1e-4)
    assert r["b"] == pytest.approx(coef[1], abs=1e-4)
    assert r["c"] == pytest.approx(coef[2], abs=1e-4)
    pred = A @ coef
    r2 = 1 - ((zs - pred) ** 2).sum() / ((zs - zs.mean()) ** 2).sum()
    assert r["r2"] == pytest.approx(r2, abs=1e-4)
    assert r["r2"] > 0.99


def _dijkstra(cost, n, src):
    dist = {src: 0.0}
    pq = [(0.0, src)]
    offs = [
        (dx, dy, 0.5 if dx == 0 or dy == 0 else 0.5 * math.sqrt(2))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    ]
    while pq:
        d, (ix, iy) = heapq.heappop(pq)
        if d > dist.get((ix, iy), float("inf")):
            continue
        for dx, dy, w in offs:
            nx, ny = ix + dx, iy + dy
            if 0 <= nx < n and 0 <= ny < n:
                nd = d + (cost[(ix, iy)] + cost[(nx, ny)]) * w
                if nd < dist.get((nx, ny), float("inf")) - 1e-12:
                    dist[(nx, ny)] = nd
                    heapq.heappush(pq, (nd, (nx, ny)))
    return dist


def test_cost_distance_matches_dijkstra(spark):
    rng = np.random.RandomState(13)
    n = 8  # res 3
    cost = {(i, j): float(1 + rng.randint(0, 9)) for i in range(n) for j in range(n)}
    # a cheap corridor along row 2 the paths should prefer
    for j in range(n):
        cost[(2, j)] = 1.0
    grid = spark.createDataFrame(
        [(i, j, c) for (i, j), c in cost.items()], "ix LONG, iy LONG, cost DOUBLE"
    )
    out = {
        (r["ix"], r["iy"]): r["dist"]
        for r in cost_distance(grid, src_ix=0, src_iy=0, res=3, rounds=20).collect()
    }
    ref = _dijkstra(cost, n, (0, 0))
    assert set(out) == set(ref)  # everything reachable within 20 rounds
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, abs=1e-5)


def test_cost_distance_rounds_bound_reach(spark):
    n = 8
    grid = spark.createDataFrame(
        [(i, j, 1.0) for i in range(n) for j in range(n)],
        "ix LONG, iy LONG, cost DOUBLE",
    )
    out = cost_distance(grid, src_ix=0, src_iy=0, res=3, rounds=2).collect()
    # 2 relaxation rounds reach Chebyshev distance <= 2 from the (0,0)
    # corner: the 3x3 block
    assert len(out) == 9
    assert all(max(r["ix"], r["iy"]) <= 2 for r in out)


def _uniform_grid(spark, n):
    return spark.createDataFrame(
        [(i, j, 1.0) for i in range(n) for j in range(n)],
        "ix LONG, iy LONG, cost DOUBLE",
    )


def test_backlink_walks_back_to_source(spark):
    n = 8
    rng = np.random.RandomState(7)
    cost = {(i, j): float(1 + rng.randint(0, 9)) for i in range(n) for j in range(n)}
    grid = spark.createDataFrame(
        [(i, j, c) for (i, j), c in cost.items()], "ix LONG, iy LONG, cost DOUBLE"
    )
    rows = cost_backlink(grid, src_ix=3, src_iy=3, res=3, rounds=20).collect()
    dirs = {(r["ix"], r["iy"]): r["dir"] for r in rows}
    dist = {(r["ix"], r["iy"]): r["dist"] for r in rows}
    ref = _dijkstra(cost, n, (3, 3))
    assert dirs[(3, 3)] == 0
    by_code = {code: (dx, dy) for dx, dy, _, code in _OFFS}
    for start in [(0, 0), (7, 7), (0, 7), (7, 0), (5, 2)]:
        cur, hops = start, 0
        while cur != (3, 3):
            code = dirs[cur]
            assert code >= 1, f"unsettled cell {cur}"
            dx, dy = by_code[code]
            nxt = (cur[0] + dx, cur[1] + dy)
            # each back-step strictly decreases accumulated cost
            assert ref[nxt] < ref[cur]
            assert dist[nxt] < dist[cur]
            cur, hops = nxt, hops + 1
            assert hops <= 2 * n

def test_corridor_uniform_grid_is_diagonal(spark):
    n = 8
    # slack of a few ulps: dA+dB along the optimum differs per cell by
    # float-accumulation rounding (sum of i terms + sum of (7-i) terms)
    rows = cost_corridor(
        _uniform_grid(spark, n), a=(0, 0), b=(7, 7), res=3, rounds=16,
        slack=1e-9,
    ).collect()
    # uniform cost: the unique least-cost path is the main diagonal
    assert sorted((r["ix"], r["iy"]) for r in rows) == [(i, i) for i in range(n)]
    assert any(r["on_path"] for r in rows)
    best = 7 * 2 * 0.5 * math.sqrt(2)
    assert all(r["total"] == pytest.approx(best, abs=1e-6) for r in rows)


def test_corridor_slack_widens_band(spark):
    n = 8
    tight_rows = cost_corridor(
        _uniform_grid(spark, n), a=(0, 0), b=(7, 7), res=3, rounds=16,
        slack=1e-9,
    ).collect()
    wide_rows = cost_corridor(
        _uniform_grid(spark, n), a=(0, 0), b=(7, 7), res=3, rounds=16,
        slack=1.0,
    ).collect()
    assert len(wide_rows) > len(tight_rows)
    # the exact-optimum cells are a subset of the ulp-slack band
    on_path = {(r["ix"], r["iy"]) for r in wide_rows if r["on_path"]}
    assert on_path <= {(r["ix"], r["iy"]) for r in tight_rows}
    assert on_path


def test_isochrones_octile_rings(spark):
    n = 8
    # uniform cost 1: dist = octile metric (orthogonal 1, diagonal sqrt2)
    out = {
        r["band"]: r
        for r in isochrones(
            _uniform_grid(spark, n), src_ix=0, src_iy=0, res=3,
            breaks=[1.5, 3.0], rounds=16,
        ).collect()
    }
    s2 = math.sqrt(2)
    octile = {
        (i, j): (max(i, j) - min(i, j)) + min(i, j) * s2
        for i in range(n)
        for j in range(n)
    }
    for band, lo, hi in [(0, -1, 1.5), (1, 1.5, 3.0), (2, 3.0, 99.0)]:
        cells = [k for k, v in octile.items() if lo < v <= hi]
        assert out[band]["n_cells"] == len(cells)
    assert sum(r["n_cells"] for r in out.values()) == n * n
    # band-0 cells: (0,0),(1,0),(0,1),(1,1) — a 2x2 corner block,
    # perimeter = 4 exposed edges + 4 grid-boundary edges
    assert out[0]["perimeter"] == 8
    assert out[0]["min_dist"] == 0.0
