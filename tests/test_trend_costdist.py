"""trend_surface vs numpy lstsq; cost_distance vs Dijkstra."""

import heapq
import math

import numpy as np
import pytest

from raptor_rag_spark.operators.costdist import cost_distance
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
