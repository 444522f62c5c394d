"""Grid-bounded LOF vs a brute-force textbook implementation.

With res = 1 every point's 3×3 block covers the whole 2×2 grid, so the
grid-bounded variant degenerates to exact LOF — comparable to a direct
numpy implementation of Breunig et al.'s definitions."""

import numpy as np
import pytest

from raptor_rag_spark.operators.lof import REACH_FLOOR, lof


def _brute_lof(xy, k):
    n = len(xy)
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    knn, kdist = {}, {}
    for i in range(n):
        order = sorted((d[i, j], j) for j in range(n) if j != i)[:k]
        knn[i] = [j for _, j in order]
        kdist[i] = order[-1][0]
    lrd = {}
    for i in range(n):
        s = sum(max(kdist[j], d[i, j], REACH_FLOOR) for j in knn[i])
        lrd[i] = len(knn[i]) / s
    return {i: sum(lrd[j] for j in knn[i]) / len(knn[i]) / lrd[i] for i in range(n)}


def test_lof_matches_brute_force(spark):
    rng = np.random.RandomState(21)
    xy = rng.rand(40, 2) * 0.4 + 0.3  # one tight-ish blob
    xy[0] = [0.05, 0.95]  # a far outlier
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(xy)],
        "id LONG, x DOUBLE, y DOUBLE",
    )
    out = {r["id"]: r for r in lof(df, k=5, res=1).collect()}
    ref = _brute_lof(xy, k=5)
    assert set(out) == set(ref)
    for i, v in ref.items():
        assert out[i]["lof"] == pytest.approx(v, abs=1e-5)
        assert out[i]["n_k"] == 5
    # the planted outlier scores far above the blob
    blob_max = max(v for i, v in ref.items() if i != 0)
    assert out[0]["lof"] > 2.0 > blob_max


def test_lof_grid_bounding_drops_isolated(spark):
    # res 3: cells are 1/8 wide; the lone point at (0.9, 0.9) has an empty
    # 3x3 block and is dropped; the cluster at the origin corner keeps
    # scoring
    pts = [(i, 0.01 + 0.005 * i, 0.01) for i in range(6)] + [(99, 0.9, 0.9)]
    df = spark.createDataFrame(pts, "id LONG, x DOUBLE, y DOUBLE")
    out = {r["id"]: r for r in lof(df, k=3, res=3).collect()}
    assert 99 not in out
    assert set(out) == set(range(6))
    # a uniform 1-d chain is locally homogeneous: LOF near 1
    for r in out.values():
        assert 0.7 < r["lof"] < 1.6
