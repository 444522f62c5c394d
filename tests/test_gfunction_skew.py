"""G-function and cell-skew report vs brute-force references."""

import math

import numpy as np
import pytest

from raptor_rag_spark.operators.pointpattern import cell_skew
from raptor_rag_spark.operators.stats import gfunction


def test_gfunction_matches_brute_ecdf(spark):
    rng = np.random.RandomState(12)
    # half background, half a tight blob -> strong small-r clustering signal
    pts = np.vstack([rng.rand(150, 2), 0.4 + 0.02 * rng.rand(150, 2)])
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "vec_id LONG, x DOUBLE, y DOUBLE",
    )
    radii = (0.005, 0.01, 0.02, 0.04)
    got = {r["r"]: r for r in gfunction(df, radii=radii, res=6).collect()}
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nnd = np.round(np.sqrt(d2.min(axis=1)), 6)
    n = len(pts)
    for r in radii:
        row = got[r]
        n_le = int((nnd <= r).sum())
        assert row["n_le"] == n_le
        assert row["g_emp"] == pytest.approx(n_le / n, abs=1e-6)
        csr = 1.0 - math.exp(-n * math.pi * r * r)
        assert row["g_csr"] == pytest.approx(csr, abs=1e-5)
    # clustered: empirical ECDF above CSR at the smallest radius
    assert got[0.005]["g_emp"] > got[0.005]["g_csr"]


def test_cell_skew_matches_brute(spark):
    rng = np.random.RandomState(13)
    # uniform background + one very hot cell
    pts = np.vstack([rng.rand(400, 2), 0.503 + 0.004 * rng.rand(300, 2)])
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x DOUBLE, y DOUBLE"
    )
    res = 5
    n = 1 << res
    counts = {}
    for x, y in pts:
        k = (min(int(x * n), n - 1), min(int(y * n), n - 1))
        counts[k] = counts.get(k, 0) + 1
    cs = sorted(counts.values())
    nc = len(cs)
    r = cell_skew(df, res=res).collect()[0]
    assert r["n_pts"] == len(pts)
    assert r["n_cells"] == nc
    assert r["max_c"] == max(cs)
    assert r["p50_c"] == cs[(nc - 1) * 50 // 100]
    assert r["p99_c"] == cs[(nc - 1) * 99 // 100]
    assert r["avg_c"] == pytest.approx(len(pts) / nc, abs=1e-6)
    assert r["skew_ratio"] == pytest.approx(max(cs) / (len(pts) / nc), abs=1e-4)
    assert r["top_share"] == pytest.approx(max(cs) / len(pts), abs=1e-6)
    assert r["salt_factor"] == math.ceil(max(cs) / cs[(nc - 1) * 99 // 100])
    assert r["skew_ratio"] > 10  # the planted hot cell dominates
