"""Point-pattern statistics vs numpy brute-force references."""

import math

import numpy as np
import pytest

from raptor_rag_spark.operators.pointpattern import (
    join_counts,
    quadrat_test,
    radius_gyration,
)


def test_join_counts_matches_brute(spark):
    rng = np.random.RandomState(5)
    pts = rng.rand(500, 2)
    marks = pts[:, 0] < 0.4  # spatially structured mark -> BB excess
    df = spark.createDataFrame(
        [(float(x), float(y), bool(m)) for (x, y), m in zip(pts, marks)],
        "x DOUBLE, y DOUBLE, mark BOOLEAN",
    )
    res = 3
    n = 1 << res
    grid_m = np.zeros((n, n), dtype=int)
    grid_t = np.zeros((n, n), dtype=int)
    for (x, y), m in zip(pts, marks):
        ix, iy = min(int(x * n), n - 1), min(int(y * n), n - 1)
        grid_m[ix, iy] += int(m)
        grid_t[ix, iy] += 1
    color = {}
    for i in range(n):
        for j in range(n):
            if grid_t[i, j]:
                color[(i, j)] = 2 * grid_m[i, j] >= grid_t[i, j]
    bb = ww = bw = 0
    for (i, j), c in color.items():
        for (ti, tj) in ((i + 1, j), (i, j + 1)):
            if (ti, tj) in color:
                c2 = color[(ti, tj)]
                bb += c and c2
                ww += (not c) and (not c2)
                bw += c != c2
    r = join_counts(df, res=res).collect()[0]
    assert (r["bb"], r["ww"], r["bw"]) == (bb, ww, bw)
    assert r["n_cells"] == len(color)
    assert r["n_b"] == sum(color.values())
    assert r["j_tot"] == bb + ww + bw
    nb, nc, j = sum(color.values()), len(color), bb + ww + bw
    e_bb = j * nb * (nb - 1) / (nc * (nc - 1))
    assert r["e_bb"] == pytest.approx(e_bb, abs=1e-5)
    # left-biased mark clusters: observed BB above CSR expectation
    assert r["bb_ratio"] > 1.0


def test_quadrat_test_clustered_vs_uniform(spark):
    rng = np.random.RandomState(6)
    uni = rng.rand(2000, 2)
    clu = 0.5 + 0.03 * rng.randn(2000, 2)
    clu = np.clip(clu, 0.0, 0.999)
    for pts, expect_clustered in ((uni, False), (clu, True)):
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in pts], "x DOUBLE, y DOUBLE"
        )
        r = quadrat_test(df, res=3).collect()[0]
        m = 64
        cnt = np.zeros(m)
        for x, y in pts:
            ix, iy = min(int(x * 8), 7), min(int(y * 8), 7)
            cnt[ix * 8 + iy] += 1
        lam = len(pts) / m
        chi2 = ((cnt - lam) ** 2 / lam).sum()
        assert r["n_pts"] == len(pts)
        assert r["chi2"] == pytest.approx(chi2, rel=1e-6)
        assert (r["vmr"] > 5) == expect_clustered


def test_radius_gyration_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for uid in range(6):
        n = 30 + uid * 10
        spread = 0.01 * (uid + 1)
        pts = np.clip(0.5 + spread * rng.randn(n, 2), 0, 0.999)
        rows += [(uid, float(x), float(y)) for x, y in pts]
    df = spark.createDataFrame(rows, "user_id LONG, x DOUBLE, y DOUBLE")
    got = {r["user_id"]: r for r in radius_gyration(df, res=5, top_k=10).collect()}
    assert len(got) == 6
    by_uid = {}
    for uid, x, y in rows:
        by_uid.setdefault(uid, []).append((x, y))
    for uid, pts in by_uid.items():
        a = np.array(pts)
        c = a.mean(axis=0)
        rg = math.sqrt(((a - c) ** 2).sum(axis=1).mean())
        r = got[uid]
        assert r["cx"] == pytest.approx(c[0], abs=1e-5)
        assert r["rg"] == pytest.approx(rg, abs=1e-5)
        # entropy: brute force over res-5 cells
        n_side = 32
        cells = {}
        for x, y in pts:
            k = (min(int(x * n_side), 31), min(int(y * n_side), 31))
            cells[k] = cells.get(k, 0) + 1
        tot = sum(cells.values())
        h = -sum(v / tot * math.log(v / tot) for v in cells.values())
        assert r["h_cells"] == pytest.approx(h, abs=1e-5)
        assert r["n_cells"] == len(cells)
    # wider-spread users rank first
    ranks = sorted((r["rank"], uid) for uid, r in got.items())
    assert [uid for _, uid in ranks] == [5, 4, 3, 2, 1, 0]
