"""Independent-reference tests for the raster→vector, Hilbert-layout,
variography-fit, and triangle-count operators (round-2 tranche 2).

Each test recomputes the expected result with a dense pure-Python reference
(classic Wikipedia xy2d for Hilbert, BFS for the distance transform, cubic
edge enumeration for triangles) and compares exactly."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------- hilbert


def _ref_xy2d(res: int, x: int, y: int) -> int:
    """Classic rotate-and-accumulate xy→d (public-domain Wikipedia form)."""
    d = 0
    s = 1 << (res - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_classic_walk(spark):
    from raptor_rag_spark.operators.layout import hilbert_layout

    res = 4
    n = 1 << res
    pts = [(i, (ix + 0.5) / n, (iy + 0.5) / n) for i, (ix, iy) in enumerate(
        (a, b) for a in range(n) for b in range(n)
    )]
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    got = {r["vec_id"]: r for r in hilbert_layout(df, res=res, bucket_bits=2).collect()}
    for i, (ix, iy) in enumerate((a, b) for a in range(n) for b in range(n)):
        r = got[i]
        assert (r["ix"], r["iy"]) == (ix, iy)
        d = _ref_xy2d(res, ix, iy)
        assert r["hkey"] == d, (ix, iy)
        assert r["bucket"] == d >> (2 * res - 2)
    # a Hilbert curve visits every cell exactly once
    assert sorted(r["hkey"] for r in got.values()) == list(range(n * n))
    # consecutive curve positions are 4-adjacent (the locality guarantee)
    by_key = {r["hkey"]: (r["ix"], r["iy"]) for r in got.values()}
    for k in range(n * n - 1):
        (ax, ay), (bx, by) = by_key[k], by_key[k + 1]
        assert abs(ax - bx) + abs(ay - by) == 1


# ---------------------------------------------------------- region boundary


def test_region_boundary_closed_outline(spark):
    from raptor_rag_spark.operators.vectorize import region_boundary

    res = 3
    n = 1 << res
    rng = np.random.default_rng(7)
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (30, 2))}
    vals = {c: float(rng.uniform(0.0, 2.0)) for c in cells}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    thr = 1.0
    region = {c for c, v in vals.items() if v >= thr}
    rows = region_boundary(df, res=res, threshold=thr).collect()
    got = {(r["ix"], r["iy"], r["side"]) for r in rows}
    exp = set()
    for (ix, iy) in region:
        for side, dx, dy in (("W", -1, 0), ("E", 1, 0), ("S", 0, -1), ("N", 0, 1)):
            if (ix + dx, iy + dy) not in region:
                exp.add((ix, iy, side))
    assert got == exp
    # each cell contributes each side at most once; segment lengths = 1/n
    s = 1.0 / n
    for r in rows:
        dx, dy = r["x1"] - r["x0"], r["y1"] - r["y0"]
        assert abs(abs(dx) + abs(dy) - s) < 1e-12
    # boundary-edge parity: summed over the region, exposed sides =
    # 4*|region| - 2*(internal adjacencies)
    adj = sum(
        1
        for (ix, iy) in region
        for dx, dy in ((1, 0), (0, 1))
        if (ix + dx, iy + dy) in region
    )
    assert len(rows) == 4 * len(region) - 2 * adj


# -------------------------------------------------------- distance transform


def test_distance_transform_matches_bfs(spark):
    from raptor_rag_spark.operators.vectorize import distance_transform

    res = 4
    n = 1 << res
    rng = np.random.default_rng(3)
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (80, 2))}
    vals = {c: float(rng.uniform(0.0, 2.0)) for c in cells}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    thr, maxd = 1.4, 5
    seeds = {c for c, v in vals.items() if v >= thr}
    assert seeds and len(seeds) < len(cells)
    # reference BFS through populated cells only
    dist = {c: 0 for c in seeds}
    frontier = set(seeds)
    for r in range(1, maxd + 1):
        nxt = set()
        for (ix, iy) in frontier:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    c = (ix + dx, iy + dy)
                    if (dx or dy) and c in vals and c not in dist:
                        nxt.add(c)
        for c in nxt:
            dist[c] = r
        frontier = nxt
        if not frontier:
            break
    got = {(r["ix"], r["iy"]): r["dist"] for r in distance_transform(
        df, res=res, threshold=thr, max_dist=maxd
    ).collect()}
    assert got == {k: v for k, v in dist.items()}


# ------------------------------------------------------------ variogram fit


def test_variogram_fit_matches_wls(spark):
    from raptor_rag_spark.operators.heatmap import variogram_fit

    rows = [(1, 0.1, 10, 0.5), (2, 0.14, 8, 0.9), (4, 0.2, 6, 1.4), (5, 0.22, 4, 1.3)]
    df = spark.createDataFrame(rows, "d2_cells long, lag_dist double, n_pairs long, gamma double")
    got = variogram_fit(df).collect()[0]
    w = np.array([r[2] for r in rows], dtype=float)
    x = np.array([r[1] for r in rows])
    y = np.array([r[3] for r in rows])
    A = np.vstack([np.ones_like(x), x]).T * np.sqrt(w)[:, None]
    b = y * np.sqrt(w)
    nugget, slope = np.linalg.lstsq(A, b, rcond=None)[0]
    resid = y - (nugget + slope * x)
    ss_res = float(np.sum(w * resid**2))
    ss_tot = float(np.sum(w * (y - np.sum(w * y) / np.sum(w)) ** 2))
    assert got["n_lags"] == 4
    assert got["nugget"] == pytest.approx(nugget, rel=1e-9)
    assert got["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["r2"] == pytest.approx(1 - ss_res / ss_tot, rel=1e-9)


# ---------------------------------------------------------- triangle count


def test_triangle_count_matches_bruteforce(spark):
    from raptor_rag_spark.operators.graph import triangle_count

    rng = np.random.default_rng(5)
    hosts = [f"h{i:02d}" for i in range(12)]
    links = []
    for _ in range(60):
        a, b = rng.integers(0, len(hosts), 2)
        links.append((hosts[a], hosts[b], int(rng.integers(1, 4))))
    df = spark.createDataFrame(links, "src_host string, dst_host string, n_links long")
    und = {tuple(sorted((a, b))) for a, b, _ in links if a != b}
    nbrs: dict[str, set[str]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    exp_tri = {h: 0 for h in nbrs}
    hs = sorted(nbrs)
    for i, a in enumerate(hs):
        for b in [x for x in hs[i + 1:] if x in nbrs[a]]:
            for c in [x for x in hs if x > b and x in nbrs[a] and x in nbrs[b]]:
                for v in (a, b, c):
                    exp_tri[v] += 1
    got = {r["host"]: (r["deg"], r["triangles"]) for r in triangle_count(df).collect()}
    assert set(got) == set(nbrs)
    for h in nbrs:
        assert got[h] == (len(nbrs[h]), exp_tri[h]), h


# --------------------------------------------------------------- kriging


def test_kriging_matches_numpy_solve(spark):
    """Simple-kriging predictions equal the numpy linear-algebra reference:
    for each unsampled target, solve C w = c with the exponential covariance
    over its 3 nearest samples and check pred = mu + w.(z - mu) and
    kvar = (1 + nugget) - w.c."""
    from raptor_rag_spark.operators.heatmap import kriging_surface

    res, rng_, nug = 4, 0.08, 0.05
    n = 1 << res
    s = 1.0 / n
    samples = [(2, 3, 1.0), (3, 3, 2.0), (2, 5, 0.5), (6, 6, 3.0), (7, 6, 1.5),
               (6, 8, 2.5), (12, 2, 4.0), (13, 2, 0.25), (12, 4, 1.75)]
    df = spark.createDataFrame(samples, "ix long, iy long, density double")
    got = {(r["ix"], r["iy"]): (r["pred"], r["kvar"])
           for r in kriging_surface(df, res=res, rng=rng_, nugget=nug).collect()}

    mu = float(np.mean([z for _, _, z in samples]))
    spts = {(x, y): z for x, y, z in samples}
    targets = set()
    for (sx, sy), _ in spts.items():
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                t = (sx + dx, sy + dy)
                if 0 <= t[0] < n and 0 <= t[1] < n and t not in spts:
                    targets.add(t)
    exp = {}
    for tx, ty in sorted(targets):
        cands = sorted(
            ((np.hypot(tx - sx, ty - sy) * s, sx, sy, z)
             for (sx, sy), z in spts.items()
             if abs(tx - sx) <= 2 and abs(ty - sy) <= 2),
        )[:3]
        if len(cands) < 3:
            continue
        C = np.empty((3, 3))
        for i in range(3):
            for j in range(3):
                h = np.hypot(cands[i][1] - cands[j][1], cands[i][2] - cands[j][2]) * s
                C[i, j] = np.exp(-h / rng_) if i != j else 1.0 + nug
        c = np.array([np.exp(-d / rng_) for d, *_ in cands])
        z = np.array([cz for *_, cz in cands])
        w = np.linalg.solve(C, c)
        exp[(tx, ty)] = (mu + float(w @ (z - mu)), (1.0 + nug) - float(w @ c))
    assert set(got) == set(exp)
    for k, (p, v) in exp.items():
        assert got[k][0] == pytest.approx(p, rel=1e-6, abs=1e-9), k
        assert got[k][1] == pytest.approx(v, rel=1e-6, abs=1e-9), k
        assert got[k][1] > 0.0
