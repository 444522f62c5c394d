"""Kulldorff spatial scan vs an O(cells² · radii) numpy brute force."""

import math

import numpy as np

from raptor_rag_spark.operators.scanstat import spatial_scan


def _brute_scan(pts, cases, res, rmax):
    """Return {(cx, cy, d): (n_z, c_z, llr)} over every center the stencil
    fan-out can produce (cells within rmax of an occupied cell)."""
    n = 1 << res
    grid_c = np.zeros((n, n), dtype=np.int64)
    grid_n = np.zeros((n, n), dtype=np.int64)
    for (x, y), c in zip(pts, cases):
        ix = min(max(int(x * n), 0), n - 1)
        iy = min(max(int(y * n), 0), n - 1)
        grid_c[ix, iy] += int(c)
        grid_n[ix, iy] += 1
    big_c, big_n = grid_c.sum(), grid_n.sum()
    occupied = {(i, j) for i in range(n) for j in range(n) if grid_n[i, j]}
    centers = set()
    for (i, j) in occupied:
        for dx in range(-rmax, rmax + 1):
            for dy in range(-rmax, rmax + 1):
                cx, cy = i + dx, j + dy
                if 0 <= cx < n and 0 <= cy < n:
                    centers.add((cx, cy))
    out = {}
    for (cx, cy) in centers:
        # radii present = distinct Chebyshev distances of occupied contributors
        ds = sorted(
            {
                max(abs(i - cx), abs(j - cy))
                for (i, j) in occupied
                if max(abs(i - cx), abs(j - cy)) <= rmax
            }
        )
        for d in ds:
            cz = nz = 0
            for (i, j) in occupied:
                if max(abs(i - cx), abs(j - cy)) <= d:
                    cz += grid_c[i, j]
                    nz += grid_n[i, j]
            expect = big_c * nz / big_n
            if cz * big_n > big_c * nz:
                llr = cz * math.log(cz / expect)
                if big_c > cz:
                    llr += (big_c - cz) * math.log((big_c - cz) / (big_c - expect))
            else:
                llr = 0.0
            out[(cx, cy, d)] = (nz, cz, llr)
    return out


def test_spatial_scan_finds_planted_cluster(spark):
    rng = np.random.RandomState(11)
    bg = rng.rand(400, 2)
    bg_case = rng.rand(400) < 0.05
    hot = 0.55 + rng.rand(60, 2) * 0.1  # dense all-case blob in [0.55, 0.65)²
    pts = np.vstack([bg, hot])
    cases = np.concatenate([bg_case, np.ones(60, dtype=bool)])
    df = spark.createDataFrame(
        [(float(x), float(y), bool(c)) for (x, y), c in zip(pts, cases)],
        "x DOUBLE, y DOUBLE, is_case BOOLEAN",
    )
    got = spatial_scan(df, res=3, rmax=2, top_k=10).collect()
    ref = _brute_scan(pts, cases, res=3, rmax=2)

    # every reported zone matches the brute-force counts and LLR
    n_side = 1 << 3
    mask = (1 << 29) - 1  # COORD_BITS = 29
    for r in got:
        cx = (r["center"] >> 29) & mask
        cy = r["center"] & mask
        nz, cz, llr = ref[(cx, cy, r["d"])]
        assert (r["n_z"], r["c_z"]) == (nz, cz)
        assert abs(r["llr"] - llr) < 1e-5
        assert 0 <= cx < n_side and 0 <= cy < n_side

    # the top zone covers the planted blob (cells (4,4)-(5,5) at res 3)
    top = got[0]
    assert top["rank"] == 1
    tx = (top["center"] >> 29) & mask
    ty = top["center"] & mask
    assert abs(tx - 4.5) <= top["d"] + 1 and abs(ty - 4.5) <= top["d"] + 1
    # and its LLR is the global maximum of the brute force
    best = max(v[2] for v in ref.values())
    assert abs(top["llr"] - best) < 1e-5

    # ranks are 1..k with strictly ordered scores under the tiebreak
    ranks = [r["rank"] for r in got]
    assert ranks == sorted(ranks) == list(range(1, len(got) + 1))
    scores = [r["llr"] for r in got]
    assert scores == sorted(scores, reverse=True)
