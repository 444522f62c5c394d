"""adaptive_tiles / quadtree_assign vs a brute-force recursive quadtree."""

import numpy as np

from raptor_rag_spark.operators.quadtree import adaptive_tiles, quadtree_assign
from raptor_rag_spark.kernels.grid import COORD_BITS, RES_SHIFT


def _cell(x, y, res):
    n = 1 << res
    ix = max(min(int(x * n), n - 1), 0)
    iy = max(min(int(y * n), n - 1), 0)
    return (res << RES_SHIFT) | (ix << COORD_BITS) | iy


def _brute_quadtree(pts, max_pts, min_res, max_res):
    """Recursive reference: split any tile with > max_pts points."""
    leaves = {}

    def rec(res, cell_pts, cx, cy):
        cell = _cell(cx, cy, res)
        if len(cell_pts) <= max_pts or res == max_res:
            leaves[(res, cell)] = len(cell_pts)
            return
        n = 1 << (res + 1)
        buckets = {}
        for x, y in cell_pts:
            k = (max(min(int(x * n), n - 1), 0), max(min(int(y * n), n - 1), 0))
            buckets.setdefault(k, []).append((x, y))
        for (ix, iy), sub in buckets.items():
            rec(res + 1, sub, (ix + 0.5) / n, (iy + 0.5) / n)

    n0 = 1 << min_res
    roots = {}
    for x, y in pts:
        k = (max(min(int(x * n0), n0 - 1), 0), max(min(int(y * n0), n0 - 1), 0))
        roots.setdefault(k, []).append((x, y))
    for (ix, iy), sub in roots.items():
        rec(min_res, sub, (ix + 0.5) / n0, (iy + 0.5) / n0)
    return leaves


def test_adaptive_tiles_matches_bruteforce(spark):
    rng = np.random.RandomState(5)
    # skewed: dense blob + sparse background
    blob = rng.rand(300, 2) * 0.1 + 0.45
    bg = rng.rand(60, 2)
    pts = [(float(x), float(y)) for x, y in np.vstack([blob, bg])]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE")
    got = {
        (r["res"], r["cell"]): (r["n_pts"], r["overflow"])
        for r in adaptive_tiles(df, max_pts=25, min_res=1, max_res=5).collect()
    }
    ref = _brute_quadtree(pts, max_pts=25, min_res=1, max_res=5)
    assert set(got) == set(ref)
    for k, n in ref.items():
        assert got[k][0] == n
        assert got[k][1] == (n > 25)  # overflow only on over-dense leaves
    # leaves partition the corpus
    assert sum(n for n, _ in got.values()) == len(pts)
    # skew actually exercised both depths
    depths = {res for res, _ in got}
    assert min(depths) <= 2 and max(depths) == 5


def test_quadtree_assign_routes_each_point_once(spark):
    rng = np.random.RandomState(9)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.rand(200, 2))]
    df = spark.createDataFrame(pts, "vec_id LONG, x DOUBLE, y DOUBLE")
    leaves = adaptive_tiles(df.select("x", "y"), max_pts=10, min_res=1, max_res=6)
    out = quadtree_assign(df, leaves, min_res=1, max_res=6).collect()
    assert len(out) == 200
    assert len({r["vec_id"] for r in out}) == 200  # exactly once each
    # each point landed in a leaf that contains its coordinates
    lv = {(r["res"], r["cell"]) for r in leaves.collect()}
    by_id = {i: (x, y) for i, x, y in pts}
    for r in out:
        x, y = by_id[r["vec_id"]]
        assert (r["res"], r["cell"]) in lv
        assert _cell(x, y, r["res"]) == r["cell"]
