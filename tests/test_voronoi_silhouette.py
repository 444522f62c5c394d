"""voronoi_raster / nearest_site_join / kmeans_silhouette / containment
vs brute-force references."""

import numpy as np
import pytest

from raptor_rag_spark.operators.dedup import containment_pairs
from raptor_rag_spark.operators.kmeans import kmeans_silhouette, kmeans_xy
from raptor_rag_spark.operators.voronoi import nearest_site_join, voronoi_raster

SEEDS = [(0, 0.1, 0.1), (1, 0.8, 0.2), (2, 0.5, 0.9), (3, 0.45, 0.48)]


def _brute_owner(res):
    n = 1 << res
    own = {}
    for ix in range(n):
        for iy in range(n):
            cx, cy = (ix + 0.5) / n, (iy + 0.5) / n
            best = min(
                SEEDS, key=lambda s: ((cx - s[1]) ** 2 + (cy - s[2]) ** 2, s[0])
            )
            own[(ix, iy)] = best[0]
    return own


def test_voronoi_raster_matches_bruteforce(spark):
    res = 4
    df = spark.createDataFrame(SEEDS, "sid LONG, sx DOUBLE, sy DOUBLE")
    got = {r["sid"]: r for r in voronoi_raster(df, res=res).collect()}
    own = _brute_owner(res)
    n = 1 << res
    for sid in range(4):
        cells = [k for k, v in own.items() if v == sid]
        r = got[sid]
        assert r["n_cells"] == len(cells)
        assert r["area_share"] == pytest.approx(len(cells) / (n * n), abs=1e-6)
        assert r["ix_min"] == min(c[0] for c in cells)
        assert r["iy_max"] == max(c[1] for c in cells)
    assert sum(r["n_cells"] for r in got.values()) == n * n  # full coverage


def test_nearest_site_join_routes_by_cell_owner(spark):
    res = 4
    seeds = spark.createDataFrame(SEEDS, "sid LONG, sx DOUBLE, sy DOUBLE")
    rng = np.random.RandomState(2)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.rand(100, 2))]
    df = spark.createDataFrame(pts, "vec_id LONG, x DOUBLE, y DOUBLE")
    out = {r["vec_id"]: r for r in nearest_site_join(df, seeds, res=res).collect()}
    own = _brute_owner(res)
    n = 1 << res
    assert len(out) == 100
    for i, x, y in pts:
        ix = max(min(int(x * n), n - 1), 0)
        iy = max(min(int(y * n), n - 1), 0)
        assert out[i]["sid"] == own[(ix, iy)]
        s = SEEDS[out[i]["sid"]]
        assert out[i]["dist"] == pytest.approx(
            ((x - s[1]) ** 2 + (y - s[2]) ** 2) ** 0.5, abs=1e-5
        )


def test_kmeans_silhouette_matches_handrolled(spark):
    rng = np.random.RandomState(4)
    blobs = np.vstack(
        [
            rng.randn(40, 2) * 0.02 + c
            for c in [(0.2, 0.2), (0.8, 0.3), (0.5, 0.8)]
        ]
    )
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.clip(blobs, 0, 1))]
    df = spark.createDataFrame(pts, "vec_id LONG, x DOUBLE, y DOUBLE")
    assign = {r["vec_id"]: r for r in kmeans_xy(df, k=3, iters=4).collect()}
    out = {r["cluster"]: r for r in kmeans_silhouette(df, k=3, iters=4).collect()}

    cents = {r["cluster"]: (r["cx"], r["cy"]) for r in assign.values()}
    sums, counts = {}, {}
    for i, x, y in pts:
        c = assign[i]["cluster"]
        a = ((x - cents[c][0]) ** 2 + (y - cents[c][1]) ** 2) ** 0.5
        b = min(
            ((x - cx) ** 2 + (y - cy) ** 2) ** 0.5
            for k2, (cx, cy) in cents.items()
            if k2 != c
        )
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        sums[c] = sums.get(c, 0.0) + s
        counts[c] = counts.get(c, 0) + 1
    for c in sums:
        assert out[c]["n"] == counts[c]
        # centroids in `assign` are rounded to 6dp; tolerate that noise
        assert out[c]["mean_sil"] == pytest.approx(sums[c] / counts[c], abs=1e-4)
    # blobs are separable: the weighted overall silhouette is clearly positive
    overall = sum(sums.values()) / sum(counts.values())
    assert overall > 0.5


def test_containment_detects_quote_inside_long_doc(spark):
    quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    filler = " ".join(f"filler{i} word{i} text{i}" for i in range(120))
    docs = [
        (1, quote),
        (2, filler + " " + quote + " " + filler),
        (3, "completely different content about gardening and tulip bulbs in spring"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(df, 0.5).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["cont_ab"] >= 0.9  # the quote is ~fully contained in doc 2
    assert r["cont_ba"] < 0.2  # but is a tiny part of doc 2
    assert not any(3 in k for k in out)
