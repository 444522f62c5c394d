"""KDE heatmap + unigram-LM scores vs independent single-machine references."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.heatmap import kde_heatmap
from raptor_rag_spark.operators.textops import lm_scores

RES, BW, CUT = 4, 0.08, 3.0


def _ref_kde(xy, res, h, cutoff):
    """Truncated-kernel KDE per cell, dense numpy loop over all (cell, point)."""
    n = 1 << res
    s = 1.0 / n
    out = {}
    for ix in range(n):
        for iy in range(n):
            cx, cy = (ix + 0.5) * s, (iy + 0.5) * s
            d2 = (cx - xy[:, 0]) ** 2 + (cy - xy[:, 1]) ** 2
            m = d2 <= (cutoff * h) ** 2
            if m.any():
                out[(ix, iy)] = (int(m.sum()), float(np.exp(-d2[m] / (2 * h * h)).sum()))
    return out


def test_kde_matches_dense_reference(spark):
    rng = np.random.default_rng(3)
    xy = rng.uniform(0.05, 0.95, (300, 2))
    df = spark.createDataFrame([(float(a), float(b)) for a, b in xy], "x double, y double")
    got = {
        (r["ix"], r["iy"]): (r["n_pts"], r["density"])
        for r in kde_heatmap(df, res=RES, bandwidth=BW, cutoff=CUT).collect()
    }
    ref = _ref_kde(xy, RES, BW, CUT)
    assert set(got) == set(ref)
    for k, (n_ref, d_ref) in ref.items():
        n_got, d_got = got[k]
        assert n_got == n_ref
        assert d_got == pytest.approx(d_ref, rel=1e-12)


def test_kde_cell_id_roundtrip(spark):
    from raptor_rag_spark.kernels.grid import COORD_BITS, RES_SHIFT, COORD_MASK

    df = spark.createDataFrame([(0.51, 0.52), (0.1, 0.9)], "x double, y double")
    for r in kde_heatmap(df, res=RES, bandwidth=BW).collect():
        assert r["cell_id"] >> RES_SHIFT == RES
        assert (r["cell_id"] >> COORD_BITS) & COORD_MASK == r["ix"]
        assert r["cell_id"] & COORD_MASK == r["iy"]


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat dog cat dog cat"),
    (3, "entirely novel vocabulary zone"),
    (4, ""),
]


def test_lm_scores_match_reference(spark):
    toks = {d: t.lower().split() for d, t in DOCS}
    counts: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    ref = {
        d: sum(math.log(counts[w] / total) for w in ws) / len(ws)
        for d, ws in toks.items()
        if ws
    }
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"]) for r in lm_scores(df).collect()}
    assert set(got) == set(ref)  # empty doc 4 drops out
    for d, lp in ref.items():
        assert got[d][0] == len(toks[d])
        assert got[d][1] == pytest.approx(lp, rel=1e-12)
    # repeated common tokens score higher (less surprising) than novel vocab
    assert got[2][1] > got[3][1]


def test_focal_mean_matches_dense_reference(spark):
    from raptor_rag_spark.operators.heatmap import focal_mean

    res, n = 3, 8
    cells = {(0, 0): 1.0, (0, 1): 2.0, (1, 0): 4.0, (4, 4): 8.0, (7, 7): 16.0}
    rows = [(ix, iy, v) for (ix, iy), v in cells.items()]
    df = spark.createDataFrame(rows, "ix long, iy long, density double")
    got = {
        (r["ix"], r["iy"]): (r["n_cells"], r["mean"])
        for r in focal_mean(df, res=res, radius=1).collect()
    }
    ref = {}
    for (ix, iy), v in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                t = (ix + dx, iy + dy)
                if 0 <= t[0] < n and 0 <= t[1] < n:
                    c, s = ref.get(t, (0, 0.0))
                    ref[t] = (c + 1, s + v)
    ref = {t: (c, s / c) for t, (c, s) in ref.items()}
    assert got == {t: (c, pytest.approx(m)) for t, (c, m) in ref.items()}


def test_zonal_stats_square_polygons(spark):
    from raptor_rag_spark.operators.pipjoin import zonal_stats

    sq = lambda x0, y0, x1, y1: [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
    polys = spark.createDataFrame(
        [(1, sq(0.0, 0.0, 0.5, 0.5)), (2, sq(0.5, 0.5, 1.0, 1.0))],
        "cell_id long, ring array<array<double>>",
    )
    pts_rows = [(0, 0.1, 0.1), (1, 0.2, 0.3), (2, 0.7, 0.8), (3, 0.9, 0.6), (4, 0.49, 0.51)]
    pts = spark.createDataFrame(pts_rows, "node_id long, x double, y double")
    got = {r["cell_id"]: (r["n_pts"], r["mean_x"], r["mean_y"]) for r in zonal_stats(pts, polys).collect()}
    assert got[1][0] == 2 and got[1][1] == pytest.approx(0.15) and got[1][2] == pytest.approx(0.2)
    assert got[2][0] == 2 and got[2][1] == pytest.approx(0.8) and got[2][2] == pytest.approx(0.7)
    assert set(got) == {1, 2}  # point 4 (0.49,0.51) is in neither square


def test_poly_metrics_known_shapes(spark):
    from raptor_rag_spark.operators.pipjoin import poly_metrics

    ccw_square = [[0.2, 0.2], [0.6, 0.2], [0.6, 0.6], [0.2, 0.6]]
    cw_square = list(reversed(ccw_square))
    tri = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    polys = spark.createDataFrame(
        [(1, ccw_square), (2, cw_square), (3, tri)],
        "cell_id long, ring array<array<double>>",
    )
    got = {r["cell_id"]: r for r in poly_metrics(polys).collect()}
    assert got[1]["signed_area"] == pytest.approx(0.16)
    assert got[1]["cx"] == pytest.approx(0.4) and got[1]["cy"] == pytest.approx(0.4)
    assert got[2]["signed_area"] == pytest.approx(-0.16)  # CW orientation flips sign
    assert got[2]["cx"] == pytest.approx(0.4) and got[2]["cy"] == pytest.approx(0.4)
    assert got[3]["signed_area"] == pytest.approx(0.5)
    assert got[3]["cx"] == pytest.approx(1 / 3) and got[3]["cy"] == pytest.approx(1 / 3)
    assert got[1]["n_vertices"] == 4 and got[3]["n_vertices"] == 3


def test_pyramid_conserves_mass_and_counts(spark):
    from raptor_rag_spark.operators.heatmap import build_pyramid

    rows = [(0, 0, 1.5), (1, 1, 2.5), (5, 5, 4.0), (7, 2, 8.0)]
    df = spark.createDataFrame(rows, "ix long, iy long, density double")
    out = build_pyramid(df, res=3, min_res=0).collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r["res"], []).append(r)
    assert set(by_res) == {0, 1, 2, 3}
    for res, rs in by_res.items():
        assert sum(r["value"] for r in rs) == pytest.approx(16.0)
        assert sum(r["n_leaves"] for r in rs) == 4
    root = by_res[0]
    assert len(root) == 1 and root[0]["ix"] == 0 and root[0]["iy"] == 0
    # level-2 parents: (0,0)+(1,1)→(0,0); (5,5)→(2,2); (7,2)→(3,1)
    l2 = {(r["ix"], r["iy"]): (r["n_leaves"], r["value"]) for r in by_res[2]}
    assert l2 == {(0, 0): (2, pytest.approx(4.0)), (2, 2): (1, 4.0), (3, 1): (1, 8.0)}


def test_stream_dedup_equals_batch(spark, tmp_path):
    from raptor_rag_spark.streaming.events_stream import stream_dedup
    from raptor_rag_spark.functions import sqlgen as G
    import pyspark.sql.functions as F

    docs = [(i, ["alpha beta", "gamma  delta", "ALPHA BETA "][i % 3]) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "dedup_src")
    df.coalesce(1).write.parquet(f"{src}/documents.parquet")
    got = {
        r["fingerprint"]: (r["canonical_id"], r["n_dups"])
        for r in stream_dedup(spark, src, source_dir=f"{src}/documents.parquet").collect()
    }
    batch = {
        r["fingerprint"]: (r["canonical_id"], r["n_dups"])
        for r in df.select("doc_id", G.fingerprint_col(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .collect()
    }
    assert got == batch
    # normalization folds case/whitespace: 'alpha beta' == 'ALPHA BETA ' → 2 groups
    assert len(got) == 2


def test_terrain_surface_plane(spark):
    """An inclined plane z = 2x has gx = 2, gy = 0 (interior cells), slope
    tangent 2, and the NW hillshade matches the closed form."""
    import math
    from raptor_rag_spark.operators.heatmap import terrain_surface, terrain_surface_sql
    import duckdb

    res, n = 3, 8
    cs = 1.0 / 8
    rows = [(ix, iy, 2.0 * (ix + 0.5) * cs) for ix in range(n) for iy in range(n)]
    raster = spark.createDataFrame(rows, "ix long, iy long, density double")
    out = {(r["ix"], r["iy"]): r for r in terrain_surface(raster, res=res).collect()}

    interior = out[(4, 4)]
    assert abs(interior["gx"] - 2.0) < 1e-9
    assert abs(interior["gy"] - 0.0) < 1e-9
    assert abs(interior["tan_slope"] - 2.0) < 1e-9
    lx, ly, lz = (
        math.cos(math.radians(45)) * math.sin(math.radians(315)),
        math.cos(math.radians(45)) * math.cos(math.radians(315)),
        math.sin(math.radians(45)),
    )
    want_shade = (lx * -2.0 + lz) / math.sqrt(5.0)
    assert abs(interior["hillshade"] - want_shade) < 1e-6

    vals = " UNION ALL ".join(
        f"SELECT {ix} AS ix, {iy} AS iy, {v!r} AS density" for ix, iy, v in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(terrain_surface_sql(vals, res=res)).fetchall()
    )
    got = sorted(tuple(r) for r in terrain_surface(raster, res=res).collect())
    assert got == want
