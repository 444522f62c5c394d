"""Property tests: BM25F field weighting, RBO, bootstrap CI, global autocorr."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.heatmap import global_autocorr
from raptor_rag_spark.operators.ranking import bm25f_rank, bm25_rank, rbo_compare
from raptor_rag_spark.operators.sampling import bootstrap_ci


def test_bm25f_title_hits_outrank_body_hits(spark):
    # identical docs except WHERE the query term sits: title (first 8
    # tokens) vs body — the title hit must win under BM25F but tie under
    # plain BM25 (same tf, same dl)
    filler = "lorem ipsum dolor sit amet consectetur adipiscing"
    docs = spark.createDataFrame(
        [
            (0, f"special {filler} end of text here now"),
            (1, f"{filler} extra special end of text here"),
        ]
        + [(i, f"{filler} nothing else here at all {i}") for i in range(2, 30)],
        "doc_id LONG, text STRING",
    )
    qs = spark.createDataFrame([(0, "special")], "query_id INT, qtext STRING")
    f_rows = {r["doc_id"]: r for r in bm25f_rank(docs, qs, top_k=5).collect()}
    assert set(f_rows) == {0, 1}
    assert f_rows[0]["score"] > f_rows[1]["score"]
    assert f_rows[0]["rank"] == 1
    b_rows = {r["doc_id"]: r for r in bm25_rank(docs, qs, top_k=5).collect()}
    assert b_rows[0]["score"] == pytest.approx(b_rows[1]["score"], abs=1e-12)


def test_rbo_identity_and_disjoint(spark):
    a = spark.createDataFrame(
        [(0, d, r) for r, d in enumerate([10, 11, 12, 13, 14], start=1)],
        "query_id INT, doc_id LONG, rank INT",
    )
    ident = rbo_compare(a, a, p=0.9, depth=5).collect()[0]
    # self-RBO truncated at the run length: (1-p)·Σ p^{d-1} = 1 - p^5
    assert ident["rbo"] == pytest.approx(1 - 0.9 ** 5, abs=1e-6)
    b = spark.createDataFrame(
        [(0, d, r) for r, d in enumerate([20, 21, 22, 23, 24], start=1)],
        "query_id INT, doc_id LONG, rank INT",
    )
    disj = rbo_compare(a, b, p=0.9, depth=5).collect()[0]
    assert disj["rbo"] == 0.0 and disj["n_common"] == 0


def test_bootstrap_ci_brackets_mean(spark):
    rng = np.random.RandomState(44)
    vals = rng.rand(2000)
    docs = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "doc_id LONG, q DOUBLE"
    )
    r = bootstrap_ci(docs, "q", n_boot=64).collect()[0]
    assert r["n_rows"] == 2000
    assert r["mean_full"] == pytest.approx(vals.mean(), abs=1e-4)
    assert r["lo95"] < r["med"] < r["hi95"]
    assert r["lo95"] < vals.mean() < r["hi95"]
    # CI width matches the CLT scale (sd/sqrt(n) ~ 0.0065): a few widths wide
    assert 0.005 < r["hi95"] - r["lo95"] < 0.06
    # deterministic: identical on re-run
    r2 = bootstrap_ci(docs, "q", n_boot=64).collect()[0]
    assert tuple(r) == tuple(r2)


def test_global_autocorr_gradient_vs_checkerboard(spark):
    n = 16
    grad = [(i, j, float(i)) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(grad, "ix LONG, iy LONG, density DOUBLE")
    r = global_autocorr(df, res=4).collect()[0]
    assert r["moran_i"] > 0.8  # smooth gradient: strong positive autocorr
    assert r["geary_c"] < 0.2
    checker = [(i, j, float((i + j) % 2)) for i in range(n) for j in range(n)]
    df2 = spark.createDataFrame(checker, "ix LONG, iy LONG, density DOUBLE")
    r2 = global_autocorr(df2, res=4).collect()[0]
    assert r2["moran_i"] < -0.9  # perfect alternation
    assert r2["geary_c"] > 1.5


def test_geomedian_robust_to_outlier(spark):
    from raptor_rag_spark.operators.geostats import tile_geomedian

    rng = np.random.RandomState(45)
    # one tile: tight blob at (0.1, 0.1) + one far outlier inside the tile
    blob = 0.10 + 0.005 * rng.randn(100, 2)
    pts = [(float(x), float(y)) for x, y in np.clip(blob, 0.001, 0.24)] + [
        (0.24, 0.24)
    ]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE")
    r = tile_geomedian(df, res=2, rounds=8).collect()[0]
    # centroid dragged toward the outlier; geomedian stays near the blob
    d_cent = math.hypot(r["mx"] - 0.10, r["my"] - 0.10)
    d_med = math.hypot(r["gx"] - 0.10, r["gy"] - 0.10)
    assert d_med < d_cent * 0.8
    assert d_med < 0.003
    # brute Weiszfeld with the same fixed rounds agrees
    import numpy as _np

    a = _np.array(pts)
    g = a.mean(axis=0)
    for _ in range(8):
        d = _np.maximum(_np.sqrt(((a - g) ** 2).sum(1)), 1e-9)
        w = 1.0 / d
        g = (a * w[:, None]).sum(0) / w.sum()
    assert r["gx"] == pytest.approx(g[0], abs=1e-5)
    assert r["gy"] == pytest.approx(g[1], abs=1e-5)
