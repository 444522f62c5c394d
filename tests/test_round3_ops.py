"""Property tests for the round-3 additions not covered elsewhere:
J-function, space-time scan, curvature, Huff, burstiness, index size,
Zipf fit."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from raptor_rag_spark.operators.drift import term_burstiness
from raptor_rag_spark.operators.geostats import huff_model
from raptor_rag_spark.operators.heatmap import curvature_surface
from raptor_rag_spark.operators.ranking import index_size
from raptor_rag_spark.operators.scanstat import spacetime_scan
from raptor_rag_spark.operators.stats import jfunction


def test_jfunction_reads_clustering(spark):
    rng = np.random.RandomState(21)
    clustered = np.vstack([rng.rand(100, 2), 0.3 + 0.02 * rng.rand(200, 2)])
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(clustered)],
        "vec_id LONG, x DOUBLE, y DOUBLE",
    )
    rows = {r["r"]: r for r in jfunction(df, res=6).collect()}
    r = rows[0.01]
    # clustered: G above CSR, F below CSR, J < 1
    assert r["g_emp"] > r["csr"]
    assert r["f_emp"] < r["csr"]
    assert r["j"] < 1.0
    for row in rows.values():
        assert 0.0 <= row["g_emp"] <= 1.0 and 0.0 <= row["f_emp"] <= 1.0


def test_spacetime_scan_finds_emerging_cluster(spark):
    rng = np.random.RandomState(22)
    base = datetime(2024, 1, 1)
    rows = []
    # uniform background over 20 days, 3% cases
    for i in range(1500):
        rows.append(
            (
                float(rng.rand()),
                float(rng.rand()),
                base + timedelta(days=float(rng.rand() * 20)),
                bool(rng.rand() < 0.03),
            )
        )
    # emerging all-case cluster near (0.2, 0.8) in the last 2 days
    for i in range(60):
        rows.append(
            (
                0.18 + 0.05 * float(rng.rand()),
                0.78 + 0.05 * float(rng.rand()),
                base + timedelta(days=18.5 + float(rng.rand() * 1.4)),
                True,
            )
        )
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE, ts TIMESTAMP, is_case BOOLEAN")
    got = spacetime_scan(df, res=4, rmax=2, wmax=7, top_k=10).collect()
    top = got[0]
    mask = (1 << 29) - 1
    cx = (top["center"] >> 29) & mask
    cy = top["center"] & mask
    # top cylinder sits over the planted cluster (cell ~(3, 12-13) at res 4)
    assert abs(cx - 3) <= top["d"] + 1 and abs(cy - 12.5) <= top["d"] + 1.5
    assert top["w"] <= 4  # a SHORT trailing window, not the whole study
    assert top["llr"] > 20
    assert top["c_z"] >= 50


def test_curvature_flat_and_ridge(spark):
    # flat plane -> zero curvature everywhere away from edges
    res = 4
    n = 1 << res
    flat = [(i, j, 5.0) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(flat, "ix LONG, iy LONG, density DOUBLE")
    rows = curvature_surface(df, res=res).collect()
    interior = [r for r in rows if 1 <= r["ix"] <= n - 2 and 1 <= r["iy"] <= n - 2]
    assert interior and all(
        r["plan_c"] == 0.0 and r["prof_c"] == 0.0 for r in interior
    )
    # a ridge along x = const: profile/plan curvature nonzero on the crest
    ridge = [
        (i, j, 10.0 - abs(i - 8) * 2.0) for i in range(n) for j in range(n)
    ]
    df2 = spark.createDataFrame(ridge, "ix LONG, iy LONG, density DOUBLE")
    rows2 = {(r["ix"], r["iy"]): r for r in curvature_surface(df2, res=res).collect()}
    flank = rows2[(6, 8)]
    assert flank["plan_c"] == 0.0  # straight slope, no across-slope bend
    crest_neighbor = rows2[(7, 8)]
    assert abs(crest_neighbor["prof_c"]) >= 0.0  # defined, finite
    assert all(math.isfinite(r["plan_c"]) for r in rows2.values())


def test_huff_shares_sum_to_one_and_follow_distance(spark):
    rng = np.random.RandomState(23)
    pts = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rng.rand(400, 2)], "x DOUBLE, y DOUBLE"
    )
    sites = spark.createDataFrame(
        [(0, 0.25, 0.25, 1.0), (1, 0.75, 0.75, 1.0), (2, 0.95, 0.05, 1.0)],
        "sid LONG, sx DOUBLE, sy DOUBLE, w DOUBLE",
    )
    rows = {r["sid"]: r for r in huff_model(pts, sites, res=4).collect()}
    assert sum(r["share"] for r in rows.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["demand"] for r in rows.values()) == pytest.approx(400, abs=0.01)
    # central sites capture more than the corner site
    assert rows[0]["demand"] > rows[2]["demand"]
    assert rows[1]["demand"] > rows[2]["demand"]


def test_burstiness_ranks_topical_words(spark):
    docs = []
    # "the" appears once in every doc (Poisson-ish); "zebra" bursts in 6 docs
    for i in range(60):
        words = ["the", "a", "data"]
        if i < 6:
            words += ["zebra"] * 10
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = term_burstiness(df, min_df=5, top_k=10).collect()
    assert rows[0]["term"] == "zebra"
    fanos = {r["term"]: r["fano"] for r in rows}
    # uniform words have var 0 -> fano 0; bursty word far above
    assert fanos["zebra"] > 5.0
    assert fanos.get("the", 0.0) == pytest.approx(0.0, abs=1e-9)
    # brute-force check for zebra: counts = 10 in 6 docs, 0 in 54
    cnts = np.array([10.0] * 6 + [0.0] * 54)
    fano = cnts.var() / cnts.mean()
    assert fanos["zebra"] == pytest.approx(fano, abs=1e-4)


def test_index_size_brute(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (300, "a")], "doc_id LONG, text STRING"
    )
    r = index_size(docs).collect()[0]
    # postings: a->(0,tf2),(1,tf1),(300,tf1); b->(0,1); c->(1,1)
    assert r["n_terms"] == 3 and r["n_postings"] == 5
    def vb(v):
        bits = max(v.bit_length(), 1)
        return (bits - 1) // 7 + 1
    expected = (
        (vb(0) + vb(2)) + (vb(1) + vb(1)) + (vb(299) + vb(1))  # term a gaps
        + (vb(0) + vb(1))  # b
        + (vb(1) + vb(1))  # c
    )
    assert r["varint_bytes"] == expected
    assert r["raw_bytes"] == 80
