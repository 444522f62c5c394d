"""Property tests: segregation, box dimension, dasymetric, 2SFCA, novelty,
CUSUM, bilinear upsample, colocation quotient."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from raptor_rag_spark.operators.areal import dasymetric
from raptor_rag_spark.operators.drift import doc_novelty, host_cusum
from raptor_rag_spark.operators.geostats import accessibility_2sfca
from raptor_rag_spark.operators.heatmap import raster_upsample
from raptor_rag_spark.operators.pointpattern import box_dimension, segregation
from raptor_rag_spark.operators.webops import URL_RE


def test_segregation_extremes(spark):
    # perfectly separated: group a in the left half, b in the right
    rng = np.random.RandomState(31)
    a = [(float(x) * 0.49, float(y), "a") for x, y in rng.rand(200, 2)]
    b = [(0.51 + float(x) * 0.49, float(y), "b") for x, y in rng.rand(200, 2)]
    df = spark.createDataFrame(a + b, "x DOUBLE, y DOUBLE, cat STRING")
    r = segregation(df, res=3).collect()[0]
    assert r["n_groups"] == 2
    assert r["dissimilarity"] == pytest.approx(1.0, abs=1e-9)
    assert r["theil_h"] == pytest.approx(1.0, abs=1e-9)
    # perfectly mixed: same point cloud, category by parity of index
    mixed = [
        (float(x), float(y), "a" if i % 2 == 0 else "b")
        for i, (x, y) in enumerate(rng.rand(4000, 2))
    ]
    df2 = spark.createDataFrame(mixed, "x DOUBLE, y DOUBLE, cat STRING")
    r2 = segregation(df2, res=2).collect()[0]
    assert r2["dissimilarity"] < 0.1
    assert r2["theil_h"] < 0.02


def test_box_dimension_extremes(spark):
    # a dense uniform cloud fills the plane -> dim near 2
    rng = np.random.RandomState(32)
    dense = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rng.rand(60000, 2)], "x DOUBLE, y DOUBLE"
    )
    r = box_dimension(dense, res_lo=2, res_hi=6).collect()[0]
    assert 1.8 < r["dim"] <= 2.05
    assert r["r2"] > 0.99
    # points on a line -> dim near 1
    line = spark.createDataFrame(
        [(i / 5000.0, i / 5000.0) for i in range(5000)], "x DOUBLE, y DOUBLE"
    )
    r2 = box_dimension(line, res_lo=2, res_hi=8).collect()[0]
    assert 0.9 < r2["dim"] < 1.1


def test_dasymetric_conserves_mass(spark):
    zones = spark.createDataFrame(
        [(0, 0, 100), (0, 1, 50), (1, 1, 30)], "zx LONG, zy LONG, total LONG"
    )
    # mask: two cells in zone (0,0) with weights 1 and 3; one cell each in
    # the other zones
    mask = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 3.0), (2, 5, 2.0), (7, 6, 4.0)],
        "ix LONG, iy LONG, w DOUBLE",
    )
    rows = dasymetric(zones, mask, res_zone=0, res_mask=2).collect()
    by_cell = {(r["ix"], r["iy"]): r for r in rows}
    assert by_cell[(0, 1)]["value"] == pytest.approx(25.0)
    assert by_cell[(1, 0)]["value"] == pytest.approx(75.0)
    assert by_cell[(2, 5)]["value"] == pytest.approx(50.0)  # alone in zone (0,1)
    assert by_cell[(7, 6)]["value"] == pytest.approx(30.0)  # alone in zone (1,1)
    # mass conserved per covered zone
    tot = sum(r["value"] for r in rows)
    assert tot == pytest.approx(180.0, abs=1e-6)


def test_2sfca_properties(spark):
    rng = np.random.RandomState(33)
    pts = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rng.rand(500, 2)], "x DOUBLE, y DOUBLE"
    )
    sites = spark.createDataFrame(
        [(0, 0.5, 0.5, 10.0), (1, 0.9, 0.9, 10.0)],
        "sid LONG, sx DOUBLE, sy DOUBLE, s DOUBLE",
    )
    rows = accessibility_2sfca(pts, sites, d0=0.2, res=4).collect()
    by_cell = {r["cell"]: r for r in rows}
    # total access weighted by pop equals total supply REACHABLE (both
    # sites have demand in range here)
    tot = sum(r["access"] * r["pop"] for r in rows)
    assert tot == pytest.approx(20.0, rel=1e-6)
    # cells near the center see the central site
    assert any(r["n_sites"] >= 1 and r["access"] > 0 for r in rows)
    # far corner cells (0.05, 0.05) have no site within 0.2
    far = [r for r in rows if r["n_sites"] == 0]
    assert far and all(r["access"] == 0.0 for r in far)


def test_doc_novelty_first_week_is_novel(spark):
    t0 = datetime(2025, 1, 6)
    rows = [
        ("u1", t0, "alpha beta gamma delta epsilon zeta"),
        ("u2", t0 + timedelta(weeks=1), "alpha beta gamma delta epsilon zeta"),
        ("u3", t0 + timedelta(weeks=1), "totally new words appear right here now"),
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP, text STRING")
    got = {r["url"]: r for r in doc_novelty(df).collect()}
    assert got["u1"]["novelty"] == 1.0  # week-1 content is new by definition
    assert got["u2"]["novelty"] == 0.0  # exact recrawl one week later
    assert got["u3"]["novelty"] == 1.0  # genuinely new text


def test_host_cusum_detects_step(spark):
    base = datetime(2025, 1, 6)
    rows = []
    # host s.com: 5/week for 4 weeks then 20/week for 4 weeks
    for wi in range(8):
        c = 5 if wi < 4 else 20
        for k in range(c):
            rows.append((f"https://s.com/p{wi}_{k}", base + timedelta(weeks=wi)))
    # host f.com: flat 8/week
    for wi in range(8):
        for k in range(8):
            rows.append((f"https://f.com/q{wi}_{k}", base + timedelta(weeks=wi)))
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP")
    got = {r["host"]: r for r in host_cusum(df, URL_RE).collect()}
    assert got["s.com"]["rel_shift"] > 0.2
    assert got["f.com"]["rel_shift"] == pytest.approx(0.0, abs=1e-9)
    # change point at the last low week (cumsum most negative there)
    epoch = datetime(1970, 1, 5)
    expected_wi = (base + timedelta(weeks=3) - epoch).days // 7
    assert got["s.com"]["change_wi"] == expected_wi


def test_raster_upsample_constant_field(spark):
    # constant raster upsamples to the same constant in the interior
    res = 3
    n = 1 << res
    df = spark.createDataFrame(
        [(i, j, 2.0) for i in range(n) for j in range(n)],
        "ix LONG, iy LONG, density DOUBLE",
    )
    rows = {(r["ix"], r["iy"]): r["v"] for r in raster_upsample(df, res=res).collect()}
    nf = 2 * n
    for (fx, fy), v in rows.items():
        if 2 <= fx <= nf - 3 and 2 <= fy <= nf - 3:
            assert v == pytest.approx(2.0, abs=1e-9)
    # total mass scales by ~4 (each coarse cell -> 4 fine cells), edges lose
    # the out-of-grid quarter weights
    assert sum(rows.values()) < 4 * 2.0 * n * n
    assert sum(rows.values()) > 3.5 * 2.0 * n * n
