"""Web-Mercator projection accuracy + SCD2 versioning invariants."""

import math
from datetime import datetime

import pytest

from raptor_rag_spark.operators.merge import scd2_apply
from raptor_rag_spark.operators.projection import LAT_MAX, mercator_project


def test_mercator_matches_libm(spark):
    pts = [
        (0, 0.0, 0.0),
        (1, -math.pi + 1e-9, 0.0),
        (2, 2.0, 1.0),
        (3, -2.5, -1.2),
        (4, 1.0, 1.55),   # above the clamp
        (5, 1.0, -1.55),  # below the clamp
    ]
    df = spark.createDataFrame(pts, "vec_id LONG, lon DOUBLE, lat DOUBLE")
    rows = {r["vec_id"]: r for r in mercator_project(df, zoom=6).collect()}
    for vid, lon, lat in pts:
        lat_c = max(min(lat, LAT_MAX), -LAT_MAX)
        mx = (lon + math.pi) / (2 * math.pi)
        my = (1.0 - math.log(math.tan(math.pi / 4 + lat_c / 2)) / math.pi) / 2
        r = rows[vid]
        assert r["merc_x"] == pytest.approx(mx, abs=1e-8)
        assert r["merc_y"] == pytest.approx(my, abs=1e-8)
        assert r["tile_x"] == min(max(int(mx * 64), 0), 63)
        assert r["tile_y"] == min(max(int(my * 64), 0), 63)
        assert 0 <= r["px"] < 256 and 0 <= r["py"] < 256
    # equator maps to the vertical middle, clamp maps to the edges
    assert rows[0]["merc_y"] == pytest.approx(0.5, abs=1e-12)
    assert rows[4]["merc_y"] == pytest.approx(0.0, abs=1e-6)
    assert rows[5]["merc_y"] == pytest.approx(1.0, abs=1e-6)


def test_scd2_versioning(spark):
    t0 = datetime(2024, 1, 1)
    t1 = datetime(2025, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, 10.0, t0, None),   # will change
            (2, 20.0, t0, None),   # same value in batch
            (3, 30.0, t0, None),   # absent from batch
            (4, 5.0, datetime(2023, 1, 1), t0),  # closed history row
            (4, 40.0, t0, None),   # current for key 4, will change
        ],
        "k LONG, v DOUBLE, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    upd = spark.createDataFrame(
        [(1, 11.0, t1), (2, 20.0, t1), (4, 44.0, t1), (9, 90.0, t1)],
        "k LONG, v DOUBLE, ts TIMESTAMP",
    )
    out = scd2_apply(dim, upd, ["k"], ["v"]).collect()
    rows = {(r["k"], r["action"], r["v"]): r for r in out}
    assert len(out) == 8
    # key 1: closed old + open new
    assert rows[(1, "close", 10.0)]["valid_to"] == t1
    assert rows[(1, "open", 11.0)]["valid_from"] == t1
    assert rows[(1, "open", 11.0)]["valid_to"] is None
    # key 2 unchanged, key 3 untouched
    assert rows[(2, "carry", 20.0)]["valid_to"] is None
    assert rows[(3, "carry", 30.0)]["valid_to"] is None
    # key 4: history passes through, current closed, new opened
    assert rows[(4, "carry", 5.0)]["valid_to"] == t0
    assert rows[(4, "close", 40.0)]["valid_to"] == t1
    assert rows[(4, "open", 44.0)]["valid_from"] == t1
    # key 9: brand-new insert
    assert rows[(9, "open", 90.0)]["valid_from"] == t1
    # invariant: exactly one open (valid_to NULL) row per live key
    live = [r["k"] for r in out if r["valid_to"] is None]
    assert sorted(live) == [1, 2, 3, 4, 9]
