"""Nearest-segment snapping (operators/mapmatch.py): clamped projection
geometry, argmin tie-break, and the DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from raptor_rag_spark.operators.mapmatch import snap_to_segments, snap_to_segments_sql

SEGS = [
    (0, 0.0, 0.0, 1.0, 0.0),  # bottom edge, left→right
    (1, 0.0, 1.0, 1.0, 1.0),  # top edge
    (2, 0.5, 0.5, 0.5, 0.5),  # degenerate point-segment
]


def _snap(spark, pts):
    p = spark.createDataFrame(pts, "vec_id long, x double, y double")
    s = spark.createDataFrame(SEGS, "seg_id long, ax double, ay double, bx double, by double")
    return {r.vec_id: r for r in snap_to_segments(p, s).collect()}


def test_interior_projection(spark):
    r = _snap(spark, [(0, 0.3, 0.2)])[0]
    assert r.seg_id == 0
    assert r.t == pytest.approx(0.3)
    assert (r.snap_x, r.snap_y) == (pytest.approx(0.3), pytest.approx(0.0))
    assert r.d2 == pytest.approx(0.04)


def test_clamping_to_endpoints(spark):
    out = _snap(spark, [(1, -0.5, 0.1), (2, 1.7, 0.1)])
    assert out[1].t == 0.0 and out[1].snap_x == 0.0
    assert out[2].t == 1.0 and out[2].snap_x == 1.0


def test_degenerate_segment_and_tiebreak(spark):
    # (0.5, 0.5) sits ON the degenerate seg 2 → d2 = 0 wins outright.
    # (-0.2, 0.5) clamps to the left endpoints of segs 0 and 1 at equal
    # d2 = 0.29, farther from seg 2 (0.49) → lowest seg_id (0) wins the tie.
    out = _snap(spark, [(3, 0.5, 0.5), (4, -0.2, 0.5)])
    assert out[3].seg_id == 2 and out[3].d2 == pytest.approx(0.0)
    assert out[4].seg_id == 0 and out[4].d2 == pytest.approx(0.29)


def test_twin_matches_duckdb(spark):
    import random

    rng = random.Random(11)
    pts = [(i, rng.random(), rng.random()) for i in range(200)]
    p = spark.createDataFrame(pts, "vec_id long, x double, y double")
    s = spark.createDataFrame(SEGS, "seg_id long, ax double, ay double, bx double, by double")
    got = snap_to_segments(p, s).toPandas().sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("pts_in", pd.DataFrame(pts, columns=["vec_id", "x", "y"]))
    con.register("segs_in", pd.DataFrame(SEGS, columns=["seg_id", "ax", "ay", "bx", "by"]))
    want = (
        con.execute(
            snap_to_segments_sql("SELECT * FROM pts_in", "SELECT * FROM segs_in")
        )
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(got["seg_id"]) == list(want["seg_id"])
    for c in ["t", "snap_x", "snap_y", "d2"]:
        assert list(got[c]) == list(want[c])  # bit-identical scalar IEEE path
