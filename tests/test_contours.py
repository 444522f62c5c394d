"""Marching-squares contour extraction (operators/contours.py).

Hand-checked cases on a tiny raster, the saddle convention, interpolation
exactness, and the Spark↔DuckDB twin equality on a random raster.
"""

import duckdb
import pandas as pd
import pytest

from raptor_rag_spark.operators.contours import contour_segments, contour_segments_sql

RES = 3  # 8×8 grid, cell size 1/8


def _run(spark, cells, level):
    df = spark.createDataFrame(cells, "ix long, iy long, density double")
    return {
        (r.wx, r.wy, r.seg): (r.case_id, r.x0, r.y0, r.x1, r.y1)
        for r in contour_segments(df, res=RES, level=level).collect()
    }


def test_single_hot_cell_emits_four_windows(spark):
    # One cell above level → it is corner c00/c10/c11/c01 of 4 windows
    # (cases 1, 2, 4, 8), one segment each, forming a closed diamond.
    out = _run(spark, [(3, 3, 2.0)], level=1.0)
    assert len(out) == 4
    cases = {k[:2]: v[0] for k, v in out.items()}
    # Window (3,3) sees the hot cell as c00, (2,3) as c10, (3,2) as c01,
    # (2,2) as c11.
    assert cases == {(3, 3): 1, (2, 3): 2, (3, 2): 8, (2, 2): 4}


def test_interpolation_is_linear(spark):
    # Corners v00=0, v10=4 at level 1 → bottom edge crossing at frac 0.25.
    out = _run(spark, [(2, 2, 0.0), (3, 2, 4.0), (2, 3, 0.0), (3, 3, 4.0)], level=1.0)
    case_id, x0, y0, x1, y1 = out[(2, 2, 0)]
    assert case_id == 2 + 4  # c10 and c11 above
    s = 1.0 / 8
    # Vertical line crossing both horizontal edges at frac 0.25 from c00.
    assert x0 == pytest.approx((2 + 0.25 + 0.5) * s)
    assert x1 == pytest.approx((2 + 0.25 + 0.5) * s)
    assert sorted([y0, y1]) == pytest.approx([(2 + 0.5) * s, (3 + 0.5) * s])


def test_saddle_emits_two_segments(spark):
    # Diagonal corners above level → case 5 → exactly two segments.
    out = _run(spark, [(2, 2, 2.0), (3, 3, 2.0)], level=1.0)
    segs_22 = [k for k in out if k[:2] == (2, 2)]
    assert len(segs_22) == 2
    assert all(out[k][0] == 5 for k in segs_22)


def test_all_above_or_below_emits_nothing(spark):
    assert _run(spark, [(2, 2, 2.0), (3, 2, 2.0), (2, 3, 2.0), (3, 3, 2.0)], level=1.0) == {
        k: v
        for k, v in _run(
            spark, [(2, 2, 2.0), (3, 2, 2.0), (2, 3, 2.0), (3, 3, 2.0)], level=1.0
        ).items()
        if v[0] not in (0, 15)
    }
    # The interior window (2,2) has all four corners above → case 15 → absent.
    assert (2, 2, 0) not in _run(
        spark, [(2, 2, 2.0), (3, 2, 2.0), (2, 3, 2.0), (3, 3, 2.0)], level=1.0
    )


def test_twin_matches_duckdb(spark):
    import random

    rng = random.Random(7)
    cells = [
        (ix, iy, round(rng.uniform(0.0, 2.0), 6))
        for ix in range(8)
        for iy in range(8)
        if rng.random() < 0.6
    ]
    df = spark.createDataFrame(cells, "ix long, iy long, density double")
    got = contour_segments(df, res=RES, level=1.0).toPandas()
    con = duckdb.connect()
    con.register("raster_in", pd.DataFrame(cells, columns=["ix", "iy", "density"]))
    want = con.execute(
        contour_segments_sql("SELECT ix, iy, density FROM raster_in", res=RES, level=1.0)
    ).df()
    key = ["wx", "wy", "seg"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in ["wx", "wy", "case_id", "seg"]:
        assert list(got[c].astype(int)) == list(want[c].astype(int))
    for c in ["x0", "y0", "x1", "y1"]:
        assert list(got[c]) == pytest.approx(list(want[c]), abs=1e-12)
