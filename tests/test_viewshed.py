"""Viewshed line-of-sight (operators/viewshed.py): hand-checked occlusion
on tiny terrains, the primitive-direction ray grouping, and the DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from raptor_rag_spark.operators.viewshed import viewshed, viewshed_sql


def _run(spark, cells, vix, viy, h=2.0):
    df = spark.createDataFrame(cells, "ix long, iy long, density double")
    vp = spark.createDataFrame([(vix, viy)], "vix long, viy long")
    return {(r.ix, r.iy): r for r in viewshed(df, vp, observer_height=h).collect()}


def test_flat_terrain_all_visible(spark):
    cells = [(x, y, 1.0) for x in range(5) for y in range(5)]
    out = _run(spark, cells, 2, 2)
    assert all(r.visible for r in out.values())
    assert out[(2, 2)].cheb == 0  # the viewpoint itself


def test_wall_blocks_cells_behind_it_on_the_same_ray(spark):
    # Observer at (0,0), eye z=3. Wall z=10 at (2,0) → slope (10-3)/2 = 3.5.
    # (3,0) z=1 sits on the same ray (primitive dir (1,0)) with slope
    # (1-3)/3 < 3.5 → hidden; (4,0) z=20 has slope 17/4 = 4.25 > 3.5 → seen.
    # (3,1) z=1 is on a DIFFERENT ray (primitive (3,1)) → unobstructed.
    cells = [(0, 0, 1.0), (1, 0, 1.0), (2, 0, 10.0), (3, 0, 1.0), (4, 0, 20.0), (3, 1, 1.0)]
    out = _run(spark, cells, 0, 0)
    assert out[(2, 0)].visible
    assert not out[(3, 0)].visible
    assert out[(4, 0)].visible
    assert out[(3, 1)].visible


def test_collinear_diagonal_grouping(spark):
    # (1,2) and (2,4) share primitive direction (1,2): gcd grouping must put
    # them on one ray. (2,3) does not share a ray with anything → visible.
    cells = [(0, 0, 0.0), (1, 2, 9.0), (2, 4, 0.0), (2, 3, 0.0)]
    out = _run(spark, cells, 0, 0)
    assert not out[(2, 4)].visible  # blocked by the spike at (1,2)
    assert out[(2, 3)].visible
    assert out[(1, 2)].visible


def test_equal_slope_is_hidden(spark):
    # Strict > : a cell exactly grazing the horizon line is occluded.
    # Eye z=2 at (0,0); (1,0) z=4 → slope 2.0; (2,0) z=6 → slope 2.0 too.
    cells = [(0, 0, 0.0), (1, 0, 4.0), (2, 0, 6.0)]
    out = _run(spark, cells, 0, 0)
    assert out[(1, 0)].visible
    assert not out[(2, 0)].visible


def test_twin_matches_duckdb(spark):
    import random

    rng = random.Random(7)
    cells = [(x, y, round(rng.random() * 8, 3)) for x in range(12) for y in range(12)]
    df = spark.createDataFrame(cells, "ix long, iy long, density double")
    vp = spark.createDataFrame([(5, 6)], "vix long, viy long")
    got = (
        viewshed(df, vp).toPandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raster_in", pd.DataFrame(cells, columns=["ix", "iy", "density"]))
    want = (
        con.execute(
            viewshed_sql(
                "SELECT * FROM raster_in", "SELECT 5 AS vix, 6 AS viy"
            )
        )
        .df()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    assert list(got["cheb"]) == list(want["cheb"])
    assert list(got["visible"]) == list(want["visible"])
    assert list(got["slope"]) == list(want["slope"])  # bit-identical IEEE path
