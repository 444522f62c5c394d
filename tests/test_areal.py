"""Areal-weighted interpolation (operators/areal.py): mass conservation,
known split weights, and the DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from raptor_rag_spark.operators.areal import areal_transfer, areal_transfer_sql


def _df(spark, cells):
    return spark.createDataFrame(cells, "ix long, iy long, density double")


def test_quarter_split_weights(spark):
    # res_src=3 → res_tgt=2: target width q=4 half-units, source cell [2ix,
    # 2ix+2). Source cell ix=2 spans [4,6); targets tx=0 [1,5) overlap 1,
    # tx=1 [5,9) overlap 1 → value splits 1/2 + 1/2 per straddled axis.
    out = {
        (r.tx, r.ty): r
        for r in areal_transfer(_df(spark, [(2, 2, 8.0)]), 3, 2).collect()
    }
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert all(r.value == pytest.approx(2.0) for r in out.values())


def test_fully_interior_cell_transfers_whole(spark):
    # Source cell ix=3 spans [6,8) ⊂ target tx=1 [5,9) → no split.
    out = areal_transfer(_df(spark, [(3, 3, 5.0)]), 3, 2).collect()
    assert len(out) == 1
    assert (out[0].tx, out[0].ty, out[0].value) == (1, 1, pytest.approx(5.0))


def test_mass_conservation(spark):
    import random

    rng = random.Random(3)
    cells = [
        (ix, iy, round(rng.uniform(0.0, 4.0), 6))
        for ix in range(8)
        for iy in range(8)
        if rng.random() < 0.7
    ]
    out = areal_transfer(_df(spark, cells), 3, 2).toPandas()
    assert out["value"].sum() == pytest.approx(sum(c[2] for c in cells), rel=1e-12)


def test_twin_matches_duckdb(spark):
    import random

    rng = random.Random(5)
    cells = [
        (ix, iy, round(rng.uniform(0.0, 4.0), 6))
        for ix in range(16)
        for iy in range(16)
        if rng.random() < 0.5
    ]
    got = (
        areal_transfer(_df(spark, cells), 4, 3)
        .toPandas()
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raster_in", pd.DataFrame(cells, columns=["ix", "iy", "density"]))
    want = (
        con.execute(areal_transfer_sql("SELECT * FROM raster_in", 4, 3))
        .df()
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )
    assert list(got["tx"]) == list(want["tx"].astype(int))
    assert list(got["n_src"]) == list(want["n_src"].astype(int))
    assert list(got["value"]) == list(want["value"])  # exact DECIMAL path


def test_coarser_target_required(spark):
    with pytest.raises(ValueError):
        areal_transfer(_df(spark, [(0, 0, 1.0)]), 3, 3)
