"""Trajectory similarity (operators/trajsim.py): hand-checked Hausdorff /
Fréchet / DTW values and the Spark ↔ DuckDB recursive-CTE twin equality."""

import math
import random

import duckdb
import pandas as pd
import pytest

from raptor_rag_spark.operators.trajsim import (
    traj_dp_distances,
    traj_dp_distances_sql,
    traj_hausdorff,
    traj_hausdorff_sql,
)

# A: straight walk along y=0; B: same walk shifted up by 0.5; C: single point.
TRAJS = (
    [(0, s, float(s), 0.0) for s in range(4)]
    + [(1, s, float(s), 0.5) for s in range(4)]
    + [(2, 0, 0.0, 3.0)]
)
PAIRS = [(0, 0, 1), (1, 0, 2)]


def _frames(spark):
    t = spark.createDataFrame(TRAJS, "traj_id long, seq long, x double, y double")
    p = spark.createDataFrame(PAIRS, "pair_id long, a_id long, b_id long")
    return t, p


def test_parallel_walks(spark):
    t, p = _frames(spark)
    h = {r.pair_id: r for r in traj_hausdorff(t, p).collect()}
    d = {r.pair_id: r for r in traj_dp_distances(t, p).collect()}
    # Parallel shifted walks: every point's nearest counterpart is 0.5 away,
    # and the optimal leash pairs them index-by-index.
    assert h[0].hausdorff == pytest.approx(0.5)
    assert d[0].frechet == pytest.approx(0.5)
    assert d[0].dtw == pytest.approx(4 * 0.5)


def test_single_point_trajectory(spark):
    t, p = _frames(spark)
    h = {r.pair_id: r for r in traj_hausdorff(t, p).collect()}
    d = {r.pair_id: r for r in traj_dp_distances(t, p).collect()}
    # C = (0,3) vs A: nearest A point to C is (0,0) -> h_ba = 3; farthest A
    # point from C is (3,0) -> h_ab = sqrt(9+9). Fréchet vs a single point is
    # the max distance; DTW is the sum over A's points.
    assert h[1].h_ba == pytest.approx(3.0)
    assert h[1].hausdorff == pytest.approx(math.sqrt(18.0))
    assert d[1].frechet == pytest.approx(math.sqrt(18.0))
    assert d[1].dtw == pytest.approx(sum(math.sqrt(s * s + 9.0) for s in range(4)))


def test_frechet_exceeds_hausdorff_on_reversed_path(spark):
    # Reversal: Hausdorff (order-free) stays 0-ish small; Fréchet (monotone
    # coupling) must traverse the whole opposite path.
    t = spark.createDataFrame(
        [(0, s, float(s), 0.0) for s in range(4)]
        + [(1, s, float(3 - s), 0.0) for s in range(4)],
        "traj_id long, seq long, x double, y double",
    )
    p = spark.createDataFrame([(0, 0, 1)], "pair_id long, a_id long, b_id long")
    h = traj_hausdorff(t, p).collect()[0]
    d = traj_dp_distances(t, p).collect()[0]
    assert h.hausdorff == pytest.approx(0.0)
    assert d.frechet == pytest.approx(3.0)


def test_twins_match_duckdb(spark):
    rng = random.Random(17)
    rows = []
    for tid, ln in [(0, 9), (1, 12), (2, 3), (3, 1), (4, 7)]:
        rows.extend((tid, s, rng.random(), rng.random()) for s in range(ln))
    pairs = [(i, a, b) for i, (a, b) in enumerate(
        (a, b) for a in range(5) for b in range(5) if a < b
    )]
    t = spark.createDataFrame(rows, "traj_id long, seq long, x double, y double")
    p = spark.createDataFrame(pairs, "pair_id long, a_id long, b_id long")
    got_h = traj_hausdorff(t, p).toPandas().sort_values("pair_id").reset_index(drop=True)
    got_d = traj_dp_distances(t, p).toPandas().sort_values("pair_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("trajs_in", pd.DataFrame(rows, columns=["traj_id", "seq", "x", "y"]))
    con.register("pairs_in", pd.DataFrame(pairs, columns=["pair_id", "a_id", "b_id"]))
    want_h = (
        con.execute(traj_hausdorff_sql("SELECT * FROM trajs_in", "SELECT * FROM pairs_in"))
        .df().sort_values("pair_id").reset_index(drop=True)
    )
    want_d = (
        con.execute(
            traj_dp_distances_sql("SELECT * FROM trajs_in", "SELECT * FROM pairs_in", maxlen=12)
        )
        .df().sort_values("pair_id").reset_index(drop=True)
    )
    for c in ["h_ab", "h_ba", "hausdorff"]:
        assert list(got_h[c]) == list(want_h[c])  # bit-identical IEEE path
    for c in ["frechet", "dtw"]:
        assert list(got_d[c]) == list(want_d[c])
