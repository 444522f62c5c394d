"""Grid DBSCAN semantics, and the stream-stream interval join vs its batch
twin. (The distance-band pair join is tested in test_operators_spark.py as
dwithin_join.)"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from raptor_rag_spark.operators.spatial import grid_dbscan


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id LONG, x DOUBLE, y DOUBLE")


def test_grid_dbscan_two_blobs_and_noise(spark):
    """Two dense blobs in far-apart cells → two clusters; a lone point →
    noise; a point in a cell adjacent to a blob → border of that blob."""
    rng = np.random.default_rng(7)
    rows = []
    # blob A: 20 pts inside cell (ix,iy)=(2,2) at res=4 (cell width 1/16)
    for i in range(20):
        rows.append((i, float(0.13 + rng.random() * 0.03), float(0.13 + rng.random() * 0.03)))
    # blob B: 20 pts around (0.8, 0.8)
    for i in range(20, 40):
        rows.append((i, float(0.80 + rng.random() * 0.03), float(0.80 + rng.random() * 0.03)))
    # border point: in the empty cell just left of blob A's cell
    rows.append((100, 0.10, 0.14))
    # noise: far from everything, isolated cell
    rows.append((101, 0.50, 0.05))
    out = grid_dbscan(_pts(spark, rows), res=4, min_pts=5).toPandas()
    by_id = out.set_index("id")
    a_cluster = by_id.loc[0, "cluster_id"]
    b_cluster = by_id.loc[20, "cluster_id"]
    assert a_cluster != b_cluster
    assert all(by_id.loc[i, "cluster_id"] == a_cluster for i in range(20))
    assert all(by_id.loc[i, "kind"] == "core" for i in range(20))
    assert all(by_id.loc[i, "cluster_id"] == b_cluster for i in range(20, 40))
    assert by_id.loc[100, "kind"] == "border" and by_id.loc[100, "cluster_id"] == a_cluster
    assert by_id.loc[101, "kind"] == "noise" and by_id.loc[101, "cluster_id"] == -1
    assert len(out) == 42  # every point labeled exactly once


def test_grid_dbscan_adjacent_cells_merge(spark):
    """Dense cells that touch diagonally form ONE component."""
    rows = []
    i = 0
    # res=3: cell width 1/8; fill cells (1,1) and (2,2) — diagonal neighbors
    for cx, cy in [(0.18, 0.18), (0.30, 0.30)]:
        for k in range(6):
            rows.append((i, cx + 0.001 * k, cy + 0.001 * k))
            i += 1
    out = grid_dbscan(_pts(spark, rows), res=3, min_pts=5).toPandas()
    assert out["cluster_id"].nunique() == 1
    assert set(out["kind"]) == {"core"}


def test_stream_stream_join_equals_batch(spark):
    from raptor_rag_spark.streaming.events_stream import stream_stream_join

    SF = "/root/testdata/sf0.001"
    out = stream_stream_join(spark, SF, interval_s=43200)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"), "value"
    )
    want = (
        s.join(p, (F.col("s_user") == F.col("p_user"))
               & (F.col("p_ts") >= F.col("s_ts"))
               & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 43200 SECONDS")))
        .select(F.col("s_user").alias("user_id"), "signup_id", "purchase_id", "value")
    )
    key = ["user_id", "signup_id", "purchase_id"]
    a = out.toPandas().sort_values(key).reset_index(drop=True)
    b = want.toPandas()[a.columns].sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
