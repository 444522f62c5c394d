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


def test_grid_dbscan_driver_and_distributed_cc_agree(spark):
    """The driver union-find fast path and the distributed pointer-jumping
    fallback must label identically (both produce min-cell-id canonicals)."""
    rng = np.random.default_rng(3)
    rows = [
        (int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.random((200, 2)))
    ]
    fast = grid_dbscan(_pts(spark, rows), res=3, min_pts=4).toPandas()
    slow = grid_dbscan(_pts(spark, rows), res=3, min_pts=4, driver_cc_max=0).toPandas()
    key = ["id"]
    a = fast.sort_values(key).reset_index(drop=True)
    b = slow[fast.columns].sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert {"core", "border"} <= set(a["kind"])


def test_idw_surface_hand_computed(spark):
    """IDW at a cell center equals the numpy Shepard power-2 estimate."""
    from raptor_rag_spark.operators.heatmap import idw_surface

    # res=2 → 4×4 grid, cell (1,1) center at (0.375, 0.375)
    rows = [(0.30, 0.30, 10.0), (0.45, 0.40, 20.0)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE, v DOUBLE")
    out = {(r["ix"], r["iy"]): r for r in idw_surface(df, res=2).collect()}
    cx = cy = 0.375
    eps = 1e-6
    ws = [1.0 / (eps + (cx - x) ** 2 + (cy - y) ** 2) for x, y, _ in rows]
    want = (ws[0] * 10.0 + ws[1] * 20.0) / (ws[0] + ws[1])
    got = out[(1, 1)]
    assert got["n_pts"] == 2
    assert abs(got["idw"] - want) < 1e-9
    # every cell in the 3×3 neighborhoods is interpolated, none outside
    assert all(abs(ix - 1) <= 1 and abs(iy - 1) <= 1 for ix, iy in out)


def test_viewport_tiles_filters_to_bbox(spark):
    """Only the level's tiles intersecting the viewport come back; edge-
    touching tiles (open-interval semantics) are excluded."""
    from raptor_rag_spark.kernels.grid import cell_encode
    from raptor_rag_spark.operators.rollup import viewport_tiles

    # res=2 cells (width 0.25): (0,0), (1,1), (3,3); level 1 rows only
    rows = []
    for i, (cx, cy) in enumerate([(0.1, 0.1), (0.3, 0.3), (0.9, 0.9)]):
        rows.append((100 + i, 1, int(cell_encode(cx, cy, 2)), 10, cx, cy, 4))
    rows.append((200, 0, int(cell_encode(0.3, 0.3, 3)), 10, 0.3, 0.3, 1))  # other level
    nodes = spark.createDataFrame(
        rows,
        "node_id LONG, level INT, cell_id LONG, token_count LONG, x DOUBLE, y DOUBLE, n_leaves LONG",
    )
    # viewport = exactly cell (1,1): [0.25,0.5)²; cell (0,0) touches at the
    # corner (0.25, 0.25) but open intervals exclude it
    out = viewport_tiles(nodes, (0.25, 0.25, 0.5, 0.5), level=1).collect()
    assert len(out) == 1
    assert out[0]["x0"] == 0.25 and out[0]["y0"] == 0.25 and out[0]["n"] == 1


def test_drill_down_returns_children_only(spark):
    """Zoom-in returns exactly the tiles whose cell-id parent (bit shift)
    is the requested cell, from the requested level."""
    from raptor_rag_spark.kernels.grid import cell_encode, cell_parent
    from raptor_rag_spark.operators.rollup import drill_down

    parent = int(cell_encode(0.30, 0.30, 2))
    rows = []
    # four res-3 children inside the parent's quadrant + one outside
    for i, (cx, cy) in enumerate([(0.26, 0.26), (0.26, 0.40), (0.40, 0.26), (0.40, 0.40)]):
        rows.append((10 + i, 1, int(cell_encode(cx, cy, 3)), 5, cx, cy, 2))
    rows.append((99, 1, int(cell_encode(0.9, 0.9, 3)), 5, 0.9, 0.9, 2))
    rows.append((98, 0, int(cell_encode(0.26, 0.26, 4)), 5, 0.26, 0.26, 1))  # wrong level
    nodes = spark.createDataFrame(
        rows,
        "node_id LONG, level INT, cell_id LONG, token_count LONG, x DOUBLE, y DOUBLE, n_leaves LONG",
    )
    out = drill_down(nodes, parent, level=1).collect()
    assert len(out) == 4
    for r in out:
        assert int(cell_parent(r["cell_id"], 1)) == parent


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


def test_bbox_overlay_join_exact(spark):
    """Overlay join: overlapping pairs appear exactly once (reference-point
    dedup across multi-cell covers), touching boxes are excluded, and the
    contained-box IoU is the area ratio."""
    import duckdb

    from raptor_rag_spark.operators.pipjoin import bbox_overlay_join, bbox_overlay_join_sql

    # a1 spans many res-4 cells and overlaps both b boxes; a2 only touches b2
    a_rows = [(1, 0.05, 0.05, 0.8, 0.6), (2, 0.8, 0.6, 0.9, 0.7)]
    b_rows = [(10, 0.1, 0.1, 0.2, 0.2), (20, 0.5, 0.5, 0.8, 0.6)]
    schema = "box_id LONG, x0 DOUBLE, y0 DOUBLE, x1 DOUBLE, y1 DOUBLE"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    out = {(r["id_a"], r["id_b"]): r for r in bbox_overlay_join(a, b, res=4).collect()}
    assert set(out) == {(1, 10), (1, 20)}  # (2,20) touches only → excluded
    # b=10 is fully inside a=1 → inter = area(b), iou = area(b)/area(a)
    r = out[(1, 10)]
    area_b = 0.1 * 0.1
    area_a = 0.75 * 0.55
    assert abs(r["inter_area"] - area_b) < 1e-12
    assert abs(r["iou"] - area_b / area_a) < 1e-12

    # twin agreement on the same rows
    mk = lambda rows: " UNION ALL ".join(  # noqa: E731
        f"SELECT {i} AS box_id, {x0} AS x0, {y0} AS y0, {x1} AS x1, {y1} AS y1"
        for i, x0, y0, x1, y1 in rows
    )
    got = sorted((r["id_a"], r["id_b"], round(r["inter_area"], 12)) for r in out.values())
    want = sorted(
        (ia, ib, round(v, 12))
        for ia, ib, v, _ in duckdb.connect()
        .execute(bbox_overlay_join_sql(mk(a_rows), mk(b_rows)))
        .fetchall()
    )
    assert got == want


def test_spherical_poly_area_octant(spark):
    """The spherical triangle with vertices at (0,0), (90E,0), (N pole) is
    exactly one octant: area = 4*pi/8 = pi/2 steradians."""
    import math

    from raptor_rag_spark.operators.pipjoin import spherical_poly_area

    half_pi = math.pi / 2
    polys = spark.createDataFrame(
        [(1, [[0.0, 0.0], [half_pi, 0.0], [0.0, half_pi]])],
        "cell_id long, ring array<array<double>>",
    )
    r = spherical_poly_area(polys).collect()[0]
    assert r["n_vertices"] == 3
    assert abs(r["area_sr"] - half_pi) < 1e-9


def test_spherical_poly_area_small_matches_planar(spark):
    """A tiny polygon's spherical area converges to its planar area (times
    cos(lat) for longitude compression; at the equator cos=1)."""
    from raptor_rag_spark.operators.pipjoin import poly_metrics, spherical_poly_area

    d = 1e-3
    ring = [[0.0, 0.0], [d, 0.0], [d, d], [0.0, d]]
    polys = spark.createDataFrame(
        [(1, ring)], "cell_id long, ring array<array<double>>"
    )
    sph = spherical_poly_area(polys).collect()[0]["area_sr"]
    planar = abs(poly_metrics(polys).collect()[0]["signed_area"])
    assert abs(sph - planar) / planar < 1e-3
