"""Map matching: snap points to the nearest polyline segment.

The classic GPS→road-network step, recast to the embedding plane: given a
(small, broadcast) set of line segments and a large point table, compute for
every point the closest point ON the nearest segment — clamped orthogonal
projection, exact argmin with a deterministic tie-break.

Scale shape: the network is broadcast (a road network is a dim table next to
a 100-TB point fact table), the candidate pairing is broadcast-nested-loop
(points never shuffle), and the per-point argmin is ONE window partitioned by
point id — or, for networks too big to broadcast, the exact cell-pruned
scheme already proven by grid_knn (operators/knn.py:274-366: rasterize
segments to covering cells, ring-widen until the covering-radius proof
closes) applies verbatim with point-to-segment distance in place of
point-to-point. No driver loop, no Python on the data path.

Mirrors the reference's retrieval "find the best anchor for each query"
shape (raptor/tree_retriever.py:137-146) with segments as anchors. All math
is scalar IEEE (dot products, one divide, clamp) on twin-identical inputs,
so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, seg_id, t, snap_x, snap_y, d2) — nearest-segment snap per point.

    ``points`` carries (id_col, x, y); ``segments`` carries
    (seg_id, ax, ay, bx, by) and is broadcast."""
    p = points.select(F.col(id_col), F.col("x"), F.col("y"))
    joined = p.crossJoin(F.broadcast(segments))
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    # Degenerate (a == b) segments snap to the endpoint via t = 0.
    t_raw = F.when(
        len2 > 0.0,
        ((F.col("x") - F.col("ax")) * dx + (F.col("y") - F.col("ay")) * dy) / len2,
    ).otherwise(F.lit(0.0))
    t = F.greatest(F.least(t_raw, F.lit(1.0)), F.lit(0.0))
    sx = F.col("ax") + t * dx
    sy = F.col("ay") + t * dy
    ex = F.col("x") - sx
    ey = F.col("y") - sy
    cand = joined.select(
        F.col(id_col),
        F.col("seg_id"),
        t.alias("t"),
        sx.alias("snap_x"),
        sy.alias("snap_y"),
        (ex * ex + ey * ey).alias("d2"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("seg_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def snap_to_segments_sql(
    points_sql: str, segments_sql: str, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`snap_to_segments`. ``points_sql`` must select
    (id_col, x, y); ``segments_sql`` (seg_id, ax, ay, bx, by)."""
    return f"""
WITH pts AS ({points_sql}),
segs AS ({segments_sql}),
cand AS (
  SELECT {id_col}, seg_id, t,
         (ax + t * (bx - ax)) AS snap_x,
         (ay + t * (by - ay)) AS snap_y,
         ((x - (ax + t * (bx - ax))) * (x - (ax + t * (bx - ax)))
        + (y - (ay + t * (by - ay))) * (y - (ay + t * (by - ay)))) AS d2
  FROM (
    SELECT *, greatest(least(CASE WHEN ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) > 0.0
                 THEN ((x - ax) * (bx - ax) + (y - ay) * (by - ay))
                      / ((bx - ax) * (bx - ax) + (by - ay) * (by - ay))
                 ELSE 0.0 END, 1.0), 0.0) AS t
    FROM pts, segs)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {id_col} ORDER BY d2 ASC, seg_id ASC) AS rn
  FROM cand)
SELECT {id_col}, seg_id, t, snap_x, snap_y, d2 FROM ranked WHERE rn = 1
"""
