"""Per-cell directional extremes — the distributed approximate convex hull.

For every occupied grid cell, find the point that is extreme (maximal
support) in each of 8 fixed directions. The union of directional extremes is
the standard scalable hull approximation (exact for the 8 chosen directions;
more directions → tighter hull): it turns a billion-point cell into ≤ 8
boundary points, which is what a vector-tile renderer or a coarse geometry
index actually wants from a point cloud. The reference has no vector-output
surface; this extends the raster→vector family (rollup.tile_vectorize,
heatmap hotspot boxes) with point-set geometry.

Direction weights are small integers ((±1, 0), (±1, ±1) — the compass rose),
so the support score ``dx·x + dy·y`` is one twin-pinned double expression and
the DuckDB oracle is hash-exact; no trigonometry, no float literals that
could round differently.

Scale shape (100 TB): score computation is codegen; the only shuffle is the
rank window keyed (cell_id, dir_id) — 8 rows per point, partitioned by cell,
so skew follows cell population and is handled by the same AQE skew-split as
every other per-cell aggregate. Output is ≤ 8 rows per occupied cell:
metadata-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G

# compass-rose support directions: integer weights keep the twin exact
DIRS: tuple[tuple[int, int], ...] = (
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1),
)


def cell_extremes(points: DataFrame, res: int = 3) -> DataFrame:
    """(cell_id, vec_id, n_dirs, first_dir, x, y): per-cell hull points.

    points: (vec_id, x, y) doubles in [0, 1). ``n_dirs`` counts how many of
    the 8 directions this point wins (a corner of the point cloud wins
    several), ``first_dir`` the smallest winning direction id. Ties on
    support break on vec_id — deterministic across partitionings.
    """
    pts = points.withColumn("cell_id", G.cell_col(F.col("x"), F.col("y"), res))
    dirs = F.array(
        *[
            F.struct(
                F.lit(k).alias("dir_id"),
                F.lit(float(dx)).alias("dx"),
                F.lit(float(dy)).alias("dy"),
            )
            for k, (dx, dy) in enumerate(DIRS)
        ]
    )
    scored = (
        pts.withColumn("d", F.explode(dirs))
        .withColumn(
            "support",
            F.col("d.dx") * F.col("x") + F.col("d.dy") * F.col("y"),
        )
        .select("cell_id", F.col("d.dir_id").alias("dir_id"), "support", "vec_id", "x", "y")
    )
    w = Window.partitionBy("cell_id", "dir_id").orderBy(F.desc("support"), "vec_id")
    winners = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return winners.groupBy("cell_id", "vec_id").agg(
        F.count("*").cast("long").alias("n_dirs"),
        F.min("dir_id").alias("first_dir"),
        F.min("x").alias("x"),
        F.min("y").alias("y"),
    )


def cell_extremes_sql(points_sql: str, res: int = 3) -> str:
    """DuckDB twin of :func:`cell_extremes`. ``points_sql`` must yield
    (vec_id, x, y) with x/y already the twin-pinned doubles."""
    cell = G.cell_sql("x", "y", res)
    dir_rows = ", ".join(f"({k}, {float(dx)!r}, {float(dy)!r})" for k, (dx, dy) in enumerate(DIRS))
    return f"""
WITH pts AS (SELECT vec_id, x, y, {cell} AS cell_id FROM ({points_sql})),
dirs(dir_id, dx, dy) AS (VALUES {dir_rows}),
scored AS (
  SELECT p.cell_id, d.dir_id, d.dx * p.x + d.dy * p.y AS support, p.vec_id, p.x, p.y
  FROM pts p CROSS JOIN dirs d),
winners AS (
  SELECT cell_id, dir_id, vec_id, x, y FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cell_id, dir_id ORDER BY support DESC, vec_id) AS rn
    FROM scored) WHERE rn = 1)
SELECT cell_id, vec_id, CAST(count(*) AS BIGINT) AS n_dirs,
       CAST(min(dir_id) AS INT) AS first_dir, min(x) AS x, min(y) AS y
FROM winners GROUP BY cell_id, vec_id
"""
