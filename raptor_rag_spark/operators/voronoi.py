"""Discrete (rasterized) Voronoi partition of the tile plane.

Every grid cell at resolution ``res`` — occupied or empty — is assigned to
its nearest seed site (squared Euclidean on cell centers, ties to the lowest
seed id): the raster Voronoi diagram / nearest-facility surface. Unlike the
k-means assignment (which labels only data points), this covers SPACE, so it
answers coverage questions — service areas, cell→site routing tables, the
"which shard owns this tile" map a spatial partitioner ships to executors.

Scale shape: the cell universe is 4^res rows generated with spark.range (no
input scan at all) and the seed table is metadata folded into ONE broadcast
sorted array; assignment is a pure map (the kmeans argmin scan), and the
per-seed rollup is a k-key groupBy. Nothing about the corpus is touched —
cost is O(4^res), chosen by the caller, independent of data volume.

Determinism: integer cell centers, first-strict-minimum scan ordered by seed
id — identical tie behavior in the DuckDB twin's (d2, sid) window argmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAR = 1e18


def _owner_cells(seeds: DataFrame, res: int) -> DataFrame:
    """(ix, iy, sid): the full res-grid labeled with its nearest seed —
    spark.range cell universe × ONE broadcast sorted seed array, argmin with
    first-strict-minimum scan (ties to the lowest sid)."""
    n = 1 << res
    spark = seeds.sparkSession
    cells = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("ix"),
        (F.col("id") % n).cast("long").alias("iy"),
    )
    ctr = lambda c: (c.cast("double") + F.lit(0.5)) / F.lit(float(n))  # noqa: E731
    packed = seeds.agg(
        F.array_sort(F.collect_list(F.struct("sid", "sx", "sy"))).alias("ss")
    )

    def step(acc, s):
        d = (ctr(F.col("ix")) - s["sx"]) * (ctr(F.col("ix")) - s["sx"]) + (
            ctr(F.col("iy")) - s["sy"]
        ) * (ctr(F.col("iy")) - s["sy"])
        better = d < acc["d"]
        return F.struct(
            F.when(better, s["sid"]).otherwise(acc["sid"]).alias("sid"),
            F.when(better, d).otherwise(acc["d"]).alias("d"),
        )

    best = F.aggregate(
        F.col("ss"),
        F.struct(F.lit(-1).cast("long").alias("sid"), F.lit(_FAR).alias("d")),
        step,
    )
    return cells.crossJoin(F.broadcast(packed)).select(
        "ix", "iy", best["sid"].alias("sid")
    )


def voronoi_raster(seeds: DataFrame, res: int = 5) -> DataFrame:
    """seeds: (sid, sx, sy) — metadata-scale sites. Returns per-seed region
    stats over the full res-grid: (sid, n_cells, area_share, ix_min, ix_max,
    iy_min, iy_max)."""
    n = 1 << res
    owned = _owner_cells(seeds, res)
    total = float(n * n)
    return owned.groupBy("sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.count(F.lit(1)) / F.lit(total), 6).alias("area_share"),
        F.min("ix").alias("ix_min"),
        F.max("ix").alias("ix_max"),
        F.min("iy").alias("iy_min"),
        F.max("iy").alias("iy_max"),
    )


def voronoi_raster_sql(seeds_sql: str, res: int = 5) -> str:
    """DuckDB twin of :func:`voronoi_raster`. ``seeds_sql`` yields
    (sid, sx, sy)."""
    n = 1 << res
    return f"""
WITH seeds AS ({seeds_sql}),
cells AS (
  SELECT CAST(i // {n} AS BIGINT) AS ix, CAST(i % {n} AS BIGINT) AS iy
  FROM range(0, {n * n}) r(i)),
d AS (
  SELECT c.ix, c.iy, s.sid,
         ((CAST(c.ix AS DOUBLE) + 0.5) / {float(n)!r} - s.sx)
           * ((CAST(c.ix AS DOUBLE) + 0.5) / {float(n)!r} - s.sx)
         + ((CAST(c.iy AS DOUBLE) + 0.5) / {float(n)!r} - s.sy)
           * ((CAST(c.iy AS DOUBLE) + 0.5) / {float(n)!r} - s.sy) AS d2
  FROM cells c, seeds s),
owned AS (
  SELECT ix, iy, sid FROM (
    SELECT ix, iy, sid,
           row_number() OVER (PARTITION BY ix, iy ORDER BY d2, sid) AS rn
    FROM d) WHERE rn = 1)
SELECT sid, CAST(count(*) AS BIGINT) AS n_cells,
       round(count(*) / {float(n * n)!r}, 6) AS area_share,
       min(ix) AS ix_min, max(ix) AS ix_max,
       min(iy) AS iy_min, max(iy) AS iy_max
FROM owned GROUP BY sid
"""


def nearest_site_join(
    pts: DataFrame, seeds: DataFrame, res: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """(id_col, sid, dist): route data points to their Voronoi owner through
    the PRECOMPUTED raster — a broadcast (ix, iy) → sid lookup instead of a
    per-point k-way argmin. With the cell→owner table materialized once, a
    100-TB point stream pays one map-side join; exactness caveat: the owner
    is the cell-center's nearest site (the rasterized diagram), matching the
    tile granularity every serving stack quantizes to anyway."""
    n = 1 << res
    owner_cells = _owner_cells(seeds, res)
    px = F.least(F.floor(F.col("x") * n).cast("long"), F.lit(n - 1))
    py = F.least(F.floor(F.col("y") * n).cast("long"), F.lit(n - 1))
    keyed = pts.select(
        id_col,
        "x",
        "y",
        F.greatest(px, F.lit(0)).alias("ix"),
        F.greatest(py, F.lit(0)).alias("iy"),
    )
    routed = keyed.join(F.broadcast(owner_cells), ["ix", "iy"]).join(
        F.broadcast(seeds), "sid"
    )
    dist = F.sqrt(
        (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
        + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
    )
    return routed.select(id_col, "sid", F.round(dist, 6).alias("dist"))


def nearest_site_join_sql(
    pts_sql: str, seeds_sql: str, res: int = 5, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`nearest_site_join`."""
    n = 1 << res
    return f"""
WITH seeds AS ({seeds_sql}),
pts AS ({pts_sql}),
cells AS (
  SELECT CAST(i // {n} AS BIGINT) AS ix, CAST(i % {n} AS BIGINT) AS iy
  FROM range(0, {n * n}) r(i)),
d AS (
  SELECT c.ix, c.iy, s.sid,
         ((CAST(c.ix AS DOUBLE) + 0.5) / {float(n)!r} - s.sx)
           * ((CAST(c.ix AS DOUBLE) + 0.5) / {float(n)!r} - s.sx)
         + ((CAST(c.iy AS DOUBLE) + 0.5) / {float(n)!r} - s.sy)
           * ((CAST(c.iy AS DOUBLE) + 0.5) / {float(n)!r} - s.sy) AS d2
  FROM cells c, seeds s),
owned AS (
  SELECT ix, iy, sid FROM (
    SELECT ix, iy, sid,
           row_number() OVER (PARTITION BY ix, iy ORDER BY d2, sid) AS rn
    FROM d) WHERE rn = 1),
keyed AS (
  SELECT {id_col}, x, y,
         greatest(least(CAST(floor(x * {n}) AS BIGINT), {n - 1}), 0) AS ix,
         greatest(least(CAST(floor(y * {n}) AS BIGINT), {n - 1}), 0) AS iy
  FROM pts)
SELECT k.{id_col}, o.sid,
       round(sqrt((k.x - s.sx) * (k.x - s.sx) + (k.y - s.sy) * (k.y - s.sy)), 6)
         AS dist
FROM keyed k JOIN owned o USING (ix, iy) JOIN seeds s USING (sid)
"""
