"""Per-tile convex hulls: the vector silhouette of each grid cell's points.

The raster→vector companion to ``region_boundary``: where that traces the
cell-granular outline of a thresholded raster, this produces the EXACT
convex polygon of the actual points inside each coarse tile — the shape
layer a tile server draws for "what does this cluster cover".

Pipeline shape (Spark side):
1. exact-dedup points per tile (one groupBy),
2. Akl–Toussaint prune: the 4 extreme points per tile come from one
   struct-ordered min/max aggregate (broadcast back); any point STRICTLY
   inside their quadrilateral cannot be a hull vertex and is dropped —
   typically halves (or better) the per-tile candidate set while provably
   never dropping a hull vertex,
3. monotone-chain hull per tile over the pruned sliver via one
   ``applyInPandas`` (numpy kernel, O(m log m) per tile — the geometry is
   per-group bounded work, exactly the GMM pattern).

The DuckDB oracle recomputes the hull edge set independently as the
all-points-to-the-right O(m³) pair test over the same pruned sliver — a
genuinely different algorithm that must produce the identical directed
clockwise edge cycle (on data with no three collinear boundary points; the
inputs here are hash-derived doubles where exact collinearity has measure
zero).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.geometry import hull_edges
from ..kernels.grid import COORD_BITS, RES_SHIFT

_OUT_SCHEMA = (
    "tile long, a_id long, b_id long, ax double, ay double, bx double, by double"
)


def _cross(ox, oy, ax, ay, px, py):
    return (ax - ox) * (py - oy) - (ay - oy) * (px - ox)


def tile_hulls(points: DataFrame, res: int = 2, id_col: str = "vec_id") -> DataFrame:
    """(tile, a_id, b_id, ax, ay, bx, by): directed clockwise convex-hull
    edges of the exact-deduplicated points of each res-grid tile. 1-point
    tiles emit nothing; 2-point tiles emit the degenerate 2-cycle."""
    n = 1 << res
    cx = F.greatest(
        F.least(F.floor(F.col("x") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    cy = F.greatest(
        F.least(F.floor(F.col("y") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    tile = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(cx, COORD_BITS))
        .bitwiseOR(cy)
    )
    pts = (
        points.select(tile.alias("tile"), "x", "y", F.col(id_col).alias("pid"))
        .groupBy("tile", "x", "y")
        .agg(F.min("pid").alias("pid"))
    )
    ext = pts.groupBy("tile").agg(
        F.min(F.struct("x", "y")).alias("e_minx"),
        F.max(F.struct("x", "y")).alias("e_maxx"),
        F.min(F.struct("y", "x")).alias("e_miny"),
        F.max(F.struct("y", "x")).alias("e_maxy"),
    )
    j = pts.join(F.broadcast(ext), "tile")
    # quad A=minx, B=miny, C=maxx, D=maxy is counter-clockwise; strict
    # inside = strictly left of all four directed edges
    ax_, ay_ = F.col("e_minx.x"), F.col("e_minx.y")
    bx_, by_ = F.col("e_miny.x"), F.col("e_miny.y")
    cx_, cy_ = F.col("e_maxx.x"), F.col("e_maxx.y")
    dx_, dy_ = F.col("e_maxy.x"), F.col("e_maxy.y")
    p, q = F.col("x"), F.col("y")
    inside = (
        (_cross(ax_, ay_, bx_, by_, p, q) > 0)
        & (_cross(bx_, by_, cx_, cy_, p, q) > 0)
        & (_cross(cx_, cy_, dx_, dy_, p, q) > 0)
        & (_cross(dx_, dy_, ax_, ay_, p, q) > 0)
    )
    pruned = j.where(~inside).select("tile", "x", "y", "pid")

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        ids = pdf["pid"].to_numpy()
        coord = {int(i): (float(a), float(b)) for i, a, b in zip(ids, xs, ys)}
        edges = hull_edges(xs, ys, ids)
        t = int(pdf["tile"].iloc[0])
        rows = [
            (t, a, b, coord[a][0], coord[a][1], coord[b][0], coord[b][1])
            for a, b in edges
        ]
        return pd.DataFrame(
            rows, columns=["tile", "a_id", "b_id", "ax", "ay", "bx", "by"]
        )

    return pruned.groupBy("tile").applyInPandas(_hull, _OUT_SCHEMA)


def tile_hulls_sql(points_sql: str, res: int = 2, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`tile_hulls` — an INDEPENDENT algorithm: the
    directed edge (p, q) is on the clockwise hull iff every other pruned
    point of the tile lies on or right of p→q (max cross ≤ 0)."""
    n = 1 << res
    cxe = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    cye = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    tile = f"(({res}::BIGINT << {RES_SHIFT}) | ({cxe} << {COORD_BITS}) | {cye})"

    def cr(ox, oy, axx, ayy, px, py):
        return f"(({axx} - {ox}) * ({py} - {oy}) - ({ayy} - {oy}) * ({px} - {ox}))"

    inside = " AND ".join(
        f"{cr(o + 'x', o + 'y', a + 'x', a + 'y', 'p.x', 'p.y')} > 0"
        for o, a in (("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"))
    )
    return f"""
WITH raw AS (SELECT {tile} AS tile, x, y, {id_col} AS pid FROM ({points_sql})),
pts AS (SELECT tile, x, y, CAST(min(pid) AS BIGINT) AS pid FROM raw GROUP BY tile, x, y),
r AS (
  SELECT tile, x, y, pid,
         row_number() OVER (PARTITION BY tile ORDER BY x, y) AS kminx,
         row_number() OVER (PARTITION BY tile ORDER BY x DESC, y DESC) AS kmaxx,
         row_number() OVER (PARTITION BY tile ORDER BY y, x) AS kminy,
         row_number() OVER (PARTITION BY tile ORDER BY y DESC, x DESC) AS kmaxy
  FROM pts),
ext AS (
  SELECT tile,
         max(CASE WHEN kminx = 1 THEN x END) AS Ax, max(CASE WHEN kminx = 1 THEN y END) AS Ay,
         max(CASE WHEN kminy = 1 THEN x END) AS Bx, max(CASE WHEN kminy = 1 THEN y END) AS By,
         max(CASE WHEN kmaxx = 1 THEN x END) AS Cx, max(CASE WHEN kmaxx = 1 THEN y END) AS Cy,
         max(CASE WHEN kmaxy = 1 THEN x END) AS Dx, max(CASE WHEN kmaxy = 1 THEN y END) AS Dy
  FROM r GROUP BY tile),
pruned AS MATERIALIZED (
  SELECT p.tile, p.x, p.y, p.pid
  FROM pts p JOIN ext e USING (tile)
  WHERE NOT ({inside.replace("Ax", "e.Ax").replace("Ay", "e.Ay")
               .replace("Bx", "e.Bx").replace("By", "e.By")
               .replace("Cx", "e.Cx").replace("Cy", "e.Cy")
               .replace("Dx", "e.Dx").replace("Dy", "e.Dy")})),
edges AS (
  SELECT p.tile, p.pid AS a_id, q.pid AS b_id, p.x AS ax, p.y AS ay, q.x AS bx, q.y AS by
  FROM pruned p JOIN pruned q ON p.tile = q.tile AND p.pid <> q.pid
  WHERE NOT EXISTS (
    SELECT 1 FROM pruned o
    WHERE o.tile = p.tile AND o.pid <> p.pid AND o.pid <> q.pid
      AND ((q.x - p.x) * (o.y - p.y) - (q.y - p.y) * (o.x - p.x)) > 0))
SELECT tile, a_id, b_id, ax, ay, bx, by FROM edges
"""
