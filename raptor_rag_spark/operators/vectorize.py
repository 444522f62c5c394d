"""Raster→vector extraction: region boundaries and grid distance transform.

Closes the raster↔vector loop the north rule asks for from the OTHER
direction: ``pipjoin``/``poly_cover`` rasterize vectors into cells;
``hotspot_boxes`` vectorizes threshold blobs into bounding boxes. This module
extracts the EXACT region outline (the marching-squares edge set) and the
cell-graph distance-to-region field — the two primitives behind isochrone
maps, buffer rings, and "how far is every page-cluster from the nearest
hotspot" analyses.

Scale shape:
- ``region_boundary``: one bounded 4-neighbor fan-out + one anti-join, both
  on the metadata-scale raster (≤4^res rows regardless of corpus size — the
  cells-are-metadata rule). No collect, no cross join.
- ``distance_transform``: multi-source BFS over the populated-cell graph.
  Each round is one bounded 8-neighbor fan-out + one anti-join against the
  settled set; the driver loop only checks the frontier count per round
  (same per-level convergence shape as ``plans/build_tree`` and
  ``dedup_clusters``). Rounds ≤ ``max_dist`` — a compile-time constant, so
  the DuckDB twin is a recursive CTE with the same depth cap.

Reference role: the reference has no raster surface; this is the tiling
engine's vector-extraction layer per the north rule (raster↔vector tile
rollups), built with the same exact-twin discipline as the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.grid import COORD_BITS, RES_SHIFT

# side encoding: (side_id, dx, dy) — the 4-neighbor whose absence makes the
# side a boundary edge. Segment endpoints are the side of the unit cell
# [ix·s,(ix+1)·s]×[iy·s,(iy+1)·s], s = 1/2^res, traced counter-clockwise.
_SIDES = [
    ("W", -1, 0),
    ("E", 1, 0),
    ("S", 0, -1),
    ("N", 0, 1),
]


def region_boundary(
    raster: DataFrame,
    res: int,
    threshold: float,
    value_col: str = "density",
) -> DataFrame:
    """(cell_id, ix, iy, side, x0, y0, x1, y1): the exact outline of the
    region ``value >= threshold`` as unit-cell edge segments — an edge is
    emitted for each cell side whose 4-neighbor is outside the region
    (below threshold, unpopulated, or off-grid). The union of segments is
    the closed marching-squares boundary of the region (axis-aligned
    variant), ready for a vector tile layer.

    One fan-out to 4 candidate neighbors, one LEFT ANTI join against the
    region itself — never touches the corpus, only the raster."""
    n = 1 << res
    s = 1.0 / float(n)
    region = raster.where(F.col(value_col) >= F.lit(threshold)).select("ix", "iy")
    sides = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("side"),
                    F.lit(dx).cast("long").alias("dx"),
                    F.lit(dy).cast("long").alias("dy"),
                )
                for name, dx, dy in _SIDES
            ]
        )
    )
    cand = region.select("ix", "iy", sides.alias("o")).select(
        "ix",
        "iy",
        F.col("o.side").alias("side"),
        (F.col("ix") + F.col("o.dx")).alias("nix"),
        (F.col("iy") + F.col("o.dy")).alias("niy"),
    )
    edges = cand.join(
        region.select(F.col("ix").alias("nix"), F.col("iy").alias("niy")),
        ["nix", "niy"],
        "left_anti",
    )
    x0 = F.col("ix").cast("double") * F.lit(s)
    y0 = F.col("iy").cast("double") * F.lit(s)
    x1 = (F.col("ix") + F.lit(1)).cast("double") * F.lit(s)
    y1 = (F.col("iy") + F.lit(1)).cast("double") * F.lit(s)
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return edges.select(
        cell.alias("cell_id"),
        "ix",
        "iy",
        "side",
        F.when(F.col("side") == "E", x1).otherwise(x0).alias("x0"),
        F.when(F.col("side") == "N", y1).otherwise(y0).alias("y0"),
        F.when(F.col("side") == "W", x0).otherwise(x1).alias("x1"),
        F.when(F.col("side") == "S", y0).otherwise(y1).alias("y1"),
    )


def region_boundary_sql(
    raster_sql: str, res: int, threshold: float, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`region_boundary`. ``raster_sql`` selects ix, iy
    and ``value_col``."""
    s = 1.0 / float(1 << res)
    vals = ", ".join(f"('{name}', {dx}, {dy})" for name, dx, dy in _SIDES)
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH region AS (SELECT ix, iy FROM ({raster_sql}) WHERE {value_col} >= {threshold!r}),
o(side, dx, dy) AS (VALUES {vals}),
cand AS (SELECT ix, iy, side, ix + dx AS nix, iy + dy AS niy FROM region, o),
edges AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.ix = c.nix AND r.iy = c.niy))
SELECT {cell} AS cell_id, ix, iy, side,
       CASE WHEN side = 'E' THEN CAST(ix + 1 AS DOUBLE) * {s!r}
            ELSE CAST(ix AS DOUBLE) * {s!r} END AS x0,
       CASE WHEN side = 'N' THEN CAST(iy + 1 AS DOUBLE) * {s!r}
            ELSE CAST(iy AS DOUBLE) * {s!r} END AS y0,
       CASE WHEN side = 'W' THEN CAST(ix AS DOUBLE) * {s!r}
            ELSE CAST(ix + 1 AS DOUBLE) * {s!r} END AS x1,
       CASE WHEN side = 'S' THEN CAST(iy AS DOUBLE) * {s!r}
            ELSE CAST(iy + 1 AS DOUBLE) * {s!r} END AS y1
FROM edges
"""


def distance_transform(
    raster: DataFrame,
    res: int,
    threshold: float,
    max_dist: int = 8,
    value_col: str = "density",
) -> DataFrame:
    """(cell_id, ix, iy, dist): 8-connected graph distance (in cells) from
    every populated raster cell to the nearest SEED cell (value >=
    threshold), walking only through populated cells — the discrete
    distance transform / isochrone field. Cells further than ``max_dist``
    hops (or unreachable through the populated set) are absent.

    Multi-source BFS: the settled set starts at the seeds (dist 0); each
    round mails the frontier to its 8 neighbors, keeps the populated ones
    not yet settled, and unions them in at dist r. Per-round work is
    bounded by the raster size; the driver sees one count per round."""
    n = 1 << res
    base = (
        raster.select("ix", "iy")
        .where((F.col("ix") >= 0) & (F.col("ix") <= n - 1) & (F.col("iy") >= 0) & (F.col("iy") <= n - 1))
    )
    settled = (
        raster.where(F.col(value_col) >= F.lit(threshold))
        .select("ix", "iy", F.lit(0).cast("long").alias("dist"))
    )
    frontier = settled
    for r in range(1, max_dist + 1):
        nbrs = (
            frontier.select("ix", "iy", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"))
            .select("ix", "iy", "dx", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
            .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
            .select((F.col("ix") + F.col("dx")).alias("ix"), (F.col("iy") + F.col("dy")).alias("iy"))
            .distinct()
        )
        nxt = (
            nbrs.join(base, ["ix", "iy"])  # populated cells only
            .join(settled.select("ix", "iy"), ["ix", "iy"], "left_anti")
            .select("ix", "iy", F.lit(r).cast("long").alias("dist"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return settled.select(cell.alias("cell_id"), "ix", "iy", "dist")


def distance_transform_sql(
    raster_sql: str, res: int, threshold: float, max_dist: int = 8, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`distance_transform`: recursive-CTE BFS with the
    same depth cap, min(dist) per cell at the end (the set-semantics UNION
    may reach a cell at several depths; BFS settles it at the minimum)."""
    n = 1 << res
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH RECURSIVE base AS (
  SELECT ix, iy FROM ({raster_sql})
  WHERE ix >= 0 AND ix <= {n - 1} AND iy >= 0 AND iy <= {n - 1}),
seeds AS (SELECT ix, iy FROM ({raster_sql}) WHERE {value_col} >= {threshold!r}),
bfs(ix, iy, dist) AS (
  SELECT ix, iy, CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT b.ix, b.iy, bfs.dist + 1
  FROM bfs
  JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy) ON true
  JOIN base b ON b.ix = bfs.ix + o.dx AND b.iy = bfs.iy + o.dy
  WHERE bfs.dist + 1 <= {max_dist})
SELECT {cell} AS cell_id, ix, iy, min(dist) AS dist
FROM bfs GROUP BY ix, iy
"""
