"""Hierarchical cell-set compaction (the H3 ``compact`` analog).

Given the set of populated cells at one resolution, produce the minimal
multi-resolution cover: wherever all four children of a parent cell are
present (recursively), the parent replaces them. This is the standard
trick for shrinking a cell cover before a broadcast spatial join — a
region that fills a coarse tile costs ONE row instead of 4^k — and is the
set-algebra twin of the engine's tile pyramid (rollup aggregates values up
the parent chain; compact collapses *membership* up the same chain).

Scale shape: one groupBy(parent) per resolution step, each input strictly
≤ 1/4 of the previous (keys halve per axis), so the whole loop costs less
than 1.4× the base aggregation; the emit step is a broadcast anti-join of
each level against the (tiny) next-coarser full set. Pure integer bit
arithmetic end to end — no floats, so the DuckDB twin is trivially exact.

Reference role: RAPTOR's tree collapses a cluster of children into one
parent node per layer (reference raptor/cluster_tree_builder.py:84-129);
compaction is that collapse specialized to full quadtree occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.grid import COORD_BITS, RES_SHIFT


def _cell(res_col, ix, iy):
    return (
        F.shiftleft(res_col.cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(ix, COORD_BITS))
        .bitwiseOR(iy)
    )


def compact_cells(cells: DataFrame, res: int, min_res: int = 0) -> DataFrame:
    """(res, cell_id, ix, iy): minimal multi-resolution cover of a cell set.

    ``cells`` carries integer columns ``ix``/``iy`` at resolution ``res``
    (duplicates allowed — deduped here). A cell is *full* iff it is present
    (at ``res``) or all four of its children are full; the cover emits every
    full cell whose parent is not full. Driver loop is ≤ ``res`` rounds over
    strictly shrinking metadata-scale sets.
    """
    full: dict[int, DataFrame] = {res: cells.select("ix", "iy").distinct()}
    for r in range(res, min_res, -1):
        full[r - 1] = (
            full[r]
            .select(F.shiftright("ix", 1).alias("ix"), F.shiftright("iy", 1).alias("iy"))
            .groupBy("ix", "iy")
            .agg(F.count("*").alias("nc"))
            .where(F.col("nc") == 4)
            .select("ix", "iy")
        )
    parts: list[DataFrame] = [full[min_res].select(F.lit(min_res).alias("res"), "ix", "iy")]
    for r in range(min_res + 1, res + 1):
        par = full[r - 1].select(F.col("ix").alias("pix"), F.col("iy").alias("piy"))
        kept = full[r].join(
            F.broadcast(par),
            (F.shiftright(F.col("ix"), 1) == F.col("pix"))
            & (F.shiftright(F.col("iy"), 1) == F.col("piy")),
            "left_anti",
        )
        parts.append(kept.select(F.lit(r).alias("res"), "ix", "iy"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("res").cast("int").alias("res"),
        _cell(F.col("res"), F.col("ix"), F.col("iy")).alias("cell_id"),
        "ix",
        "iy",
    )


def compact_cells_sql(cells_sql: str, res: int, min_res: int = 0) -> str:
    """DuckDB twin of :func:`compact_cells`. ``cells_sql`` selects ix, iy
    (BIGINT) at resolution ``res``. Same unrolled level chain, pure ints."""
    ctes = [
        f"c{res} AS (SELECT DISTINCT CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy "
        f"FROM ({cells_sql}))"
    ]
    for r in range(res - 1, min_res - 1, -1):
        ctes.append(
            f"c{r} AS (SELECT ix, iy FROM "
            f"(SELECT (ix >> 1) AS ix, (iy >> 1) AS iy FROM c{r + 1}) "
            f"GROUP BY ix, iy HAVING count(*) = 4)"
        )
    parts = [f"SELECT {min_res} AS res, ix, iy FROM c{min_res}"]
    for r in range(min_res + 1, res + 1):
        parts.append(
            f"SELECT {r} AS res, ix, iy FROM c{r} a WHERE NOT EXISTS "
            f"(SELECT 1 FROM c{r - 1} p WHERE p.ix = (a.ix >> 1) AND p.iy = (a.iy >> 1))"
        )
    union = "\nUNION ALL\n".join(parts)
    cell = f"((CAST(res AS BIGINT) << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH {', '.join(ctes)},
u AS ({union})
SELECT CAST(res AS INT) AS res, {cell} AS cell_id, ix, iy FROM u
"""


def uncompact_cells(cover: DataFrame, res: int) -> DataFrame:
    """(ix, iy): expand a multi-resolution cover back to uniform cells at
    ``res`` (the H3 ``uncompact`` inverse). Each cover cell at resolution r
    explodes to 4^(res-r) children via two integer sequences — bounded
    fan-out, no join."""
    # column-valued shift amounts need expr() — F.shiftleft takes a literal only
    side = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({res} - res AS INT))")
    base_x = F.expr(f"shiftleft(ix, CAST({res} - res AS INT))")
    base_y = F.expr(f"shiftleft(iy, CAST({res} - res AS INT))")
    return (
        cover.select(base_x.alias("bx"), base_y.alias("by"), side.alias("side"))
        .select(
            "by",
            "side",
            F.explode(F.sequence(F.col("bx"), F.col("bx") + F.col("side") - 1)).alias("ix"),
        )
        .select("ix", F.explode(F.sequence(F.col("by"), F.col("by") + F.col("side") - 1)).alias("iy"))
    )
