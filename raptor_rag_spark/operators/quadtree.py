"""Adaptive quadtree tiling: variable-resolution leaves by point density.

Fixed-resolution tiling (kernels/grid.py) wastes cells where data is sparse
and overflows where it is hot; the classic answer is the adaptive quadtree
(region quadtree / the tile-server "overzoom" rule): split a tile while it
holds more than ``max_pts`` points, down to ``max_res``. The result is the
variable-depth leaf partition a vector-tile server or an adaptive spatial
index (e.g., a quadtree-partitioned join) would build over a skewed corpus.

Leaf rule — derived purely from per-level COUNTS, never by walking points
down the tree: counts are monotone up the hierarchy (an ancestor's count ≥
any descendant's), so a cell at res r is a leaf iff

  - r == min_res and count ≤ max_pts               (root tile small enough)
  - r >  min_res and count ≤ max_pts and count(parent) > max_pts
  - r == max_res and count  > max_pts and count(parent) > max_pts
                                                    (over-dense terminal)

Parent count > max_pts already implies every higher ancestor also exceeds
it, so one parent join replaces the whole ancestor chain.

Scale shape: ONE corpus-scale groupBy at ``max_res`` (map-side combinable
to ≤ 4^max_res rows), then a chain of (max_res − min_res) parent rollups and
one self-join — all on cell-cardinality metadata. Leaves are disjoint and
cover every point by construction: Σ leaf n_pts = |corpus| (asserted in
tests and checkable from the output alone).

Reference framing: this is the same adaptive recursion as the reference's
RAPTOR tree growth (cluster → too big → split), recast as the quadtree the
geospatial engine wants; cf. /root/reference/raptor/cluster_tree_builder.py
(recursive layer construction).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def adaptive_tiles(
    pts: DataFrame,
    max_pts: int = 100,
    min_res: int = 2,
    max_res: int = 8,
) -> DataFrame:
    """pts: (x, y). Returns the adaptive-quadtree leaf partition:
    (res, cell, n_pts, overflow) — ``overflow`` marks max_res leaves still
    above ``max_pts`` (the "overzoom" tiles a server would page)."""
    assert min_res < max_res
    # ONE corpus groupBy, materialized: every per-resolution leaf select
    # below references some counts[r], and each counts[r] references
    # counts[r+1] — unmaterialized, Catalyst would re-execute the corpus
    # aggregation once per resolution (max_res−min_res corpus scans)
    base = pts.groupBy(
        G.cell_col(F.col("x"), F.col("y"), max_res).alias("cell")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pts")).localCheckpoint(eager=True)

    counts = {max_res: base}
    for r in range(max_res - 1, min_res - 1, -1):
        counts[r] = (
            counts[r + 1]
            .groupBy(G.cell_parent_col(F.col("cell")).alias("cell"))
            .agg(F.sum("n_pts").cast("long").alias("n_pts"))
            .localCheckpoint(eager=False)  # ≤ occupied-cell metadata
        )

    leaves = []
    root = counts[min_res].where(F.col("n_pts") <= max_pts).select(
        F.lit(min_res).alias("res"), "cell", "n_pts", F.lit(False).alias("overflow")
    )
    leaves.append(root)
    for r in range(min_res + 1, max_res + 1):
        parents_split = (
            counts[r - 1]
            .where(F.col("n_pts") > max_pts)
            .select(F.col("cell").alias("pcell"))
        )
        cur = counts[r].withColumn("pcell", G.cell_parent_col(F.col("cell")))
        joined = cur.join(parents_split, "pcell")
        keep = (
            joined.where(
                (F.col("n_pts") <= max_pts)
                if r < max_res
                else F.lit(True)  # max_res: terminal regardless of count
            )
            .select(
                F.lit(r).alias("res"),
                "cell",
                "n_pts",
                (F.col("n_pts") > max_pts).alias("overflow"),
            )
        )
        leaves.append(keep)
    return reduce(lambda a, b: a.unionByName(b), leaves)


def adaptive_tiles_sql(
    pts_sql: str,
    max_pts: int = 100,
    min_res: int = 2,
    max_res: int = 8,
) -> str:
    """DuckDB twin of :func:`adaptive_tiles`."""
    ctes = [
        f"pts AS ({pts_sql})",
        f"""c{max_res} AS (
  SELECT {G.cell_sql('x', 'y', max_res)} AS cell, CAST(count(*) AS BIGINT) AS n_pts
  FROM pts GROUP BY 1)""",
    ]
    for r in range(max_res - 1, min_res - 1, -1):
        ctes.append(
            f"""c{r} AS (
  SELECT {G.cell_parent_sql('cell')} AS cell, CAST(sum(n_pts) AS BIGINT) AS n_pts
  FROM c{r + 1} GROUP BY 1)"""
        )
    selects = [
        f"""SELECT {min_res} AS res, cell, n_pts, FALSE AS overflow
FROM c{min_res} WHERE n_pts <= {max_pts}"""
    ]
    for r in range(min_res + 1, max_res + 1):
        cond = f"AND k.n_pts <= {max_pts}" if r < max_res else ""
        selects.append(
            f"""SELECT {r} AS res, k.cell, k.n_pts, k.n_pts > {max_pts} AS overflow
FROM c{r} k
JOIN (SELECT cell AS pcell FROM c{r - 1} WHERE n_pts > {max_pts}) p
  ON {G.cell_parent_sql('k.cell')} = p.pcell
WHERE TRUE {cond}"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def quadtree_assign(
    pts: DataFrame,
    leaves: DataFrame,
    min_res: int,
    max_res: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, res, cell): route each point to its quadtree leaf — the
    lookup an adaptive-partitioned join runs before co-locating work.

    The leaf set is cell-cardinality metadata, so it broadcasts: each point
    computes its cell at every res in [min_res, max_res] (pure bit math)
    and keeps the unique one present in the leaf set. Exactly one matches,
    because leaves partition occupied space by construction."""
    keys = F.array(
        *[
            F.struct(
                F.lit(r).alias("res"),
                G.cell_col(F.col("x"), F.col("y"), r).alias("cell"),
            )
            for r in range(min_res, max_res + 1)
        ]
    )
    exploded = pts.select(id_col, F.explode(keys).alias("k")).select(
        id_col, F.col("k.res").alias("res"), F.col("k.cell").alias("cell")
    )
    return exploded.join(
        F.broadcast(leaves.select("res", "cell")), ["res", "cell"]
    ).select(id_col, "res", "cell")
