"""Density clustering over the quadkey grid: cell-granular DBSCAN.

Follows the engine's one rule for pairwise spatial work at 100 TB: never join
points against points globally — density decisions and connected components
run on CELLS (metadata-scale at any corpus size), and the only point-sized
steps are one count aggregate and one broadcast label join. Every step is
twin-expressible, so the operator carries an exact DuckDB oracle
(recursive-CTE reachability replaces the min-label-propagation loop).

Reference analogue: the reference's GMM soft-clustering over embedding space
(raptor/cluster_utils.py:90-126) is the *model-based* clustering surface; the
grid DBSCAN here is the density-based twin a tiling engine needs for
hot-region discovery. The distance-band pair join lives in
operators/pipjoin.py (dwithin_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.grid import COORD_BITS, RES_SHIFT

_MASK = (1 << COORD_BITS) - 1
_OFFS8 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def _ix(cell):
    return F.shiftrightunsigned(cell, COORD_BITS).bitwiseAND(F.lit(_MASK))


def _iy(cell):
    return cell.bitwiseAND(F.lit(_MASK))


def _encode(ix, iy, res: int):
    return (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(ix.cast("long"), COORD_BITS))
        .bitwiseOR(iy.cast("long"))
    )


def _neighbor_keys(cell, res: int, offs) -> "F.Column":
    """Array of in-range neighbor cell ids — pure bit arithmetic, no UDF, no
    driver round-trip (the explode(array(...)) shape soft_assignments uses)."""
    n = 1 << res
    ix, iy = _ix(cell), _iy(cell)
    ks = []
    for dx, dy in offs:
        nx, ny = ix + F.lit(dx), iy + F.lit(dy)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        ks.append(F.when(ok, _encode(nx, ny, res)))
    return F.array_compact(F.array(*ks))


def _sql_neighbor_cte(res: int, offs) -> str:
    """offs(dx, dy) VALUES list for the DuckDB twin."""
    vals = ", ".join(f"({dx}, {dy})" for dx, dy in offs)
    return f"offs(dx, dy) AS (VALUES {vals})"


def _sql_nkey(cell_expr: str, res: int) -> tuple[str, str]:
    """(neighbor-cell expr over offs row, in-range predicate)."""
    n = 1 << res
    ix = f"((({cell_expr}) >> {COORD_BITS}) & {_MASK})"
    iy = f"(({cell_expr}) & {_MASK})"
    nx, ny = f"({ix} + dx)", f"({iy} + dy)"
    key = f"(({res}::BIGINT << {RES_SHIFT}) | ({nx}::BIGINT << {COORD_BITS}) | {ny}::BIGINT)"
    ok = f"({nx} >= 0 AND {nx} < {n} AND {ny} >= 0 AND {ny} < {n})"
    return key, ok


# ------------------------------------------------------------- grid DBSCAN


def grid_dbscan(
    points: DataFrame,
    res: int = 6,
    min_pts: int = 5,
    id_col: str = "id",
    driver_cc_max: int = 1 << 17,
) -> DataFrame:
    """Cell-granular DBSCAN (the GriDBSCAN family): (id, cluster_id, kind)
    where kind ∈ {core, border, noise}.

    A cell with ≥ min_pts points is a CORE cell; core cells connected through
    8-neighbor adjacency form one cluster (cluster_id = min core-cell id of
    the component); points in core cells are 'core', points in non-core cells
    with ≥1 core 8-neighbor join the min-cluster_id neighboring cluster as
    'border', everything else is 'noise' (cluster_id −1).

    Scale shape: ONE count aggregate over points (map-side combinable), then
    every subsequent step — adjacency, connected components, labeling — runs
    over CELLS (≤ 4^res rows, metadata-scale at any corpus size), and the
    final label is a broadcast join back onto points. Density decisions never
    shuffle the point set twice. Because core cells are bounded by the grid
    (65k at res 8) rather than the corpus, the component pass runs as a
    driver union-find over ≤ 8·cells edges when they fit (the same
    metadata-on-driver move every planner makes — not a data collect); only
    past ``driver_cc_max`` cells does it fall back to the distributed
    pointer-jumping loop, which costs one shuffle round per log(diameter).
    Deterministic: counts and bit arithmetic only."""
    pts = points.withColumn("_cell", G.cell_col(F.col("x"), F.col("y"), res))
    counts = pts.groupBy("_cell").agg(F.count("*").alias("_n"))
    core = counts.where(F.col("_n") >= min_pts).select(F.col("_cell").alias("cell"))

    if (1 << (2 * res)) <= driver_cc_max:
        # driver path: core cells are grid-bounded metadata. ONE corpus scan
        # builds the counts; adjacency, union-find components, and the
        # border map are pure bit arithmetic over the collected cell set; a
        # second scan broadcast-joins the finished (cell → cluster, kind)
        # map back onto the points. Union by min root: the smaller root
        # always becomes parent, so the final root of every tree IS the
        # component's min cell id — the same canonical label the distributed
        # path and the SQL oracle produce.
        from ..kernels.grid import cell_neighbors

        core_set = {r["cell"] for r in core.collect()}
        parent = {c: c for c in core_set}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for c in core_set:
            for nb in cell_neighbors(c):
                if nb in core_set:
                    ra, rb = find(c), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        label = {c: find(c) for c in core_set}
        border: dict[int, int] = {}
        for c in core_set:
            for nb in cell_neighbors(c):
                if nb not in core_set:
                    lc = label[c]
                    border[nb] = lc if nb not in border else min(border[nb], lc)
        rows = [(c, label[c], "core") for c in core_set] + [
            (c, lab, "border") for c, lab in border.items()
        ]
        lbl = points.sparkSession.createDataFrame(
            rows or [], "cell LONG, cluster_id LONG, kind STRING"
        )
        return pts.join(F.broadcast(lbl), pts._cell == lbl.cell, "left").select(
            F.col(id_col),
            F.coalesce("cluster_id", F.lit(-1).cast("long")).alias("cluster_id"),
            F.coalesce("kind", F.lit("noise")).alias("kind"),
        )

    # distributed fallback: pointer-jumping CC over the cell adjacency
    from .dedup import dedup_clusters

    nbr = core.select(
        F.col("cell").alias("cell_a"),
        F.explode(_neighbor_keys(F.col("cell"), res, _OFFS8)).alias("cell_b"),
    )
    edges = nbr.join(
        core.select(F.col("cell").alias("cell_b")), "cell_b"
    ).select("cell_a", "cell_b")
    cc = dedup_clusters(edges, "cell_a", "cell_b")
    labels = (
        core.join(cc, core.cell == cc.doc_id, "left")
        .select("cell", F.coalesce("canonical_id", F.col("cell")).alias("cluster_id"))
    )
    core_pts = pts.join(F.broadcast(labels), pts._cell == labels.cell).select(
        F.col(id_col), "cluster_id", F.lit("core").alias("kind")
    )
    noncore = pts.join(F.broadcast(labels), pts._cell == labels.cell, "left_anti")
    border_pts = (
        noncore.select(
            F.col(id_col),
            F.explode(_neighbor_keys(F.col("_cell"), res, _OFFS8)).alias("nk"),
        )
        .join(F.broadcast(labels), F.col("nk") == labels.cell)
        .groupBy(id_col)
        .agg(F.min("cluster_id").alias("cluster_id"))
        .select(F.col(id_col), "cluster_id", F.lit("border").alias("kind"))
    )
    noise = (
        noncore.join(border_pts.select(id_col), id_col, "left_anti")
        .select(F.col(id_col), F.lit(-1).cast("long").alias("cluster_id"), F.lit("noise").alias("kind"))
    )
    return core_pts.unionByName(border_pts).unionByName(noise)


def grid_dbscan_sql(
    points_sql: str, res: int = 6, min_pts: int = 5, id_col: str = "id"
) -> str:
    """DuckDB twin of :func:`grid_dbscan` — recursive-CTE reachability over
    core-cell adjacency replaces the min-label-propagation loop."""
    cell = G.cell_sql("x", "y", res)
    nkey, nok = _sql_nkey("cell", res)
    return f"""
WITH RECURSIVE
pts AS (SELECT *, {cell} AS cell FROM ({points_sql})),
counts AS (SELECT cell, count(*) AS n FROM pts GROUP BY cell),
core AS (SELECT cell FROM counts WHERE n >= {min_pts}),
{_sql_neighbor_cte(res, _OFFS8)},
edges AS (
  SELECT c.cell AS src, {nkey.replace('cell', 'c.cell')} AS dst
  FROM core c CROSS JOIN offs
  WHERE {nok.replace('cell', 'c.cell')}
    AND {nkey.replace('cell', 'c.cell')} IN (SELECT cell FROM core)),
reach(cell, r) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.cell),
lab AS (SELECT cell, min(r) AS cluster_id FROM reach GROUP BY cell),
core_pts AS (
  SELECT p.{id_col} AS {id_col}, l.cluster_id, 'core' AS kind
  FROM pts p JOIN lab l ON p.cell = l.cell),
noncore AS (SELECT * FROM pts WHERE cell NOT IN (SELECT cell FROM lab)),
border AS (
  SELECT p.{id_col} AS {id_col}, min(l.cluster_id) AS cluster_id, 'border' AS kind
  FROM noncore p CROSS JOIN offs
  JOIN lab l ON {nok.replace('cell', 'p.cell')} AND l.cell = {nkey.replace('cell', 'p.cell')}
  GROUP BY p.{id_col}),
noise AS (
  SELECT {id_col}, CAST(-1 AS BIGINT) AS cluster_id, 'noise' AS kind
  FROM noncore WHERE {id_col} NOT IN (SELECT {id_col} FROM border))
SELECT * FROM core_pts UNION ALL SELECT * FROM border UNION ALL SELECT * FROM noise
"""


def skyline(
    points: DataFrame,
    res: int = 6,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, x, y): the EXACT Pareto frontier (skyline) of the point set under
    minimize-both dominance — p dominates q when p.x ≤ q.x ∧ p.y ≤ q.y with
    at least one strict; the skyline is every non-dominated point (exact
    duplicates of a frontier point all survive, the standard convention).
    The multi-criteria "best tradeoff" selector — e.g. documents Pareto-
    optimal in (perplexity, 1/length) for curation triage.

    Scale shape — grid-pruned, NOT a raw quadratic self-join: a res-grid
    cell is wholly dominated when any nonempty cell sits strictly
    south-west of it (every point there beats every point here in both
    dims, by the cell-corner bound), so the candidate set collapses to the
    points inside the nonempty-cell STAIRCASE — O(grid width · cell
    density), independent of corpus size. Cell dominance is a
    metadata-scale anti-join (≤4^res rows); only the surviving sliver pays
    the exact pairwise dominance check (a broadcast-sized non-equi
    anti-join). Pruning never changes the answer: dropped cells contain
    dominated points only."""
    n = 1 << res
    cx = F.greatest(
        F.least(F.floor(F.col("x") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    cy = F.greatest(
        F.least(F.floor(F.col("y") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    pts = points.select(id_col, "x", "y", cx.alias("cx"), cy.alias("cy"))
    cells = pts.select("cx", "cy").distinct()
    dominators = cells.select(F.col("cx").alias("dx"), F.col("cy").alias("dy"))
    live = cells.join(
        F.broadcast(dominators),
        (F.col("dx") < F.col("cx")) & (F.col("dy") < F.col("cy")),
        "left_anti",
    )
    cand = pts.join(F.broadcast(live), ["cx", "cy"]).select(id_col, "x", "y")
    other = cand.select(
        F.col("x").alias("ox"), F.col("y").alias("oy"), F.col(id_col).alias("oid")
    )
    dominated = (
        (F.col("ox") <= F.col("x"))
        & (F.col("oy") <= F.col("y"))
        & ((F.col("ox") < F.col("x")) | (F.col("oy") < F.col("y")))
    )
    return cand.join(F.broadcast(other), dominated, "left_anti").select(id_col, "x", "y")


def skyline_sql(points_sql: str, res: int = 6, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`skyline`. ``points_sql`` yields
    (``id_col``, x, y)."""
    n = 1 << res
    cx = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    cy = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    return f"""
WITH pts AS (SELECT {id_col}, x, y, {cx} AS cx, {cy} AS cy FROM ({points_sql})),
cells AS (SELECT DISTINCT cx, cy FROM pts),
live AS (
  SELECT c.cx, c.cy FROM cells c
  WHERE NOT EXISTS (SELECT 1 FROM cells d WHERE d.cx < c.cx AND d.cy < c.cy)),
cand AS (SELECT p.{id_col}, p.x, p.y FROM pts p JOIN live USING (cx, cy))
SELECT {id_col}, x, y FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM cand o
  WHERE o.x <= c.x AND o.y <= c.y AND (o.x < c.x OR o.y < c.y))
"""


def segment_intersections(
    segs: DataFrame,
    res: int = 4,
) -> DataFrame:
    """(seg_a, seg_b, px, py): all PROPER crossings between segments of
    different trajectories — the ST_Intersects(line, line) join. Input:
    (seg_id, traj_id, ax, ay, bx, by) with coordinates in [0, 1].

    A proper crossing is a strict double-straddle: orient(a,b,c)·orient(a,b,d)
    < 0 AND orient(c,d,a)·orient(c,d,b) < 0 (touching endpoints and collinear
    overlaps are excluded — the deterministic, degeneracy-free predicate).
    The crossing point comes from the standard parametric solve; all of it
    is plain double arithmetic evaluated in one pinned order on both engines.

    Scale shape: each segment is mailed to the res-grid cells of its
    BOUNDING BOX (a bounded fan-out — short segments touch O(1) cells; the
    grid res should match typical segment length), candidates pair up via
    ONE cell equi-join with seg_a < seg_b ordering, duplicates from shared
    cells collapse with a DISTINCT on the pair key, and only candidates pay
    the O(1) exact test. The same candidate shape as the DWithin self-join;
    hot cells are AQE-skew-split."""
    n = 1 << res
    lo = lambda c: F.greatest(F.least(F.floor(c * n).cast("long"), F.lit(n - 1)), F.lit(0))  # noqa: E731
    s = segs.select(
        "seg_id",
        "traj_id",
        "ax",
        "ay",
        "bx",
        "by",
        lo(F.least("ax", "bx")).alias("cx0"),
        lo(F.greatest("ax", "bx")).alias("cx1"),
        lo(F.least("ay", "by")).alias("cy0"),
        lo(F.greatest("ay", "by")).alias("cy1"),
    )
    cells = s.select(
        "seg_id",
        "traj_id",
        "ax",
        "ay",
        "bx",
        "by",
        F.explode(F.sequence("cx0", "cx1")).alias("cx"),
        F.col("cy0"),
        F.col("cy1"),
    ).select(
        "seg_id", "traj_id", "ax", "ay", "bx", "by", "cx",
        F.explode(F.sequence("cy0", "cy1")).alias("cy"),
    )
    a = cells.select(
        F.col("seg_id").alias("seg_a"), F.col("traj_id").alias("ta"),
        F.col("ax").alias("x1"), F.col("ay").alias("y1"),
        F.col("bx").alias("x2"), F.col("by").alias("y2"),
        "cx", "cy",
    )
    b = cells.select(
        F.col("seg_id").alias("seg_b"), F.col("traj_id").alias("tb"),
        F.col("ax").alias("x3"), F.col("ay").alias("y3"),
        F.col("bx").alias("x4"), F.col("by").alias("y4"),
        "cx", "cy",
    )
    cand = (
        a.join(b, ["cx", "cy"])
        .where((F.col("seg_a") < F.col("seg_b")) & (F.col("ta") != F.col("tb")))
        .drop("cx", "cy")
        .distinct()
    )
    d1 = (F.col("x2") - F.col("x1")) * (F.col("y3") - F.col("y1")) - (
        F.col("y2") - F.col("y1")
    ) * (F.col("x3") - F.col("x1"))
    d2 = (F.col("x2") - F.col("x1")) * (F.col("y4") - F.col("y1")) - (
        F.col("y2") - F.col("y1")
    ) * (F.col("x4") - F.col("x1"))
    d3 = (F.col("x4") - F.col("x3")) * (F.col("y1") - F.col("y3")) - (
        F.col("y4") - F.col("y3")
    ) * (F.col("x1") - F.col("x3"))
    d4 = (F.col("x4") - F.col("x3")) * (F.col("y2") - F.col("y3")) - (
        F.col("y4") - F.col("y3")
    ) * (F.col("x2") - F.col("x3"))
    hit = cand.where((d1 * d2 < 0) & (d3 * d4 < 0))
    t = d3 / (
        (F.col("x4") - F.col("x3")) * (F.col("y2") - F.col("y1"))
        - (F.col("y4") - F.col("y3")) * (F.col("x2") - F.col("x1"))
    )
    return hit.select(
        "seg_a",
        "seg_b",
        F.round(F.col("x1") + t * (F.col("x2") - F.col("x1")), 6).alias("px"),
        F.round(F.col("y1") + t * (F.col("y2") - F.col("y1")), 6).alias("py"),
    )


def segment_intersections_sql(segs_sql: str, res: int = 4) -> str:
    """DuckDB twin of :func:`segment_intersections`. ``segs_sql`` yields
    (seg_id, traj_id, ax, ay, bx, by)."""
    n = 1 << res
    lo = lambda e: f"greatest(least(floor(({e}) * {n})::BIGINT, {n - 1}), 0)"  # noqa: E731
    return f"""
WITH s AS (
  SELECT seg_id, traj_id, ax, ay, bx, by,
         {lo('least(ax, bx)')} AS cx0, {lo('greatest(ax, bx)')} AS cx1,
         {lo('least(ay, by)')} AS cy0, {lo('greatest(ay, by)')} AS cy1
  FROM ({segs_sql})),
cells AS (
  SELECT seg_id, traj_id, ax, ay, bx, by,
         unnest(generate_series(cx0, cx1)) AS cx, cy0, cy1
  FROM s),
cells2 AS (
  SELECT seg_id, traj_id, ax, ay, bx, by, cx,
         unnest(generate_series(cy0, cy1)) AS cy
  FROM cells),
cand AS (
  SELECT DISTINCT
         a.seg_id AS seg_a, b.seg_id AS seg_b,
         a.ax AS x1, a.ay AS y1, a.bx AS x2, a.by AS y2,
         b.ax AS x3, b.ay AS y3, b.bx AS x4, b.by AS y4
  FROM cells2 a JOIN cells2 b USING (cx, cy)
  WHERE a.seg_id < b.seg_id AND a.traj_id <> b.traj_id),
t AS (
  SELECT *,
         ((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) AS d1,
         ((x2 - x1) * (y4 - y1) - (y2 - y1) * (x4 - x1)) AS d2,
         ((x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)) AS d3,
         ((x4 - x3) * (y2 - y3) - (y4 - y3) * (x2 - x3)) AS d4
  FROM cand)
SELECT seg_a, seg_b,
       round(x1 + (d3 / ((x4 - x3) * (y2 - y1) - (y4 - y3) * (x2 - x1))) * (x2 - x1), 6) AS px,
       round(y1 + (d3 / ((x4 - x3) * (y2 - y1) - (y4 - y3) * (x2 - x1))) * (y2 - y1), 6) AS py
FROM t WHERE d1 * d2 < 0 AND d3 * d4 < 0
"""
