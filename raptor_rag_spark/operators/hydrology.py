"""Raster hydrology: D8 flow direction, flow accumulation, basin labeling.

The classic terrain-analysis trio (ArcGIS FlowDirection / FlowAccumulation /
Basin) over the engine's tile rasters — here the KDE density surface plays
the DEM. Together with ``heatmap.terrain_surface`` (slope/hillshade),
``vectorize.distance_transform`` (isochrone field) and
``contours.contour_segments`` (isolines), this completes the raster-analysis
layer the north rule's raster↔vector tile rollups imply.

Semantics (all exact, twin-checked against DuckDB):

- ``flow_direction``: for every populated cell, the D8 steepest-descent
  neighbor *within the populated set* — drop = (z − z_n)·w with w = 1 for
  cardinal and 1/√2 for diagonal moves (distance-weighted drop, Jenson &
  Domingue 1988). Ties break on the smallest direction code; cells with no
  strictly lower populated neighbor are pits (``dir = -1``). Restricting
  targets to populated cells keeps the flow graph closed over the raster,
  so downstream walks never leave it.
- ``flow_accumulation``: the number of upstream cells whose flow path
  passes through each cell (0 for ridge heads) — the drainage network.
- ``flow_basins``: each cell labeled with the pit its flow path terminates
  in — watershed delineation.

Scale shape: the raster is metadata-scale (≤4^res rows regardless of corpus
size — the cells-are-metadata rule), the stencil fan-out is a bounded 8×,
and the walk is iterative bounded-round joins over single-out-degree edges
(strictly descending ⇒ acyclic ⇒ every (origin, cell) pair is produced at
most once, so UNION ALL in the twin equals Spark's union). Rounds are capped
at ``max_rounds`` — a compile-time constant mirrored in the DuckDB recursive
CTE, so even a truncated walk is truncated identically in both engines.

Reference role: the reference (raptor/) has no raster surface; this module
is part of the geospatial recast mandated by the north rule, built with the
same exact-twin discipline as the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels.grid import COORD_BITS, RES_SHIFT

# (code, dx, dy) in xy coords (y up): E, NE, N, NW, W, SW, S, SE.
_D8 = [
    (0, 1, 0),
    (1, 1, 1),
    (2, 0, 1),
    (3, -1, 1),
    (4, -1, 0),
    (5, -1, -1),
    (6, 0, -1),
    (7, 1, -1),
]

_INV_SQRT2 = 0.7071067811865476  # 1/sqrt(2), the double literal both engines fold


def _cell(res: int):
    return (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )


def _cell_sql(res: int, ix: str = "ix", iy: str = "iy") -> str:
    return (
        f"(({res}::BIGINT << {RES_SHIFT})"
        f" | (CAST({ix} AS BIGINT) << {COORD_BITS}) | {iy})"
    )


def flow_direction(
    raster: DataFrame, res: int, value_col: str = "density"
) -> DataFrame:
    """(cell_id, ix, iy, dir, nix, niy): D8 steepest-descent direction per
    populated cell; pits carry ``dir = -1`` and NULL target coords.

    One bounded 8× fan-out, one self-join on the raster (both sides are the
    metadata-scale cell table), one window rank — no corpus access."""
    offs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(code).alias("dir"),
                    F.lit(dx).cast("long").alias("dx"),
                    F.lit(dy).cast("long").alias("dy"),
                    F.lit(_INV_SQRT2 if dx * dy != 0 else 1.0).alias("w"),
                )
                for code, dx, dy in _D8
            ]
        )
    )
    base = raster.select("ix", "iy", F.col(value_col).alias("z"))
    cand = base.select("ix", "iy", "z", offs.alias("o")).select(
        "ix",
        "iy",
        "z",
        F.col("o.dir").alias("dir"),
        (F.col("ix") + F.col("o.dx")).alias("nix"),
        (F.col("iy") + F.col("o.dy")).alias("niy"),
        F.col("o.w").alias("w"),
    )
    nbr = base.select(
        F.col("ix").alias("nix"), F.col("iy").alias("niy"), F.col("z").alias("zn")
    )
    drops = (
        cand.join(nbr, ["nix", "niy"])
        .withColumn("drop", (F.col("z") - F.col("zn")) * F.col("w"))
        .where(F.col("drop") > 0)
    )
    win = Window.partitionBy("ix", "iy").orderBy(
        F.col("drop").desc(), F.col("dir").asc()
    )
    flows = (
        drops.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("ix", "iy", "dir", "nix", "niy")
    )
    pits = (
        base.join(flows.select("ix", "iy"), ["ix", "iy"], "left_anti")
        .select(
            "ix",
            "iy",
            F.lit(-1).alias("dir"),
            F.lit(None).cast("long").alias("nix"),
            F.lit(None).cast("long").alias("niy"),
        )
    )
    return flows.unionByName(pits).select(
        _cell(res).alias("cell_id"), "ix", "iy", "dir", "nix", "niy"
    )


def _d8_values_sql() -> str:
    return ", ".join(
        f"({code}, {dx}, {dy}, {(_INV_SQRT2 if dx * dy != 0 else 1.0)!r})"
        for code, dx, dy in _D8
    )


def _flow_core_sql(raster_sql: str, value_col: str) -> str:
    """Shared CTE body: ``fd`` = flowing cells, ``pits`` = terminal cells."""
    return f"""
base AS (SELECT ix, iy, {value_col} AS z FROM ({raster_sql})),
o(dir, dx, dy, w) AS (VALUES {_d8_values_sql()}),
drops AS (
  SELECT b.ix, b.iy, o.dir, b.ix + o.dx AS nix, b.iy + o.dy AS niy,
         (b.z - n.z) * o.w AS drp
  FROM base b, o
  JOIN base n ON n.ix = b.ix + o.dx AND n.iy = b.iy + o.dy
  WHERE (b.z - n.z) * o.w > 0),
fd AS (
  SELECT ix, iy, dir, nix, niy FROM (
    SELECT ix, iy, dir, nix, niy,
           row_number() OVER (PARTITION BY ix, iy ORDER BY drp DESC, dir ASC) AS rn
    FROM drops) WHERE rn = 1),
pits AS (
  SELECT b.ix, b.iy FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM fd f WHERE f.ix = b.ix AND f.iy = b.iy))"""


def flow_direction_sql(raster_sql: str, res: int, value_col: str = "density") -> str:
    """DuckDB twin of :func:`flow_direction`."""
    return f"""
WITH {_flow_core_sql(raster_sql, value_col)}
SELECT {_cell_sql(res)} AS cell_id, ix, iy, dir, nix, niy FROM fd
UNION ALL
SELECT {_cell_sql(res)} AS cell_id, ix, iy, -1 AS dir,
       CAST(NULL AS BIGINT) AS nix, CAST(NULL AS BIGINT) AS niy
FROM pits
"""


def _walk(flows: DataFrame, max_rounds: int) -> DataFrame:
    """Transitive closure (origin_ix, origin_iy, cix, ciy) of the flow
    edges, paths capped at ``max_rounds`` hops. Strict descent makes the
    edge relation acyclic with out-degree ≤ 1, so each pair appears once
    and the loop terminates when every path has reached a pit."""
    # materialized once: joined by every hop round below, and `flows` is
    # usually an unmaterialized stencil plan over the raster (same
    # re-execution defect class as cost-distance's grid)
    edges = flows.where(F.col("dir") >= 0).select(
        F.col("ix").alias("six"),
        F.col("iy").alias("siy"),
        F.col("nix").alias("tix"),
        F.col("niy").alias("tiy"),
    ).localCheckpoint(eager=True)
    paths = edges.select(
        F.col("six").alias("oix"),
        F.col("siy").alias("oiy"),
        F.col("tix").alias("cix"),
        F.col("tiy").alias("ciy"),
    ).localCheckpoint(eager=True)
    frontier = paths
    for _ in range(2, max_rounds + 1):
        nxt = (
            frontier.join(
                edges,
                (frontier["cix"] == edges["six"]) & (frontier["ciy"] == edges["siy"]),
            )
            .select("oix", "oiy", F.col("tix").alias("cix"), F.col("tiy").alias("ciy"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        paths = paths.unionByName(nxt)
        frontier = nxt
    return paths


def _walk_sql(max_rounds: int) -> str:
    """Recursive-CTE twin of :func:`_walk` (UNION ALL is exact: acyclicity
    + out-degree ≤ 1 mean no pair is ever produced twice)."""
    return f"""
walk(oix, oiy, cix, ciy, depth) AS (
  SELECT ix, iy, nix, niy, 1 FROM fd
  UNION ALL
  SELECT w.oix, w.oiy, f.nix, f.niy, w.depth + 1
  FROM walk w JOIN fd f ON f.ix = w.cix AND f.iy = w.ciy
  WHERE w.depth + 1 <= {max_rounds})"""


def flow_accumulation(
    raster: DataFrame, res: int, value_col: str = "density", max_rounds: int = 40
) -> DataFrame:
    """(cell_id, ix, iy, acc): number of upstream cells draining through
    each populated cell (0 for ridge heads) — the drainage network."""
    flows = flow_direction(raster, res, value_col)
    paths = _walk(flows, max_rounds)
    acc = paths.groupBy(
        F.col("cix").alias("ix"), F.col("ciy").alias("iy")
    ).agg(F.count(F.lit(1)).alias("acc"))
    return (
        raster.select("ix", "iy")
        .join(acc, ["ix", "iy"], "left")
        .select(
            _cell(res).alias("cell_id"),
            "ix",
            "iy",
            F.coalesce(F.col("acc"), F.lit(0).cast("long")).alias("acc"),
        )
    )


def flow_accumulation_sql(
    raster_sql: str, res: int, value_col: str = "density", max_rounds: int = 40
) -> str:
    """DuckDB twin of :func:`flow_accumulation`."""
    return f"""
WITH RECURSIVE {_flow_core_sql(raster_sql, value_col)},
{_walk_sql(max_rounds)},
acc AS (SELECT cix AS ix, ciy AS iy, count(*) AS acc FROM walk GROUP BY cix, ciy)
SELECT {_cell_sql(res, "b.ix", "b.iy")} AS cell_id, b.ix, b.iy,
       COALESCE(a.acc, 0) AS acc
FROM base b LEFT JOIN acc a ON a.ix = b.ix AND a.iy = b.iy
"""


def flow_basins(
    raster: DataFrame, res: int, value_col: str = "density", max_rounds: int = 40
) -> DataFrame:
    """(cell_id, ix, iy, sink_ix, sink_iy, sink_cell): every populated cell
    labeled with the pit its flow path terminates in (pits label
    themselves) — watershed delineation. A cell whose path exceeds
    ``max_rounds`` hops is absent (identically in the twin)."""
    flows = flow_direction(raster, res, value_col)
    pits = flows.where(F.col("dir") == -1).select(
        F.col("ix").alias("sink_ix"), F.col("iy").alias("sink_iy")
    )
    paths = _walk(flows, max_rounds)
    reached = paths.join(
        pits,
        (paths["cix"] == pits["sink_ix"]) & (paths["ciy"] == pits["sink_iy"]),
    ).select(
        F.col("oix").alias("ix"), F.col("oiy").alias("iy"), "sink_ix", "sink_iy"
    )
    self_rows = pits.select(
        F.col("sink_ix").alias("ix"),
        F.col("sink_iy").alias("iy"),
        "sink_ix",
        "sink_iy",
    )
    sink_cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("sink_ix"), COORD_BITS))
        .bitwiseOR(F.col("sink_iy"))
    )
    return reached.unionByName(self_rows).select(
        _cell(res).alias("cell_id"),
        "ix",
        "iy",
        "sink_ix",
        "sink_iy",
        sink_cell.alias("sink_cell"),
    )


def flow_basins_sql(
    raster_sql: str, res: int, value_col: str = "density", max_rounds: int = 40
) -> str:
    """DuckDB twin of :func:`flow_basins`."""
    return f"""
WITH RECURSIVE {_flow_core_sql(raster_sql, value_col)},
{_walk_sql(max_rounds)},
lab AS (
  SELECT w.oix AS ix, w.oiy AS iy, p.ix AS sink_ix, p.iy AS sink_iy
  FROM walk w JOIN pits p ON p.ix = w.cix AND p.iy = w.ciy
  UNION ALL
  SELECT ix, iy, ix AS sink_ix, iy AS sink_iy FROM pits)
SELECT {_cell_sql(res)} AS cell_id, ix, iy, sink_ix, sink_iy,
       {_cell_sql(res, "sink_ix", "sink_iy")} AS sink_cell
FROM lab
"""


def strahler_order(
    raster: DataFrame,
    res: int,
    value_col: str = "density",
    acc_threshold: int = 5,
    max_rounds: int = 12,
) -> DataFrame:
    """(cell_id, ix, iy, acc, strahler): Strahler stream order over the
    drainage network — stream cells are those with flow accumulation ≥
    ``acc_threshold``; headwaters are order 1, a confluence of ≥ 2 streams
    of equal maximal order o forms order o+1, otherwise the max passes
    through.

    Synchronized Jacobi iteration on CELL METADATA: every round recomputes
    each stream cell's order from its upstream stream neighbors' previous
    orders (D8 in-degree ≤ 8), starting from all-1. Converges in ≤
    longest-stream-path rounds; ``max_rounds`` caps the unrolled loop and
    the DuckDB twin unrolls the SAME number of rounds, so results are
    hash-identical even before convergence. Per-round state is one
    localCheckpoint of ≤ occupied-cells rows — bounded rounds, no
    data-scale shuffle."""
    fd = flow_direction(raster, res, value_col).localCheckpoint(eager=True)
    # accumulation from the SAME materialized flow table (flow_accumulation
    # would re-derive it); one walk, one groupBy — all cell metadata
    paths = _walk(fd, 40)
    acc_counts = paths.groupBy(
        F.col("cix").alias("ix"), F.col("ciy").alias("iy")
    ).agg(F.count(F.lit(1)).cast("long").alias("acc"))
    acc = (
        raster.select("ix", "iy")
        .join(acc_counts, ["ix", "iy"], "left")
        .select("ix", "iy", F.coalesce(F.col("acc"), F.lit(0).cast("long")).alias("acc"))
    )
    streams = acc.where(F.col("acc") >= acc_threshold).select("ix", "iy", "acc")
    sedges = (
        fd.where(F.col("dir") >= 0)
        .join(streams.select("ix", "iy"), ["ix", "iy"])
        .join(
            streams.select(F.col("ix").alias("nix"), F.col("iy").alias("niy")),
            ["nix", "niy"],
        )
        .select(
            F.col("ix").alias("six"),
            F.col("iy").alias("siy"),
            F.col("nix").alias("tix"),
            F.col("niy").alias("tiy"),
        )
        .localCheckpoint(eager=True)
    )
    state = streams.select("ix", "iy", F.lit(1).cast("long").alias("ord")).localCheckpoint(
        eager=True
    )
    for _ in range(max_rounds):
        inflow = sedges.join(
            state.select(F.col("ix").alias("six"), F.col("iy").alias("siy"), "ord"),
            ["six", "siy"],
        ).select(F.col("tix").alias("ix"), F.col("tiy").alias("iy"), "ord")
        per_ord = inflow.groupBy("ix", "iy", "ord").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        w = Window.partitionBy("ix", "iy").orderBy(F.col("ord").desc())
        agg = (
            per_ord.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("ix", "iy", F.col("ord").alias("omax"), F.col("n").alias("cmax"))
        )
        new_state = (
            streams.select("ix", "iy")
            .join(agg, ["ix", "iy"], "left")
            .select(
                "ix",
                "iy",
                F.when(F.col("omax").isNull(), F.lit(1).cast("long"))
                .when(F.col("cmax") >= 2, F.col("omax") + 1)
                .otherwise(F.col("omax"))
                .alias("ord"),
            )
            .localCheckpoint(eager=True)
        )
        # once converged every further round is a no-op, so breaking early
        # is result-identical to the twin's full unroll (metadata-scale
        # anti-join per round)
        changed = new_state.join(
            state.withColumnRenamed("ord", "prev_ord"), ["ix", "iy"]
        ).where(F.col("ord") != F.col("prev_ord"))
        state = new_state
        if changed.isEmpty():
            break
    return streams.join(state, ["ix", "iy"]).select(
        _cell(res).alias("cell_id"), "ix", "iy", "acc", F.col("ord").alias("strahler")
    )


def strahler_order_sql(
    raster_sql: str,
    res: int,
    value_col: str = "density",
    acc_threshold: int = 5,
    max_rounds: int = 12,
) -> str:
    """DuckDB twin of :func:`strahler_order` — the Jacobi rounds are
    textually UNROLLED (r1..r{max_rounds}) so each round is plain SQL over
    the previous round's full state, exactly the Spark loop's structure."""
    walk = _walk_sql(40)
    rounds = ["r0 AS (SELECT ix, iy, CAST(1 AS BIGINT) AS ord FROM streams)"]
    for k in range(1, max_rounds + 1):
        prev = f"r{k-1}"
        rounds.append(f"""r{k} AS (
  SELECT s.ix, s.iy,
         CASE WHEN a.omax IS NULL THEN CAST(1 AS BIGINT)
              WHEN a.cmax >= 2 THEN a.omax + 1 ELSE a.omax END AS ord
  FROM streams s LEFT JOIN (
    SELECT ix, iy, ord AS omax, n AS cmax FROM (
      SELECT p.ix, p.iy, p.ord, p.n,
             row_number() OVER (PARTITION BY p.ix, p.iy ORDER BY p.ord DESC) AS rn
      FROM (
        SELECT e.tix AS ix, e.tiy AS iy, u.ord, count(*)::BIGINT AS n
        FROM sedges e JOIN {prev} u ON u.ix = e.six AND u.iy = e.siy
        GROUP BY e.tix, e.tiy, u.ord) p) q
    WHERE rn = 1) a ON a.ix = s.ix AND a.iy = s.iy)""")
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH RECURSIVE {_flow_core_sql(raster_sql, value_col)},
{walk},
accq AS MATERIALIZED (SELECT cix AS ix, ciy AS iy, count(*)::BIGINT AS acc FROM walk GROUP BY cix, ciy),
acc_all AS (
  SELECT b.ix, b.iy, COALESCE(a.acc, 0)::BIGINT AS acc
  FROM base b LEFT JOIN accq a ON a.ix = b.ix AND a.iy = b.iy),
streams AS MATERIALIZED (SELECT ix, iy, acc FROM acc_all WHERE acc >= {acc_threshold}),
sedges AS MATERIALIZED (
  SELECT f.ix AS six, f.iy AS siy, f.nix AS tix, f.niy AS tiy
  FROM fd f
  JOIN streams a ON a.ix = f.ix AND a.iy = f.iy
  JOIN streams b ON b.ix = f.nix AND b.iy = f.niy),
{rounds_sql}
SELECT {_cell_sql(res, "s.ix", "s.iy")} AS cell_id, s.ix, s.iy, s.acc,
       r.ord AS strahler
FROM streams s JOIN r{max_rounds} r ON r.ix = s.ix AND r.iy = s.iy
"""
