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
# (dx, dy, half-step weight, direction code 1..8). The code is the offset's
# 1-based position in this fixed enumeration order — both engines share it.
_OFFS = [
    (dx, dy, 0.5 if dx == 0 or dy == 0 else SQRT2_HALF, i + 1)
    for i, (dx, dy) in enumerate(
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
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
    d = _surface(grid, src_ix, src_iy, res, rounds)
    return d.select("ix", "iy", "cost", F.round("d", 6).alias("dist"))


def _surface(
    grid: DataFrame,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> DataFrame:
    """Exact (unrounded) accumulated-cost surface (ix, iy, cost, d) — the
    shared core of cost_distance / cost_backlink / cost_corridor /
    isochrones. d is bit-identical across engines: a min over an identical
    candidate multiset of fixed-order float expressions."""
    n = 1 << res
    # Materialize the cost raster ONCE: it is bounded by 4^res rows, but the
    # caller usually passes an UNMATERIALIZED plan (a corpus groupBy + grid
    # join). tgt is referenced in every relaxation round, and Catalyst does
    # not reuse subplans — without this barrier each round re-executes the
    # corpus aggregation (measured: 24 corpus scans, 60 s vs 9 s at sf0.001).
    grid = grid.localCheckpoint(eager=True)
    d = grid.where(
        (F.col("ix") == src_ix) & (F.col("iy") == src_iy)
    ).select("ix", "iy", "cost", F.lit(0.0).alias("d"))

    moves = _moves()
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
    return d


def _moves() -> F.Column:
    return F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(w).alias("w"),
                F.lit(code).alias("code"),
            )
            for dx, dy, w, code in _OFFS
        ]
    )


def cost_backlink(
    grid: DataFrame,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> DataFrame:
    """Cost back-link raster (ArcGIS "Cost Back Link", GRASS r.cost -d): for
    every reached cell, the direction code (1..8, `_OFFS` order) of the
    neighbor it was settled FROM on a least-cost path — following the codes
    from any cell walks back to the source. dir = 0 at the source; dir = -1
    for a cell whose round-bounded d satisfies no predecessor identity yet
    (not converged within ``rounds``) — both engines agree by construction.

    ONE declarative self-join over the surface, no extra iteration: v is a
    predecessor of u iff d(u) == d(v) + (cost(u)+cost(v))*w — exact float
    equality holds because the winning relaxation candidate IS that very
    expression. Ties broken by min (linearized v index, code), packed into a
    single BIGINT so min-agg semantics are identical across engines."""
    n = 1 << res
    d = _surface(grid, src_ix, src_iy, res, rounds)
    v = d.select(
        F.col("ix").alias("vix"),
        F.col("iy").alias("viy"),
        F.col("cost").alias("vcost"),
        F.col("d").alias("vd"),
    )
    cand = (
        d.select("ix", "iy", "cost", "d", F.explode(_moves()).alias("m"))
        .select(
            "ix",
            "iy",
            "cost",
            "d",
            (F.col("ix") + F.col("m.dx")).alias("vix"),
            (F.col("iy") + F.col("m.dy")).alias("viy"),
            F.col("m.w").alias("w"),
            F.col("m.code").alias("code"),
        )
        .join(v, ["vix", "viy"])
        .where(
            F.col("d")
            == F.col("vd") + (F.col("cost") + F.col("vcost")) * F.col("w")
        )
        .groupBy("ix", "iy")
        .agg(
            F.min(
                (F.col("vix") * n + F.col("viy")) * 16 + F.col("code")
            ).alias("po")
        )
        .select("ix", "iy", (F.col("po") % 16).cast("int").alias("pdir"))
    )
    return d.join(cand, ["ix", "iy"], "left").select(
        "ix",
        "iy",
        F.when((F.col("ix") == src_ix) & (F.col("iy") == src_iy), F.lit(0))
        .otherwise(F.coalesce(F.col("pdir"), F.lit(-1)))
        .alias("dir"),
        F.round("d", 6).alias("dist"),
    )


def cost_corridor(
    grid: DataFrame,
    a: tuple[int, int],
    b: tuple[int, int],
    res: int,
    rounds: int = 24,
    slack: float = 0.0,
) -> DataFrame:
    """Least-cost corridor (ArcGIS Corridor): cells u whose best A→u→B path
    cost dA(u)+dB(u) is within ``slack`` of the optimal A→B cost — the
    near-optimal travel band between two sites. Two shared cost surfaces,
    one equi-join, one empty-frame window min; on_path marks the exact
    least-cost path cells (total == best, float-exact both engines)."""
    from pyspark.sql import Window

    da = _surface(grid, a[0], a[1], res, rounds).select(
        "ix", "iy", F.col("d").alias("da")
    )
    db = _surface(grid, b[0], b[1], res, rounds).select(
        "ix", "iy", F.col("d").alias("db")
    )
    j = da.join(db, ["ix", "iy"]).select(
        "ix", "iy", (F.col("da") + F.col("db")).alias("total")
    )
    best = F.min("total").over(Window.partitionBy())  # metadata-scale state
    return (
        j.withColumn("best", best)
        .where(F.col("total") <= F.col("best") + F.lit(float(slack)))
        .select(
            "ix",
            "iy",
            F.round("total", 6).alias("total"),
            (F.col("total") == F.col("best")).alias("on_path"),
        )
    )


def isochrones(
    grid: DataFrame,
    src_ix: int,
    src_iy: int,
    res: int,
    breaks: list[float],
    rounds: int = 24,
) -> DataFrame:
    """Isochrone bands over the accumulated-cost surface: band k = reached
    cells with dist in (breaks[k-1], breaks[k]] (band 0 = dist ≤ breaks[0],
    band len(breaks) = beyond the last break). Per band: cell count, min/max
    dist, and perimeter — the count of 4-neighbor cell edges exposed to a
    DIFFERENT band, an unreached cell, or the grid boundary (the raster→
    vector isoline length in cell-edge units). One banding select + one
    4-offset left self-join, both metadata scale."""
    d = _surface(grid, src_ix, src_iy, res, rounds)
    band_expr = sum(
        (F.when(F.col("d") > F.lit(float(b)), 1).otherwise(0) for b in breaks),
        F.lit(0),
    )
    banded = d.select("ix", "iy", "d", band_expr.cast("int").alias("band"))
    offs4 = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        ]
    )
    nb = banded.select(
        F.col("ix").alias("nix"),
        F.col("iy").alias("niy"),
        F.col("band").alias("nband"),
    )
    exposure = (
        banded.select("ix", "iy", "band", F.explode(offs4).alias("m"))
        .select(
            "band",
            (F.col("ix") + F.col("m.dx")).alias("nix"),
            (F.col("iy") + F.col("m.dy")).alias("niy"),
        )
        .join(nb, ["nix", "niy"], "left")
        .where(F.col("nband").isNull() | (F.col("nband") != F.col("band")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("perimeter"))
    )
    cells = banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.min("d"), 6).alias("min_dist"),
        F.round(F.max("d"), 6).alias("max_dist"),
    )
    return cells.join(exposure, ["band"], "left").select(
        "band",
        "n_cells",
        F.coalesce("perimeter", F.lit(0)).cast("long").alias("perimeter"),
        "min_dist",
        "max_dist",
    )


def _surface_ctes(
    prefix: str, src_ix: int, src_iy: int, res: int, rounds: int
) -> list[str]:
    """CTE chain computing the accumulated-cost surface as
    ``{prefix}{rounds}(ix, iy, cost, d)``; expects CTEs ``grid`` and
    ``offs(dx, dy, w, code)`` to already be in scope."""
    n = 1 << res
    # MATERIALIZED is load-bearing: every round references the previous one
    # TWICE (probe + carry-forward) and grid twice more — inlined, that is
    # exponential plan growth and one parquet scan per reference
    ctes = [
        f"""{prefix}0 AS (
  SELECT ix, iy, cost, 0.0 AS d FROM grid
  WHERE ix = {src_ix} AND iy = {src_iy})"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""{prefix}{r} AS MATERIALIZED (
  SELECT ix, iy, cost, min(d) AS d FROM (
    SELECT g.ix, g.iy, g.cost, p.d + (p.cost + g.cost) * o.w AS d
    FROM {prefix}{r - 1} p CROSS JOIN offs o
    JOIN grid g ON g.ix = p.ix + o.dx AND g.iy = p.iy + o.dy
    WHERE p.ix + o.dx >= 0 AND p.ix + o.dx < {n}
      AND p.iy + o.dy >= 0 AND p.iy + o.dy < {n}
    UNION ALL
    SELECT ix, iy, cost, d FROM {prefix}{r - 1}
  ) GROUP BY 1, 2, 3)"""
        )
    return ctes


def _offs_cte() -> str:
    vals = ", ".join(
        f"({dx}, {dy}, {flit(w)}, {code})" for dx, dy, w, code in _OFFS
    )
    return f"offs(dx, dy, w, code) AS (VALUES {vals})"


def cost_distance_sql(
    grid_sql: str,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> str:
    """DuckDB twin of :func:`cost_distance` — the relaxation unrolled into
    one CTE per round. ``grid_sql`` yields (ix, iy, cost)."""
    ctes = [
        f"grid AS MATERIALIZED ({grid_sql})",
        _offs_cte(),
        *_surface_ctes("d", src_ix, src_iy, res, rounds),
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT ix, iy, cost, round(d, 6) AS dist FROM d{rounds}"
    )


def cost_backlink_sql(
    grid_sql: str,
    src_ix: int,
    src_iy: int,
    res: int,
    rounds: int = 24,
) -> str:
    """DuckDB twin of :func:`cost_backlink` — the same predecessor-identity
    self-join over the unrolled surface, min over the packed BIGINT."""
    n = 1 << res
    ctes = [
        f"grid AS MATERIALIZED ({grid_sql})",
        _offs_cte(),
        *_surface_ctes("d", src_ix, src_iy, res, rounds),
        f"""pred AS (
  SELECT u.ix, u.iy,
         CAST(min((v.ix * {n} + v.iy) * 16 + o.code) % 16 AS INT) AS pdir
  FROM d{rounds} u CROSS JOIN offs o
  JOIN d{rounds} v ON v.ix = u.ix + o.dx AND v.iy = u.iy + o.dy
  WHERE u.d = v.d + (u.cost + v.cost) * o.w
  GROUP BY 1, 2)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT u.ix, u.iy,
       CASE WHEN u.ix = {src_ix} AND u.iy = {src_iy} THEN 0
            ELSE coalesce(p.pdir, -1) END AS dir,
       round(u.d, 6) AS dist
FROM d{rounds} u LEFT JOIN pred p USING (ix, iy)"""
    )


def cost_corridor_sql(
    grid_sql: str,
    a: tuple[int, int],
    b: tuple[int, int],
    res: int,
    rounds: int = 24,
    slack: float = 0.0,
) -> str:
    """DuckDB twin of :func:`cost_corridor` — two surface chains, equi-join,
    empty-frame window min."""
    ctes = [
        f"grid AS MATERIALIZED ({grid_sql})",
        _offs_cte(),
        *_surface_ctes("a", a[0], a[1], res, rounds),
        *_surface_ctes("b", b[0], b[1], res, rounds),
        f"""tot AS (
  SELECT a.ix, a.iy, a.d + b.d AS total,
         min(a.d + b.d) OVER () AS best
  FROM a{rounds} a JOIN b{rounds} b USING (ix, iy))""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT ix, iy, round(total, 6) AS total, total = best AS on_path
FROM tot WHERE total <= best + {flit(float(slack))}"""
    )


def isochrones_sql(
    grid_sql: str,
    src_ix: int,
    src_iy: int,
    res: int,
    breaks: list[float],
    rounds: int = 24,
) -> str:
    """DuckDB twin of :func:`isochrones` — identical banding expression and
    4-offset exposure left join."""
    band = " + ".join(
        f"(CASE WHEN d > {flit(float(b))} THEN 1 ELSE 0 END)" for b in breaks
    )
    ctes = [
        f"grid AS MATERIALIZED ({grid_sql})",
        _offs_cte(),
        *_surface_ctes("d", src_ix, src_iy, res, rounds),
        f"""banded AS MATERIALIZED (
  SELECT ix, iy, d, CAST({band} AS INT) AS band FROM d{rounds})""",
        """offs4(dx, dy) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1))""",
        """expo AS (
  SELECT u.band, count(*) AS perimeter
  FROM banded u CROSS JOIN offs4 o
  LEFT JOIN banded v ON v.ix = u.ix + o.dx AND v.iy = u.iy + o.dy
  WHERE v.band IS NULL OR v.band <> u.band
  GROUP BY 1)""",
        """cells AS (
  SELECT band, count(*) AS n_cells,
         round(min(d), 6) AS min_dist, round(max(d), 6) AS max_dist
  FROM banded GROUP BY 1)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT band, n_cells, CAST(coalesce(perimeter, 0) AS BIGINT) AS perimeter,
       min_dist, max_dist
FROM cells LEFT JOIN expo USING (band)"""
    )
