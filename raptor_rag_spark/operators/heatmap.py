"""Gaussian KDE heatmap: truncated-kernel density per grid cell.

The geospatial rollup surface one step past tile_stats (counts/means per
cell): a kernel-density raster, the standard "heatmap" layer of a web-map
stack. For every cell at resolution ``res``, density is the sum over nearby
points of exp(-d² / 2h²), where d is the distance from the point to the CELL
CENTER and the kernel is truncated at ``cutoff``·h (the 3σ tail is dropped —
the textbook truncation that turns KDE from an all-pairs problem into a
bounded-neighborhood one).

Scale shape: each point fans out to the (2R+1)² candidate cells whose
centers can be within the cutoff radius (R = ceil(cutoff·h·2^res) cells,
a COMPILE-TIME constant), the exact-distance filter prunes the corners, and
ONE groupBy(cell) with map-side partial aggregation collapses everything to
at most 4^res output rows. No self-join, no driver loop; at 100 TB the
fan-out is a constant factor on the scan and the shuffle carries only
(cell, partial-sum) pairs. This mirrors how the reference's per-cluster
summarize gathers bounded neighborhoods (raptor/cluster_tree_builder.py:
106-114) — recast from cluster membership to metric proximity.

Every float op is twin-pinned (exp from sqlgen's bit-exact twin; cross-row
sums in DECIMAL), so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.grid import COORD_BITS, RES_SHIFT


def _plan(res: int, bandwidth: float, cutoff: float) -> tuple[int, int, float, float, float]:
    """(n, radius_cells, cell_size, r2, two_h2) — Python-computed constants
    shared verbatim by the Column and SQL twins."""
    n = 1 << res
    s = 1.0 / n  # exact power of two
    rad = cutoff * bandwidth
    radius_cells = int(math.ceil(rad / s))
    return n, radius_cells, s, rad * rad, 2.0 * (bandwidth * bandwidth)


def kde_heatmap(
    pts: DataFrame,
    res: int,
    bandwidth: float,
    cutoff: float = 3.0,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(cell_id, ix, iy, n_pts, density) — truncated-Gaussian KDE per cell.

    pts carries planar coords in [0,1)² (columns ``x_col``/``y_col``)."""
    n, R, s, r2, two_h2 = _plan(res, bandwidth, cutoff)
    x, y = F.col(x_col), F.col(y_col)
    ix0 = F.greatest(F.least(F.floor(x * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0))
    iy0 = F.greatest(F.least(F.floor(y * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0))
    cand = (
        pts.select(x.alias("x"), y.alias("y"), ix0.alias("ix0"), iy0.alias("iy0"))
        .select(
            "x",
            "y",
            "iy0",
            F.explode(
                F.sequence(F.greatest(F.col("ix0") - R, F.lit(0)), F.least(F.col("ix0") + R, F.lit(n - 1)))
            ).alias("ix"),
        )
        .select(
            "x",
            "y",
            "ix",
            F.explode(
                F.sequence(F.greatest(F.col("iy0") - R, F.lit(0)), F.least(F.col("iy0") + R, F.lit(n - 1)))
            ).alias("iy"),
        )
    )
    cx = (F.col("ix").cast("double") + F.lit(0.5)) * F.lit(s)
    cy = (F.col("iy").cast("double") + F.lit(0.5)) * F.lit(s)
    dx = cx - F.col("x")
    dy = cy - F.col("y")
    d2 = dx * dx + dy * dy
    arg = -(F.col("d2") / F.lit(two_h2))
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return (
        cand.withColumn("d2", d2)
        .where(F.col("d2") <= F.lit(r2))
        .withColumn("contrib", G.exp_col(arg))
        .groupBy("ix", "iy")
        .agg(
            F.count("*").alias("n_pts"),
            F.sum(F.col("contrib").cast("decimal(28,15)")).cast("double").alias("density"),
        )
        .select(cell.alias("cell_id"), "ix", "iy", "n_pts", "density")
    )


def focal_mean(
    raster: DataFrame,
    res: int,
    radius: int = 1,
    value_col: str = "density",
) -> DataFrame:
    """(cell_id, ix, iy, n_cells, mean) — sparse focal mean (map algebra).

    The classic raster neighborhood operation (smoothing / focal statistics):
    each populated cell contributes its value to every cell within the
    (2·radius+1)² window, and each target averages over the populated cells
    it received (absent cells are absent, not zero — the sparse-raster
    convention). Same bounded fan-out + one groupBy shape as kde_heatmap:
    at 4^res ≤ cells ≪ corpus size this is metadata-scale work."""
    n = 1 << res
    nb = (
        raster.select("ix", "iy", F.col(value_col).alias("v"))
        .select("ix", "iy", "v", F.explode(F.sequence(F.lit(-radius), F.lit(radius))).alias("dx"))
        .select("ix", "iy", "v", "dx", F.explode(F.sequence(F.lit(-radius), F.lit(radius))).alias("dy"))
        .select((F.col("ix") + F.col("dx")).alias("tix"), (F.col("iy") + F.col("dy")).alias("tiy"), "v")
        .where((F.col("tix") >= 0) & (F.col("tix") <= n - 1) & (F.col("tiy") >= 0) & (F.col("tiy") <= n - 1))
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    return (
        nb.groupBy("tix", "tiy")
        .agg(
            F.count("*").alias("n_cells"),
            (
                F.sum(F.col("v").cast("decimal(28,15)")).cast("double")
                / F.count("*").cast("double")
            ).alias("mean"),
        )
        .select(cell.alias("cell_id"), F.col("tix").alias("ix"), F.col("tiy").alias("iy"), "n_cells", "mean")
    )


def focal_mean_sql(raster_sql: str, res: int, radius: int = 1, value_col: str = "density") -> str:
    """DuckDB twin of :func:`focal_mean`. ``raster_sql`` must select ix, iy
    and ``value_col``."""
    n = 1 << res
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (tix << {COORD_BITS}) | tiy)"
    return f"""
WITH r AS ({raster_sql}),
nx AS (SELECT iy, {value_col} AS v, (ix + unnest(generate_series(-{radius}, {radius}))) AS tix FROM r),
ny AS (SELECT tix, v, (iy + unnest(generate_series(-{radius}, {radius}))) AS tiy FROM nx),
f AS (SELECT tix, tiy, v FROM ny
      WHERE tix >= 0 AND tix <= {n - 1} AND tiy >= 0 AND tiy <= {n - 1})
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CAST(v AS DECIMAL(28,15))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
FROM f GROUP BY tix, tiy
"""


def build_pyramid(
    raster: DataFrame,
    res: int,
    min_res: int = 0,
    value_col: str = "density",
) -> DataFrame:
    """(res, cell_id, ix, iy, n_leaves, value): the full tile pyramid.

    Aggregates a sparse raster up the quadtree parent chain — each level
    halves the grid and sums the four children (web-map tile pyramids,
    hypertable-style rollups; the raster twin of build_tree's level loop,
    reference raptor/tree_builder.py:125-139's layer recursion). The loop is
    driver-side over ≤ res levels; each level is ONE groupBy whose key is a
    bit-shift of the previous level's key, so every shuffle is strictly
    smaller than the last and partial aggregation collapses map-side.
    Value sums go through exact DECIMAL per level (deterministic
    level-by-level semantics, mirrored verbatim by the SQL twin);
    n_leaves counts the populated base-resolution cells under each tile."""
    base = raster.select(
        F.lit(res).cast("int").alias("res"),
        F.col("ix").cast("long").alias("ix"),
        F.col("iy").cast("long").alias("iy"),
        F.lit(1).cast("long").alias("n_leaves"),
        F.col(value_col).cast("double").alias("value"),
    )
    levels = [base]
    cur = base
    for r in range(res - 1, min_res - 1, -1):
        cur = (
            cur.select(
                F.shiftright(F.col("ix"), 1).alias("ix"),
                F.shiftright(F.col("iy"), 1).alias("iy"),
                "n_leaves",
                "value",
            )
            .groupBy("ix", "iy")
            .agg(
                F.sum("n_leaves").alias("n_leaves"),
                F.sum(F.col("value").cast("decimal(28,15)")).cast("double").alias("value"),
            )
            .select(F.lit(r).cast("int").alias("res"), "ix", "iy", "n_leaves", "value")
        )
        levels.append(cur)
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    cell = (
        F.shiftleft(F.col("res").cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return out.select("res", cell.alias("cell_id"), "ix", "iy", "n_leaves", "value")


def build_pyramid_sql(
    raster_sql: str, res: int, min_res: int = 0, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`build_pyramid`. ``raster_sql`` selects ix, iy
    and ``value_col``."""
    ctes = [
        f"l{res} AS (SELECT {res} AS res, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy, "
        f"1::BIGINT AS n_leaves, CAST({value_col} AS DOUBLE) AS value FROM ({raster_sql}))"
    ]
    for r in range(res - 1, min_res - 1, -1):
        ctes.append(
            f"l{r} AS (SELECT {r} AS res, ix, iy, CAST(sum(n_leaves) AS BIGINT) AS n_leaves, "
            f"CAST(sum(CAST(value AS DECIMAL(28,15))) AS DOUBLE) AS value "
            f"FROM (SELECT (ix >> 1) AS ix, (iy >> 1) AS iy, n_leaves, value FROM l{r + 1}) "
            f"GROUP BY ix, iy)"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT res, ix, iy, n_leaves, value FROM l{r}" for r in range(res, min_res - 1, -1)
    )
    cell = f"((CAST(res AS BIGINT) << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH {', '.join(ctes)},
u AS ({union})
SELECT res, {cell} AS cell_id, ix, iy, n_leaves, value FROM u
"""


def hotspot_cells(
    focal: DataFrame,
    res: int,
    threshold: float,
) -> DataFrame:
    """(cell_id, ix, iy, mean, x0, y0, x1, y1): smoothed-density hotspots as
    vector cell boxes — the raster→vector tail of the heatmap stack
    (kde_heatmap → focal_mean → threshold → polygonize). The threshold is a
    Catalyst-pushable filter on the tiny raster; box corners are pure
    arithmetic on the cell indices."""
    s = 1.0 / (1 << res)
    ixd, iyd = F.col("ix").cast("double"), F.col("iy").cast("double")
    return focal.where(F.col("mean") > F.lit(threshold)).select(
        "cell_id",
        "ix",
        "iy",
        "mean",
        (ixd * F.lit(s)).alias("x0"),
        (iyd * F.lit(s)).alias("y0"),
        ((ixd + F.lit(1.0)) * F.lit(s)).alias("x1"),
        ((iyd + F.lit(1.0)) * F.lit(s)).alias("y1"),
    )


def hotspot_cells_sql(focal_sql: str, res: int, threshold: float) -> str:
    """DuckDB twin of :func:`hotspot_cells`. ``focal_sql`` selects cell_id,
    ix, iy, mean."""
    s = 1.0 / (1 << res)
    return f"""
SELECT cell_id, ix, iy, mean,
       (CAST(ix AS DOUBLE) * {s!r}) AS x0,
       (CAST(iy AS DOUBLE) * {s!r}) AS y0,
       ((CAST(ix AS DOUBLE) + 1.0) * {s!r}) AS x1,
       ((CAST(iy AS DOUBLE) + 1.0) * {s!r}) AS y1
FROM ({focal_sql}) WHERE mean > {threshold!r}
"""


def kde_heatmap_sql(
    pts_sql: str, res: int, bandwidth: float, cutoff: float = 3.0
) -> str:
    """DuckDB twin of :func:`kde_heatmap`. ``pts_sql`` must select x, y."""
    n, R, s, r2, two_h2 = _plan(res, bandwidth, cutoff)
    ix0 = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    iy0 = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    cx = f"((CAST(ix AS DOUBLE) + 0.5) * {s!r})"
    cy = f"((CAST(iy AS DOUBLE) + 0.5) * {s!r})"
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH pts AS ({pts_sql}),
home AS (SELECT x, y, {ix0} AS ix0, {iy0} AS iy0 FROM pts),
cx_ AS (SELECT x, y, iy0,
               unnest(generate_series(greatest(ix0 - {R}, 0), least(ix0 + {R}, {n - 1}))) AS ix
        FROM home),
cy_ AS (SELECT x, y, ix,
               unnest(generate_series(greatest(iy0 - {R}, 0), least(iy0 + {R}, {n - 1}))) AS iy
        FROM cx_),
d AS MATERIALIZED (
  SELECT ix, iy,
         (({cx} - x) * ({cx} - x) + ({cy} - y) * ({cy} - y)) AS d2
  FROM cy_),
f AS MATERIALIZED (
  SELECT ix, iy, (-(d2 / {two_h2!r})) AS arg FROM d WHERE d2 <= {r2!r})
SELECT {cell} AS cell_id, ix, iy,
       CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(CAST({G.exp_sql('arg')} AS DECIMAL(28,15))) AS DOUBLE) AS density
FROM f GROUP BY ix, iy
"""


def idw_surface(
    pts: DataFrame,
    res: int,
    eps: float = 1e-6,
    value_col: str = "v",
) -> DataFrame:
    """(cell_id, ix, iy, n_pts, idw) — inverse-distance-squared weighted
    interpolation (Shepard's method, power 2) of point values at cell
    centers, from the points in each cell's 3×3 neighborhood.

    The raster twin of the KDE: instead of summing a kernel, each point
    contributes w·v with w = 1/(eps + d²) and the cell value is Σw·v / Σw.
    Power 2 keeps the whole weight path in products and one division — no
    sqrt, no pow — and both cross-row sums go through exact DECIMAL, so the
    DuckDB twin hash-matches. Scale shape: 9× bounded fan-out (pure column
    arithmetic) then ONE map-side-combinable groupBy per output cell —
    identical to kde_heatmap with R = 1."""
    n = 1 << res
    s = 1.0 / float(n)
    x, y = F.col("x"), F.col("y")
    ix0 = F.greatest(F.least(F.floor(x * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0))
    iy0 = F.greatest(F.least(F.floor(y * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0))
    cand = (
        pts.select(x.alias("x"), y.alias("y"), F.col(value_col).alias("v"),
                   ix0.alias("ix0"), iy0.alias("iy0"))
        .select(
            "x", "y", "v", "iy0",
            F.explode(
                F.sequence(F.greatest(F.col("ix0") - 1, F.lit(0)), F.least(F.col("ix0") + 1, F.lit(n - 1)))
            ).alias("ix"),
        )
        .select(
            "x", "y", "v", "ix",
            F.explode(
                F.sequence(F.greatest(F.col("iy0") - 1, F.lit(0)), F.least(F.col("iy0") + 1, F.lit(n - 1)))
            ).alias("iy"),
        )
    )
    cx = (F.col("ix").cast("double") + F.lit(0.5)) * F.lit(s)
    cy = (F.col("iy").cast("double") + F.lit(0.5)) * F.lit(s)
    dx = cx - F.col("x")
    dy = cy - F.col("y")
    d2 = dx * dx + dy * dy
    w = F.lit(1.0) / (F.lit(eps) + d2)
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return (
        cand.withColumn("w", w)
        .groupBy("ix", "iy")
        .agg(
            F.count("*").alias("n_pts"),
            (
                F.sum((F.col("w") * F.col("v")).cast("decimal(28,15)")).cast("double")
                / F.sum(F.col("w").cast("decimal(28,15)")).cast("double")
            ).alias("idw"),
        )
        .select(cell.alias("cell_id"), "ix", "iy", "n_pts", "idw")
    )


def idw_surface_sql(pts_sql: str, res: int, eps: float = 1e-6) -> str:
    """DuckDB twin of :func:`idw_surface`. ``pts_sql`` must select x, y, v."""
    n = 1 << res
    s = 1.0 / float(n)
    ix0 = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    iy0 = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    cx = f"((CAST(ix AS DOUBLE) + 0.5) * {s!r})"
    cy = f"((CAST(iy AS DOUBLE) + 0.5) * {s!r})"
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH pts AS ({pts_sql}),
home AS (SELECT x, y, v, {ix0} AS ix0, {iy0} AS iy0 FROM pts),
cx_ AS (SELECT x, y, v, iy0,
               unnest(generate_series(greatest(ix0 - 1, 0), least(ix0 + 1, {n - 1}))) AS ix
        FROM home),
cy_ AS (SELECT x, y, v, ix,
               unnest(generate_series(greatest(iy0 - 1, 0), least(iy0 + 1, {n - 1}))) AS iy
        FROM cx_),
wt AS MATERIALIZED (
  SELECT ix, iy, v,
         (1.0 / ({eps!r} + (({cx} - x) * ({cx} - x) + ({cy} - y) * ({cy} - y)))) AS w
  FROM cy_)
SELECT {cell} AS cell_id, ix, iy,
       CAST(count(*) AS BIGINT) AS n_pts,
       (CAST(sum(CAST((w * v) AS DECIMAL(28,15))) AS DOUBLE)
        / CAST(sum(CAST(w AS DECIMAL(28,15))) AS DOUBLE)) AS idw
FROM wt GROUP BY ix, iy
"""


def local_moran(raster: DataFrame, res: int, value_col: str = "density") -> DataFrame:
    """(cell_id, ix, iy, z, lag_z, n_nb, moran_i): local Moran's I spatial
    autocorrelation per populated raster cell — the standard hotspot/coldspot
    LISA statistic (Anselin). For cell i with deviation z_i = v_i − μ:

        I_i = z_i · mean(z over populated 8-neighbors) / m2,   m2 = Σz²/n

    High positive I_i = a cluster (hot-hot or cold-cold); negative = a
    spatial outlier. Plan: two metadata-scale global aggregates broadcast
    back via crossJoin (the raster is ≤ 4^res rows regardless of corpus
    size), then the same bounded neighbor fan-out + ONE groupBy as
    focal_mean. Cells with no populated neighbor are dropped (lag undefined
    — the sparse-raster convention). Cross-row sums in exact DECIMAL; every
    division order is pinned and mirrored by the SQL twin.
    """
    n = 1 << res
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    g1 = base.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.col("v").cast("decimal(28,15)")).cast("double").alias("sv"),
    )
    withz = (
        base.crossJoin(F.broadcast(g1))
        .withColumn("mu", F.col("sv") / F.col("n_cells").cast("double"))
        .withColumn("z", F.col("v") - F.col("mu"))
        .select("ix", "iy", "z", "n_cells")
    )
    g2 = withz.agg(
        F.sum((F.col("z") * F.col("z")).cast("decimal(28,15)")).cast("double").alias("szz"),
        F.max("n_cells").alias("nc"),
    ).select((F.col("szz") / F.col("nc").cast("double")).alias("m2"))
    nb = (
        withz.select("ix", "iy", "z")
        .select("ix", "iy", "z", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"))
        .select("ix", "iy", "z", "dx", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
        .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select((F.col("ix") + F.col("dx")).alias("tix"), (F.col("iy") + F.col("dy")).alias("tiy"), "z")
        .where((F.col("tix") >= 0) & (F.col("tix") <= n - 1) & (F.col("tiy") >= 0) & (F.col("tiy") <= n - 1))
    )
    lag = nb.groupBy("tix", "tiy").agg(
        F.count("*").alias("n_nb"),
        (
            F.sum(F.col("z").cast("decimal(28,15)")).cast("double")
            / F.count("*").cast("double")
        ).alias("lag_z"),
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return (
        withz.join(lag, (F.col("ix") == F.col("tix")) & (F.col("iy") == F.col("tiy")))
        .crossJoin(F.broadcast(g2))
        .select(
            cell.alias("cell_id"),
            "ix",
            "iy",
            "z",
            "lag_z",
            "n_nb",
            ((F.col("z") * F.col("lag_z")) / F.col("m2")).alias("moran_i"),
        )
    )


def local_moran_sql(raster_sql: str, res: int, value_col: str = "density") -> str:
    """DuckDB twin of :func:`local_moran`. ``raster_sql`` selects ix, iy and
    ``value_col``."""
    n = 1 << res
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (ix << {COORD_BITS}) | iy)"
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
g1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(CAST(v AS DECIMAL(28,15))) AS DOUBLE) AS sv FROM base),
withz AS (SELECT ix, iy, (v - (sv / CAST(n_cells AS DOUBLE))) AS z, n_cells
          FROM base CROSS JOIN g1),
g2 AS (SELECT (CAST(sum(CAST(z * z AS DECIMAL(28,15))) AS DOUBLE)
               / CAST(max(n_cells) AS DOUBLE)) AS m2 FROM withz),
nx AS (SELECT ix, iy, z, unnest(generate_series(-1, 1)) AS dx FROM withz),
ny AS (SELECT ix, iy, z, dx, unnest(generate_series(-1, 1)) AS dy FROM nx),
nb AS (SELECT (ix + dx) AS tix, (iy + dy) AS tiy, z FROM ny
       WHERE NOT (dx = 0 AND dy = 0)
         AND ix + dx >= 0 AND ix + dx <= {n - 1}
         AND iy + dy >= 0 AND iy + dy <= {n - 1}),
lag_ AS (SELECT tix, tiy, CAST(count(*) AS BIGINT) AS n_nb,
                CAST(sum(CAST(z AS DECIMAL(28,15))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS lag_z
         FROM nb GROUP BY tix, tiy)
SELECT {cell} AS cell_id, ix, iy, z, lag_z, n_nb,
       ((z * lag_z) / m2) AS moran_i
FROM withz JOIN lag_ ON ix = tix AND iy = tiy CROSS JOIN g2
"""


# ------------------------------------------------------------- Getis-Ord Gi*


def getis_ord(raster: DataFrame, res: int, value_col: str = "v") -> DataFrame:
    """(cell_id, ix, iy, w_sum, k_cells, gi_z): Getis-Ord Gi* hot/cold-spot
    z-scores over a raster — the classic local spatial statistic behind
    "hotspot analysis" tools, complementing local Moran's I (kde_moran) with
    a calibrated z-score: |z| > 2.58 ≈ 99% hotspot.

    Universe semantics: ALL 4^res cells of the grid, absent cells = 0 — the
    raster convention (Moran here uses the sparse one; both are standard).
    Global mean/std over the full grid come from the occupied cells' sums
    (zeros add nothing); the neighborhood weight count k_i is the in-bounds
    3x3 window size, computed from coordinates. Only cells within one step
    of an occupied cell are emitted (any farther cell has w=0 and the same
    baseline score — no information).

    Gi* = (W_i - x̄·k_i) / (s·sqrt((N·k_i - k_i²)/(N-1))), Ord & Getis 1995.

    Scale shape: identical to focal_mean — bounded 9x fan-out + one groupBy
    on metadata-scale cells; global stats are a broadcast 1-row aggregate.
    """
    n = 1 << res
    big_n = float(n * n)
    vd = F.col(value_col).cast("double")
    stats = raster.agg(
        F.sum(vd.cast("decimal(28,15)")).cast("double").alias("s1"),
        F.sum((vd * vd).cast("decimal(28,15)")).cast("double").alias("s2"),
    )
    nb = (
        raster.select("ix", "iy", vd.alias("vd"))
        .select("ix", "iy", "vd", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"))
        .select("ix", "iy", "vd", "dx", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
        .select((F.col("ix") + F.col("dx")).alias("tix"), (F.col("iy") + F.col("dy")).alias("tiy"), "vd")
        .where((F.col("tix") >= 0) & (F.col("tix") <= n - 1) & (F.col("tiy") >= 0) & (F.col("tiy") <= n - 1))
    )
    w = nb.groupBy("tix", "tiy").agg(
        F.sum(F.col("vd").cast("decimal(28,15)")).cast("double").alias("w_sum")
    )
    k = (
        (F.least(F.col("tix") + 1, F.lit(n - 1)) - F.greatest(F.col("tix") - 1, F.lit(0)) + 1)
        * (F.least(F.col("tiy") + 1, F.lit(n - 1)) - F.greatest(F.col("tiy") - 1, F.lit(0)) + 1)
    ).cast("long")
    mean = F.col("s1") / F.lit(big_n)
    var = F.col("s2") / F.lit(big_n) - mean * mean
    kd = F.col("k_cells").cast("double")
    gi = (F.col("w_sum") - mean * kd) / (
        F.sqrt(var)
        * F.sqrt((F.lit(big_n) * kd - kd * kd) / F.lit(big_n - 1.0))
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    return (
        w.withColumn("k_cells", k)
        .join(F.broadcast(stats))
        .select(
            cell.alias("cell_id"),
            F.col("tix").alias("ix"),
            F.col("tiy").alias("iy"),
            "w_sum",
            "k_cells",
            gi.alias("gi_z"),
        )
    )


def getis_ord_sql(raster_sql: str, res: int, value_col: str = "v") -> str:
    """DuckDB twin of :func:`getis_ord`. ``raster_sql`` must select ix, iy
    and ``value_col``."""
    n = 1 << res
    big_n = float(n * n)
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (tix << {COORD_BITS}) | tiy)"
    return f"""
WITH r AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS vd FROM ({raster_sql})),
stats AS (
  SELECT CAST(sum(CAST(vd AS DECIMAL(28,15))) AS DOUBLE) AS s1,
         CAST(sum(CAST(vd * vd AS DECIMAL(28,15))) AS DOUBLE) AS s2
  FROM r),
nx AS (SELECT iy, vd, (ix + unnest(generate_series(-1, 1))) AS tix FROM r),
ny AS (SELECT tix, vd, (iy + unnest(generate_series(-1, 1))) AS tiy FROM nx),
f AS (SELECT tix, tiy, vd FROM ny
      WHERE tix >= 0 AND tix <= {n - 1} AND tiy >= 0 AND tiy <= {n - 1}),
w AS (
  SELECT tix, tiy,
         CAST(sum(CAST(vd AS DECIMAL(28,15))) AS DOUBLE) AS w_sum,
         CAST((least(tix + 1, {n - 1}) - greatest(tix - 1, 0) + 1)
            * (least(tiy + 1, {n - 1}) - greatest(tiy - 1, 0) + 1) AS BIGINT) AS k_cells
  FROM f GROUP BY tix, tiy)
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy, w_sum, k_cells,
       ((w_sum - (s1 / {big_n!r}) * CAST(k_cells AS DOUBLE))
        / (sqrt(s2 / {big_n!r} - (s1 / {big_n!r}) * (s1 / {big_n!r}))
           * sqrt(({big_n!r} * CAST(k_cells AS DOUBLE)
                   - CAST(k_cells AS DOUBLE) * CAST(k_cells AS DOUBLE)) / {big_n - 1.0!r})))
         AS gi_z
FROM w CROSS JOIN stats
"""


# ------------------------------------------------------------ local Geary C


def local_geary(raster: DataFrame, res: int, value_col: str = "density") -> DataFrame:
    """(cell_id, ix, iy, z, n_nb, geary_c): local Geary's C spatial
    autocorrelation per populated raster cell — the LISA statistic that
    complements local Moran's I (kde_moran): Moran measures covariance with
    the neighborhood, Geary measures squared DIFFERENCE, so it flags edges
    and local heterogeneity that Moran's product form smooths over
    (Anselin 1995, §4). For cell i with deviation z_i = v_i − μ over the
    populated 8-neighborhood:

        c_i = mean((z_i − z_j)² over populated neighbors j) / m2,  m2 = Σz²/n

    Small c_i = locally homogeneous (cluster interior); large = an edge or
    outlier. Sparse convention as local_moran: only populated cells carry a
    value, cells with no populated neighbor are dropped.

    Plan shape (identical to local_moran, so it inherits the 100-TB
    argument): two metadata-scale global aggregates broadcast back via
    crossJoin, ONE bounded 8-neighbor fan-out, ONE groupBy on ≤4^res cells.
    The (z_i − z_j)² pairs are formed by mailing each source's z to its
    neighbors and joining the target's own z back at the groupBy — cross-row
    sums in exact DECIMAL so the DuckDB twin hash-matches."""
    n = 1 << res
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    g1 = base.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.col("v").cast("decimal(28,15)")).cast("double").alias("sv"),
    )
    withz = (
        base.crossJoin(F.broadcast(g1))
        .withColumn("z", F.col("v") - F.col("sv") / F.col("n_cells").cast("double"))
        .select("ix", "iy", "z", "n_cells")
    )
    g2 = withz.agg(
        F.sum((F.col("z") * F.col("z")).cast("decimal(28,15)")).cast("double").alias("szz"),
        F.max("n_cells").alias("nc"),
    ).select((F.col("szz") / F.col("nc").cast("double")).alias("m2"))
    nb = (
        withz.select("ix", "iy", "z")
        .select("ix", "iy", "z", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"))
        .select("ix", "iy", "z", "dx", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
        .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("ix") + F.col("dx")).alias("tix"),
            (F.col("iy") + F.col("dy")).alias("tiy"),
            F.col("z").alias("zj"),
        )
        .where((F.col("tix") >= 0) & (F.col("tix") <= n - 1) & (F.col("tiy") >= 0) & (F.col("tiy") <= n - 1))
    )
    diff = (
        withz.select(F.col("ix").alias("tix"), F.col("iy").alias("tiy"), F.col("z").alias("zi"))
        .join(nb, ["tix", "tiy"])
        .groupBy("tix", "tiy")
        .agg(
            F.count("*").alias("n_nb"),
            F.max("zi").alias("z"),  # zi is constant within the group
            (
                F.sum(((F.col("zi") - F.col("zj")) * (F.col("zi") - F.col("zj"))).cast("decimal(28,15)")).cast("double")
                / F.count("*").cast("double")
            ).alias("mean_sq_diff"),
        )
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    return diff.crossJoin(F.broadcast(g2)).select(
        cell.alias("cell_id"),
        F.col("tix").alias("ix"),
        F.col("tiy").alias("iy"),
        "z",
        "n_nb",
        (F.col("mean_sq_diff") / F.col("m2")).alias("geary_c"),
    )


def local_geary_sql(raster_sql: str, res: int, value_col: str = "density") -> str:
    """DuckDB twin of :func:`local_geary`. ``raster_sql`` selects ix, iy and
    ``value_col``."""
    n = 1 << res
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (tix << {COORD_BITS}) | tiy)"
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
g1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(CAST(v AS DECIMAL(28,15))) AS DOUBLE) AS sv FROM base),
withz AS (SELECT ix, iy, (v - sv / CAST(n_cells AS DOUBLE)) AS z, n_cells
          FROM base CROSS JOIN g1),
g2 AS (SELECT (CAST(sum(CAST(z * z AS DECIMAL(28,15))) AS DOUBLE)
               / CAST(max(n_cells) AS DOUBLE)) AS m2 FROM withz),
nx AS (SELECT ix, iy, z, unnest(generate_series(-1, 1)) AS dx FROM withz),
ny AS (SELECT ix, iy, z, dx, unnest(generate_series(-1, 1)) AS dy FROM nx),
nb AS (SELECT (ix + dx) AS tix, (iy + dy) AS tiy, z AS zj FROM ny
       WHERE NOT (dx = 0 AND dy = 0)
         AND ix + dx >= 0 AND ix + dx <= {n - 1}
         AND iy + dy >= 0 AND iy + dy <= {n - 1}),
diff AS (
  SELECT tix, tiy, CAST(count(*) AS BIGINT) AS n_nb, max(zi) AS z,
         CAST(sum(CAST((zi - zj) * (zi - zj) AS DECIMAL(28,15))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_sq_diff
  FROM (SELECT ix AS tix, iy AS tiy, z AS zi FROM withz) me
  JOIN nb USING (tix, tiy)
  GROUP BY tix, tiy)
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy, z, n_nb,
       (mean_sq_diff / m2) AS geary_c
FROM diff CROSS JOIN g2
"""


# ------------------------------------------------------------ semivariogram


def semivariogram(
    raster: DataFrame,
    res: int,
    max_lag_cells: int = 4,
    value_col: str = "density",
) -> DataFrame:
    """(d2_cells, lag_dist, n_pairs, gamma): the empirical semivariogram of a
    raster — the spatial-structure summary kriging and variography start
    from: γ(h) = mean((v_i − v_j)²)/2 over cell pairs at separation h.

    Lags are EXACT integer squared cell offsets (d2_cells = dx²+dy², 0 <
    d2 ≤ max_lag²) rather than float distance bins, so the bin key is pure
    integer arithmetic — no float binning to drift between engines —
    and lag_dist = sqrt(d2)·cell_size is derived per bin afterwards. Each
    unordered pair contributes twice (both directions), which cancels in the
    mean — the standard trick that keeps the fan-out join symmetric.

    Plan shape: each populated cell mails (z, target) to the O(max_lag²)
    offsets of its disc (a compile-time literal array — bounded fan-out, no
    self-join on data keys), one inner join back to the raster picks up the
    populated targets, ONE groupBy on ≤ max_lag² lag keys aggregates with
    exact DECIMAL sums. Output is O(max_lag²) rows regardless of corpus
    size; the shuffle carries (lag, partial) pairs only."""
    n = 1 << res
    s = 1.0 / float(n)
    offsets = [
        (dx, dy)
        for dx in range(-max_lag_cells, max_lag_cells + 1)
        for dy in range(-max_lag_cells, max_lag_cells + 1)
        if (dx or dy) and dx * dx + dy * dy <= max_lag_cells * max_lag_cells
    ]
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in offsets
            ]
        )
    )
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    nb = (
        base.select("ix", "iy", "v", off.alias("o"))
        .select(
            (F.col("ix") + F.col("o.dx")).alias("tix"),
            (F.col("iy") + F.col("o.dy")).alias("tiy"),
            (F.col("o.dx") * F.col("o.dx") + F.col("o.dy") * F.col("o.dy")).cast("long").alias("d2_cells"),
            F.col("v").alias("vi"),
        )
        .where((F.col("tix") >= 0) & (F.col("tix") <= n - 1) & (F.col("tiy") >= 0) & (F.col("tiy") <= n - 1))
    )
    return (
        nb.join(
            base.select(F.col("ix").alias("tix"), F.col("iy").alias("tiy"), F.col("v").alias("vj")),
            ["tix", "tiy"],
        )
        .groupBy("d2_cells")
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.sum(((F.col("vi") - F.col("vj")) * (F.col("vi") - F.col("vj"))).cast("decimal(28,15)")).cast("double")
                / (F.lit(2.0) * F.count("*").cast("double"))
            ).alias("gamma"),
        )
        .select(
            "d2_cells",
            (F.sqrt(F.col("d2_cells").cast("double")) * F.lit(s)).alias("lag_dist"),
            "n_pairs",
            "gamma",
        )
    )


def semivariogram_sql(
    raster_sql: str, res: int, max_lag_cells: int = 4, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`semivariogram`. ``raster_sql`` selects ix, iy
    and ``value_col``."""
    n = 1 << res
    s = 1.0 / float(n)
    offsets = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-max_lag_cells, max_lag_cells + 1)
        for dy in range(-max_lag_cells, max_lag_cells + 1)
        if (dx or dy) and dx * dx + dy * dy <= max_lag_cells * max_lag_cells
    )
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
o(dx, dy) AS (VALUES {offsets}),
nb AS (
  SELECT base.ix + o.dx AS tix, base.iy + o.dy AS tiy,
         CAST(o.dx * o.dx + o.dy * o.dy AS BIGINT) AS d2_cells,
         base.v AS vi
  FROM base, o
  WHERE base.ix + o.dx >= 0 AND base.ix + o.dx <= {n - 1}
    AND base.iy + o.dy >= 0 AND base.iy + o.dy <= {n - 1}),
paired AS (
  SELECT nb.d2_cells, nb.vi, t.v AS vj
  FROM nb JOIN base t ON t.ix = nb.tix AND t.iy = nb.tiy)
SELECT d2_cells,
       (sqrt(CAST(d2_cells AS DOUBLE)) * {s!r}) AS lag_dist,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CAST((vi - vj) * (vi - vj) AS DECIMAL(28,15))) AS DOUBLE)
         / (2.0 * CAST(count(*) AS DOUBLE)) AS gamma
FROM paired GROUP BY d2_cells
"""


def variogram_fit(vgram: DataFrame) -> DataFrame:
    """(n_lags, nugget, slope, r2): weighted least-squares fit of the LINEAR
    variogram model γ(h) = nugget + slope·h to the empirical semivariogram
    (:func:`semivariogram` output), weighted by pair counts — the
    variography step that turns the empirical cloud into the model kriging
    consumes, and a one-number spatial-structure summary (slope ≈ 0 means no
    spatial correlation structure).

    ONE global aggregate over the ≤max_lag² lag rows (exact DECIMAL partial
    sums, so the fold order can't drift between engines), closed-form 2-param
    WLS in the final projection — driver never sees data."""
    dec = "decimal(28,15)"
    w = F.col("n_pairs").cast("double")
    x = F.col("lag_dist")
    y = F.col("gamma")
    sums = vgram.agg(
        F.count("*").alias("n_lags"),
        F.sum(w.cast(dec)).cast("double").alias("sw"),
        F.sum((w * x).cast(dec)).cast("double").alias("swx"),
        F.sum((w * y).cast(dec)).cast("double").alias("swy"),
        F.sum((w * x * y).cast(dec)).cast("double").alias("swxy"),
        F.sum((w * x * x).cast(dec)).cast("double").alias("swxx"),
        F.sum((w * y * y).cast(dec)).cast("double").alias("swyy"),
    )
    slope = (F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")) / (
        F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    )
    out = sums.select("n_lags", "sw", "swx", "swy", "swxy", "swxx", "swyy", slope.alias("slope"))
    nugget = (F.col("swy") - F.col("slope") * F.col("swx")) / F.col("sw")
    out = out.withColumn("nugget", nugget)
    ss_tot = F.col("swyy") - F.col("swy") * F.col("swy") / F.col("sw")
    ss_res = (
        F.col("swyy")
        + F.col("nugget") * F.col("nugget") * F.col("sw")
        + F.col("slope") * F.col("slope") * F.col("swxx")
        + F.lit(2.0) * F.col("nugget") * F.col("slope") * F.col("swx")
        - F.lit(2.0) * F.col("nugget") * F.col("swy")
        - F.lit(2.0) * F.col("slope") * F.col("swxy")
    )
    return out.select(
        "n_lags", "nugget", "slope", (F.lit(1.0) - ss_res / ss_tot).alias("r2")
    )


def variogram_fit_sql(vgram_sql: str) -> str:
    """DuckDB twin of :func:`variogram_fit`. ``vgram_sql`` yields
    (lag_dist, n_pairs, gamma)."""
    dec = "DECIMAL(28,15)"
    return f"""
WITH v AS (SELECT CAST(n_pairs AS DOUBLE) AS w, lag_dist AS x, gamma AS y FROM ({vgram_sql})),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n_lags,
         CAST(sum(CAST(w AS {dec})) AS DOUBLE) AS sw,
         CAST(sum(CAST(w * x AS {dec})) AS DOUBLE) AS swx,
         CAST(sum(CAST(w * y AS {dec})) AS DOUBLE) AS swy,
         CAST(sum(CAST(w * x * y AS {dec})) AS DOUBLE) AS swxy,
         CAST(sum(CAST(w * x * x AS {dec})) AS DOUBLE) AS swxx,
         CAST(sum(CAST(w * y * y AS {dec})) AS DOUBLE) AS swyy
  FROM v),
fit AS (
  SELECT *, (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS slope FROM sums),
fit2 AS (
  SELECT *, (swy - slope * swx) / sw AS nugget FROM fit)
SELECT n_lags, nugget, slope,
       (1.0 - (swyy + nugget * nugget * sw + slope * slope * swxx
               + 2.0 * nugget * slope * swx - 2.0 * nugget * swy
               - 2.0 * slope * swxy)
            / (swyy - swy * swy / sw)) AS r2
FROM fit2
"""


# ---------------------------------------------------------------- terrain

def terrain_surface(
    raster: DataFrame,
    res: int,
    value_col: str = "density",
) -> DataFrame:
    """Raster terrain derivatives (Horn's method, the ArcGIS slope stencil):
    per populated cell the gradient (gx, gy), the slope TANGENT
    sqrt(gx²+gy²) (rise/run — the angle is a monotone transform left to the
    client; atan/atan2 libm results differ between engines so angles can't
    be twin-exact) and an analytic hillshade from the standard NW light
    (azimuth 315°, altitude 45°) — computed as a dot product with the unit
    normal, sqrt-only arithmetic, so the DuckDB twin hash-matches.

    Missing neighbors read as elevation 0 (the dense-zero convention — a
    density raster is implicitly 0 where no mass landed). Scatter shape:
    each populated cell mails its weighted value to its 8 neighbors, one
    groupBy sums the stencil with exact DECIMAL accumulation, and an inner
    join back to the raster keeps populated targets only. Metadata-scale at
    any corpus size (bounded by 4^res, not by rows)."""
    import math

    cs = 1.0 / (1 << res)  # cell size (exact power of two)
    n = 1 << res
    alt = math.radians(45.0)
    az = math.radians(315.0)
    lx, ly, lz = (
        math.cos(alt) * math.sin(az),
        math.cos(alt) * math.cos(az),
        math.sin(alt),
    )

    # (ox, oy) = source offset relative to target; Horn weights
    contribs = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            wx = ox * (1 if abs(oy) == 1 else 2)
            wy = oy * (1 if abs(ox) == 1 else 2)
            contribs.append((ox, oy, wx, wy))
    off = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ox).alias("ox"),
                    F.lit(oy).alias("oy"),
                    F.lit(wx).alias("wx"),
                    F.lit(wy).alias("wy"),
                )
                for ox, oy, wx, wy in contribs
            ]
        )
    )
    nb = (
        raster.select("ix", "iy", F.col(value_col).alias("v"))
        .select("ix", "iy", "v", off.alias("o"))
        .select(
            (F.col("ix") - F.col("o.ox")).alias("tix"),
            (F.col("iy") - F.col("o.oy")).alias("tiy"),
            (F.col("v") * F.col("o.wx")).cast("decimal(28,15)").alias("cx"),
            (F.col("v") * F.col("o.wy")).cast("decimal(28,15)").alias("cy"),
        )
        .where(
            (F.col("tix") >= 0)
            & (F.col("tix") <= n - 1)
            & (F.col("tiy") >= 0)
            & (F.col("tiy") <= n - 1)
        )
    )
    sums = nb.groupBy("tix", "tiy").agg(
        (F.sum("cx").cast("double") / F.lit(8.0 * cs)).alias("gx"),
        (F.sum("cy").cast("double") / F.lit(8.0 * cs)).alias("gy"),
    )
    base = raster.select(F.col("ix").alias("tix"), F.col("iy").alias("tiy"))
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    g2 = F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")
    shade = (
        F.lit(lx) * -F.col("gx") + F.lit(ly) * -F.col("gy") + F.lit(lz)
    ) / F.sqrt(g2 + 1.0)
    return (
        sums.join(base, ["tix", "tiy"])
        .select(
            cell.alias("cell_id"),
            F.col("tix").alias("ix"),
            F.col("tiy").alias("iy"),
            F.round("gx", 6).alias("gx"),
            F.round("gy", 6).alias("gy"),
            F.round(F.sqrt(g2), 6).alias("tan_slope"),
            F.round(shade, 6).alias("hillshade"),
        )
    )


def terrain_surface_sql(raster_sql: str, res: int, value_col: str = "density") -> str:
    """DuckDB twin of :func:`terrain_surface`."""
    import math

    cs = 1.0 / (1 << res)
    n = 1 << res
    alt = math.radians(45.0)
    az = math.radians(315.0)
    lx, ly, lz = (
        math.cos(alt) * math.sin(az),
        math.cos(alt) * math.cos(az),
        math.sin(alt),
    )
    vals = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            wx = ox * (1 if abs(oy) == 1 else 2)
            wy = oy * (1 if abs(ox) == 1 else 2)
            vals.append(f"({ox}, {oy}, {wx}, {wy})")
    offs = ", ".join(vals)
    cell = (
        f"(({res}::BIGINT << {RES_SHIFT}) | (CAST(tix AS BIGINT) << {COORD_BITS}) "
        "| CAST(tiy AS BIGINT))"
    )
    return f"""
WITH r AS ({raster_sql}),
o(ox, oy, wx, wy) AS (VALUES {offs}),
nb AS (
  SELECT r.ix - o.ox AS tix, r.iy - o.oy AS tiy,
         CAST(r.{value_col} * o.wx AS DECIMAL(28,15)) AS cx,
         CAST(r.{value_col} * o.wy AS DECIMAL(28,15)) AS cy
  FROM r, o
  WHERE r.ix - o.ox >= 0 AND r.ix - o.ox <= {n - 1}
    AND r.iy - o.oy >= 0 AND r.iy - o.oy <= {n - 1}
),
sums AS (
  SELECT tix, tiy,
         CAST(sum(cx) AS DOUBLE) / {8.0 * cs!r} AS gx,
         CAST(sum(cy) AS DOUBLE) / {8.0 * cs!r} AS gy
  FROM nb GROUP BY 1, 2
)
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy,
       round(gx, 6) AS gx, round(gy, 6) AS gy,
       round(sqrt(gx * gx + gy * gy), 6) AS tan_slope,
       round(({lx!r} * -gx + {ly!r} * -gy + {lz!r}) / sqrt(gx * gx + gy * gy + 1.0), 6)
         AS hillshade
FROM sums JOIN r ON r.ix = sums.tix AND r.iy = sums.tiy
"""


# ---------------------------------------------------------------- kriging

def kriging_surface(
    raster: DataFrame,
    res: int,
    rng: float = 0.08,
    nugget: float = 0.05,
    value_col: str = "density",
) -> DataFrame:
    """(cell_id, ix, iy, pred, kvar): SIMPLE KRIGING prediction at every
    unsampled cell within Chebyshev distance 2 of a sampled cell — the
    geostatistical tail of the variography stack (semivariogram →
    variogram_fit → kriging), i.e. the statistically-weighted upgrade of
    ``idw_surface``.

    Model: exponential covariance C(h) = exp(−h/rng) with a nugget on the
    diagonal, known mean = the global sample mean (simple kriging). Each
    target uses its k = 3 nearest samples (ties broken on (dist, ix, iy));
    targets with fewer than 3 candidate samples in the 5×5 window are
    dropped. The 3×3 system C·w = c is solved in closed form by Cramer's
    rule — determinants are explicit pinned-order polynomials and the
    covariances come from the twin ``exp``, so the DuckDB twin
    hash-matches bit-for-bit. ``kvar`` = (1+nugget) − wᵀc is the kriging
    variance (the model's own uncertainty raster band).

    Scale shape: one bounded 25× fan-out of the sample cells, one
    metadata-scale window rank, one pivot groupBy — everything runs on the
    ≤4^res cell table, never on the corpus; the mean is one exact-DECIMAL
    global aggregate broadcast to the cell table."""
    from ..functions.sqlgen import exp_col

    n = 1 << res
    s = 1.0 / float(n)
    diag = 1.0 + nugget
    samples = raster.select("ix", "iy", F.col(value_col).alias("z"))
    mu_df = samples.agg(
        (
            F.sum(F.col("z").cast("decimal(28,15)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu")
    )
    offs = F.explode(F.sequence(F.lit(-2), F.lit(2)))
    pairs = (
        samples.select(F.col("ix").alias("six"), F.col("iy").alias("siy"), "z")
        .select("six", "siy", "z", offs.alias("dx"))
        .select("six", "siy", "z", "dx", offs.alias("dy"))
        .select(
            (F.col("six") + F.col("dx")).alias("tix"),
            (F.col("siy") + F.col("dy")).alias("tiy"),
            "six",
            "siy",
            "z",
        )
        .where(
            (F.col("tix") >= 0)
            & (F.col("tix") <= n - 1)
            & (F.col("tiy") >= 0)
            & (F.col("tiy") <= n - 1)
        )
    )
    targets = (
        pairs.select("tix", "tiy")
        .distinct()
        .join(
            samples.select(
                F.col("ix").alias("tix"), F.col("iy").alias("tiy")
            ),
            ["tix", "tiy"],
            "left_anti",
        )
    )
    ddx = F.col("tix") - F.col("six")
    ddy = F.col("tiy") - F.col("siy")
    dist = F.sqrt((ddx * ddx + ddy * ddy).cast("double")) * F.lit(s)
    cand = pairs.join(targets, ["tix", "tiy"]).withColumn("d", dist)
    from pyspark.sql import Window

    rnw = Window.partitionBy("tix", "tiy").orderBy(
        F.col("d").asc(), F.col("six").asc(), F.col("siy").asc()
    )
    top = cand.withColumn("rn", F.row_number().over(rnw)).where(F.col("rn") <= 3)
    aggs = [F.count(F.lit(1)).alias("n_nb")]
    for j in (1, 2, 3):
        for c in ("six", "siy", "z", "d"):
            aggs.append(
                F.max(F.when(F.col("rn") == j, F.col(c))).alias(f"{c}{j}")
            )
    piv = top.groupBy("tix", "tiy").agg(*aggs).where(F.col("n_nb") == 3)

    def _pd(i: int, j: int):
        dx = F.col(f"six{i}") - F.col(f"six{j}")
        dy = F.col(f"siy{i}") - F.col(f"siy{j}")
        return F.sqrt((dx * dx + dy * dy).cast("double")) * F.lit(s)

    staged = piv.select(
        "tix",
        "tiy",
        "z1",
        "z2",
        "z3",
        (-(F.col("d1") / F.lit(rng))).alias("h1"),
        (-(F.col("d2") / F.lit(rng))).alias("h2"),
        (-(F.col("d3") / F.lit(rng))).alias("h3"),
        (-(_pd(1, 2) / F.lit(rng))).alias("g12"),
        (-(_pd(1, 3) / F.lit(rng))).alias("g13"),
        (-(_pd(2, 3) / F.lit(rng))).alias("g23"),
    ).localCheckpoint(eager=False)
    ex = staged.select(
        "tix",
        "tiy",
        "z1",
        "z2",
        "z3",
        exp_col(F.col("h1")).alias("c1"),
        exp_col(F.col("h2")).alias("c2"),
        exp_col(F.col("h3")).alias("c3"),
        exp_col(F.col("g12")).alias("e12"),
        exp_col(F.col("g13")).alias("e13"),
        exp_col(F.col("g23")).alias("e23"),
    ).localCheckpoint(eager=False)
    dg = F.lit(diag)
    det = (
        dg * (dg * dg - F.col("e23") * F.col("e23"))
        - F.col("e12") * (F.col("e12") * dg - F.col("e23") * F.col("e13"))
        + F.col("e13") * (F.col("e12") * F.col("e23") - dg * F.col("e13"))
    )
    w1n = (
        F.col("c1") * (dg * dg - F.col("e23") * F.col("e23"))
        - F.col("e12") * (F.col("c2") * dg - F.col("e23") * F.col("c3"))
        + F.col("e13") * (F.col("c2") * F.col("e23") - dg * F.col("c3"))
    )
    w2n = (
        dg * (F.col("c2") * dg - F.col("e23") * F.col("c3"))
        - F.col("c1") * (F.col("e12") * dg - F.col("e23") * F.col("e13"))
        + F.col("e13") * (F.col("e12") * F.col("c3") - F.col("c2") * F.col("e13"))
    )
    w3n = (
        dg * (dg * F.col("c3") - F.col("c2") * F.col("e23"))
        - F.col("e12") * (F.col("e12") * F.col("c3") - F.col("c2") * F.col("e13"))
        + F.col("c1") * (F.col("e12") * F.col("e23") - dg * F.col("e13"))
    )
    solved = ex.select(
        "tix",
        "tiy",
        "z1",
        "z2",
        "z3",
        "c1",
        "c2",
        "c3",
        (w1n / det).alias("w1"),
        (w2n / det).alias("w2"),
        (w3n / det).alias("w3"),
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    pred = F.col("mu") + (
        (
            F.col("w1") * (F.col("z1") - F.col("mu"))
            + F.col("w2") * (F.col("z2") - F.col("mu"))
        )
        + F.col("w3") * (F.col("z3") - F.col("mu"))
    )
    kvar = F.lit(diag) - (
        (F.col("w1") * F.col("c1") + F.col("w2") * F.col("c2"))
        + F.col("w3") * F.col("c3")
    )
    return solved.crossJoin(F.broadcast(mu_df)).select(
        cell.alias("cell_id"),
        F.col("tix").alias("ix"),
        F.col("tiy").alias("iy"),
        pred.alias("pred"),
        kvar.alias("kvar"),
    )


def kriging_surface_sql(
    raster_sql: str,
    res: int,
    rng: float = 0.08,
    nugget: float = 0.05,
    value_col: str = "density",
) -> str:
    """DuckDB twin of :func:`kriging_surface`."""
    from ..functions.sqlgen import exp_sql

    n = 1 << res
    s = 1.0 / float(n)
    diag = repr(1.0 + nugget)
    cell = (
        f"(({res}::BIGINT << {RES_SHIFT})"
        f" | (CAST(tix AS BIGINT) << {COORD_BITS}) | tiy)"
    )

    def pd_(i: int, j: int) -> str:
        return (
            f"(sqrt(CAST((six{i} - six{j}) * (six{i} - six{j})"
            f" + (siy{i} - siy{j}) * (siy{i} - siy{j}) AS DOUBLE)) * {s!r})"
        )

    pivot_cols = ", ".join(
        f"max(CASE WHEN rn = {j} THEN {c} END) AS {c}{j}"
        for j in (1, 2, 3)
        for c in ("six", "siy", "z", "d")
    )
    e = {k: exp_sql(k) for k in ("h1", "h2", "h3", "g12", "g13", "g23")}
    return f"""
WITH samples AS (SELECT ix, iy, {value_col} AS z FROM ({raster_sql})),
m AS (SELECT CAST(sum(CAST(z AS DECIMAL(28,15))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mu FROM samples),
pairs AS (
  SELECT s.ix + dx.dx AS tix, s.iy + dy.dy AS tiy, s.ix AS six, s.iy AS siy, s.z
  FROM samples s,
       (SELECT unnest(generate_series(-2, 2)) AS dx) dx,
       (SELECT unnest(generate_series(-2, 2)) AS dy) dy
  WHERE s.ix + dx.dx BETWEEN 0 AND {n - 1} AND s.iy + dy.dy BETWEEN 0 AND {n - 1}),
targets AS (
  SELECT DISTINCT tix, tiy FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM samples q WHERE q.ix = p.tix AND q.iy = p.tiy)),
cand AS (
  SELECT p.tix, p.tiy, p.six, p.siy, p.z,
         sqrt(CAST((p.tix - p.six) * (p.tix - p.six)
                   + (p.tiy - p.siy) * (p.tiy - p.siy) AS DOUBLE)) * {s!r} AS d
  FROM pairs p JOIN targets t ON t.tix = p.tix AND t.tiy = p.tiy),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY tix, tiy ORDER BY d ASC, six ASC, siy ASC) AS rn
    FROM cand) WHERE rn <= 3),
piv AS (
  SELECT tix, tiy, count(*) AS n_nb, {pivot_cols}
  FROM top GROUP BY tix, tiy HAVING count(*) = 3),
staged AS (
  SELECT tix, tiy, z1, z2, z3,
         (-(d1 / {rng!r})) AS h1, (-(d2 / {rng!r})) AS h2, (-(d3 / {rng!r})) AS h3,
         (-({pd_(1, 2)} / {rng!r})) AS g12,
         (-({pd_(1, 3)} / {rng!r})) AS g13,
         (-({pd_(2, 3)} / {rng!r})) AS g23
  FROM piv),
ex AS (
  SELECT tix, tiy, z1, z2, z3,
         {e['h1']} AS c1, {e['h2']} AS c2, {e['h3']} AS c3,
         {e['g12']} AS e12, {e['g13']} AS e13, {e['g23']} AS e23
  FROM staged),
solved AS (
  SELECT tix, tiy, z1, z2, z3, c1, c2, c3,
         ((c1 * ({diag} * {diag} - e23 * e23)
           - e12 * (c2 * {diag} - e23 * c3)
           + e13 * (c2 * e23 - {diag} * c3))
          / ({diag} * ({diag} * {diag} - e23 * e23)
             - e12 * (e12 * {diag} - e23 * e13)
             + e13 * (e12 * e23 - {diag} * e13))) AS w1,
         (({diag} * (c2 * {diag} - e23 * c3)
           - c1 * (e12 * {diag} - e23 * e13)
           + e13 * (e12 * c3 - c2 * e13))
          / ({diag} * ({diag} * {diag} - e23 * e23)
             - e12 * (e12 * {diag} - e23 * e13)
             + e13 * (e12 * e23 - {diag} * e13))) AS w2,
         (({diag} * ({diag} * c3 - c2 * e23)
           - e12 * (e12 * c3 - c2 * e13)
           + c1 * (e12 * e23 - {diag} * e13))
          / ({diag} * ({diag} * {diag} - e23 * e23)
             - e12 * (e12 * {diag} - e23 * e13)
             + e13 * (e12 * e23 - {diag} * e13))) AS w3
  FROM ex)
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy,
       (mu + ((w1 * (z1 - mu) + w2 * (z2 - mu)) + w3 * (z3 - mu))) AS pred,
       ({diag} - ((w1 * c1 + w2 * c2) + w3 * c3)) AS kvar
FROM solved, m
"""


def curvature_surface(
    raster: DataFrame,
    res: int,
    value_col: str = "density",
) -> DataFrame:
    """(cell_id, ix, iy, plan_c, prof_c): Zevenbergen-Thorne (1987) surface
    curvature — the second-derivative companion to :func:`terrain_surface`
    (ArcGIS "Curvature"): planform curvature (across-slope; + = diverging
    flow, ridges) and profile curvature (along-slope; + = accelerating
    flow) from the standard 9-term quadric fit on the 3×3 window:

        D=((z4+z6)/2−z5)/L², E=((z2+z8)/2−z5)/L², F=(−z1+z3+z7−z9)/4L²,
        G=(−z4+z6)/2L, H=(z2−z8)/2L
        plan = 2(DH²+EG²−FGH)/(G²+H²),  prof = −2(DG²+EH²+FGH)/(G²+H²)

    Flat cells (G²+H² = 0) report 0 — the ArcGIS convention. Missing
    neighbors read 0 (dense-zero). Same scatter shape as terrain_surface:
    each populated cell mails its value to the 9 window positions, ONE
    groupBy picks each z_k with max() (at most one source per slot — no
    float accumulation order at all), inner join keeps populated centers.
    """
    n = 1 << res
    inv_l = float(1 << res)        # 1/L, exact power of two
    inv_l2 = float(1 << (2 * res))  # 1/L²
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
                for ox in (-1, 0, 1)
                for oy in (-1, 0, 1)
            ]
        )
    )
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    nb = (
        base.select("ix", "iy", "v", offs.alias("o"))
        .select(
            (F.col("ix") + F.col("o.ox")).alias("tix"),
            (F.col("iy") + F.col("o.oy")).alias("tiy"),
            F.col("o.ox").alias("ox"),
            F.col("o.oy").alias("oy"),
            "v",
        )
        .where(
            (F.col("tix") >= 0) & (F.col("tix") < n)
            & (F.col("tiy") >= 0) & (F.col("tiy") < n)
        )
    )

    def slot(ox, oy):
        # source offset (ox,oy) relative to target: source = target+(ox,oy)
        # mails with o = -(ox,oy); at most one source per slot -> max()
        return F.coalesce(
            F.max(F.when((F.col("ox") == -ox) & (F.col("oy") == -oy), F.col("v"))),
            F.lit(0.0),
        )

    win = nb.groupBy("tix", "tiy").agg(
        slot(-1, 1).alias("z1"), slot(0, 1).alias("z2"), slot(1, 1).alias("z3"),
        slot(-1, 0).alias("z4"), slot(0, 0).alias("z5"), slot(1, 0).alias("z6"),
        slot(-1, -1).alias("z7"), slot(0, -1).alias("z8"), slot(1, -1).alias("z9"),
    )
    pop = base.select(F.col("ix").alias("tix"), F.col("iy").alias("tiy"))
    w = win.join(pop, ["tix", "tiy"])
    d_ = ((F.col("z4") + F.col("z6")) * F.lit(0.5) - F.col("z5")) * F.lit(inv_l2)
    e_ = ((F.col("z2") + F.col("z8")) * F.lit(0.5) - F.col("z5")) * F.lit(inv_l2)
    f_ = (
        (-F.col("z1") + F.col("z3") + F.col("z7") - F.col("z9"))
        * F.lit(0.25)
        * F.lit(inv_l2)
    )
    g_ = (-F.col("z4") + F.col("z6")) * F.lit(0.5) * F.lit(inv_l)
    h_ = (F.col("z2") - F.col("z8")) * F.lit(0.5) * F.lit(inv_l)
    staged = w.select(
        "tix", "tiy",
        d_.alias("dd"), e_.alias("ee"), f_.alias("ff"),
        g_.alias("gg"), h_.alias("hh"),
    )
    g2h2 = F.col("gg") * F.col("gg") + F.col("hh") * F.col("hh")
    plan = (
        F.lit(2.0)
        * (
            F.col("dd") * (F.col("hh") * F.col("hh"))
            + F.col("ee") * (F.col("gg") * F.col("gg"))
            - F.col("ff") * (F.col("gg") * F.col("hh"))
        )
        / g2h2
    )
    prof = (
        F.lit(-2.0)
        * (
            F.col("dd") * (F.col("gg") * F.col("gg"))
            + F.col("ee") * (F.col("hh") * F.col("hh"))
            + F.col("ff") * (F.col("gg") * F.col("hh"))
        )
        / g2h2
    )
    cell = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("tix"), COORD_BITS))
        .bitwiseOR(F.col("tiy"))
    )
    zero = g2h2 == F.lit(0.0)
    return staged.select(
        cell.alias("cell_id"),
        F.col("tix").alias("ix"),
        F.col("tiy").alias("iy"),
        F.round(F.when(zero, F.lit(0.0)).otherwise(plan), 6).alias("plan_c"),
        F.round(F.when(zero, F.lit(0.0)).otherwise(prof), 6).alias("prof_c"),
    )


def curvature_surface_sql(
    raster_sql: str, res: int, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`curvature_surface`."""
    n = 1 << res
    inv_l = float(1 << res)
    inv_l2 = float(1 << (2 * res))
    offs = ", ".join(
        f"({ox}, {oy})" for ox in (-1, 0, 1) for oy in (-1, 0, 1)
    )
    slots = ",\n         ".join(
        f"coalesce(max(CASE WHEN ox = {-ox} AND oy = {-oy} THEN v END), 0.0) AS z{k}"
        for k, (ox, oy) in enumerate(
            [(-1, 1), (0, 1), (1, 1), (-1, 0), (0, 0), (1, 0), (-1, -1), (0, -1), (1, -1)],
            start=1,
        )
    )
    cell = f"(({res}::BIGINT << {RES_SHIFT}) | (tix::BIGINT << {COORD_BITS}) | tiy::BIGINT)"
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
nb AS (
  SELECT ix + ox AS tix, iy + oy AS tiy, ox, oy, v
  FROM base, (VALUES {offs}) o(ox, oy)
  WHERE ix + ox >= 0 AND ix + ox < {n} AND iy + oy >= 0 AND iy + oy < {n}),
win AS (
  SELECT tix, tiy,
         {slots}
  FROM nb GROUP BY tix, tiy),
w AS (
  SELECT win.* FROM win JOIN base ON win.tix = base.ix AND win.tiy = base.iy),
staged AS (
  SELECT tix, tiy,
         (((z4 + z6) * 0.5 - z5) * {inv_l2!r}) AS dd,
         (((z2 + z8) * 0.5 - z5) * {inv_l2!r}) AS ee,
         ((-z1 + z3 + z7 - z9) * 0.25 * {inv_l2!r}) AS ff,
         ((-z4 + z6) * 0.5 * {inv_l!r}) AS gg,
         ((z2 - z8) * 0.5 * {inv_l!r}) AS hh
  FROM w)
SELECT {cell} AS cell_id, tix AS ix, tiy AS iy,
       round(CASE WHEN gg * gg + hh * hh = 0.0 THEN 0.0
                  ELSE 2.0 * (dd * (hh * hh) + ee * (gg * gg) - ff * (gg * hh))
                       / (gg * gg + hh * hh) END, 6) AS plan_c,
       round(CASE WHEN gg * gg + hh * hh = 0.0 THEN 0.0
                  ELSE -2.0 * (dd * (gg * gg) + ee * (hh * hh) + ff * (gg * hh))
                       / (gg * gg + hh * hh) END, 6) AS prof_c
FROM staged
"""


def raster_upsample(
    raster: DataFrame,
    res: int,
    value_col: str = "density",
) -> DataFrame:
    """(ix, iy, v): bilinear 2× upsample of a raster — res → res+1, the
    smooth "overzoom" a tile server renders when a client zooms past the
    deepest materialized level (GDAL/magic-kernel weights). Each fine cell
    center sits between its 2×2 coarse neighbors; the separable weights are
    (3/4, 1/4) per axis, so one coarse cell scatters to the 4×4 fine cells
    it influences with weights {9,3,3,1}/16.

    Scatter shape: 16× bounded fan-out over coarse-cell metadata, ONE
    groupBy with exact DECIMAL weight sums (weights are dyadic rationals —
    exact in binary), fine cells with no populated coarse neighbor are
    absent (sparse-raster convention)."""
    n_fine = 1 << (res + 1)
    # fine cell 2i+p (p∈{0,1}) receives from coarse i with axis weight 3/4
    # and from coarse i−1+2p (the neighbor on p's side) with weight 1/4.
    offs = []
    for px in (0, 1):
        for py in (0, 1):
            for (sx, wx) in ((0, 0.75), (2 * px - 1, 0.25)):
                for (sy, wy) in ((0, 0.75), (2 * py - 1, 0.25)):
                    offs.append((px, py, sx, sy, wx * wy))
    o = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(px).alias("px"), F.lit(py).alias("py"),
                    F.lit(sx).alias("sx"), F.lit(sy).alias("sy"),
                    F.lit(w).alias("w"),
                )
                for px, py, sx, sy, w in offs
            ]
        )
    )
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    fan = (
        base.select("ix", "iy", "v", o.alias("o"))
        .select(
            (2 * (F.col("ix") - F.col("o.sx")) + F.col("o.px")).alias("fx"),
            (2 * (F.col("iy") - F.col("o.sy")) + F.col("o.py")).alias("fy"),
            (F.col("v") * F.col("o.w")).alias("wv"),
        )
        .where(
            (F.col("fx") >= 0) & (F.col("fx") < n_fine)
            & (F.col("fy") >= 0) & (F.col("fy") < n_fine)
        )
    )
    return (
        fan.groupBy(F.col("fx").alias("ix"), F.col("fy").alias("iy"))
        .agg(
            F.round(
                F.sum(F.col("wv").cast("decimal(28,15)")).cast("double"), 6
            ).alias("v")
        )
    )


def raster_upsample_sql(
    raster_sql: str, res: int, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`raster_upsample`."""
    n_fine = 1 << (res + 1)
    offs = []
    for px in (0, 1):
        for py in (0, 1):
            for (sx, wx) in ((0, 0.75), (2 * px - 1, 0.25)):
                for (sy, wy) in ((0, 0.75), (2 * py - 1, 0.25)):
                    offs.append(f"({px}, {py}, {sx}, {sy}, {wx * wy!r})")
    vals = ", ".join(offs)
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
fan AS (
  SELECT 2 * (ix - sx) + px AS fx, 2 * (iy - sy) + py AS fy, v * w AS wv
  FROM base, (VALUES {vals}) o(px, py, sx, sy, w)
  WHERE 2 * (ix - sx) + px >= 0 AND 2 * (ix - sx) + px < {n_fine}
    AND 2 * (iy - sy) + py >= 0 AND 2 * (iy - sy) + py < {n_fine})
SELECT fx AS ix, fy AS iy,
       round(CAST(sum(CAST(wv AS DECIMAL(28,15))) AS DOUBLE), 6) AS v
FROM fan GROUP BY fx, fy
"""


def global_autocorr(
    raster: DataFrame,
    res: int,
    value_col: str = "density",
) -> DataFrame:
    """ONE row (n_cells, w_sum, moran_i, geary_c): the GLOBAL Moran's I and
    Geary's C over rook-adjacent populated raster cells — the single-number
    companions of the local LISA bands (local_moran / local_geary):

        I = (n/W)·Σ w_ij·z_i·z_j / Σ z²          (z = v − mean)
        C = ((n−1)/2W)·Σ w_ij·(v_i − v_j)² / Σ z²

    I → +1 clustered / −1 checkerboard; C < 1 clustered, > 1 dispersed.
    Adjacency: rook edges between POPULATED cells via the east/south probe
    (each undirected edge once; W counts both directions, so W = 2·edges).

    Scale shape: the raster is already cell metadata; two global DECIMAL
    aggregates broadcast back, one edge probe join, one final reduce."""
    base = raster.select("ix", "iy", F.col(value_col).cast("double").alias("v"))
    g1 = base.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.col("v").cast("decimal(28,15)")).cast("double").alias("sv"),
    )
    withz = (
        base.crossJoin(F.broadcast(g1))
        .withColumn("z", F.col("v") - F.col("sv") / F.col("n_cells").cast("double"))
        .select("ix", "iy", "v", "z", "n_cells")
    )
    g2 = withz.agg(
        F.sum((F.col("z") * F.col("z")).cast("decimal(28,15)")).cast("double").alias("szz"),
        F.max("n_cells").alias("n_cells"),
    )
    probes = withz.select(
        F.col("v").alias("v1"), F.col("z").alias("z1"),
        F.explode(
            F.array(
                F.struct((F.col("ix") + 1).alias("tx"), F.col("iy").alias("ty")),
                F.struct(F.col("ix").alias("tx"), (F.col("iy") + 1).alias("ty")),
            )
        ).alias("t"),
    ).select("v1", "z1", F.col("t.tx").alias("tx"), F.col("t.ty").alias("ty"))
    edges = probes.join(
        withz.select(
            F.col("ix").alias("tx"), F.col("iy").alias("ty"),
            F.col("v").alias("v2"), F.col("z").alias("z2"),
        ),
        ["tx", "ty"],
    )
    e_agg = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum((F.col("z1") * F.col("z2")).cast("decimal(28,15)")).cast("double").alias("szz12"),
        F.sum(
            ((F.col("v1") - F.col("v2")) * (F.col("v1") - F.col("v2"))).cast("decimal(28,15)")
        ).cast("double").alias("sdd"),
    )
    z = g2.crossJoin(F.broadcast(e_agg))
    n = F.col("n_cells").cast("double")
    w = F.lit(2.0) * F.col("n_edges").cast("double")
    # symmetric W: each undirected edge contributes both directions
    moran = (n / w) * (F.lit(2.0) * F.col("szz12")) / F.col("szz")
    geary = ((n - F.lit(1.0)) / (F.lit(2.0) * w)) * (
        F.lit(2.0) * F.col("sdd")
    ) / F.col("szz")
    return z.select(
        "n_cells",
        (F.col("n_edges") * 2).alias("w_sum"),
        F.round(moran, 6).alias("moran_i"),
        F.round(geary, 6).alias("geary_c"),
    )


def global_autocorr_sql(
    raster_sql: str, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`global_autocorr`."""
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v FROM ({raster_sql})),
g1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(CAST(v AS DECIMAL(28,15))) AS DOUBLE) AS sv
  FROM base),
withz AS (
  SELECT ix, iy, v, v - sv / CAST(n_cells AS DOUBLE) AS z, n_cells
  FROM base, g1),
g2 AS (
  SELECT CAST(sum(CAST(z * z AS DECIMAL(28,15))) AS DOUBLE) AS szz,
         max(n_cells) AS n_cells
  FROM withz),
probes AS (
  SELECT v AS v1, z AS z1, ix + dx AS tx, iy + dy AS ty
  FROM withz, (VALUES (1, 0), (0, 1)) o(dx, dy)),
edges AS (
  SELECT p.v1, p.z1, w.v AS v2, w.z AS z2
  FROM probes p JOIN withz w ON p.tx = w.ix AND p.ty = w.iy),
e_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(CAST(z1 * z2 AS DECIMAL(28,15))) AS DOUBLE) AS szz12,
         CAST(sum(CAST((v1 - v2) * (v1 - v2) AS DECIMAL(28,15))) AS DOUBLE) AS sdd
  FROM edges)
SELECT n_cells, n_edges * 2 AS w_sum,
       round((CAST(n_cells AS DOUBLE) / (2.0 * CAST(n_edges AS DOUBLE)))
             * (2.0 * szz12) / szz, 6) AS moran_i,
       round(((CAST(n_cells AS DOUBLE) - 1.0) / (2.0 * (2.0 * CAST(n_edges AS DOUBLE))))
             * (2.0 * sdd) / szz, 6) AS geary_c
FROM g2, e_agg
"""


def raster_crosstab(
    raster_a: DataFrame,
    raster_b: DataFrame,
    col_a: str,
    col_b: str,
    edges_a: tuple[float, ...],
    edges_b: tuple[float, ...],
) -> DataFrame:
    """Map-algebra cross-tabulation (the COMBINE/Tabulate-Area step): two
    rasters on the same (ix, iy) lattice, each classified by fixed bin
    edges, counted per class pair — (class_a, class_b, n_cells). The
    land-cover-vs-terrain contingency table, here density vs any second
    band. Cells present in only one raster are dropped (inner join on the
    lattice). Pure metadata: both inputs are ≤ 4^res rows."""

    def classify(col, edges):
        c = F.lit(0)
        for i, e in enumerate(edges):
            c = F.when(F.col(col) >= F.lit(float(e)), F.lit(i + 1)).otherwise(c)
        return c.cast("long")

    a = raster_a.select("ix", "iy", classify(col_a, edges_a).alias("class_a"))
    b = raster_b.select("ix", "iy", classify(col_b, edges_b).alias("class_b"))
    return (
        a.join(b, ["ix", "iy"])
        .groupBy("class_a", "class_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
    )


def raster_crosstab_sql(
    a_sql: str,
    b_sql: str,
    col_a: str,
    col_b: str,
    edges_a: tuple[float, ...],
    edges_b: tuple[float, ...],
) -> str:
    """DuckDB twin of :func:`raster_crosstab`."""
    from ..functions.hexgen import flit

    def classify(col, edges):
        expr = "0"
        for i, e in enumerate(edges):
            expr = f"CASE WHEN {col} >= {flit(float(e))} THEN {i + 1} ELSE {expr} END"
        return f"CAST({expr} AS BIGINT)"

    return f"""
WITH a AS (SELECT ix, iy, {classify(col_a, edges_a)} AS class_a FROM ({a_sql})),
b AS (SELECT ix, iy, {classify(col_b, edges_b)} AS class_b FROM ({b_sql}))
SELECT a.class_a, b.class_b, count(*)::BIGINT AS n_cells
FROM a JOIN b ON a.ix = b.ix AND a.iy = b.iy
GROUP BY a.class_a, b.class_b
"""
