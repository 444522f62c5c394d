"""Kulldorff spatial scan statistic — most-likely disease/anomaly clusters.

The reference has no scan statistic (its only "cluster quality" signal is
GMM/BIC, /root/reference/raptor/cluster_utils.py:34-43); this implements the
classic Kulldorff (1997) Poisson scan over the tile grid: find the circular
(here: square Chebyshev-ring) zone whose observed case count most exceeds
its population-share expectation, scored by the Poisson log-likelihood
ratio

    LLR(z) = c·ln(c/E) + (C−c)·ln((C−c)/(C−E))   if c/n > C/N else 0

with c = zone cases, n = zone points, C/N = study totals, E = C·n/N. This
is THE spatial-epidemiology statistic (SaTScan) and, over a web corpus,
flags tiles whose marked-page share (spam mark, language, recrawl failure)
is anomalously concentrated.

Scale shape — aggregate-first, never points-at-a-time:

1. ONE corpus-scale groupBy reduces points to per-cell (cases, total) at
   resolution ``res`` — after this everything runs on occupied-cell
   metadata (≤ 4^res rows).
2. Candidate zones are (center, radius ρ) for ρ = 0..rmax in Chebyshev
   rings: each occupied cell fans out to the (2·rmax+1)² centers it can
   contribute to (a bounded stencil over metadata, the kde_focal shape),
   carrying d = max(|dx|,|dy|); a groupBy (center, d) then ONE cumulative
   window over d turns ring sums into zone sums for every radius at once.
3. Study totals join in as a broadcast 1-row aggregate; the LLR is pure
   closed-form arithmetic; top-k is a TakeOrderedAndProject.

Determinism / twin-exactness: the LLR uses the from-scratch twin ln
(functions/sqlgen.py:ln_*) so scores are bit-identical Spark / DuckDB;
ln arguments are CASE-defaulted to 1.0 (twin ln(1.0) ≡ 0.0 exactly) on
gated branches so no engine ever evaluates ln(0); ordering ties broken by
(center, d) which is unique per zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..functions.hexgen import flit
from ..kernels.grid import COORD_BITS, RES_SHIFT

_MASK = (1 << COORD_BITS) - 1


def _offsets(rmax: int) -> list[tuple[int, int]]:
    return [
        (dx, dy)
        for dx in range(-rmax, rmax + 1)
        for dy in range(-rmax, rmax + 1)
    ]


def spatial_scan(
    pts: DataFrame,
    res: int = 4,
    rmax: int = 2,
    top_k: int = 15,
) -> DataFrame:
    """pts: (x, y, is_case) in [0,1)² with a boolean/0-1 case mark.

    Returns the ``top_k`` highest-LLR zones:
    (center, d, n_z, c_z, expect, llr, rank) — center is the zone's middle
    cell id at ``res``, d its Chebyshev radius in cells, n_z/c_z the zone
    point/case counts, expect the Poisson expectation E, llr the Kulldorff
    score (rounded 6dp for display; ordering uses the full double).
    """
    n_side = 1 << res
    cells = (
        pts.select(
            G.cell_col(F.col("x"), F.col("y"), res).alias("cell"),
            F.col("is_case").cast("long").alias("case1"),
        )
        .groupBy("cell")
        .agg(
            F.sum("case1").alias("cases"),
            F.count(F.lit(1)).alias("tot"),
        )
    ).localCheckpoint(eager=False)  # metadata; totals + fan would re-run the corpus groupBy
    totals = cells.agg(
        F.sum("cases").cast("long").alias("big_c"),
        F.sum("tot").cast("long").alias("big_n"),
    )

    offs = pts.sparkSession.createDataFrame(
        _offsets(rmax), "dx INT, dy INT"
    )
    ix = F.shiftrightunsigned(F.col("cell"), COORD_BITS).bitwiseAND(F.lit(_MASK))
    iy = F.col("cell").bitwiseAND(F.lit(_MASK))
    cx = ix + F.col("dx")
    cy = iy + F.col("dy")
    fan = (
        cells.crossJoin(F.broadcast(offs))
        .where((cx >= 0) & (cx < n_side) & (cy >= 0) & (cy < n_side))
        .select(
            (
                F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
                .bitwiseOR(F.shiftleft(cx.cast("long"), COORD_BITS))
                .bitwiseOR(cy.cast("long"))
            ).alias("center"),
            F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy"))).alias("d"),
            "cases",
            "tot",
        )
    )
    rings = fan.groupBy("center", "d").agg(
        F.sum("cases").alias("r_cases"), F.sum("tot").alias("r_tot")
    )
    w = (
        Window.partitionBy("center")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zones = rings.select(
        "center",
        "d",
        F.sum("r_cases").over(w).alias("c_z"),
        F.sum("r_tot").over(w).alias("n_z"),
    )

    z = zones.crossJoin(F.broadcast(totals))
    c = F.col("c_z").cast("double")
    n = F.col("n_z").cast("double")
    bc = F.col("big_c").cast("double")
    bn = F.col("big_n").cast("double")
    expect = bc * n / bn
    hot = F.col("c_z") * F.col("big_n") > F.col("big_c") * F.col("n_z")
    arg1 = F.when(hot, c / expect).otherwise(F.lit(1.0))
    arg2 = F.when(
        hot & (F.col("big_c") > F.col("c_z")), (bc - c) / (bc - expect)
    ).otherwise(F.lit(1.0))
    scored = z.select(
        "center",
        "d",
        "n_z",
        "c_z",
        expect.alias("expect_raw"),
        arg1.alias("a1"),
        arg2.alias("a2"),
        c.alias("cd"),
        (bc - c).alias("rd"),
    ).select(
        "center",
        "d",
        "n_z",
        "c_z",
        "expect_raw",
        (F.col("cd") * G.ln_col(F.col("a1")) + F.col("rd") * G.ln_col(F.col("a2"))).alias(
            "llr_full"
        ),
    )
    rw = Window.orderBy(F.col("llr_full").desc(), F.col("center"), F.col("d"))
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_k)
        .select(
            "center",
            "d",
            F.col("n_z").cast("long").alias("n_z"),
            F.col("c_z").cast("long").alias("c_z"),
            F.round("expect_raw", 6).alias("expect"),
            F.round("llr_full", 6).alias("llr"),
            "rank",
        )
    )


def spatial_scan_sql(
    pts_sql: str,
    res: int = 4,
    rmax: int = 2,
    top_k: int = 15,
) -> str:
    """DuckDB twin of :func:`spatial_scan`. ``pts_sql`` must yield
    (x, y, is_case)."""
    n_side = 1 << res
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _offsets(rmax))
    center = (
        f"(({res}::BIGINT << {RES_SHIFT}) | ((ix + dx)::BIGINT << {COORD_BITS})"
        f" | (iy + dy)::BIGINT)"
    )
    ok = f"(ix + dx >= 0 AND ix + dx < {n_side} AND iy + dy >= 0 AND iy + dy < {n_side})"
    return f"""
WITH p AS ({pts_sql}),
cells AS (
  SELECT {G.cell_sql('x', 'y', res)} AS cell,
         CAST(sum(CASE WHEN is_case THEN 1 ELSE 0 END) AS BIGINT) AS cases,
         CAST(count(*) AS BIGINT) AS tot
  FROM p GROUP BY 1),
totals AS (
  SELECT CAST(sum(cases) AS BIGINT) AS big_c, CAST(sum(tot) AS BIGINT) AS big_n
  FROM cells),
cc AS (
  SELECT cell, cases, tot,
         ((cell >> {COORD_BITS}) & {_MASK}) AS ix, (cell & {_MASK}) AS iy
  FROM cells),
offs(dx, dy) AS (VALUES {offs}),
fan AS (
  SELECT {center} AS center,
         greatest(abs(dx), abs(dy)) AS d, cases, tot
  FROM cc, offs WHERE {ok}),
rings AS (
  SELECT center, d, sum(cases) AS r_cases, sum(tot) AS r_tot
  FROM fan GROUP BY center, d),
zones AS (
  SELECT center, d,
         sum(r_cases) OVER (PARTITION BY center ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_z,
         sum(r_tot) OVER (PARTITION BY center ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_z
  FROM rings),
z AS (
  SELECT center, d, CAST(c_z AS BIGINT) AS c_z, CAST(n_z AS BIGINT) AS n_z,
         big_c, big_n,
         CAST(big_c AS DOUBLE) * CAST(n_z AS DOUBLE) / CAST(big_n AS DOUBLE)
           AS expect_raw,
         (c_z * big_n > big_c * n_z) AS hot
  FROM zones, totals),
args AS (
  SELECT center, d, c_z, n_z, expect_raw,
         CASE WHEN hot THEN CAST(c_z AS DOUBLE) / expect_raw ELSE 1.0 END AS a1,
         CASE WHEN hot AND big_c > c_z
              THEN (CAST(big_c AS DOUBLE) - CAST(c_z AS DOUBLE))
                   / (CAST(big_c AS DOUBLE) - expect_raw)
              ELSE 1.0 END AS a2,
         CAST(c_z AS DOUBLE) AS cd,
         CAST(big_c AS DOUBLE) - CAST(c_z AS DOUBLE) AS rd
  FROM z),
scored AS (
  SELECT center, d, n_z, c_z, expect_raw,
         (cd * {G.ln_sql('a1')} + rd * {G.ln_sql('a2')}) AS llr_full
  FROM args),
ranked AS (
  SELECT center, d, n_z, c_z, expect_raw, llr_full,
         row_number() OVER (ORDER BY llr_full DESC, center, d) AS rank
  FROM scored)
SELECT center, d, n_z, c_z,
       round(expect_raw, 6) AS expect, round(llr_full, 6) AS llr,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}
"""


def spacetime_scan(
    pts: DataFrame,
    res: int = 4,
    rmax: int = 2,
    wmax: int = 7,
    top_k: int = 15,
) -> DataFrame:
    """Prospective SPACE-TIME scan statistic (Kulldorff 2001, SaTScan's
    emerging-cluster mode): cylinders = (Chebyshev zone, trailing time
    window of w ∈ 1..``wmax`` day-buckets ending at the LATEST day), scored
    with the same Poisson LLR against the whole-study expectation — "is an
    excess of marked events emerging HERE, NOW?".

    pts: (x, y, ts, is_case). Returns top_k cylinders:
    (center, d, w, n_z, c_z, expect, llr, rank).

    Scale shape: ONE corpus groupBy to (cell, day) counts; the stencil
    fan-out and BOTH cumulations (over radius, then over trailing days)
    run on occupied-(cell, day) metadata; latest day is a broadcast 1-row
    aggregate. Same twin-ln LLR and CASE-defaulted arguments as
    :func:`spatial_scan`."""
    n_side = 1 << res
    day = F.floor(F.unix_timestamp("ts").cast("double") / F.lit(86400.0)).cast("long")
    cells = (
        pts.select(
            G.cell_col(F.col("x"), F.col("y"), res).alias("cell"),
            day.alias("day"),
            F.col("is_case").cast("long").alias("case1"),
        )
        .groupBy("cell", "day")
        .agg(F.sum("case1").alias("cases"), F.count(F.lit(1)).alias("tot"))
    ).localCheckpoint(eager=False)  # metadata; two consumers
    totals = cells.agg(
        F.sum("cases").cast("long").alias("big_c"),
        F.sum("tot").cast("long").alias("big_n"),
        F.max("day").alias("last_day"),
    )

    offs = pts.sparkSession.createDataFrame(_offsets(rmax), "dx INT, dy INT")
    ix = F.shiftrightunsigned(F.col("cell"), COORD_BITS).bitwiseAND(F.lit(_MASK))
    iy = F.col("cell").bitwiseAND(F.lit(_MASK))
    cx = ix + F.col("dx")
    cy = iy + F.col("dy")
    fan = (
        cells.crossJoin(F.broadcast(offs))
        .where((cx >= 0) & (cx < n_side) & (cy >= 0) & (cy < n_side))
        .select(
            (
                F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
                .bitwiseOR(F.shiftleft(cx.cast("long"), COORD_BITS))
                .bitwiseOR(cy.cast("long"))
            ).alias("center"),
            F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy"))).alias("d"),
            "day",
            "cases",
            "tot",
        )
    )
    rings = fan.groupBy("center", "d", "day").agg(
        F.sum("cases").alias("r_cases"), F.sum("tot").alias("r_tot")
    )
    wr = (
        Window.partitionBy("center", "day")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zone_day = rings.select(
        "center",
        "d",
        "day",
        F.sum("r_cases").over(wr).alias("zc"),
        F.sum("r_tot").over(wr).alias("zt"),
    )
    # trailing windows ending at the latest day: w = last_day - day + 1
    zd = (
        zone_day.crossJoin(F.broadcast(totals))
        .where(F.col("day") > F.col("last_day") - F.lit(wmax))
        .withColumn("w", (F.col("last_day") - F.col("day") + 1).cast("int"))
    )
    wt = (
        Window.partitionBy("center", "d")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cyl = zd.select(
        "center",
        "d",
        "w",
        "big_c",
        "big_n",
        F.sum("zc").over(wt).alias("c_z"),
        F.sum("zt").over(wt).alias("n_z"),
    )
    c = F.col("c_z").cast("double")
    bc = F.col("big_c").cast("double")
    bn = F.col("big_n").cast("double")
    expect = bc * F.col("n_z").cast("double") / bn
    hot = F.col("c_z") * F.col("big_n") > F.col("big_c") * F.col("n_z")
    arg1 = F.when(hot, c / expect).otherwise(F.lit(1.0))
    arg2 = F.when(
        hot & (F.col("big_c") > F.col("c_z")), (bc - c) / (bc - expect)
    ).otherwise(F.lit(1.0))
    scored = cyl.select(
        "center", "d", "w", "n_z", "c_z",
        expect.alias("expect_raw"),
        arg1.alias("a1"), arg2.alias("a2"),
        c.alias("cd"), (bc - c).alias("rd"),
    ).select(
        "center", "d", "w", "n_z", "c_z", "expect_raw",
        (F.col("cd") * G.ln_col(F.col("a1")) + F.col("rd") * G.ln_col(F.col("a2")))
        .alias("llr_full"),
    )
    rw = Window.orderBy(
        F.col("llr_full").desc(), F.col("center"), F.col("d"), F.col("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= top_k)
        .select(
            "center", "d", "w",
            F.col("n_z").cast("long").alias("n_z"),
            F.col("c_z").cast("long").alias("c_z"),
            F.round("expect_raw", 6).alias("expect"),
            F.round("llr_full", 6).alias("llr"),
            "rank",
        )
    )


def spacetime_scan_sql(
    pts_sql: str,
    res: int = 4,
    rmax: int = 2,
    wmax: int = 7,
    top_k: int = 15,
) -> str:
    """DuckDB twin of :func:`spacetime_scan`. ``pts_sql`` yields
    (x, y, ts, is_case)."""
    n_side = 1 << res
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _offsets(rmax))
    center = (
        f"(({res}::BIGINT << {RES_SHIFT}) | ((ix + dx)::BIGINT << {COORD_BITS})"
        f" | (iy + dy)::BIGINT)"
    )
    ok = f"(ix + dx >= 0 AND ix + dx < {n_side} AND iy + dy >= 0 AND iy + dy < {n_side})"
    return f"""
WITH p AS ({pts_sql}),
cells AS (
  SELECT {G.cell_sql('x', 'y', res)} AS cell,
         CAST(floor(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) / 86400.0)
              AS BIGINT) AS day,
         CAST(sum(CASE WHEN is_case THEN 1 ELSE 0 END) AS BIGINT) AS cases,
         CAST(count(*) AS BIGINT) AS tot
  FROM p GROUP BY 1, 2),
totals AS (
  SELECT CAST(sum(cases) AS BIGINT) AS big_c, CAST(sum(tot) AS BIGINT) AS big_n,
         max(day) AS last_day
  FROM cells),
cc AS (
  SELECT cell, day, cases, tot,
         ((cell >> {COORD_BITS}) & {_MASK}) AS ix, (cell & {_MASK}) AS iy
  FROM cells),
offs(dx, dy) AS (VALUES {offs}),
fan AS (
  SELECT {center} AS center, greatest(abs(dx), abs(dy)) AS d, day, cases, tot
  FROM cc, offs WHERE {ok}),
rings AS (
  SELECT center, d, day, sum(cases) AS r_cases, sum(tot) AS r_tot
  FROM fan GROUP BY center, d, day),
zone_day AS (
  SELECT center, d, day,
         sum(r_cases) OVER (PARTITION BY center, day ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zc,
         sum(r_tot) OVER (PARTITION BY center, day ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zt
  FROM rings),
zd AS (
  SELECT center, d, CAST(last_day - day + 1 AS INT) AS w, zc, zt, big_c, big_n
  FROM zone_day, totals WHERE day > last_day - {wmax}),
cyl AS (
  SELECT center, d, w, big_c, big_n,
         CAST(sum(zc) OVER (PARTITION BY center, d ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_z,
         CAST(sum(zt) OVER (PARTITION BY center, d ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_z
  FROM zd),
z AS (
  SELECT center, d, w, c_z, n_z, big_c, big_n,
         CAST(big_c AS DOUBLE) * CAST(n_z AS DOUBLE) / CAST(big_n AS DOUBLE)
           AS expect_raw,
         (c_z * big_n > big_c * n_z) AS hot
  FROM cyl),
args AS (
  SELECT center, d, w, c_z, n_z, expect_raw,
         CASE WHEN hot THEN CAST(c_z AS DOUBLE) / expect_raw ELSE 1.0 END AS a1,
         CASE WHEN hot AND big_c > c_z
              THEN (CAST(big_c AS DOUBLE) - CAST(c_z AS DOUBLE))
                   / (CAST(big_c AS DOUBLE) - expect_raw)
              ELSE 1.0 END AS a2,
         CAST(c_z AS DOUBLE) AS cd,
         CAST(big_c AS DOUBLE) - CAST(c_z AS DOUBLE) AS rd
  FROM z),
scored AS (
  SELECT center, d, w, n_z, c_z, expect_raw,
         (cd * {G.ln_sql('a1')} + rd * {G.ln_sql('a2')}) AS llr_full
  FROM args),
ranked AS (
  SELECT center, d, w, n_z, c_z, expect_raw, llr_full,
         row_number() OVER (ORDER BY llr_full DESC, center, d, w) AS rank
  FROM scored)
SELECT center, d, w, n_z, c_z,
       round(expect_raw, 6) AS expect, round(llr_full, 6) AS llr,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}
"""
