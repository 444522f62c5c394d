"""Exact distribution statistics: per-group quantiles by rank selection.

``approx_percentile`` sketches are the usual scale answer, but a corpus
curation report (token-length distribution per language, chunk-size audit,
shard balance) wants EXACT, engine-portable numbers — and exactness is what
makes the DuckDB oracle byte-match. Type-1 (lower) quantile: the value at
sorted position ``(n-1)·q // 100 + 1`` — pure integer arithmetic, identical
in both engines, no interpolation floats.

Scale shape: one rank window per group. Groups are metadata-scale (languages,
shards, hosts), so the per-group sort is the same shuffle any per-group
top-k already pays; for a single global group use a two-level rank (per-
partition counts → offset join) instead. Ties need no tiebreak: the value at
a sorted position is invariant to tie order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """(group, n, v_min, v_max, p<q>…): exact per-group quantiles.

    NULL values are excluded up front: Spark windows order NULLS FIRST while
    DuckDB defaults to NULLS LAST, so leaving them in would shift _rn and
    desync the twins (and quantiles over NULLs are meaningless anyway)."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    cw = Window.partitionBy(group_col)
    r = df.select(group_col, value_col).where(F.col(value_col).isNotNull()).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count("*").over(cw))
    picks = [
        F.max(
            F.when(
                F.col("_rn") == F.expr(f"((_n - 1) * {q}) div 100 + 1"),
                F.col(value_col),
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    return r.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        *picks,
    )


def group_quantiles_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    qs: Sequence[int] = (50, 90, 99),
) -> str:
    """DuckDB twin of :func:`group_quantiles`. ``src_sql`` must yield
    (``group_col``, ``value_col``)."""
    picks = ",\n       ".join(
        f"max(CASE WHEN _rn = ((_n - 1) * {q}) // 100 + 1 THEN {value_col} END) AS p{q}"
        for q in qs
    )
    return f"""
WITH t AS (
  SELECT {group_col}, {value_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS _rn,
         count(*) OVER (PARTITION BY {group_col}) AS _n
  FROM ({src_sql}) WHERE {value_col} IS NOT NULL)
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       min({value_col}) AS v_min, max({value_col}) AS v_max,
       {picks}
FROM t GROUP BY {group_col}
"""


# ---------------------------------------------------------------- Ripley's K

def ripley_k(
    points: DataFrame,
    radii: Sequence[float],
    id_col: str = "vec_id",
    area: float = 1.0,
) -> DataFrame:
    """Ripley's K and L functions at each radius — the classic
    point-pattern clustering-vs-dispersion statistic (K(r) above πr² ⇒
    clustered at scale r; below ⇒ dispersed).

    Naive (no edge-correction) estimator over the unit-square study area:
    K(r) = area · 2·|{i<j : d_ij < r}| / (n·(n−1)), L(r) = sqrt(K/π);
    ``l_minus_r`` > 0 flags clustering. One grid-pruned DWithin self-join at
    max(radii) (operators/pipjoin.py:dwithin_join — the only corpus-sized
    job), then each radius counts from the materialized pair distances;
    n·(n−1) comes from a broadcast 1-row count, no driver action.
    """
    import math

    rmax = max(radii)
    from .pipjoin import dwithin_join

    pairs = dwithin_join(points, rmax, id_col=id_col)
    n_df = points.agg(F.count(F.lit(1)).cast("double").alias("n_pts"))
    radii_df = points.sparkSession.createDataFrame(
        [(float(r),) for r in radii], "r double"
    )
    per_r = (
        pairs.crossJoin(F.broadcast(radii_df))
        .where(F.col("dist") < F.col("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lt"))
    )
    k = (
        F.lit(2.0 * area)
        * F.coalesce(F.col("n_lt"), F.lit(0)).cast("double")
        / (F.col("n_pts") * (F.col("n_pts") - 1.0))
    )
    out = (
        radii_df.join(per_r, "r", "left")
        .crossJoin(F.broadcast(n_df))
        .withColumn("k_est", k)
        .withColumn("l_est", F.sqrt(F.col("k_est") / F.lit(math.pi)))
    )
    return out.select(
        "r",
        F.coalesce("n_lt", F.lit(0)).cast("long").alias("n_pairs"),
        F.round("k_est", 9).alias("k_est"),
        F.round("l_est", 9).alias("l_est"),
        F.round(F.col("l_est") - F.col("r"), 9).alias("l_minus_r"),
    )


def ripley_k_sql(
    pts_sql: str,
    radii: Sequence[float],
    id_col: str = "vec_id",
    area: float = 1.0,
) -> str:
    """DuckDB twin of :func:`ripley_k` (quadratic pair join — the oracle
    formulation the pruned Spark join must match exactly)."""
    import math

    rmax = max(radii)
    rlist = ", ".join(repr(float(r)) for r in radii)
    return f"""
WITH pts AS MATERIALIZED ({pts_sql}),
pairs AS (
  SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
  FROM pts a JOIN pts b ON a.{id_col} < b.{id_col}
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        < {rmax!r} * {rmax!r}
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_pts FROM pts),
radii AS (SELECT CAST(unnest([{rlist}]) AS DOUBLE) AS r),
per_r AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_lt
  FROM radii JOIN pairs ON pairs.dist < radii.r GROUP BY r
),
scored AS (
  SELECT radii.r, coalesce(per_r.n_lt, 0) AS n_pairs,
         {2.0 * area!r} * CAST(coalesce(per_r.n_lt, 0) AS DOUBLE)
           / (n.n_pts * (n.n_pts - 1.0)) AS k_est
  FROM radii LEFT JOIN per_r USING (r), n
)
SELECT r, n_pairs, round(k_est, 9) AS k_est,
       round(sqrt(k_est / {math.pi!r}), 9) AS l_est,
       round(sqrt(k_est / {math.pi!r}) - r, 9) AS l_minus_r
FROM scored
"""
