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
