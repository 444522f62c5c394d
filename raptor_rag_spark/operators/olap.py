"""Classic OLAP shapes the inventory still lacked: CUBE and RANGE frames.

- :func:`docs_cube` — GROUPING SETS/CUBE over (lang, source): every
  sub-total level in one pass (the A6 `cube('is_hard')` shape from
  SURVEY §2.4, generalized). Spark and DuckDB both plan cube as an
  Expand + single hash aggregate — one shuffle for all 2^k grouping sets.
- :func:`events_moving_avg` — event-time moving aggregates with a TRUE
  RANGE frame (RANGE BETWEEN n PRECEDING AND CURRENT ROW over epoch
  seconds): the frame is defined by VALUE distance, not row count, so
  irregular event spacing is handled exactly — the window-frame variant
  none of the ROWS-frame operators (cumulative_budget, W1) exercise.

Exactness: counts/sums are integers or DECIMAL; grouping-set null markers
are normalized to literal strings ('ALL') so the hash compare is
unambiguous across engines (Spark and DuckDB both emit NULL for rolled-up
dimensions; coalesce pins them)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def docs_cube(docs: DataFrame) -> DataFrame:
    """(lang, source, n_docs, total_chars, avg_chars) for every CUBE
    grouping set of (lang, source) — rolled-up dimensions read 'ALL'."""
    base = docs.select("lang", "source", F.col("n_chars").cast("long").alias("nc"))
    cubed = base.cube("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("total_chars"),
        F.round(
            F.sum(F.col("nc").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_chars"),
    )
    return cubed.select(
        F.coalesce("lang", F.lit("ALL")).alias("lang"),
        F.coalesce("source", F.lit("ALL")).alias("source"),
        "n_docs",
        "total_chars",
        "avg_chars",
    )


def docs_cube_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`docs_cube`."""
    return f"""
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       round(CAST(sum(CAST(nc AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS avg_chars
FROM (SELECT lang, source, CAST(n_chars AS BIGINT) AS nc FROM ({docs_sql}))
GROUP BY CUBE (lang, source)
"""


def events_moving_avg(
    events: DataFrame, window_s: int = 3600, top_k: int = 500
) -> DataFrame:
    """(event_id, user_id, t, n_win, avg_win, rank): per event, the count
    and exact average of `value` over the user's events in the trailing
    ``window_s`` seconds — a RANGE frame over epoch seconds, so the frame
    width is wall-clock, not row-count. Top-``top_k`` events by (n_win
    desc, event_id) keep the output bounded."""
    t = F.unix_timestamp("ts").cast("long")
    base = events.select("event_id", "user_id", t.alias("t"),
                         F.col("value").cast("double").alias("v"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-window_s, 0)
    )
    scored = base.select(
        "event_id",
        "user_id",
        "t",
        F.count(F.lit(1)).over(w).cast("long").alias("n_win"),
        F.round(
            F.sum(F.col("v").cast("decimal(28,15)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double"),
            6,
        ).alias("avg_win"),
    )
    # distributed top-k FIRST (TakeOrdered), THEN the rank window over
    # ≤ top_k rows — never a single-partition sort of every event
    top = scored.orderBy(F.desc("n_win"), "event_id").limit(top_k)
    rw = Window.orderBy(F.desc("n_win"), "event_id")
    return top.withColumn("rank", F.row_number().over(rw).cast("long"))


def events_moving_avg_sql(
    events_sql: str, window_s: int = 3600, top_k: int = 500
) -> str:
    """DuckDB twin of :func:`events_moving_avg`."""
    return f"""
WITH base AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(value AS DOUBLE) AS v
  FROM ({events_sql})),
scored AS (
  SELECT event_id, user_id, t,
         CAST(count(*) OVER win AS BIGINT) AS n_win,
         round(CAST(sum(CAST(v AS DECIMAL(28,15))) OVER win AS DOUBLE)
               / CAST(count(*) OVER win AS DOUBLE), 6) AS avg_win
  FROM base
  WINDOW win AS (PARTITION BY user_id ORDER BY t
                 RANGE BETWEEN {window_s} PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, t, n_win, avg_win,
       CAST(row_number() OVER (ORDER BY n_win DESC, event_id) AS BIGINT) AS rank
FROM scored QUALIFY rank <= {top_k}
"""
