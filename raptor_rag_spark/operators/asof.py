"""As-of (backward) join — the time-series attribution join a web-events
pipeline needs (each conversion matched to the latest prior touch per user).

Not in the reference (which has no temporal operators); included as part of
the large-scale-pipeline operator family alongside dedup/similarity/text.

Scale design: the naive formulation is a range join (l.ts >= r.ts) whose
candidate set explodes quadratically per key. This implementation uses the
union + ordered-window trick instead: tag both sides, union, and carry the
last right-side payload forward with last_value(ignorenulls) over
(key ORDER BY ts, side) — ONE shuffle on the key, zero range explosion,
and AQE-skew-splittable because it is a plain window, not a join. The
DuckDB oracle uses the engine's native ASOF JOIN — a fully independent
implementation — so the contract check cross-validates two different
algorithms for the same semantics.

Tie semantics: a right row at exactly l.ts matches (inclusive), because the
right side sorts before the left at equal ts. Right-side (key, ts) pairs
are assumed unique (true for event streams with microsecond stamps); with
duplicates the later event_id wins deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    suffix: str = "_r",
) -> DataFrame:
    """For every left row: the right row with the greatest ts' <= ts for the
    same key (NULL-filled when no prior right row exists).

    Returns left's (key, ts_col, *left_cols) plus right's (ts_col, *right_cols)
    suffixed. Both inputs shuffle ONCE on ``key``."""
    # united schema: key, ts, side, left payload struct, right payload struct
    rpay_t = F.struct(F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols])
    l_u = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lp"),
        F.lit(None).cast(right.select(rpay_t.alias("_rp")).schema["_rp"].dataType).alias("_rp"),
    )
    r_u = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*[F.col(c) for c in left_cols]).alias("_lp")).schema["_lp"].dataType).alias("_lp"),
        rpay_t.alias("_rp"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_u.unionByName(r_u).withColumn(
        "_last_r", F.last("_rp", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        key,
        ts_col,
        *[F.col(f"_lp.{c}").alias(c) for c in left_cols],
        F.col(f"_last_r._rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str = "l_id",
    r_id: str = "r_id",
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval-overlap join (``l_start <= r_end AND r_start <= l_end``,
    epoch-second bounds, inclusive) as a BUCKETED EQUI-JOIN — the classic
    fix for Spark planning a range predicate as BroadcastNestedLoop/cartesian.

    Each interval explodes to the ``bucket_s``-wide time buckets it spans;
    the join runs on the bucket key (hash shuffle both sides, AQE-skew
    splittable), the exact overlap predicate filters the candidates, and
    each surviving pair is emitted ONCE by keeping only the bucket where the
    pair first co-exists (bucket == max of the two start buckets) — no
    distinct needed, so no second shuffle.

    Scale: work is O(intervals x spanned buckets + true pairs); pick
    ``bucket_s`` near the typical interval length so the explode factor
    stays small. Long-tail intervals fan out to more buckets but land in
    DIFFERENT partitions (bucket is the shuffle key), so a 1000x-length
    outlier costs extra rows, not a hot partition.

    Returns (l_id, r_id, overlap_s) with overlap_s = inclusive-bound
    overlap length in seconds (>= 0; touching endpoints = 0).
    """
    lb = F.floor(F.col(l_start) / bucket_s).cast("long")
    le_b = F.floor(F.col(l_end) / bucket_s).cast("long")
    rb = F.floor(F.col(r_start) / bucket_s).cast("long")
    re_b = F.floor(F.col(r_end) / bucket_s).cast("long")
    lx = left.select(
        l_id, l_start, l_end, F.explode(F.sequence(lb, le_b)).alias("_b"),
        lb.alias("_lb0"),
    )
    rx = right.select(
        r_id, r_start, r_end, F.explode(F.sequence(rb, re_b)).alias("_b"),
        rb.alias("_rb0"),
    )
    pairs = (
        lx.join(rx, "_b")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_b") == F.greatest(F.col("_lb0"), F.col("_rb0")))
        )
    )
    overlap = F.least(F.col(l_end), F.col(r_end)) - F.greatest(
        F.col(l_start), F.col(r_start)
    )
    return pairs.select(l_id, r_id, overlap.cast("long").alias("overlap_s"))


def attribution_linear(
    events: DataFrame,
    window_s: int = 7 * 86400,
    touch_type: str = "click",
    convert_type: str = "purchase",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value splits
    EQUALLY over the same user's touches in the trailing ``window_s``
    seconds (inclusive); conversions with no touch in window attribute to a
    NULL touch row so value totals reconcile. events: (user_id, event_id,
    event_type, ts, value). Returns (conv_id, touch_id, n_touches,
    credit).

    Scale shape: the per-user range join is the BUCKETED interval join
    (``interval_join`` semantics specialized to point-in-trailing-window,
    keyed by user): touches map to their time bucket, conversions explode
    to the ≤ window/bucket+1 buckets their window spans, and the join runs
    on (user_id, bucket) — hash shuffle, AQE-splittable, no theta-join."""
    bucket_s = window_s  # window spans ≤ 2 buckets at this width
    t = F.unix_timestamp("ts").cast("long")
    conv = events.where(F.col("event_type") == convert_type).select(
        F.col("user_id"), F.col("event_id").alias("conv_id"), t.alias("ct"),
        F.col("value").cast("double").alias("value"),
    )
    touch = events.where(F.col("event_type") == touch_type).select(
        F.col("user_id"), F.col("event_id").alias("touch_id"), t.alias("tt"),
    ).withColumn("_b", F.floor(F.col("tt") / bucket_s).cast("long"))
    cspan = conv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((F.col("ct") - window_s) / bucket_s).cast("long"),
                F.floor(F.col("ct") / bucket_s).cast("long"),
            )
        ),
    )
    pairs = cspan.join(touch, ["user_id", "_b"]).where(
        (F.col("tt") <= F.col("ct")) & (F.col("tt") >= F.col("ct") - window_s)
    )
    counts = pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches")
    )
    credited = (
        pairs.join(F.broadcast(counts), "conv_id")
        .select(
            "conv_id",
            "touch_id",
            "n_touches",
            F.round(F.col("value") / F.col("n_touches").cast("double"), 6).alias("credit"),
        )
    )
    orphans = conv.join(counts, conv["conv_id"] == counts["conv_id"], "left_anti").select(
        "conv_id",
        F.lit(None).cast("long").alias("touch_id"),
        F.lit(0).cast("long").alias("n_touches"),
        F.round(F.col("value"), 6).alias("credit"),
    )
    return credited.unionByName(orphans)


def attribution_linear_sql(
    events_sql: str,
    window_s: int = 7 * 86400,
    touch_type: str = "click",
    convert_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`attribution_linear` — plain theta-join oracle
    cross-validates the bucketed plan."""
    return f"""
WITH ev AS ({events_sql}),
conv AS (
  SELECT user_id, event_id AS conv_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ct, CAST(value AS DOUBLE) AS value
  FROM ev WHERE event_type = '{convert_type}'),
touch AS (
  SELECT user_id, event_id AS touch_id, CAST(floor(epoch(ts)) AS BIGINT) AS tt
  FROM ev WHERE event_type = '{touch_type}'),
pairs AS (
  SELECT c.conv_id, c.value, t.touch_id
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id AND t.tt <= c.ct AND t.tt >= c.ct - {window_s}),
counts AS (SELECT conv_id, count(*)::BIGINT AS n_touches FROM pairs GROUP BY conv_id)
SELECT p.conv_id, p.touch_id, n.n_touches,
       round(p.value / CAST(n.n_touches AS DOUBLE), 6) AS credit
FROM pairs p JOIN counts n ON n.conv_id = p.conv_id
UNION ALL
SELECT c.conv_id, CAST(NULL AS BIGINT), CAST(0 AS BIGINT), round(c.value, 6)
FROM conv c WHERE NOT EXISTS (SELECT 1 FROM counts n WHERE n.conv_id = c.conv_id)
"""
