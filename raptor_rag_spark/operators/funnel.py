"""Event-sequence analytics over the events stream: funnels and cohorts.

The product-analytics pair every event pipeline ships: ordered-step funnel
conversion (how many users did A, then B after A, then C after B — all inside
a window anchored at the first step) and cohort retention (of the users who
first appeared in week w, how many were active in week w+k).

Scale shape:
- ``funnel``: one filtered scan per step is avoided — a single scan feeds a
  per-(user, step) min-timestamp aggregate; the step chaining is K-1
  broadcast-sized joins on user_id (the per-step survivor tables only
  shrink). No window over the raw event stream, no collect.
- ``cohort_retention``: one scan → per-user first-week aggregate, one join
  back (user-keyed, AQE-broadcast when cohorts are small relative to
  events), one groupBy on the (cohort_week, week_offset) pair — both
  metadata-cardinality keys.

Exactness: timestamp arithmetic is integer epoch seconds on both engines
(no interval/timezone drift); conversion rates are one double division in a
pinned order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_S = 7 * 24 * 3600


def funnel(
    events: DataFrame,
    steps: list[str],
    window_s: int = 7 * 24 * 3600,
) -> DataFrame:
    """(step, event_type, users, conv_rate): strictly-ordered funnel. A user
    converts step k when their earliest step-k event falls strictly after
    their step-(k-1) conversion time and within ``window_s`` seconds of the
    step-1 anchor. ``conv_rate`` = users / step-1 users.

    Earliest-event semantics (min-timestamp per step, not any-path) is the
    standard deterministic funnel; it never misses a conversion for k=2 and
    is the fixed, engine-reproducible choice for deeper steps."""
    ep = F.col("ts").cast("timestamp_ltz").cast("long").alias("t")  # UTC, floors µs
    mins = (
        events.where(F.col("event_type").isin(steps))
        .select("user_id", "event_type", ep)
        .groupBy("user_id")
        .agg(
            *[
                F.min(F.when(F.col("event_type") == s, F.col("t"))).alias(f"t{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    # survivors per step: s0 = has t0; sk = s(k-1) and tk > conv(k-1) and
    # tk <= t0 + window. conv time for min-timestamp semantics is just tk.
    cond = F.col("t0").isNotNull()
    counts = []
    prev = "t0"
    for i, s in enumerate(steps):
        if i > 0:
            cond = (
                cond
                & F.col(f"t{i}").isNotNull()
                & (F.col(f"t{i}") > F.col(prev))
                & (F.col(f"t{i}") <= F.col("t0") + F.lit(window_s))
            )
            prev = f"t{i}"
        counts.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"u{i}")
        )
    agg = mins.agg(*counts)
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step"),
                        F.lit(s).alias("event_type"),
                        F.col(f"u{i}").alias("users"),
                        (
                            F.col(f"u{i}").cast("double")
                            / F.col("u0").cast("double")
                        ).alias("conv_rate"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step", "r.event_type", "r.users", "r.conv_rate")


def funnel_sql(
    events_sql: str, steps: list[str], window_s: int = 7 * 24 * 3600
) -> str:
    """DuckDB twin of :func:`funnel`. ``events_sql`` yields
    (user_id, event_type, ts)."""
    mins_cols = ", ".join(
        f"min(CASE WHEN event_type = '{s}' THEN t END) AS t{i}"
        for i, s in enumerate(steps)
    )
    conds = ["t0 IS NOT NULL"]
    for i in range(1, len(steps)):
        conds.append(
            f"{conds[i - 1]} AND t{i} IS NOT NULL AND t{i} > t{i - 1}"
            f" AND t{i} <= t0 + {window_s}"
        )
    ucols = ", ".join(
        f"CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS u{i}"
        for i, c in enumerate(conds)
    )
    sel = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, '{s}' AS event_type, u{i} AS users,"
        f" (CAST(u{i} AS DOUBLE) / CAST(u0 AS DOUBLE)) AS conv_rate FROM agg"
        for i, s in enumerate(steps)
    )
    quoted = ", ".join(f"'{s}'" for s in steps)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM ({events_sql}) WHERE event_type IN ({quoted})),
mins AS (SELECT user_id, {mins_cols} FROM ev GROUP BY user_id),
agg AS (SELECT {ucols} FROM mins)
{sel}
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, users, retention): of the users whose
    FIRST event falls in epoch-week w, how many were active k weeks later,
    as a fraction of the cohort. Weeks are floor(epoch/604800) — pure
    integer arithmetic, no calendar drift between engines."""
    ep = (F.unix_timestamp("ts") / F.lit(WEEK_S)).cast("long")
    weeks = events.select("user_id", ep.alias("wk"))
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = weeks.distinct()
    cell = (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
    )
    size = cell.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("users").alias("cohort_size")
    )
    return cell.join(size, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "users",
        (F.col("users").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


def cohort_retention_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`cohort_retention`. ``events_sql`` yields
    (user_id, ts)."""
    return f"""
WITH weeks AS (
  SELECT user_id, CAST(floor(CAST(epoch(ts) AS DOUBLE) / {WEEK_S}) AS BIGINT) AS wk
  FROM ({events_sql})),
first AS (SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id),
active AS (SELECT DISTINCT user_id, wk FROM weeks),
cell AS (
  SELECT f.cohort_week, (a.wk - f.cohort_week) AS week_offset,
         CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
  FROM active a JOIN first f USING (user_id)
  GROUP BY f.cohort_week, (a.wk - f.cohort_week)),
size AS (SELECT cohort_week, users AS cohort_size FROM cell WHERE week_offset = 0)
SELECT c.cohort_week, c.week_offset, c.users,
       (CAST(c.users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)) AS retention
FROM cell c JOIN size s USING (cohort_week)
"""


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n, p): the first-order Markov transition
    matrix of the event stream — for each user's time-ordered sequence,
    count consecutive (prev → next) type pairs and normalize per source
    state. The path-analysis primitive behind "what do users do after an
    error" and sequence-anomaly scoring.

    One window (partitioned BY USER, so the sort is per-user-partition, not
    global), one groupBy on the ≤|types|² pair space with map-side combine.
    Ties inside a user at the same timestamp are broken by event_id — the
    same total order both engines use, so counts are identical."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_tot"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.col("row_tot").cast("double")).alias("p"),
    )


def event_transitions_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`event_transitions`. ``events_sql`` yields
    (user_id, event_id, ts, event_type)."""
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM ({events_sql})),
pairs AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type),
tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_tot FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.event_type, p.n,
       (CAST(p.n AS DOUBLE) / CAST(t.row_tot AS DOUBLE)) AS p
FROM pairs p JOIN tot t USING (prev_type)
"""
