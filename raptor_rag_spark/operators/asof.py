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
