"""Lakehouse MERGE (upsert) as a deterministic dataflow.

``merge_upsert`` reproduces the MERGE INTO semantics every incremental-ingest
pipeline needs (Iceberg/Delta ``MERGE WHEN MATCHED … WHEN NOT MATCHED …``)
as a plain full-outer join, so the decision logic itself is testable with an
exact oracle and portable to any sink. The engine's own checkpoint sink
(sources/checkpoint.py) appends by level; this is the row-level-update
counterpart for dimension/metrics tables.

Semantics per key:
- present only in updates            → action = 'insert', take update values
- present in both, any value differs → action = 'update', take update values
- present in both, all values equal  → action = 'unchanged'
- present only in base               → action = 'keep' (MERGE's no-op branch)

Scale shape: ONE sort-merge (or broadcast, if updates are small) full-outer
join on the key — exactly the shuffle MERGE INTO plans as; no window, no
driver state. Null-safe comparison (`<=>`) makes genuinely-null values
upsert correctly instead of flapping between update/unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """(key…, value… (post-merge), action): the merged snapshot."""
    keys = list(key_cols)
    b = base.select(
        *keys,
        F.lit(1).alias("_in_base"),
        *[F.col(c).alias(f"_b_{c}") for c in value_cols],
    )
    u = updates.select(
        *keys,
        F.lit(1).alias("_in_upd"),
        *[F.col(c).alias(f"_u_{c}") for c in value_cols],
    )
    j = b.join(u, keys, "full_outer")
    # key-only merge (no value columns): matched rows are never "update"
    differs = F.lit(False)
    for c in value_cols:
        d = ~F.col(f"_u_{c}").eqNullSafe(F.col(f"_b_{c}"))
        differs = differs | d
    action = (
        F.when(F.col("_in_base").isNull(), F.lit("insert"))
        .when(F.col("_in_upd").isNull(), F.lit("keep"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        *[
            F.when(F.col("_in_upd").isNotNull(), F.col(f"_u_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in value_cols
        ],
        action.alias("action"),
    )


def merge_upsert_sql(
    base_sql: str,
    updates_sql: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`merge_upsert`."""
    keys = ", ".join(key_cols)
    differs = " OR ".join(
        f"NOT (u._u_{c} IS NOT DISTINCT FROM b._b_{c})" for c in value_cols
    ) or "FALSE"  # key-only merge: matched rows are never "update"
    finals = ", ".join(
        f"CASE WHEN u._in_upd IS NOT NULL THEN u._u_{c} ELSE b._b_{c} END AS {c}"
        for c in value_cols
    )
    b_cols = ", ".join([keys, "1 AS _in_base"] + [f"{c} AS _b_{c}" for c in value_cols])
    u_cols = ", ".join([keys, "1 AS _in_upd"] + [f"{c} AS _u_{c}" for c in value_cols])
    using = ", ".join(key_cols)
    select_bits = ", ".join(x for x in (using, finals) if x)
    return f"""
WITH b AS (SELECT {b_cols} FROM ({base_sql})),
u AS (SELECT {u_cols} FROM ({updates_sql}))
SELECT {select_bits},
       CASE WHEN b._in_base IS NULL THEN 'insert'
            WHEN u._in_upd IS NULL THEN 'keep'
            WHEN {differs} THEN 'update'
            ELSE 'unchanged' END AS action
FROM b FULL OUTER JOIN u USING ({using})
"""


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-Changing-Dimension type 2 maintenance — the versioned-history
    counterpart of :func:`merge_upsert` (Kimball SCD2; what Delta/Iceberg
    users hand-roll with two MERGEs).

    dim: (key…, value…, valid_from, valid_to) — current rows have
    valid_to IS NULL. updates: (key…, value…, ts_col) — the change batch,
    at most one row per key. Per key:

    - changed value, key exists → CLOSE the current row (valid_to = ts)
      and OPEN a new one (valid_from = ts, valid_to NULL)
    - new key → OPEN (valid_from = ts)
    - equal values or absent from batch → row passes through unchanged
    - already-closed history rows always pass through untouched

    Output: the full new SCD2 table (key…, value…, valid_from, valid_to,
    action ∈ open/close/carry). Scale shape: ONE full-outer join of the
    CURRENT slice against the batch (the history slice never shuffles —
    it is unioned through), null-safe value comparison, no windows."""
    keys = list(key_cols)
    vals = list(value_cols)
    history = dim.where(F.col("valid_to").isNotNull()).select(
        *keys, *vals, "valid_from", "valid_to", F.lit("carry").alias("action")
    )
    current = dim.where(F.col("valid_to").isNull()).select(
        *keys,
        *[F.col(v).alias(f"_b_{v}") for v in vals],
        F.col("valid_from").alias("_b_from"),
        F.lit(1).alias("_in_base"),
    )
    u = updates.select(
        *keys,
        *[F.col(v).alias(f"_u_{v}") for v in vals],
        F.col(ts_col).alias("_u_ts"),
        F.lit(1).alias("_in_upd"),
    )
    j = current.join(u, keys, "full_outer")
    changed = (
        (F.col("_in_base") == 1)
        & (F.col("_in_upd") == 1)
        & ~F.expr(" AND ".join(f"(_b_{v} <=> _u_{v})" for v in vals))
    )
    closed = j.where(changed).select(
        *keys,
        *[F.col(f"_b_{v}").alias(v) for v in vals],
        F.col("_b_from").alias("valid_from"),
        F.col("_u_ts").alias("valid_to"),
        F.lit("close").alias("action"),
    )
    opened = j.where(changed | F.col("_in_base").isNull()).select(
        *keys,
        *[F.col(f"_u_{v}").alias(v) for v in vals],
        F.col("_u_ts").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit("open").alias("action"),
    )
    carried = j.where(~F.coalesce(changed, F.lit(False)) & (F.col("_in_base") == 1)).select(
        *keys,
        *[F.col(f"_b_{v}").alias(v) for v in vals],
        F.col("_b_from").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit("carry").alias("action"),
    )
    return history.unionByName(closed).unionByName(opened).unionByName(carried)


def scd2_apply_sql(
    dim_sql: str,
    updates_sql: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`scd2_apply`."""
    keys = list(key_cols)
    vals = list(value_cols)
    kl = ", ".join(keys)
    vl = ", ".join(vals)
    keq = " AND ".join(f"c.{k} IS NOT DISTINCT FROM u.{k}" for k in keys)
    veq = " AND ".join(f"(c.{v} IS NOT DISTINCT FROM u.{v})" for v in vals)
    kco = ", ".join(f"coalesce(c.{k}, u.{k}) AS {k}" for k in keys)
    bvals = ", ".join(f"c.{v} AS b_{v}" for v in vals)
    uvals = ", ".join(f"u.{v} AS u_{v}" for v in vals)
    bsel = ", ".join(f"b_{v} AS {v}" for v in vals)
    usel = ", ".join(f"u_{v} AS {v}" for v in vals)
    return f"""
WITH dim AS ({dim_sql}),
upd AS ({updates_sql}),
cur AS (SELECT * FROM dim WHERE valid_to IS NULL),
hist AS (
  SELECT {kl}, {vl}, valid_from, valid_to, 'carry' AS action
  FROM dim WHERE valid_to IS NOT NULL),
j AS (
  SELECT {kco}, {bvals}, {uvals},
         c.valid_from AS b_from, u.{ts_col} AS u_ts,
         (CASE WHEN c.valid_from IS NOT NULL AND u.{ts_col} IS NOT NULL
                    AND NOT ({veq}) THEN 1 ELSE 0 END) AS changed,
         (CASE WHEN c.valid_from IS NOT NULL THEN 1 ELSE 0 END) AS in_base,
         (CASE WHEN u.{ts_col} IS NOT NULL THEN 1 ELSE 0 END) AS in_upd
  FROM cur c FULL OUTER JOIN upd u ON {keq})
SELECT * FROM hist
UNION ALL
SELECT {kl}, {bsel}, b_from AS valid_from, u_ts AS valid_to, 'close' AS action
FROM j WHERE changed = 1
UNION ALL
SELECT {kl}, {usel}, u_ts AS valid_from, NULL AS valid_to, 'open' AS action
FROM j WHERE changed = 1 OR in_base = 0
UNION ALL
SELECT {kl}, {bsel}, b_from AS valid_from, NULL AS valid_to, 'carry' AS action
FROM j WHERE changed = 0 AND in_base = 1
"""
