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
