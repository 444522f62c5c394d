"""Bucketed tables: shuffle-free big-big joins via storage co-location.

At 100 TB the most expensive plan shape is a big-big equi-join (corpus ⋈
corpus-sized index): both sides shuffle. Bucketing moves that shuffle to
WRITE TIME, once: both tables are hash-partitioned into the same number of
buckets on the join key and sorted within buckets, so every later join is a
zipped per-bucket sort-merge with ZERO Exchange — the Spark analog of the
co-located join every MPP warehouse builds around, and the right layout for
artifacts that are written once and joined many times (postings, dedup
keep-lists, node tables, embeddings).

`tests/test_plan_shapes.py::test_bucketed_join_no_exchange` asserts the
no-Exchange plan; `SelectedBucketsCount` in the scan also enables bucket
pruning for point lookups on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted table (the one-time shuffle)."""
    w = df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned as a
    per-bucket sort-merge with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
