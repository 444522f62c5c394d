"""Physical-plan assertions — the scale properties SURVEY.md §4 promises must
be visible in `.explain`, not just claimed in docstrings:

- column pruning: metadata-only queries never read the binary payload column;
- predicate pushdown: row filters reach the parquet scan (PushedFilters);
- broadcast joins: the tiny query side of every kNN join broadcasts (no
  shuffle of the node corpus onto query keys);
- map-side combine: hash aggregations run partial-then-final;
- whole-stage codegen: the JVM expression pipelines (text analysis, cells)
  compile into codegen spans rather than interpreted rows.

A plan regression here (e.g. an accidental UDF breaking codegen, or a join
flipping to sort-merge over the corpus) is a 100-TB incident that small-scale
row-count tests cannot catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def explain_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def pages_pq(spark, tmp_path_factory):
    from raptor_rag_spark.sources.pages import generate_pages

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    generate_pages(spark, 64, partitions=4).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def tiny_tree_df(spark, pages_pq):
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.plans.build_tree import build_tree

    docs = spark.read.parquet(pages_pq).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    cfg = ClusterTreeConfig(max_tokens=48, num_layers=2, max_resolution=6)
    return build_tree(docs, cfg).cache()


@pytest.fixture(scope="module")
def tiny_queries_df(spark):
    from raptor_rag_spark.operators.core import with_embedding

    qdf = spark.createDataFrame(
        [(0, "spark joins data"), (1, "tiles roll up")], "query_id long, qtext string"
    )
    return with_embedding(qdf, "qtext").select(
        "query_id", F.col("embedding").alias("q_embedding")
    ).cache()


def test_binary_column_pruned(spark, pages_pq):
    """A metadata-only projection must not scan the html BINARY payload."""
    df = spark.read.parquet(pages_pq).select("url", "lang", F.length("text").alias("n"))
    plan = explain_str(df)
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, plan
    assert "html" not in scan_schema[0], scan_schema[0]
    assert "url" in scan_schema[0]


def test_filter_pushed_to_scan(spark, pages_pq):
    df = spark.read.parquet(pages_pq).filter(F.col("lang") == "en").select("url")
    plan = explain_str(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "lang" in pushed[0], plan


def test_collapsed_knn_broadcasts_queries(spark, tiny_tree_df, tiny_queries_df):
    from raptor_rag_spark.operators.knn import collapsed_knn

    plan = explain_str(collapsed_knn(tiny_tree_df, tiny_queries_df, top_k=3))
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cell_pruned_knn_broadcasts_candidates(spark, tiny_tree_df, tiny_queries_df):
    from raptor_rag_spark.operators.knn import cell_pruned_knn

    levels = [r["level"] for r in tiny_tree_df.select("level").distinct().collect()]
    res = {lv: max(8 - lv, 0) for lv in levels}
    plan = explain_str(cell_pruned_knn(tiny_tree_df, tiny_queries_df, res, top_k=3))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # the node corpus must never shuffle onto query keys
    assert "SortMergeJoin" not in plan, plan


def test_exact_dedup_partial_aggregation(spark, pages_pq):
    from raptor_rag_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(pages_pq).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    plan = explain_str(exact_dedup(docs))
    # partial (map-side combine) + final pair on the fingerprint groupBy
    assert plan.count("HashAggregate") >= 2, plan


def test_text_analysis_stays_in_codegen(spark, pages_pq):
    from raptor_rag_spark.operators.textops import token_counts

    docs = spark.read.parquet(pages_pq).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    plan = explain_str(token_counts(docs), "simple")
    # '*(n)' prefixes mark whole-stage-codegen spans in simple mode
    assert "*(" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_leaf_pipeline_single_python_pass(spark, pages_pq):
    """Chunk+embed is ONE fused Arrow round trip; everything after it (cells,
    token counts) must be JVM expressions — exactly one Python eval node."""
    from raptor_rag_spark.operators.core import leaf_nodes

    docs = spark.read.parquet(pages_pq).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    plan = explain_str(leaf_nodes(docs, "doc_id", "text", 64, 8), "simple")
    n_python = sum(
        plan.count(tag)
        for tag in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython")
    )
    assert n_python == 1, plan
