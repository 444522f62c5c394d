"""Persisted BM25 index: incremental maintenance is exact, snapshots search
as-of, epoch commits are idempotent (sources/searchindex.py)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from raptor_rag_spark.sources.lakehouse import LakeTable
from raptor_rag_spark.sources.searchindex import SearchIndex

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(
        [(0, "spark join merge sort"), (1, "customer order data")],
        "query_id INT, qtext STRING",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_index_equals_full_rebuild(spark, docs, queries, tmp_path):
    inc = SearchIndex(str(tmp_path / "inc"))
    inc.build(docs.filter("doc_id < 30"))
    inc.add_documents(docs.filter("doc_id >= 30"))

    full = SearchIndex(str(tmp_path / "full"))
    full.build(docs)

    a = _rows(inc.search(spark, queries, top_k=10, max_df_ratio=(9, 10)))
    b = _rows(full.search(spark, queries, top_k=10, max_df_ratio=(9, 10)))
    assert a == b and len(a) > 0


def test_search_as_of_snapshot(spark, docs, queries, tmp_path):
    idx = SearchIndex(str(tmp_path / "i"))
    s1 = idx.build(docs.filter("doc_id < 30"))
    idx.add_documents(docs.filter("doc_id >= 30"))

    old_only = SearchIndex(str(tmp_path / "o"))
    old_only.build(docs.filter("doc_id < 30"))

    a = _rows(idx.search(spark, queries, top_k=5, snapshot_id=s1))
    b = _rows(old_only.search(spark, queries, top_k=5))
    assert a == b


def test_refresh_from_corpus_cdc(spark, docs, queries, tmp_path):
    corpus = LakeTable(str(tmp_path / "corpus"))
    s1 = corpus.append(docs.filter("doc_id < 30"))
    idx = SearchIndex(str(tmp_path / "i"))
    idx.build(corpus.read(spark, s1))

    s2 = corpus.append(docs.filter("doc_id >= 30"))
    idx.refresh_from(corpus, s1, s2)

    full = SearchIndex(str(tmp_path / "full"))
    full.build(docs)
    assert _rows(idx.search(spark, queries, top_k=10)) == _rows(
        full.search(spark, queries, top_k=10)
    )


def test_epoch_idempotent_index_commits(spark, docs, queries, tmp_path):
    idx = SearchIndex(str(tmp_path / "i"))
    idx.build(docs.filter("doc_id < 30"))
    delta = docs.filter("doc_id >= 30 AND doc_id < 40")
    idx.add_documents(delta, epoch_id=7)
    idx.add_documents(delta, epoch_id=7)  # re-delivered micro-batch
    # postings not duplicated → tf stats unchanged
    n = idx.postings(spark).count()
    once = SearchIndex(str(tmp_path / "once"))
    once.build(docs.filter("doc_id < 40"))
    assert n == once.postings(spark).count()


def test_delete_documents_tombstones_are_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.ranking import bm25_rank
    from raptor_rag_spark.sources.searchindex import SearchIndex

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma" if i % 2 else f"delta epsilon doc{i}") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    qs = spark.createDataFrame([(0, "alpha gamma"), (1, "delta")], "query_id INT, qtext STRING")
    idx = SearchIndex(str(tmp_path / "idx"))
    idx.build(docs)
    idx.delete_documents(docs.where(F.col("doc_id") % 4 == 1).select("doc_id"))
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"])
        for r in idx.search(spark, qs, top_k=20).collect()
    )
    ref = sorted(
        (r["query_id"], r["doc_id"], r["score"])
        for r in bm25_rank(docs.where(F.col("doc_id") % 4 != 1), qs, top_k=20).collect()
    )
    assert got == ref  # score-exact, not just same doc set
    # deleting an already-deleted doc is a net no-op
    idx.delete_documents(spark.createDataFrame([(1,)], "doc_id LONG"))
    again = sorted(
        (r["query_id"], r["doc_id"], r["score"])
        for r in idx.search(spark, qs, top_k=20).collect()
    )
    assert again == ref


def test_delete_then_readd_recrawl_path(spark, tmp_path):
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.ranking import bm25_rank
    from raptor_rag_spark.sources.searchindex import SearchIndex

    v1 = spark.createDataFrame(
        [(1, "old stale content"), (2, "stable other page")], "doc_id LONG, text STRING"
    )
    v2_doc1 = spark.createDataFrame([(1, "fresh recrawled content")], "doc_id LONG, text STRING")
    idx = SearchIndex(str(tmp_path / "idx"))
    idx.build(v1)
    idx.delete_documents(v2_doc1.select("doc_id"))
    idx.add_documents(v2_doc1)
    qs = spark.createDataFrame([(0, "fresh content"), (1, "stale")], "query_id INT, qtext STRING")
    union = spark.createDataFrame(
        [(1, "fresh recrawled content"), (2, "stable other page")], "doc_id LONG, text STRING"
    )
    got = sorted(map(tuple, idx.search(spark, qs, top_k=10).collect()))
    ref = sorted(map(tuple, bm25_rank(union, qs, top_k=10).collect()))
    assert got == ref
