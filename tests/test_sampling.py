"""Deterministic sampling / split / sharding properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.operators.sampling import (
    corpus_shards,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=400, parts=4):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"),
    )


def test_hash_split_deterministic_and_partition_independent(spark):
    a = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, parts=2)).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, parts=13)).collect()}
    assert a == b
    frac = {s: sum(1 for v in a.values() if v == s) / len(a) for s in ("train", "val", "test")}
    assert frac["train"] == pytest.approx(0.8, abs=0.08)
    assert frac["val"] == pytest.approx(0.1, abs=0.05)
    assert frac["test"] == pytest.approx(0.1, abs=0.05)


def test_hash_split_salt_gives_independent_assignment(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, salt="s2").collect()}
    assert a != b  # different salts reshuffle
    assert set(a) == set(b)


def test_stratified_sample_quotas(spark):
    d = _docs(spark, n=900)
    kept = stratified_sample(d, {"en": 50, "de": 20}, default_pct=0).collect()
    by_lang = {}
    for r in kept:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert "fr" not in by_lang  # default 0%
    assert by_lang["en"] / 300 == pytest.approx(0.5, abs=0.12)
    assert by_lang["de"] / 300 == pytest.approx(0.2, abs=0.1)
    # subset of input, deterministic
    again = stratified_sample(d, {"en": 50, "de": 20}, default_pct=0).collect()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in again}


def test_corpus_shards_equals_naive_prefix_sum(spark):
    d = _docs(spark, n=300, parts=7)
    budget = 64
    rows = corpus_shards(d, token_budget=budget).collect()
    # naive reference: sort by (h, doc_id), running sum, start-offset shard
    rows_sorted = sorted(rows, key=lambda r: (r["h"], r["doc_id"]))
    cum = 0
    for r in rows_sorted:
        start = cum
        cum += r["n_tokens"]
        assert r["global_cum"] == cum
        assert r["shard_id"] == start // budget
    # shards are contiguous in hash order and cover 0..max
    sids = [r["shard_id"] for r in rows_sorted]
    assert sids == sorted(sids)
    assert set(sids) == set(range(max(sids) + 1))


def test_weighted_sample(spark):
    """Weight 1 keeps everything, weight 0 keeps nothing, a mid weight keeps
    roughly that fraction, and the decision is reproducible."""
    from raptor_rag_spark.operators.sampling import weighted_sample, weighted_sample_sql
    import duckdb
    from pyspark.sql import functions as F

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    assert weighted_sample(docs.withColumn("w", F.lit(1.0)), "w").count() == 2000
    assert weighted_sample(docs.withColumn("w", F.lit(0.0)), "w").count() == 0
    kept = weighted_sample(docs.withColumn("w", F.lit(0.3)), "w")
    n = kept.count()
    assert 450 < n < 750  # ≈600 expected
    # reproducible: same survivors on a re-run with different partitioning
    again = weighted_sample(
        docs.repartition(7).withColumn("w", F.lit(0.3)), "w"
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # twin agreement
    want = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(weighted_sample_sql(
            "SELECT unnest(range(2000)) AS doc_id, 0.3 AS w", "w"))
        .fetchall()
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == want


def test_quality_rank_reconstructs_global_rank(spark):
    """Two-level bucket reconstruction == plain global row_number, and the
    percentile endpoints are exactly 0 and 1."""
    from raptor_rag_spark.operators.sampling import quality_rank

    rows = [(i, f"some text with quality {'good ' * (i % 17)} {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["rnk"], r["pctl"], r["quality"]) for r in quality_rank(df).collect()}
    assert sorted(r[0] for r in out.values()) == list(range(1, 201))
    by_rank = sorted(out.values())
    assert by_rank[0][1] == 0.0 and by_rank[-1][1] == 1.0
    # rank order agrees with (quality, doc_id) order
    qs = sorted((q, d) for d, (_, _, q) in out.items())
    for want_rnk, (_, d) in enumerate(qs, start=1):
        assert out[d][0] == want_rnk
