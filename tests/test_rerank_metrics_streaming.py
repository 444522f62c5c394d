"""Tests for rerank (W3), distributed eval metrics (A8/A9), the Structured
Streaming twin, and multimodal binary plumbing."""

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.kernels.metrics import token_f1
from raptor_rag_spark.operators.evalmetrics import accuracy_pairs, token_f1_pairs
from raptor_rag_spark.operators.rerank import rerank

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_rerank_orders_by_score_desc(spark):
    data = [
        (1, "spark window data filter part extra words here"),
        (2, "nothing relevant at all in this text"),
        (3, "spark window"),
    ]
    df = spark.createDataFrame(data, "node_id long, text string").withColumn(
        "query_id", F.lit(0)
    )
    out = rerank(df, "spark window data filter part", text_col="text").toPandas()
    out = out.sort_values("rank")
    # rank 1 must have the highest score; scores non-increasing
    scores = out["score"].tolist()
    assert scores == sorted(scores, reverse=True)
    assert out.iloc[0]["node_id"] == 3  # 2 hits / 3 tokens beats 5 hits / 9 tokens


def test_rerank_topk_truncates(spark):
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("query_id", F.lit(0))
        .withColumnRenamed("doc_id", "node_id")
    )
    out = rerank(df, "spark data", top_k=5, text_col="text").toPandas()
    assert len(out) == 5
    assert sorted(out["rank"].tolist()) == [1, 2, 3, 4, 5]


def test_token_f1_matches_kernel(spark):
    rows = [
        (0, "the quick brown fox", "quick brown fox jumps"),
        (1, "alpha beta", "gamma delta"),
        (2, "same text", "same text"),
        (3, "", ""),
        (4, "only pred", ""),
    ]
    df = spark.createDataFrame(rows, "pair_id long, prediction string, gold string")
    got = {r["pair_id"]: r["f1"] for r in token_f1_pairs(df).collect()}
    for pid, pred, gold in rows:
        assert got[pid] == pytest.approx(round(token_f1(pred, gold), 6), abs=2e-6), pid


def test_accuracy_pairs(spark):
    rows = [(0, "The Answer!", "the answer"), (1, "a", "b")]
    df = spark.createDataFrame(rows, "pair_id long, prediction string, gold string")
    got = {r["pair_id"]: r["acc"] for r in accuracy_pairs(df).collect()}
    assert got == {0: 1.0, 1: 0.0}


def test_streaming_twin_equals_batch(spark):
    from raptor_rag_spark.plans.contract import q_events_hourly
    from raptor_rag_spark.streaming.events_stream import stream_events_hourly

    batch = q_events_hourly(spark, SF).toPandas()
    stream = stream_events_hourly(spark, SF).toPandas()
    key = ["hour_ts", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = stream[batch.columns].sort_values(key).reset_index(drop=True)
    assert b.equals(s)


def test_multimodal_binary_features(spark):
    import hashlib

    from raptor_rag_spark.operators.multimodal import binary_features
    from raptor_rag_spark.sources.pages import generate_pages, make_page

    pages = generate_pages(spark, 50, partitions=4)
    out = binary_features(pages).toPandas()
    assert len(out) == 50
    assert set(out.columns) == {
        "url", "n_bytes", "digest", "fake_width", "fake_height", "n_sampled_frames"
    }
    # digest matches a locally computed md5 of the same deterministic payload
    p0 = make_page(0)
    row = out[out.url == p0["url"]].iloc[0]
    assert row["digest"] == hashlib.md5(p0["html"]).hexdigest()
    assert row["n_bytes"] == len(p0["html"])


def test_frame_sample_indices():
    from raptor_rag_spark.operators.multimodal import frame_sample_indices

    assert frame_sample_indices(100, 4) == [0, 25, 50, 75]
    assert frame_sample_indices(3, 10) == [0, 1, 2]
    assert frame_sample_indices(0, 4) == []


def test_stateful_sessionize_stitches_across_batches(spark, tmp_path):
    """Cross-batch state carry: the events table split into two time-ordered
    files, drained one file per micro-batch, must equal both the single-batch
    drain and the batch lag+window twin — sessions spanning the batch
    boundary are stitched by the (last_epoch, session) state."""
    from raptor_rag_spark.plans.contract import q_events_sessionize
    from raptor_rag_spark.streaming.events_stream import stream_sessionize

    batch = q_events_sessionize(spark, SF).toPandas()

    events = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "_epoch", F.col("ts").cast("timestamp_ltz").cast("long")
    )
    cut = events.approxQuantile("_epoch", [0.5], 0.0)[0]
    src = tmp_path / "events_src"
    early = events.where(F.col("_epoch") <= cut).drop("_epoch").coalesce(1)
    late = events.where(F.col("_epoch") > cut).drop("_epoch").coalesce(1)
    early.write.parquet(str(src / "b0"))
    import time

    time.sleep(1.1)  # file-source ordering is by modification time
    late.write.parquet(str(src / "b1"))

    out = stream_sessionize(
        spark, SF, source_dir=str(src) + "/*/", max_files_per_trigger=1
    ).toPandas()

    key = ["user_id", "event_id"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = out[batch.columns].sort_values(key).reset_index(drop=True)
    assert b.equals(s)
    # the split genuinely crosses sessions: some user has events in both halves
    ep = events.toPandas()
    both = ep.groupby("user_id")["_epoch"].agg(["min", "max"])
    assert ((both["min"] <= cut) & (both["max"] > cut)).any()


def test_webops_host_rollup_and_filter(spark):
    from raptor_rag_spark.operators.webops import host_quality_filter, host_stats, parse_urls
    from raptor_rag_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 300, partitions=4).cache()
    parsed = parse_urls(pages).toPandas()
    assert (parsed["scheme"] == "https").all()
    assert parsed["host"].str.match(r"site\d+\.example\.com").all()
    assert parsed["path"].str.startswith("/p/").all()

    stats = host_stats(pages).toPandas()
    assert stats["n_pages"].sum() == 300
    # Zipf-ish skew is load-bearing: the hottest host dominates the median
    assert stats["n_pages"].max() >= 5 * stats["n_pages"].median()

    kept = host_quality_filter(pages, min_avg_tokens=40.0, lang="en").toPandas()
    assert (kept["lang"] == "en").all()
    assert (kept["host_avg_tokens"] >= 40.0).all()
    # the gate is per-HOST: a kept page may itself be short
    assert set(kept["host"]).issubset(set(stats["host"]))


def test_stream_hex_density_equals_batch_hex_counts(spark):
    """The streaming hex rollup drains to exactly the batch per-(day, hex)
    counts, and per-day mass equals the event count of that day."""
    from raptor_rag_spark.streaming.events_stream import stream_hex_density

    out = stream_hex_density(spark, SF).toPandas()
    assert (out["n"] > 0).all()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F

    per_day = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        ).agg(F.count("*").alias("n")).collect()
    }
    got_day = out.groupby("day")["n"].sum().to_dict()
    assert got_day == per_day


def test_stream_cusum_state_across_batches(spark, tmp_path):
    """Integer CUSUM state carried across micro-batches: the two-file
    time-ordered drain equals both the single-batch drain and the
    closed-form batch oracle (cum − min(0, running-min cum))."""
    import duckdb

    from raptor_rag_spark.streaming.events_stream import (
        stream_cusum,
        stream_cusum_batch_sql,
    )

    single = stream_cusum(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(stream_cusum_batch_sql()).df()
    key = ["event_type", "period"]
    a = single.sort_values(key).reset_index(drop=True)
    b = oracle[single.columns].sort_values(key).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b)

    events = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "_epoch", F.col("ts").cast("timestamp_ltz").cast("long")
    )
    cut = events.approxQuantile("_epoch", [0.5], 0.0)[0]
    src = tmp_path / "events_cusum_src"
    events.where(F.col("_epoch") <= cut).drop("_epoch").coalesce(1).write.parquet(
        str(src / "b0")
    )
    import time

    time.sleep(1.1)
    events.where(F.col("_epoch") > cut).drop("_epoch").coalesce(1).write.parquet(
        str(src / "b1")
    )
    multi = stream_cusum(
        spark, SF, source_dir=str(src) + "/*/", max_files_per_trigger=1
    ).toPandas()
    m = multi.sort_values(key).reset_index(drop=True)
    assert a.equals(m[a.columns].sort_values(key).reset_index(drop=True))
