"""TileStatsTable: exact incremental view maintenance + pyramid rollup."""

import tempfile

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.sources.lakehouse import LakeTable
from raptor_rag_spark.sources.tilestats import TileStatsTable, _partials


def _pts(spark, seed, n=200):
    return spark.range(n).select(
        F.col("id").alias("pid"),
        ((F.hash(F.col("id") + seed).cast("double") / 2147483647.0 + 1.0) / 2.0).alias("x"),
        ((F.hash(F.col("id") * 3 + seed).cast("double") / 2147483647.0 + 1.0) / 2.0).alias("y"),
    )


def _stats_rows(df):
    return {r["cell_id"]: (r["n"], r["centroid_x"], r["centroid_y"]) for r in df.collect()}


def test_incremental_equals_full_rebuild(spark):
    a, b = _pts(spark, 1), _pts(spark, 99)
    inc = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=5)
    inc.build(a)
    inc.add_points(b)
    full = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=5)
    full.build(a.unionByName(b))
    assert _stats_rows(inc.read_stats(spark)) == _stats_rows(full.read_stats(spark))


def test_pyramid_rollup_equals_direct_grouping(spark):
    a = _pts(spark, 7)
    t = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=6)
    t.build(a)
    direct = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=3)
    direct.build(a)
    assert _stats_rows(t.read_stats(spark, res=3)) == _stats_rows(direct.read_stats(spark))
    with pytest.raises(ValueError):
        t.read_stats(spark, res=7)


def test_epoch_gated_merge_is_exactly_once(spark):
    a, b = _pts(spark, 1), _pts(spark, 42)
    t = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=5)
    t.build(a)
    s1 = t.add_points(b, epoch_id=10)
    s2 = t.add_points(b, epoch_id=10)  # replayed micro-batch
    assert s1 == s2  # no new snapshot, no double count
    n_total = t.read_stats(spark).agg(F.sum("n")).collect()[0][0]
    assert n_total == 400


def test_refresh_from_corpus_cdc(spark):
    a, b = _pts(spark, 5), _pts(spark, 6)
    corpus = LakeTable(tempfile.mkdtemp(prefix="corpus_"))
    s1 = corpus.append(a)
    t = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=5)
    t.build(corpus.read(spark, s1))
    s2 = corpus.append(b)
    t.refresh_from(corpus, s1, s2)
    full = TileStatsTable(tempfile.mkdtemp(prefix="ts_"), res=5)
    full.build(a.unionByName(b))
    assert _stats_rows(t.read_stats(spark)) == _stats_rows(full.read_stats(spark))


def test_stream_tile_stats_multi_epoch(spark, tmp_path):
    """The streaming drain must span multiple epochs and still equal batch."""
    import glob
    import os

    from raptor_rag_spark.streaming.events_stream import stream_tile_stats

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    out = stream_tile_stats(spark, sf, res=5, n_files=3)
    rows = _stats_rows(out)
    assert rows and sum(n for n, _, _ in rows.values()) == spark.read.parquet(
        f"{sf}/events.parquet"
    ).count()
