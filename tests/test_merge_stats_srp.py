"""MERGE upsert, exact group quantiles, Getis-Ord Gi*, and SRP-LSH pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_merge_upsert_actions(spark):
    from raptor_rag_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k LONG, price DOUBLE, status STRING",
    )
    updates = spark.createDataFrame(
        [(2, 25.0, "B"), (3, 30.0, "C"), (5, 50.0, "E"), (4, None, "D")],
        "k LONG, price DOUBLE, status STRING",
    )
    out = {r["k"]: r for r in merge_upsert(base, updates, ["k"], ["price", "status"]).collect()}
    assert out[1]["action"] == "keep" and out[1]["price"] == 10.0
    assert out[2]["action"] == "update" and out[2]["price"] == 25.0
    assert out[3]["action"] == "unchanged"
    # null-safe compare: (None == None) is a match, not an update
    assert out[4]["action"] == "unchanged" and out[4]["price"] is None
    assert out[5]["action"] == "insert" and out[5]["price"] == 50.0
    assert len(out) == 5


def test_group_quantiles_exact(spark):
    from raptor_rag_spark.operators.stats import group_quantiles

    rows = [("a", v) for v in range(1, 101)] + [("b", 7)]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    out = {r["g"]: r for r in group_quantiles(df, "g", "v", qs=(50, 90, 99)).collect()}
    a = out["a"]
    # type-1 lower quantile over 1..100: idx = (99*q)//100 + 1
    assert (a["p50"], a["p90"], a["p99"]) == (50, 90, 99)
    assert (a["n"], a["v_min"], a["v_max"]) == (100, 1, 100)
    b = out["b"]
    assert (b["p50"], b["p90"], b["p99"]) == (7, 7, 7) and b["n"] == 1


def test_getis_ord_hotspot(spark):
    from raptor_rag_spark.operators.heatmap import getis_ord

    # res=2 -> 4x4 grid (N=16); one hot 2x2 block of mass, rest empty
    raster = spark.createDataFrame(
        [(0, 0, 8.0), (0, 1, 8.0), (1, 0, 8.0), (1, 1, 8.0)],
        "ix LONG, iy LONG, v DOUBLE",
    )
    out = {(r["ix"], r["iy"]): r for r in getis_ord(raster, res=2).collect()}
    # emitted cells = within 1 step of occupied = the 3x3 block
    assert set(out) == {(i, j) for i in range(3) for j in range(3)}
    # hand-check the corner cell (0,0): k=4 (corner window), W=32 (all mass)
    r00 = out[(0, 0)]
    assert r00["k_cells"] == 4 and r00["w_sum"] == 32.0
    N, mean = 16.0, 32.0 / 16.0
    s = math.sqrt(sum(64.0 for _ in range(4)) / N - mean * mean)
    expected = (32.0 - mean * 4.0) / (s * math.sqrt((N * 4.0 - 16.0) / (N - 1.0)))
    assert r00["gi_z"] == pytest.approx(expected, rel=1e-12)
    # the far corner of the emitted block holds only one occupied neighbor
    assert out[(2, 2)]["w_sum"] == 8.0 and out[(2, 2)]["k_cells"] == 9
    assert out[(2, 2)]["gi_z"] < r00["gi_z"]


def test_zorder_key_and_layout(spark):
    from raptor_rag_spark.operators.layout import zorder_layout

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.999, 0.999), (3, 0.999, 0.0), (4, 0.26, 0.51)],
        "vec_id LONG, x DOUBLE, y DOUBLE",
    )
    out = {r["vec_id"]: r for r in zorder_layout(pts, res=2, bucket_bits=2).collect()}
    # res=2 grid: (0,0)->z 0; (3,3)->z 15; (3,0)->bits ix=11 interleaved odd -> 0b1010=10
    assert out[1]["zkey"] == 0 and out[1]["bucket"] == 0
    assert out[2]["zkey"] == 15 and out[2]["bucket"] == 3
    assert out[3]["zkey"] == 10 and out[3]["bucket"] == 2
    # (ix=1, iy=2): ix bits at odd pos -> 0b0010=2 ; iy bit1 at pos 2 -> 8 ; z=10? no:
    # ix=1 -> bit0=1 -> pos1 (2); iy=2 -> bit1=1 -> pos2 (4); z=6
    assert out[4]["zkey"] == 6 and out[4]["bucket"] == 1


def test_link_pagerank_dangling(spark):
    from raptor_rag_spark.operators.graph import link_pagerank

    links = spark.createDataFrame(
        [("a.com", "hub.com", 3), ("b.com", "hub.com", 1), ("hub.com", "a.com", 1)],
        "src_host STRING, dst_host STRING, n_links LONG",
    )
    out = {r["host"]: r for r in link_pagerank(links, iterations=5).collect()}
    assert set(out) == {"a.com", "b.com", "hub.com"}
    # b.com is never linked to -> floor rank; hub.com collects the most mass
    assert out["hub.com"]["rank"] > out["a.com"]["rank"] > out["b.com"]["rank"]
    assert out["b.com"]["out_deg"] == 1 and out["hub.com"]["out_deg"] == 1
    total = sum(r["rank"] for r in out.values())
    assert 0.4 < total <= 1.0001  # dangling leak keeps total <= 1


def test_hll_distinct_accuracy(spark):
    from raptor_rag_spark.operators.sketches import hll_distinct

    # 5000 rows, 1000 distinct values
    df = spark.range(5000).select((F.col("id") % 1000).cast("string").alias("v"))
    r = hll_distinct(df, "v").collect()[0]
    assert r["n_exact"] == 1000
    # p=8 HLL standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(r["est_distinct"] - 1000) / 1000 < 0.20
    # small cardinality -> linear counting regime, still in tolerance
    small = spark.range(500).select((F.col("id") % 40).cast("string").alias("v"))
    r2 = hll_distinct(small, "v").collect()[0]
    assert r2["n_exact"] == 40 and abs(r2["est_distinct"] - 40) / 40 < 0.25
    # determinism: same input partitioned differently -> identical estimate
    r3 = hll_distinct(df.repartition(7), "v").collect()[0]
    assert r3["est_distinct"] == r["est_distinct"]


def test_stream_late_drop_semantics(spark):
    """The middle-third batch arrives below the watermark and must vanish;
    emitted windows are exactly the finalized ones (end <= max ts - delay)."""
    import pandas as pd

    from raptor_rag_spark.streaming.events_stream import stream_late_drop

    SF = "/root/testdata/sf0.001"
    out = stream_late_drop(spark, SF, delay_s=3600).toPandas()

    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ep", F.col("ts").cast("timestamp_ltz").cast("long")
    )
    lo, hi = ev.agg(F.min("ep"), F.max("ep")).first()
    d1, d2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    kept = ev.where((F.col("ep") < d1) | (F.col("ep") >= d2))
    expect = (
        kept.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("value_sum"),
        )
        .withColumn("wend", F.unix_timestamp("hour_ts") + 3600)
        .where(F.col("wend") <= hi - 3600)
        .drop("wend")
        .toPandas()
    )
    key = ["hour_ts", "event_type"]
    a = out.sort_values(key).reset_index(drop=True)
    b = expect[out.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the late batch really contained data (the drop is meaningful)
    n_late = ev.where((F.col("ep") >= d1) & (F.col("ep") < d2)).count()
    assert n_late > 0 and len(out) > 0


def test_cms_one_sided_error(spark):
    from raptor_rag_spark.operators.sketches import cms_heavy_terms

    docs = spark.createDataFrame(
        [(("alpha " * 50) + ("beta " * 20) + "gamma delta epsilon",)], "text STRING"
    )
    out = {r["term"]: r for r in cms_heavy_terms(docs, top_k=3).collect()}
    assert out["alpha"]["exact"] == 50 and out["beta"]["exact"] == 20
    for r in out.values():
        assert r["est"] >= r["exact"]  # count-min never underestimates
    # at width 512 with 5 distinct terms collisions are absent -> exact
    assert out["alpha"]["est"] == 50


def test_merge_upsert_key_only(spark):
    """Key-only presence merge (no value columns): matched rows are
    'unchanged', never 'update'; the SQL twin parses too."""
    import duckdb

    from raptor_rag_spark.operators.merge import merge_upsert, merge_upsert_sql

    base = spark.createDataFrame([(1,), (2,)], "k LONG")
    upd = spark.createDataFrame([(2,), (3,)], "k LONG")
    out = {r["k"]: r["action"] for r in merge_upsert(base, upd, ["k"], []).collect()}
    assert out == {1: "keep", 2: "unchanged", 3: "insert"}
    con = duckdb.connect()
    sql = merge_upsert_sql("SELECT 1 AS k UNION ALL SELECT 2", "SELECT 2 AS k UNION ALL SELECT 3", ["k"], [])
    rows = dict(con.execute(sql).fetchall())
    assert rows == {1: "keep", 2: "unchanged", 3: "insert"}


def test_group_quantiles_ignores_nulls(spark):
    """NULL values must not shift ranks (Spark orders NULLS FIRST, DuckDB
    NULLS LAST — the twins only agree if NULLs are excluded)."""
    from raptor_rag_spark.operators.stats import group_quantiles

    df = spark.createDataFrame(
        [("g", None), ("g", 1), ("g", 2), ("g", 3)], "grp STRING, v INT"
    )
    r = group_quantiles(df, "grp", "v", qs=(50,)).collect()[0]
    assert r["n"] == 3 and r["p50"] == 2 and r["v_min"] == 1


def test_repetition_signals_covers_tokenless_docs(spark):
    """A doc with no word tokens (pure punctuation spam) still gets its
    line-duplication signal instead of being dropped by the bigram join."""
    from raptor_rag_spark.operators.curation import repetition_signals

    pages = spark.createDataFrame(
        [("u1", "!!!\n!!!\n!!!"), ("u2", "alpha beta gamma\ndelta epsilon zeta")],
        "url STRING, text STRING",
    )
    out = {r["url"]: r for r in repetition_signals(pages).collect()}
    assert out["u1"]["dup_line_frac"] == 1.0
    assert out["u1"]["top_bigram_frac"] == 0.0
    assert out["u2"]["dup_line_frac"] == 0.0


def test_cms_estimate_absent_item_is_zero(spark):
    """An item that never entered the sketch must estimate 0 (min over
    counters including empty buckets), not vanish or over-report."""
    from raptor_rag_spark.operators.sketches import cms_estimate, cms_table

    data = spark.createDataFrame([("alpha",)] * 5 + [("beta",)] * 2, "v STRING")
    table = cms_table(data, "v")
    items = spark.createDataFrame([("alpha",), ("never-seen-term",)], "v STRING")
    out = {r["item"]: r["est"] for r in cms_estimate(table, items).collect()}
    assert out["alpha"] >= 5
    assert out["never-seen-term"] == 0


def test_srp_pairs_finds_neardups(spark):
    import numpy as np

    from raptor_rag_spark.operators.similarity import srp_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64)).astype("float32")
    rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
    # near-dup twins: tiny perturbation of vectors 0..4
    for i in range(5):
        pert = base[i].copy()
        pert[0] = 0.0
        rows.append((100 + i, [float(v) for v in pert]))
    vecs = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = srp_pairs(vecs, min_sim=0.9)
    got = {(r["a_id"], r["b_id"]) for r in out.collect()}
    # all five planted twins recovered (cos ≈ 0.99, all 32 bits agree whp)
    assert {(i, 100 + i) for i in range(5)} <= got
    for r in srp_pairs(vecs, min_sim=0.9).collect():
        assert r["cos_sim"] >= 0.9


def test_bloom_semijoin_no_false_negatives(spark):
    """Every true member passes the filter; false positives are counted, not
    hidden; the audit row is internally consistent."""
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.sketches import bloom_semijoin

    probe = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    keys = spark.range(0, 2000, 4).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    row = bloom_semijoin(probe, keys, "key").collect()[0]
    assert row["n_probe"] == 2000 and row["n_true"] == 500
    # no false negatives: every true member passes
    assert row["n_pass"] >= row["n_true"]
    assert row["n_pass"] - row["n_true"] == row["n_false_pos"]
    # 500 keys * 3 hashes into 2016 bits -> fill ~0.53; fpr ~ 0.15, so the
    # pre-filter must actually prune (pass rate well below 1)
    assert row["n_pass"] < 1400


def test_hits_hub_authority_separation(spark):
    from raptor_rag_spark.operators.graph import hits

    # h1/h2 are pure hubs pointing at a1/a2 (pure authorities); x.com does both.
    links = spark.createDataFrame(
        [
            ("h1.com", "a1.com", 2),
            ("h1.com", "a2.com", 1),
            ("h2.com", "a1.com", 1),
            ("x.com", "a1.com", 1),
            ("a2.com", "x.com", 1),
        ],
        "src_host STRING, dst_host STRING, n_links LONG",
    )
    out = {r["host"]: r for r in hits(links, iterations=5).collect()}
    assert set(out) == {"h1.com", "h2.com", "x.com", "a1.com", "a2.com"}
    # pure authorities have zero hub score; pure hubs have zero authority
    assert out["a1.com"]["hub"] == 0.0 and out["h1.com"]["auth"] == 0.0
    # a1 collects the most in-mass; h1 distributes the most out-mass
    assert out["a1.com"]["auth"] > out["a2.com"]["auth"]
    assert out["h1.com"]["hub"] > out["h2.com"]["hub"]
    # L1 normalization: both score vectors sum to 1
    assert abs(sum(r["hub"] for r in out.values()) - 1.0) < 1e-9
    assert abs(sum(r["auth"] for r in out.values()) - 1.0) < 1e-9


def test_link_ppr_mass_concentrates_near_seeds(spark):
    from raptor_rag_spark.operators.graph import link_ppr

    # a.com is the only seed; chain a -> m -> z, plus unreachable u -> v
    links = spark.createDataFrame(
        [("a.com", "m.com", 1), ("m.com", "z.com", 1), ("u.com", "v.com", 1)],
        "src_host STRING, dst_host STRING, n_links LONG",
    )
    out = {r["host"]: r for r in link_ppr(links, seed_prefix="a", iterations=5).collect()}
    assert out["a.com"]["is_seed"] and not out["m.com"]["is_seed"]
    # unreachable-from-seed hosts get exactly zero mass
    assert out["u.com"]["rank"] == 0.0 and out["v.com"]["rank"] == 0.0
    # mass decays with distance from the seed
    assert out["a.com"]["rank"] > out["m.com"]["rank"] > out["z.com"]["rank"] > 0.0


def test_cell_hll_pyramid_merge_equals_direct(spark):
    from raptor_rag_spark.operators.sketches import cell_hll_pyramid

    pts = spark.range(3000).select(
        ((F.hash(F.col("id")).cast("double") / 2147483647.0 + 1.0) / 2.0).alias("x"),
        ((F.hash(F.col("id") * 7).cast("double") / 2147483647.0 + 1.0) / 2.0).alias("y"),
        (F.col("id") % 50).alias("v"),
    )
    pyr = cell_hll_pyramid(pts, "v", res=4, min_res=2)
    rows = {(r["level_res"], r["cell_id"]): r["est_distinct"] for r in pyr.collect()}
    # level-4 rolled up two steps must equal building directly at res 2
    direct2 = {
        r["cell_id"]: r["est_distinct"]
        for r in cell_hll_pyramid(pts, "v", res=2, min_res=2).collect()
    }
    got2 = {c: v for (lv, c), v in rows.items() if lv == 2}
    assert got2 == direct2  # bit-identical, not approx: max-merge associativity
    # root-ish level estimate is near the true distinct count (50)
    lv2_total = cell_hll_pyramid(pts, "v", res=2, min_res=0)
    root = [r for r in lv2_total.collect() if r["level_res"] == 0]
    assert len(root) == 1 and abs(root[0]["est_distinct"] - 50) / 50 < 0.25
