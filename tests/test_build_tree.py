"""Tree-build plan tests: level semantics, checkpoint/resume, salting.

Mirrors the reference's cluster_tree_builder contracts (stop rule, children
coverage, per-level layering) plus the north rule's resume requirement.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.config import ClusterTreeConfig
from raptor_rag_spark.operators.rollup import build_parent_nodes, level_stats, salt_bucket_count, tile_stats
from raptor_rag_spark.plans.build_tree import build_tree, load_tree
from raptor_rag_spark.sources.checkpoint import TreeCheckpoint

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"
CFG = dict(max_tokens=64, num_layers=4, max_resolution=5)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 80").cache()


@pytest.fixture(scope="module")
def tree(spark, docs):
    return build_tree(docs, ClusterTreeConfig(**CFG)).cache()


def test_levels_shrink(tree):
    counts = {r["level"]: r["count"] for r in tree.groupBy("level").count().collect()}
    assert counts[0] > counts[1]
    for lv in range(1, max(counts)):
        assert counts[lv] >= counts[lv + 1]


def test_children_cover_previous_level(tree):
    max_level = tree.agg(F.max("level")).first()[0]
    for lv in range(1, max_level + 1):
        children = {
            c
            for r in tree.filter(F.col("level") == lv).select("children").collect()
            for c in r["children"]
        }
        prev = {r["node_id"] for r in tree.filter(F.col("level") == lv - 1).select("node_id").collect()}
        assert children == prev, f"level {lv} children must partition level {lv - 1}"


def test_children_sorted_unique(tree):
    rows = tree.filter("level > 0").select("children").collect()
    for r in rows:
        ch = list(r["children"])
        assert ch == sorted(set(ch))


def test_parent_cell_is_bit_parent(tree, spark):
    from raptor_rag_spark.functions.sqlgen import cell_parent_col

    pairs = (
        tree.filter("level = 1")
        .select(F.explode("children").alias("node_id"), F.col("cell_id").alias("parent_cell"))
        .join(tree.filter("level = 0").select("node_id", "cell_id"), "node_id")
        .withColumn("expect", cell_parent_col(F.col("cell_id"), 1))
    )
    assert pairs.filter(F.col("parent_cell") != F.col("expect")).count() == 0


def test_n_leaves_conserved(tree):
    leaf_count = tree.filter("level = 0").count()
    max_level = tree.agg(F.max("level")).first()[0]
    for lv in range(max_level + 1):
        total = tree.filter(F.col("level") == lv).agg(F.sum("n_leaves")).first()[0]
        assert total == leaf_count, f"level {lv} must conserve leaf count"


def test_checkpoint_resume_identical(spark, docs, tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("tree_full"))
    cfg = ClusterTreeConfig(**CFG)
    full = build_tree(docs, cfg, checkpoint_dir=d1)
    full_pdf = (
        full.select("node_id", "level", "cell_id", "token_count")
        .toPandas().sort_values("node_id").reset_index(drop=True)
    )
    full_count = len(full_pdf)

    # simulate a kill after level 1: drop manifests and data of levels > 1
    ckpt = TreeCheckpoint(d1)
    committed = ckpt.committed_levels()
    assert committed[0] == 0 and len(committed) >= 3
    for lv in committed:
        if lv > 1:
            shutil.rmtree(ckpt.level_dir(lv))
            import os

            os.remove(ckpt._manifest_path(lv))
    assert ckpt.resume_level() == 2

    resumed = build_tree(docs, cfg, checkpoint_dir=d1)
    resumed_pdf = (
        resumed.select("node_id", "level", "cell_id", "token_count")
        .toPandas().sort_values("node_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(full_pdf, resumed_pdf)
    # manifests carry lineage
    m = ckpt.manifest(0)
    assert m["rows"] > 0 and m["partitions"] and m["committed"]
    assert load_tree(spark, d1).count() == full_count


def test_hot_cell_salting(spark, docs):
    # force salting: tiny max_length_in_cluster makes every cell hot
    from raptor_rag_spark.operators.core import leaf_nodes

    leaves = leaf_nodes(docs, max_tokens=64, res=3)
    parents_salted = build_parent_nodes(leaves, 1, max_length_in_cluster=100)
    parents_plain = build_parent_nodes(leaves, 1, max_length_in_cluster=10**9)
    n_salted, n_plain = parents_salted.count(), parents_plain.count()
    assert n_salted > n_plain  # hot cells split into multiple parents
    # salted parents still conserve leaves
    assert parents_salted.agg(F.sum("n_leaves")).first()[0] == leaves.count()
    assert salt_bucket_count(1000, 7, 100) == 7
    assert salt_bucket_count(1000, 50, 100) == 10


def test_tile_and_level_stats(tree):
    tiles = tile_stats(tree)
    assert tiles.filter("n <= 0").count() == 0
    stats = level_stats(tree).orderBy("level").collect()
    assert stats[0]["compression_ratio"] == pytest.approx(1.0)
    # summaries compress: upper levels hold fewer tokens than the leaves
    assert stats[-1]["token_sum"] < stats[0]["token_sum"]


def test_config_keyed_cache_skip_and_reject(spark, docs, tmp_path_factory, monkeypatch):
    """Completed checkpoint + same config = zero build work (skip-if-exists);
    different config on the same dir = ValueError (reference
    benchmarks/_tree_cache.py:27-51)."""
    d = str(tmp_path_factory.mktemp("tree_cache"))
    cfg = ClusterTreeConfig(max_tokens=64, num_layers=2, max_resolution=6)
    first = build_tree(docs, cfg, checkpoint_dir=d)
    n = first.count()

    # same config: must come straight from the cache — leaf build forbidden
    import raptor_rag_spark.plans.build_tree as bt

    def boom(*a, **k):
        raise AssertionError("leaf_nodes called despite completed cache")

    monkeypatch.setattr(bt, "leaf_nodes", boom)
    again = build_tree(docs, cfg, checkpoint_dir=d)
    assert again.count() == n
    monkeypatch.undo()

    # changed config: refuse the dir instead of silently mixing levels
    cfg2 = ClusterTreeConfig(max_tokens=32, num_layers=2, max_resolution=6)
    assert cfg2.config_hash() != cfg.config_hash()
    with pytest.raises(ValueError, match="different config"):
        build_tree(docs, cfg2, checkpoint_dir=d)


def test_metrics_table_sink_and_resume(spark, docs, tmp_path_factory):
    """S8 metrics sink: checkpointed builds append per-level + final rows;
    resume_filter anti-joins completed keys (S5 shape)."""
    import os

    from raptor_rag_spark.sources.metrics import MetricsTable

    d = str(tmp_path_factory.mktemp("tree_metrics"))
    cfg = ClusterTreeConfig(max_tokens=64, num_layers=2, max_resolution=6)
    build_tree(docs, cfg, checkpoint_dir=d)

    mt = MetricsTable(os.path.join(d, "_metrics"))
    m = mt.load(spark)
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"tree_level", "final"}
    levels = sorted(r["key"] for r in m.filter("kind = 'tree_level'").collect())
    assert levels[0] == "0" and len(levels) >= 2
    assert all(r["rows"] > 0 for r in m.filter("kind = 'tree_level'").collect())

    # resume: pending work keyed by level, already-recorded levels drop out
    pending = spark.createDataFrame([(k,) for k in ["0", "1", "99"]], "level string")
    left = mt.resume_filter(pending, spark, "tree_level", "level").collect()
    assert [r["level"] for r in left] == ["99"]


def test_update_tree_matches_full_rebuild(spark):
    """Incremental dirty-tile update must be node-for-node identical to a
    full rebuild over the union corpus — ids, cells, levels, texts, children
    and embeddings."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.plans.build_tree import build_tree, update_tree

    cfg = ClusterTreeConfig(max_tokens=64, num_layers=3, max_resolution=6)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter("doc_id < 30")
    extra = docs.filter("doc_id >= 30 AND doc_id < 40")

    def sig(tree):
        rows = tree.select(
            "node_id",
            "level",
            "cell_id",
            "text",
            "token_count",
            F.array_sort("children").alias("ch"),
            F.round(F.aggregate("embedding", F.lit(0.0), lambda a, v: a + v), 6).alias("es"),
        ).collect()
        return sorted(
            (r["node_id"], r["level"], r["cell_id"], r["text"], r["token_count"],
             tuple(r["ch"]), r["es"])
            for r in rows
        )

    full = build_tree(docs.filter("doc_id < 40"), cfg)
    updated = update_tree(build_tree(base, cfg), extra, cfg)
    assert sig(updated) == sig(full)


def test_update_tree_touches_only_dirty_cells(spark):
    """A single new document must leave every node outside its dirty-cell
    cone byte-identical (same node_id set per untouched cell)."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.kernels.grid import cell_parent
    from raptor_rag_spark.plans.build_tree import build_tree, update_tree
    from raptor_rag_spark.operators.core import leaf_nodes

    cfg = ClusterTreeConfig(max_tokens=64, num_layers=3, max_resolution=6)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_tree = build_tree(docs.filter("doc_id < 30"), cfg).cache()
    extra = docs.filter("doc_id = 31")

    new_cells = {
        int(cell_parent(r["cell_id"], 1))
        for r in leaf_nodes(extra, max_tokens=64, res=6).select("cell_id").collect()
    }
    updated = update_tree(base_tree, extra, cfg).cache()
    before = {
        (r["level"], r["cell_id"]): r["node_id"]
        for r in base_tree.filter("level = 1").collect()
    }
    after = {
        (r["level"], r["cell_id"]): r["node_id"]
        for r in updated.filter("level = 1").collect()
    }
    for key, nid in before.items():
        if key[1] not in new_cells:
            assert after[key] == nid  # untouched level-1 cells are identical


def test_update_tree_deepens_shallow_base(spark):
    """When the base corpus is so small its tree stopped at a shallow level,
    folding in a larger batch must still produce the full-depth union tree
    (every level beyond the base's max is recomputed whole)."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.plans.build_tree import build_tree, update_tree

    cfg = ClusterTreeConfig(max_tokens=64, num_layers=3, max_resolution=6)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter("doc_id < 3")
    extra = docs.filter("doc_id >= 3 AND doc_id < 40")

    base_tree = build_tree(base, cfg)
    full = build_tree(docs.filter("doc_id < 40"), cfg)
    updated = update_tree(base_tree, extra, cfg)

    assert base_tree.agg(F.max("level")).collect()[0][0] < \
        full.agg(F.max("level")).collect()[0][0]

    def sig(tree):
        rows = tree.select(
            "node_id", "level", "cell_id", "text", "token_count",
            F.array_sort("children").alias("ch"),
        ).collect()
        return sorted(
            (r["node_id"], r["level"], r["cell_id"], r["text"],
             r["token_count"], tuple(r["ch"]))
            for r in rows
        )

    assert sig(updated) == sig(full)


def test_update_tree_wide_dirty_set_stays_distributed(spark):
    """Dirty-set propagation must survive a dirty set of >= 10^4 distinct
    cells — the 100-TB-scale shape where a 0.1% daily crawl touches millions
    of cells. The set is carried as a DataFrame through broadcast semi/anti
    joins (never collected into an ``isin`` literal list), so the per-level
    plan stays O(1) in dirty-set size; a literal-list plan blows up Catalyst
    analysis long before this size. Measured ~15 s wall at 13k new docs /
    10k+ dirty cells on local[32]."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.functions import sqlgen as G
    from raptor_rag_spark.operators.core import leaf_nodes
    from raptor_rag_spark.plans.build_tree import build_tree, update_tree

    cfg = ClusterTreeConfig(max_tokens=64, num_layers=3, max_resolution=9)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_tree = build_tree(docs.filter("doc_id < 50"), cfg).localCheckpoint(eager=True)

    extra = spark.range(13000).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.concat(F.lit("unique token "), F.sha2(F.col("id").cast("string"), 256)).alias("text"),
    )
    new_leaves = leaf_nodes(extra, max_tokens=64, res=9)
    n_dirty = (
        new_leaves.select(G.cell_parent_col(F.col("cell_id"), 1).alias("c"))
        .distinct()
        .count()
    )
    assert n_dirty >= 10_000  # the test genuinely exercises the target scale

    updated = update_tree(base_tree, extra, cfg).cache()
    n_base_leaves = base_tree.filter("level = 0").count()
    assert updated.filter("level = 0").count() == n_base_leaves + new_leaves.count()
    assert updated.agg(F.max("level")).collect()[0][0] >= 1
    updated.unpersist()


def test_hex_lattice_tree(spark):
    """build_tree(lattice='hex') runs the identical pipeline on the hex
    lattice: every level's cells are valid hex ids one resolution coarser,
    children partition the level below, and the config hash differs from the
    quad tree's (separate cache key)."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.functions import hexgen as H
    from raptor_rag_spark.plans.build_tree import build_tree

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = ClusterTreeConfig(max_tokens=48, num_layers=2, max_resolution=4, lattice="hex")
    assert cfg.config_hash() != ClusterTreeConfig(
        max_tokens=48, num_layers=2, max_resolution=4
    ).config_hash()
    tree = build_tree(docs, cfg)
    rows = tree.select("node_id", "level", "cell_id", "children").collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert set(by_level) >= {0, 1}
    for lv, rs in by_level.items():
        for r in rs:
            assert (r["cell_id"] >> H.RES_SHIFT) == 4 - lv  # hex res per level
    # children of level-1 nodes exactly partition level 0
    kids = [c for r in by_level[1] for c in r["children"]]
    assert sorted(kids) == sorted(r["node_id"] for r in by_level[0])
    # parent cell of each child's cell equals the parent's cell
    leaf_cell = {r["node_id"]: r["cell_id"] for r in by_level[0]}
    for r in by_level[1]:
        for c in r["children"]:
            assert H.hex_parent_packed_py(leaf_cell[c]) == r["cell_id"]


def test_update_tree_hex_lattice_matches_rebuild(spark):
    """Incremental update on the HEX lattice (driver dirty-set hops via
    hex_parent_packed_py) is node-for-node identical to a full rebuild."""
    from raptor_rag_spark.config import ClusterTreeConfig
    from raptor_rag_spark.plans.build_tree import build_tree, update_tree

    cfg = ClusterTreeConfig(max_tokens=64, num_layers=2, max_resolution=4, lattice="hex")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter("doc_id < 30")
    extra = docs.filter("doc_id >= 30 AND doc_id < 40")

    def sig(tree):
        rows = tree.select(
            "node_id", "level", "cell_id", "text", "token_count",
            F.array_sort("children").alias("ch"),
        ).collect()
        return sorted(
            (r["node_id"], r["level"], r["cell_id"], r["text"], r["token_count"], tuple(r["ch"]))
            for r in rows
        )

    full = build_tree(docs.filter("doc_id < 40"), cfg)
    updated = update_tree(build_tree(base, cfg), extra, cfg)
    assert sig(updated) == sig(full)
