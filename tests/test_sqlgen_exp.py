"""Twin exp + GMM fit/assign split.

The exp twin must be bit-identical across Spark, DuckDB, and the Python
scalar reference over its domain (x <= 0), and the distributed assignment
recomputed from exported EM state must reproduce the grouped kernel's labels.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.functions import sqlgen as G


@pytest.fixture(scope="module")
def xs():
    rng = np.random.default_rng(7)
    return np.concatenate(
        [
            -rng.exponential(5.0, 500),
            -rng.uniform(0, 750, 300),
            np.array([0.0, -1e-300, -0.3465, -0.3466, -700.0, -699.999999, -1.0, -20.0]),
        ]
    )


def test_exp_twin_duckdb_bits(xs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [xs.tolist()])
    duck = next(iter(con.execute(f"SELECT {G.exp_sql('x')} FROM t").fetchnumpy().values()))
    py = np.array([G.exp_py(float(x)) for x in xs])
    assert (duck.view(np.uint64) == py.view(np.uint64)).all()


def test_exp_twin_spark_bits(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    out = np.array([r[0] for r in df.select(G.exp_col(F.col("x")).alias("e")).collect()])
    py = np.array([G.exp_py(float(x)) for x in xs])
    assert (out.view(np.uint64) == py.view(np.uint64)).all()


def test_exp_twin_accuracy(xs):
    vals = np.array([G.exp_py(float(x)) for x in xs])
    true = np.exp(xs)
    mask = xs > -700
    rel = np.abs(vals[mask] - true[mask]) / np.maximum(true[mask], 1e-308)
    assert rel.max() < 5e-16


def test_gmm_assign_matches_kernel_labels(spark):
    """fit-export + distributed twin assignment == the grouped kernel's soft
    labels on well-separated blobs (same EM, same threshold decisions)."""
    from raptor_rag_spark.operators.cluster import (
        gmm_assign_from_params,
        gmm_fit_export,
        gmm_soft_cluster,
    )

    rng = np.random.default_rng(42)
    centers = rng.uniform(-5, 5, (3, 8))
    rows = []
    nid = 0
    for cell in (0, 1):
        for c in range(3):
            for _ in range(15):
                v = centers[c] + rng.normal(0, 0.05, 8)
                rows.append((nid, [float(x) for x in v], cell))
                nid += 1
    df = spark.createDataFrame(rows, "node_id long, embedding array<double>, cell_id long")

    kernel = gmm_soft_cluster(df, reduction_dimension=4).toPandas()
    raw = gmm_fit_export(df, reduction_dimension=4).cache()
    points = raw.where(F.col("kind") == "pt").select("group_key", "node_id", "g", "coords")
    params = raw.where(F.col("kind") == "pm").select(
        "group_key", "g", "cluster_id", "log_norm", "mean", "nhiv"
    )
    assigned = gmm_assign_from_params(points, params).toPandas()

    k = set(map(tuple, kernel[["group_key", "node_id", "cluster_id"]].to_numpy()))
    a = set(map(tuple, assigned[["group_key", "node_id", "cluster_id"]].to_numpy()))
    assert k == a
    # n_clusters: every fitted local cluster counted once per group
    per_group = assigned.groupby("group_key")["n_clusters"].first()
    pm = raw.where(F.col("kind") == "pm").groupBy("group_key").count().toPandas()
    for _, r in pm.iterrows():
        assert per_group[r["group_key"]] == r["count"]
