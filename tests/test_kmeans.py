"""Deterministic distributed k-means: semantics + DuckDB twin."""

import duckdb


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, x double, y double")


def test_kmeans_recovers_separated_clusters(spark):
    from raptor_rag_spark.operators.kmeans import kmeans_xy

    blobs = {0: (0.1, 0.1), 1: (0.9, 0.1), 2: (0.5, 0.9)}
    rows = []
    for b, (bx, by) in blobs.items():
        for i in range(6):
            rows.append((b * 10 + i, bx + 0.003 * i, by - 0.002 * i))
    out = kmeans_xy(_df(spark, rows), k=3, iters=4).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] // 10, set()).add(r["cluster"])
    # each blob lands in exactly one cluster and the three are distinct
    assert all(len(cs) == 1 for cs in by_blob.values())
    assert len(set.union(*by_blob.values())) == 3
    assert all(r["dist"] < 1e-3 for r in out)


def test_kmeans_twin_and_empty_cluster(spark):
    from raptor_rag_spark.operators.kmeans import kmeans_xy, kmeans_xy_sql

    # k=5 over 2 tight blobs → most seeds collapse, clusters go empty
    rows = [(i, 0.2 + 0.001 * i, 0.2) for i in range(4)] + [
        (10 + i, 0.8, 0.8 - 0.001 * i) for i in range(4)
    ]
    got = sorted(tuple(r) for r in kmeans_xy(_df(spark, rows), k=5, iters=3).collect())
    vals = " UNION ALL ".join(
        f"SELECT {i} AS vec_id, {x} AS x, {y} AS y" for i, x, y in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(kmeans_xy_sql(vals, k=5, iters=3)).fetchall()
    )
    assert got == want
    assert len(got) == len(rows)  # every point still assigned
