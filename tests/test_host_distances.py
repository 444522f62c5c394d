"""Bellman-Ford host distances: DuckDB twin vs reference Dijkstra + Spark twin."""

from __future__ import annotations

import heapq

import duckdb

LINKS = [
    # (src_host, dst_host, n_links); source = min host = "a.com"
    ("a.com", "b.com", 4),
    ("a.com", "c.com", 1),
    ("b.com", "c.com", 2),
    ("c.com", "d.com", 1),
    ("b.com", "d.com", 1),
    ("d.com", "e.com", 5),
    ("x.com", "y.com", 1),  # unreachable island
]


def _dijkstra() -> dict[str, float]:
    # every shortest path here has <= 3 hops, so 6 Bellman-Ford rounds have
    # fully converged and plain Dijkstra is the right reference
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, n in LINKS:
        adj.setdefault(s, []).append((d, 1.0 / n))
    dist = {"a.com": 0.0}
    pq = [(0.0, "a.com")]
    while pq:
        dv, v = heapq.heappop(pq)
        if dist.get(v, 1e18) < dv:
            continue
        for u, w in adj.get(v, []):
            nd = dv + w
            if nd < dist.get(u, 1e18):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def _duck():
    from raptor_rag_spark.operators.graph import host_distances_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE links(src_host VARCHAR, dst_host VARCHAR, n_links BIGINT)")
    con.executemany("INSERT INTO links VALUES (?, ?, ?)", LINKS)
    return dict(
        con.execute(
            host_distances_sql("SELECT src_host, dst_host, n_links FROM links")
        ).fetchall()
    )


def test_sql_matches_dijkstra():
    got = _duck()
    want = _dijkstra()
    assert set(got) == set(want)  # island never reached
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h
    # sanity: the heavy a->b link (n=4) makes the 2-hop a->b->c path (0.75)
    # beat the direct a->c link (1.0)
    assert got["b.com"] == 0.25 and got["c.com"] == 0.75


def test_spark_twin(spark):
    from raptor_rag_spark.operators.graph import host_distances

    df = spark.createDataFrame(LINKS, "src_host string, dst_host string, n_links long")
    got = {r["host"]: r["dist"] for r in host_distances(df).collect()}
    assert got == _duck()


def test_host_communities_semantics_and_twin(spark):
    """Two dense triangles joined by one weak bridge resolve into two
    communities; Spark == DuckDB exactly."""
    import duckdb as _dd

    from raptor_rag_spark.operators.graph import host_communities, host_communities_sql

    edges = [
        # triangle 1 (heavy)
        ("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5),
        # triangle 2 (heavy)
        ("b1", "b2", 5), ("b2", "b3", 5), ("b1", "b3", 5),
        # weak bridge
        ("a3", "b1", 1),
        # isolated pair
        ("c1", "c2", 2),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    got = {r["host"]: r["community"] for r in host_communities(df).collect()}
    a = {got["a1"], got["a2"], got["a3"]}
    b = {got["b1"], got["b2"], got["b3"]}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert got["c1"] == got["c2"]
    con = _dd.connect()
    con.execute("CREATE TABLE lk(src_host VARCHAR, dst_host VARCHAR, n_links BIGINT)")
    con.executemany("INSERT INTO lk VALUES (?, ?, ?)", edges)
    want = dict(
        con.execute(
            host_communities_sql("SELECT src_host, dst_host, n_links FROM lk")
        ).fetchall()
    )
    assert got == want
