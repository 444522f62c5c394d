"""TextRank keywords: hub word must rank first; Spark == DuckDB twin."""

from __future__ import annotations

import duckdb

# "spark" co-occurs with every other long word (hub); the others only ever
# touch "spark" — so the hub must take rnk 1. Short words (<4 chars) and
# hapax pairs (min_count=2) are pruned.
DOC = "spark engine spark tiles spark raster spark engine spark tiles spark raster is ok"
ROWS = [(DOC,), (DOC,)]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", ROWS)
    return con


def test_sql_hub_ranks_first():
    from raptor_rag_spark.operators.keywords import textrank_keywords_sql

    rows = _duck().execute(textrank_keywords_sql("SELECT text FROM docs")).fetchall()
    assert rows[0][0] == "spark" and rows[0][3] == 1
    terms = {r[0] for r in rows}
    assert "is" not in terms and "ok" not in terms  # min_len pruning
    # hub out-degree counts weighted co-occurrences in both directions' source rows
    by = {r[0]: r for r in rows}
    assert by["spark"][1] > by["engine"][1]


def test_edges_are_symmetric_and_pruned():
    from raptor_rag_spark.operators.keywords import cooccur_edges_sql

    rows = _duck().execute(cooccur_edges_sql("SELECT text FROM docs")).fetchall()
    edges = {(a, b): n for a, b, n in rows}
    for (a, b), n in edges.items():
        assert edges[(b, a)] == n  # undirected
        assert len(a) >= 4 and len(b) >= 4 and a != b


def test_spark_twin(spark):
    from raptor_rag_spark.operators.keywords import textrank_keywords, textrank_keywords_sql

    df = spark.createDataFrame(ROWS, "text string")
    got = {tuple(r) for r in textrank_keywords(df).collect()}
    want = {
        tuple(r)
        for r in _duck().execute(textrank_keywords_sql("SELECT text FROM docs")).fetchall()
    }
    assert got == want
