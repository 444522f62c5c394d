"""URL path-pyramid rollup: Spark/DuckDB twin + mass-conservation invariants."""

from __future__ import annotations

import duckdb

PAGES = [
    ("https://a.com/x/y/z.html", "alpha beta gamma"),
    ("https://a.com/x/y/w.html", "one two"),
    ("https://a.com/x/other", "three"),
    ("https://a.com/", "root page"),
    ("https://b.org/p/q/r/s/t", "deep path page here"),
    ("https://b.org/p", "shallow"),
]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", PAGES)
    return con


def test_sql_invariants():
    from raptor_rag_spark.operators.webops import path_rollup_sql

    rows = _duck().execute(
        path_rollup_sql("SELECT url, text FROM pages")
    ).fetchall()
    by = {(h, d, p): (n, t) for h, d, p, n, t in rows}
    # depth 0 = per-host page totals
    assert by[("a.com", 0, "/")][0] == 4
    assert by[("b.org", 0, "/")][0] == 2
    # depth truncation: the deep b.org page stops at depth 3
    assert max(d for (h, d, p) in by if h == "b.org") == 3
    assert ("b.org", 3, "/p/q/r") in by
    # prefix nesting: child counts never exceed the parent's
    assert by[("a.com", 2, "/x/y")][0] == 2
    assert by[("a.com", 1, "/x")][0] == 3
    # token mass at depth 0 equals the sum over all pages of the host
    assert by[("a.com", 0, "/")][1] == sum(
        len(t.split()) for u, t in PAGES if "a.com" in u
    )


def test_spark_twin(spark):
    from raptor_rag_spark.operators.webops import path_rollup, path_rollup_sql

    df = spark.createDataFrame(PAGES, "url string, text string")
    got = {tuple(r) for r in path_rollup(df).collect()}
    want = {
        tuple(r)
        for r in _duck().execute(path_rollup_sql("SELECT url, text FROM pages")).fetchall()
    }
    assert got == want
