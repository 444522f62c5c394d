"""Term-burst detection: constructed burst must rank first; Spark == DuckDB."""

from __future__ import annotations

from datetime import datetime

import duckdb

# three prior weeks of background chatter, then "solstice" explodes in the
# last week; "steady" stays flat
ROWS = []
for wk, day in [("2024-01-01", 1), ("2024-01-08", 8), ("2024-01-15", 15), ("2024-01-22", 22)]:
    last = day == 22
    for i in range(4):
        text = "steady words about the web " + ("solstice " * (6 if last else 1))
        ROWS.append((f"2024-01-{day:02d} 12:00:00", text))


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE pg(warc_ts TIMESTAMP, text VARCHAR)")
    con.executemany("INSERT INTO pg VALUES (?, ?)", ROWS)
    return con


def test_sql_burst_ranks_first():
    from raptor_rag_spark.operators.webops import term_bursts_sql

    rows = _duck().execute(
        term_bursts_sql("SELECT warc_ts, text FROM pg", min_last=3, min_prior_periods=2)
    ).fetchall()
    by = {r[0]: r for r in rows}
    assert rows[0][0] == "solstice"  # rnk 1
    term, c_last, avg_prior, lift, rnk = by["solstice"]
    assert c_last == 24 and avg_prior == 4.0 and lift == 6.0
    assert by["steady"][3] == 1.0  # flat term has lift 1


def test_spark_twin(spark):
    from raptor_rag_spark.operators.webops import term_bursts, term_bursts_sql

    rows = [(datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x) for t, x in ROWS]
    df = spark.createDataFrame(rows, "warc_ts timestamp, text string")
    got = {tuple(r) for r in term_bursts(df, min_last=3, min_prior_periods=2).collect()}
    want = {
        tuple(r)
        for r in _duck()
        .execute(term_bursts_sql("SELECT warc_ts, text FROM pg", min_last=3, min_prior_periods=2))
        .fetchall()
    }
    assert got == want
