"""Host crawl-volume anomaly: constructed spike must score z > 2; twin exact."""

from __future__ import annotations

from datetime import datetime

import duckdb

ROWS = []
# host a.com: 2-3 pages/week for 4 weeks, then 10 in its last week (spike)
for wk, n in [("2024-01-01", 2), ("2024-01-08", 3), ("2024-01-15", 2), ("2024-01-22", 3), ("2024-01-29", 10)]:
    for i in range(n):
        ROWS.append((f"https://a.com/p{wk}{i}", f"{wk} 10:00:00"))
# host b.com: flat 3/week
for wk in ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-29"]:
    for i in range(3):
        ROWS.append((f"https://b.com/q{wk}{i}", f"{wk} 11:00:00"))


def _duck():
    from raptor_rag_spark.operators.webops import host_anomaly_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE pg(url VARCHAR, warc_ts TIMESTAMP)")
    con.executemany("INSERT INTO pg VALUES (?, ?)", ROWS)
    return {
        r[0]: r
        for r in con.execute(host_anomaly_sql("SELECT url, warc_ts FROM pg")).fetchall()
    }


def test_spike_scores_high_flat_scores_zero():
    got = _duck()
    a = got["a.com"]
    assert a[1] == 10 and a[2] == 2.5 and a[4] > 2.0  # c_last, mean, z
    b = got["b.com"]
    assert b[4] == 0.0  # sd = 0 guard on the flat host


def test_spark_twin(spark):
    from raptor_rag_spark.operators.webops import host_anomaly

    rows = [(u, datetime.strptime(t, "%Y-%m-%d %H:%M:%S")) for u, t in ROWS]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    got = {tuple(r) for r in host_anomaly(df).collect()}
    want = {tuple(v) for v in _duck().values()}
    assert got == want
