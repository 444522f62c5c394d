"""OD flow matrix: endpoints, flow counts and mean desire-line length."""

from __future__ import annotations

from datetime import datetime

import duckdb

# two users travel NW-corner -> SE-corner (same flow, lengths sqrt(2) and
# sqrt(0.5)); one user never moves (self-flow, length 0)
ROWS = [
    ("u1", 1, "2024-01-01 00:00:00", 0.0, 0.0),
    ("u1", 2, "2024-01-01 01:00:00", 0.4, 0.9),
    ("u1", 3, "2024-01-01 02:00:00", 0.99, 0.99),
    ("u2", 1, "2024-01-01 00:00:00", 0.01, 0.01),
    ("u2", 2, "2024-01-01 01:00:00", 0.51, 0.51),
    ("u3", 1, "2024-01-01 00:00:00", 0.2, 0.2),
    ("u3", 2, "2024-01-01 01:00:00", 0.2, 0.2),
]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE evt(user_id VARCHAR, event_id BIGINT, ts TIMESTAMP, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO evt VALUES (?, ?, ?, ?, ?)", ROWS)
    return con


def test_sql_flows():
    from raptor_rag_spark.operators.spacetime import od_matrix_sql

    rows = _duck().execute(od_matrix_sql("SELECT * FROM evt", res=1)).fetchall()
    # res=1 -> 2x2 grid: u1 and u2 both flow cell(0,0) -> cell(1,1); u3 self-flow
    assert len(rows) == 2
    (o1, d1, n1, ln1, r1), (o2, d2, n2, ln2, r2) = rows
    assert (n1, r1) == (2, 1) and (n2, r2) == (1, 2)
    assert o1 != d1 and o2 == d2 and ln2 == 0.0
    import math

    want = round((math.sqrt(0.99**2 + 0.99**2) + math.sqrt(0.5**2 + 0.5**2)) / 2, 6)
    assert abs(ln1 - want) < 1e-9


def test_spark_twin(spark):
    from raptor_rag_spark.operators.spacetime import od_matrix, od_matrix_sql

    rows = [(u, e, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x, y) for u, e, t, x, y in ROWS]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp, x double, y double")
    got = {tuple(r) for r in od_matrix(df, res=1).collect()}
    want = {tuple(r) for r in _duck().execute(od_matrix_sql("SELECT * FROM evt", res=1)).fetchall()}
    assert got == want
