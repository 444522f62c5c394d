"""Visvalingam one-pass simplification: collinear points drop, spikes stay."""

from __future__ import annotations

from datetime import datetime

import duckdb

# u1 walks a straight line with one big spike at event 4; the truly
# collinear points (2, 6) have zero area and drop; endpoints, the spike and
# its shoulders (3, 5 — their triangles include the spike) survive
ROWS = [
    ("u1", 1, "2024-01-01 00:00:00", 0.0, 0.0),
    ("u1", 2, "2024-01-01 01:00:00", 0.1, 0.0),
    ("u1", 3, "2024-01-01 02:00:00", 0.2, 0.0),
    ("u1", 4, "2024-01-01 03:00:00", 0.3, 0.5),
    ("u1", 5, "2024-01-01 04:00:00", 0.4, 0.0),
    ("u1", 6, "2024-01-01 05:00:00", 0.5, 0.0),
    ("u1", 7, "2024-01-01 06:00:00", 0.6, 0.0),
]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE evt(user_id VARCHAR, event_id BIGINT, ts TIMESTAMP, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO evt VALUES (?, ?, ?, ?, ?)", ROWS)
    return con


def test_sql_keeps_spike_drops_flats():
    from raptor_rag_spark.operators.spacetime import traj_simplify_sql

    rows = _duck().execute(traj_simplify_sql("SELECT * FROM evt", min_area=0.001)).fetchall()
    kept = sorted(r[1] for r in rows)
    assert kept == [1, 3, 4, 5, 7]  # endpoints + spike + shoulders
    spike = next(r for r in rows if r[1] == 4)
    assert abs(spike[5] - 0.05) < 1e-9  # triangle (0.2,0)-(0.3,0.5)-(0.4,0) area


def test_spark_twin(spark):
    from raptor_rag_spark.operators.spacetime import traj_simplify, traj_simplify_sql

    rows = [(u, e, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x, y) for u, e, t, x, y in ROWS]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp, x double, y double")
    got = {tuple(r) for r in traj_simplify(df, min_area=0.001).collect()}
    want = {
        tuple(r)
        for r in _duck().execute(traj_simplify_sql("SELECT * FROM evt", min_area=0.001)).fetchall()
    }
    assert got == want
