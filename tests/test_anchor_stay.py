"""Anchor-text profile and stay-point detection: twins + semantics."""

from __future__ import annotations

import duckdb

PAGES = [
    (
        "https://s1.com/a",
        b'<p>x</p><p>see <a href="https://t1.com/p">good docs</a>.</p>'
        b'<p>see <a href="https://t2.com/q">bad page</a>.</p>',
    ),
    (
        "https://s2.com/b",
        b'<p>see <a href="https://t1.com/r">good stuff</a>.</p>'
        b'<p>see <a href="https://t1.com/s">good docs</a>.</p>',
    ),
    ("https://s3.com/c", b"<p>no links here</p>"),
]

EVENTS = [
    # (user_id, event_id, ts, x, y): user 1 dwells in one cell then moves
    (1, 0, "2024-01-01 00:00:00", 0.10, 0.10),
    (1, 1, "2024-01-01 00:05:00", 0.11, 0.11),
    (1, 2, "2024-01-01 00:10:00", 0.12, 0.10),
    (1, 3, "2024-01-01 00:15:00", 0.90, 0.90),
    (1, 4, "2024-01-01 00:20:00", 0.10, 0.10),  # returns: separate run
    (2, 5, "2024-01-01 00:00:00", 0.50, 0.50),
    (2, 6, "2024-01-01 00:30:00", 0.52, 0.51),
]


def _duck_pages():
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, html BLOB)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", PAGES)
    return con


def test_anchor_profile_sql_semantics():
    from raptor_rag_spark.operators.curation import anchor_text_profile_sql

    rows = _duck_pages().execute(
        anchor_text_profile_sql("SELECT url, html FROM pages")
    ).fetchall()
    by = {(h, t): (n, r) for h, t, n, r in rows}
    # "good" appears 3x pointing at t1.com and ranks first
    assert by[("t1.com", "good")] == (3, 1)
    assert by[("t1.com", "docs")] == (2, 2)
    assert by[("t2.com", "bad")][1] == 1
    assert not any(h == "s3.com" for h, _ in by)  # source-only host absent


def test_anchor_profile_spark_twin(spark):
    from raptor_rag_spark.operators.curation import (
        anchor_text_profile,
        anchor_text_profile_sql,
    )

    df = spark.createDataFrame(PAGES, "url string, html binary")
    got = {tuple(r) for r in anchor_text_profile(df).collect()}
    want = {
        tuple(r)
        for r in _duck_pages()
        .execute(anchor_text_profile_sql("SELECT url, html FROM pages"))
        .fetchall()
    }
    assert got == want


def _duck_events():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(user_id BIGINT, event_id BIGINT, ts TIMESTAMP, x DOUBLE, y DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?)", EVENTS)
    return con


def test_stay_points_sql_semantics():
    from raptor_rag_spark.operators.spacetime import stay_points_sql

    rows = _duck_events().execute(
        stay_points_sql("SELECT user_id, event_id, ts, x, y FROM ev", res=3, min_events=2)
    ).fetchall()
    # user 1: one dwell of 3 events (the return visit is a run of 1, dropped);
    # user 2: one dwell of 2 events
    assert len(rows) == 2
    by_user = {r[0]: r for r in rows}
    assert by_user[1][2] == 3 and by_user[1][3] == "2024-01-01 00:00:00"
    assert by_user[1][4] == "2024-01-01 00:10:00"
    assert by_user[2][2] == 2


def test_stay_points_spark_twin(spark):
    from datetime import datetime

    from raptor_rag_spark.operators.spacetime import stay_points, stay_points_sql

    rows = [(u, e, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x, y) for u, e, t, x, y in EVENTS]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x double, y double"
    )
    got = {tuple(r) for r in stay_points(df, res=3, min_events=2).collect()}
    want = {
        tuple(r)
        for r in _duck_events()
        .execute(stay_points_sql("SELECT user_id, event_id, ts, x, y FROM ev", res=3, min_events=2))
        .fetchall()
    }
    assert got == want
