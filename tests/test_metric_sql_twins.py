"""The ROUGE-L / METEOR DuckDB oracle twins must be bit-identical to the
Python kernels (no Spark needed — the Spark side runs the very same kernels
inside a pandas_udf, so kernel == SQL proves the whole twin).

Covers the reformulations the twins rely on:
- rouge_l_sql: monotone-row LCS (prefix-max over match candidates) in a
  recursive CTE == the classic 2-row DP;
- meteor_sql: greedy first-unused alignment == k-th-occurrence equi-join.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raptor_rag_spark.kernels.metrics import meteor, rouge_l
from raptor_rag_spark.operators.evalmetrics import meteor_sql, rouge_l_sql

WORDS = ["the", "cat", "sat", "mat", "a", "dog", "ran", "fast", "Blue", "sky!"]


def _run(sql_gen, pairs):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE metric_pairs(pair_id BIGINT, prediction VARCHAR, gold VARCHAR)"
    )
    con.executemany("INSERT INTO metric_pairs VALUES (?, ?, ?)", pairs)
    q = sql_gen("SELECT pair_id, prediction, gold FROM metric_pairs")
    return dict(con.execute(f"SELECT * FROM ({q}) ORDER BY pair_id").fetchall())


texts = st.lists(st.sampled_from(WORDS), max_size=12).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
def test_rouge_l_sql_twin(pairs):
    rows = [(i, p, g) for i, (p, g) in enumerate(pairs)]
    got = _run(rouge_l_sql, rows)
    for i, p, g in rows:
        assert got[i] == rouge_l(p, g), (p, g)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
def test_meteor_sql_twin(pairs):
    rows = [(i, p, g) for i, (p, g) in enumerate(pairs)]
    got = _run(meteor_sql, rows)
    for i, p, g in rows:
        assert got[i] == meteor(p, g), (p, g)


def test_rouge_l_sql_edge_cases():
    rows = [
        (0, "", ""),  # both empty -> 1.0
        (1, "word", ""),  # gold empty -> 0.0
        (2, "a", "a"),  # normalizes to empty on both sides -> 1.0
        (3, "x y z", "z y x"),  # lcs 1
    ]
    got = _run(rouge_l_sql, rows)
    for i, p, g in rows:
        assert got[i] == rouge_l(p, g)


def test_meteor_sql_edge_cases():
    rows = [
        (0, "", ""),
        (1, "b a", "a b"),  # full match, 2 chunks -> 0.5
        (2, "x y", "a b"),
        (3, "a a b", "a b a"),  # repeated-token occurrence ranks
    ]
    got = _run(meteor_sql, rows)
    for i, p, g in rows:
        assert got[i] == meteor(p, g)
    assert got[1] == pytest.approx(0.5)
