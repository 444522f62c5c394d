"""SymSpell deletion-neighborhood fuzzy matching (operators/fuzzy.py)."""

import duckdb
import pandas as pd

from raptor_rag_spark.operators.fuzzy import (
    MAX_KEY_BUCKET,
    fuzzy_vocab_match,
    fuzzy_vocab_match_sql,
)

DOCS = [
    (0, "spark join merge window scan"),
    (1, "spark merge sort filter"),
    (2, "window window join spark"),
]


def _match(spark, qterms):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r.qterm, r.term): (r.dist, r.df)
        for r in fuzzy_vocab_match(docs, qterms).collect()
    }


def test_all_single_edit_kinds(spark):
    out = _match(spark, ["spqrk", "joinn", "mege", "merge", "qqqqq"])
    assert out[("spqrk", "spark")] == (1, 3)  # substitution
    assert out[("joinn", "join")] == (1, 2)  # insertion in the query
    assert out[("mege", "merge")] == (1, 2)  # deletion in the query
    assert out[("merge", "merge")] == (0, 2)  # exact
    assert not any(q == "qqqqq" for q, _ in out)  # no match at dist ≤ 1


def test_no_false_positives_at_distance_two(spark):
    # "spikr" is distance 2 from "spark" — deletion keys may or may not
    # collide, but the levenshtein verify must drop it.
    out = _match(spark, ["spikr"])
    assert not any(t == "spark" for _, t in out)


def test_short_terms_excluded(spark):
    # 2-char queries and vocab terms are below MIN_LEN.
    docs_short = [(0, "ab cd spark")]
    docs = spark.createDataFrame(docs_short, "doc_id long, text string")
    rows = fuzzy_vocab_match(docs, ["ab", "spark"]).collect()
    assert {(r.qterm, r.term) for r in rows} == {("spark", "spark")}


def test_twin_matches_duckdb(spark):
    qterms = ["spqrk", "joinn", "mege", "merge", "windw"]
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        fuzzy_vocab_match(docs, qterms)
        .toPandas()
        .sort_values(["qterm", "term"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_in", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = (
        con.execute(fuzzy_vocab_match_sql("SELECT doc_id, text FROM docs_in", qterms))
        .df()
        .sort_values(["qterm", "term"])
        .reset_index(drop=True)
    )
    assert got[["qterm", "term"]].values.tolist() == want[["qterm", "term"]].values.tolist()
    assert list(got["dist"]) == list(want["dist"])
    assert list(got["df"]) == list(want["df"])
    assert MAX_KEY_BUCKET >= 1
