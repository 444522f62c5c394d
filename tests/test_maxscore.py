"""MaxScore-pruned BM25 must equal full BM25 exactly — and actually prune."""

import numpy as np

from raptor_rag_spark.operators.ranking import (
    _bm25_matched,
    bm25_rank,
    maxscore_rank,
)

RARE = ["zephyr", "quasar", "obelisk", "fjord"]
COMMON = ["data", "web", "page", "crawl", "index"]


def _corpus(n=300):
    """Common terms everywhere; rare terms only in a handful of docs — the
    shape where MaxScore's essential/non-essential split pays off."""
    rng = np.random.RandomState(3)
    docs = []
    for i in range(n):
        words = list(rng.choice(COMMON, size=rng.randint(5, 15)))
        if i % 20 == 0:
            words += [RARE[i // 20 % len(RARE)]] * rng.randint(1, 4)
        rng.shuffle(words)
        docs.append((i, " ".join(words)))
    return docs


def test_maxscore_equals_full_bm25(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id LONG, text STRING")
    qs = spark.createDataFrame(
        [(0, "zephyr data web"), (1, "quasar crawl"), (2, "data web page")],
        "query_id INT, qtext STRING",
    )
    full = bm25_rank(docs, qs, top_k=5).collect()
    pruned = maxscore_rank(docs, qs, top_k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, pruned), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, full), key=lambda t: (t[0], t[3])
    )


def test_maxscore_actually_prunes(spark):
    """For the rare-term query the common terms are non-essential, so the
    candidate set must be strictly smaller than the matched-doc set."""
    docs = spark.createDataFrame(_corpus(), "doc_id LONG, text STRING")
    qs = spark.createDataFrame([(0, "zephyr data")], "query_id INT, qtext STRING")
    from pyspark.sql import functions as F

    from raptor_rag_spark.operators.ranking import _maxscore_candidates

    matched = _bm25_matched(docs, qs)
    n_matched_docs = matched.select("doc_id").distinct().count()
    assert n_matched_docs > 200  # almost every doc matches "data"
    dfreq = matched.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    dfs = {r["term"]: r["df"] for r in dfreq}
    assert dfs["zephyr"] < 10 < dfs["data"]  # the pruning precondition

    # top_k=3: zephyr has ~4 postings (docs 0, 80, 160, 240), so theta exists and "data" (ub ~0.002)
    # falls below it -> candidates are just the zephyr docs
    n_candidates = _maxscore_candidates(matched, 3).count()
    assert n_candidates < 10  # "data" postings never aggregated per doc

    full = bm25_rank(docs, qs, top_k=3).collect()
    pruned = maxscore_rank(docs, qs, top_k=3).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))
    # the very top hits are zephyr docs (highest-impact term)
    top_docs = {r["doc_id"] for r in pruned if r["rank"] <= 2}
    assert top_docs <= {0, 80, 160, 240}
