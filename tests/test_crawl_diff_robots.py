"""Tests for crawl-snapshot diff and the robots.txt longest-prefix gate."""

from __future__ import annotations

import pytest


def test_crawl_diff_counts(spark):
    from raptor_rag_spark.operators.webops import crawl_diff

    a = spark.createDataFrame(
        [
            ("https://h1.example.com/p/1", "one"),
            ("https://h1.example.com/p/2", "two"),
            ("https://h1.example.com/p/3", "three"),
            ("https://h2.example.com/p/1", "same"),
        ],
        "url string, text string",
    )
    b = spark.createDataFrame(
        [
            ("https://h1.example.com/p/1", "one"),        # unchanged
            ("https://h1.example.com/p/2", "two EDITED"),  # changed
            # /p/3 removed
            ("https://h1.example.com/p/9", "brand new"),   # added
            ("https://h2.example.com/p/1", "same"),        # unchanged
        ],
        "url string, text string",
    )
    got = {r["host"]: r for r in crawl_diff(a, b).collect()}
    h1 = got["h1.example.com"]
    assert (h1["added"], h1["removed"], h1["changed"], h1["unchanged"]) == (1, 1, 1, 1)
    h2 = got["h2.example.com"]
    assert (h2["added"], h2["removed"], h2["changed"], h2["unchanged"]) == (0, 0, 0, 1)


def test_snapshot_b_buckets(spark):
    from raptor_rag_spark.operators.webops import snapshot_b
    from raptor_rag_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 120, partitions=4).cache()
    b = snapshot_b(pages).cache()
    urls_a = {r["url"] for r in pages.select("url").collect()}
    urls_b = {r["url"] for r in b.collect()}
    removed = urls_a - urls_b
    added = urls_b - urls_a
    assert removed and added  # both classes occur at n=120
    assert all(u.endswith("#v2") for u in added)
    # added urls are derived from surviving bucket-2 originals
    assert all(u[: -len("#v2")] in urls_a for u in added)


def test_robots_longest_prefix_wins(spark):
    from raptor_rag_spark.operators.webops import robots_filter

    pages = spark.createDataFrame(
        [
            ("https://h1.example.com/p/10", "x"),
            ("https://h1.example.com/p/42", "x"),
            ("https://h1.example.com/about", "x"),
            ("https://h2.example.com/p/42", "x"),
        ],
        "url string, text string",
    )
    rules = spark.createDataFrame(
        [
            ("h1.example.com", "/", True),
            ("h1.example.com", "/p/", False),
            ("h1.example.com", "/p/1", True),
            ("h2.example.com", "/", True),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {r["url"]: r for r in robots_filter(pages, rules).collect()}
    # /p/10 matches /p/1 (longest) → re-allowed
    assert got["https://h1.example.com/p/10"]["allowed"] is True
    assert got["https://h1.example.com/p/10"]["matched_prefix"] == "/p/1"
    # /p/42 matches /p/ → disallowed
    assert got["https://h1.example.com/p/42"]["allowed"] is False
    # /about only matches / → allowed
    assert got["https://h1.example.com/about"]["allowed"] is True
    # other host has no /p/ rule → allowed
    assert got["https://h2.example.com/p/42"]["allowed"] is True
    assert len(got) == 4


def test_robots_rules_exercise_all_shapes(spark):
    from raptor_rag_spark.operators.webops import robots_filter, robots_rules
    from raptor_rag_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, partitions=4).cache()
    verdicts = robots_filter(pages, robots_rules(pages)).cache()
    rows = verdicts.collect()
    assert len(rows) == pages.select("url").distinct().count()
    kinds = {(r["matched_prefix"], r["allowed"]) for r in rows}
    assert ("/", True) in kinds          # default allow
    assert ("/p/", False) in kinds       # disallowed subtree
    assert ("/p/1", True) in kinds       # longest-prefix re-allow


def test_tile_labels_lift_reference(spark):
    import math

    from raptor_rag_spark.operators.ranking import tile_labels

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "apple cherry"),
            (2, "banana banana banana"),
            (3, "cherry cherry apple"),
        ],
        "doc_id long, text string",
    )
    # two tiles: docs 0,1 left (x<0.5), docs 2,3 right
    pts = spark.createDataFrame(
        [(0, 0.1, 0.5), (1, 0.2, 0.5), (2, 0.8, 0.5), (3, 0.9, 0.5)],
        "doc_id long, x double, y double",
    )
    rows = tile_labels(docs, pts, res=1, top_k=3).collect()
    by_tile = {}
    for r in rows:
        by_tile.setdefault(r["tile"], {})[r["term"]] = r
    # reference lift for 'apple' in the left tile: 3/5 vs corpus 4/11
    left = min(by_tile)
    exp = math.log((3 / 5) / (4 / 11))
    assert by_tile[left]["apple"]["n"] == 3
    assert abs(by_tile[left]["apple"]["lift"] - exp) < 1e-9
    # ranks are 1..k, ordered by lift desc within each tile
    for t, terms in by_tile.items():
        ranked = sorted(terms.values(), key=lambda r: r["rank"])
        assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
        lifts = [r["lift"] for r in ranked]
        assert lifts == sorted(lifts, reverse=True)


def test_tile_exemplars_deterministic(spark):
    from raptor_rag_spark.operators.ranking import tile_exemplars

    docs = spark.createDataFrame([(i, "t") for i in range(50)], "doc_id long, text string")
    pts = spark.createDataFrame(
        [(i, (i % 10) / 10.0 + 0.05, (i // 10) / 5.0 + 0.05) for i in range(50)],
        "doc_id long, x double, y double",
    )
    a = {(r["tile"], r["doc_id"], r["n_docs"]) for r in tile_exemplars(docs, pts, res=1).collect()}
    b = {(r["tile"], r["doc_id"], r["n_docs"]) for r in tile_exemplars(docs, pts, res=1).collect()}
    assert a == b and a
    # every tile's population sums to the corpus
    assert sum(t[2] for t in a) == 50
    # exemplar belongs to its tile
    loc = {i: (min(int(((i % 10) / 10.0 + 0.05) * 2), 1), min(int(((i // 10) / 5.0 + 0.05) * 2), 1)) for i in range(50)}
    for tile, doc, _ in a:
        assert loc[doc] == (tile // 2, tile % 2)
