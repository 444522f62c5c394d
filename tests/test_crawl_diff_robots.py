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
