"""Curation operators (paragraph dedup, PII scrub, URL canon, link graph),
phrase search, and per-cell directional extremes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_line_dedup_drops_boilerplate(spark):
    from raptor_rag_spark.operators.curation import line_dedup

    rows = [
        ("u1", "unique alpha line\nshared banner\nunique beta line"),
        ("u2", "shared banner\nanother unique line"),
        ("u3", "only unique content here"),
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    out = {r["url"]: r for r in line_dedup(pages, max_df=1).collect()}
    assert out["u1"]["clean_text"] == "unique alpha line\nunique beta line"
    assert out["u1"]["n_lines"] == 3 and out["u1"]["n_kept"] == 2
    assert out["u2"]["clean_text"] == "another unique line"
    assert out["u3"]["n_kept"] == 1
    # a line repeated WITHIN one doc has df=1 (distinct url,hash) and is kept
    pages2 = spark.createDataFrame(
        [("u1", "dup\ndup\nother")], "url STRING, text STRING"
    )
    r = line_dedup(pages2, max_df=1).collect()[0]
    assert r["clean_text"] == "dup\ndup\nother"


def test_line_dedup_on_generated_pages(spark):
    from raptor_rag_spark.operators.curation import line_dedup
    from raptor_rag_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 80, partitions=4).cache()
    out = line_dedup(pages, max_df=1).cache()
    joined = out.join(pages, "url").select("clean_text").collect()
    # the global nav line appears on every page -> always removed
    assert all("home about contact subscribe" not in r[0] for r in joined)
    # every page survives (body prose is unique)
    assert out.count() == 80


def test_repetition_signals(spark):
    from raptor_rag_spark.operators.curation import repetition_signals

    rows = [
        ("u1", "a b a b\na b a b\nc d"),  # dup line + dominant bigram
        ("u2", "w x y z"),  # no repetition
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    out = {r["url"]: r for r in repetition_signals(pages).collect()}
    r1 = out["u1"]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(2 / 3)
    assert r1["dup_char_frac"] == pytest.approx(14 / 17)
    # bigrams: (a,b)x4 (b,a)x2 (b,c)1 (c,d)1 over lines joined -> top=4, tot=9
    assert r1["top_bigram_frac"] == pytest.approx(4 / 9)
    r2 = out["u2"]
    assert r2["dup_line_frac"] == 0.0 and r2["top_bigram_frac"] == pytest.approx(1 / 3)


def test_pii_scrub(spark):
    from raptor_rag_spark.operators.curation import pii_scrub

    rows = [
        ("u1", "mail admin2@site3.example.com or root@a.io now"),
        ("u2", "served from 10.2.3.44 and 192.168.0.1 nodes"),
        ("u3", "nothing sensitive here"),
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    out = {r["url"]: r for r in pii_scrub(pages).collect()}
    assert out["u1"]["n_emails"] == 2 and out["u1"]["n_ips"] == 0
    assert out["u1"]["scrubbed"] == "mail <EMAIL> or <EMAIL> now"
    assert out["u2"]["n_ips"] == 2
    assert out["u2"]["scrubbed"] == "served from <IP> and <IP> nodes"
    assert out["u3"]["scrubbed"] == "nothing sensitive here"


def test_canonical_dedup(spark):
    from raptor_rag_spark.operators.curation import canonical_dedup

    rows = [
        ("https://a.com/p/1?utm_source=x&fbclid=1", "2026-01-01 00:00:00"),
        ("https://a.com/p/1?utm_source=y&fbclid=2", "2026-01-02 00:00:00"),
        ("https://a.com/p/1?page=2&utm_campaign=z", "2026-01-01 00:00:00"),
        ("https://b.com/q#frag", "2026-01-03 00:00:00"),
    ]
    pages = spark.createDataFrame(rows, "url STRING, warc_ts STRING").withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )
    out = canonical_dedup(pages).collect()
    by_url = {r["url"]: r for r in out}
    # the two tracked fetches collapse to the same canon; earliest wins
    r1 = by_url["https://a.com/p/1?utm_source=x&fbclid=1"]
    r2 = by_url["https://a.com/p/1?utm_source=y&fbclid=2"]
    assert r1["canon_url"] == r2["canon_url"] == "https://a.com/p/1"
    assert r1["fetch_rank"] == 1 and r2["fetch_rank"] == 2 and r1["n_fetches"] == 2
    # kept param retains its '?'; fragment is stripped
    assert by_url["https://a.com/p/1?page=2&utm_campaign=z"]["canon_url"] == (
        "https://a.com/p/1?page=2"
    )
    assert by_url["https://b.com/q#frag"]["canon_url"] == "https://b.com/q"


def test_extract_links(spark):
    from raptor_rag_spark.operators.curation import extract_links

    html = (
        '<p><a href="https://x.com/p/1">one</a></p>'
        '<p><a href="https://x.com/p/2">two</a>'
        '<a href="https://y.com/p/3">three</a></p>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.com/a", bytearray(html))], "url STRING, html BINARY"
    )
    out = {(r["src_host"], r["dst_host"]): r["n_links"] for r in extract_links(pages).collect()}
    assert out == {("src.com", "x.com"): 2, ("src.com", "y.com"): 1}


def test_phrase_search(spark):
    from raptor_rag_spark.operators.phrases import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the table scan beats the index scan on a full table scan"),
            (2, "table scan! Table Scan."),  # case/punct folding -> 2 hits
            (3, "scan table"),  # reversed -> no hit
            (4, "a b a appears with a b a overlapping"),
        ],
        "doc_id LONG, text STRING",
    )
    phrases = spark.createDataFrame(
        [(0, "table scan"), (1, "a b a")], "phrase_id INT, qtext STRING"
    )
    out = {
        (r["phrase_id"], r["doc_id"]): r["n_hits"]
        for r in phrase_search(docs, phrases).collect()
    }
    assert out[(0, 1)] == 2
    assert out[(0, 2)] == 2
    assert (0, 3) not in out
    # repeated-term phrase: offsets {0,2} must both be 'a', offset 1 'b'
    assert out[(1, 4)] == 2


def test_duplicate_spans(spark):
    from raptor_rag_spark.operators.dedup import duplicate_spans

    shared = "one two three four five six seven eight nine ten"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota kappa"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, w=8).collect()}
    assert 3 not in out
    # doc1: windows at pos 2,3,4 flagged (the shared 10-gram) -> span [2, 11]
    assert (out[1]["start_pos"], out[1]["end_pos"], out[1]["n_windows"]) == (2, 11, 3)
    # doc2: windows at pos 0,1,2 -> span [0, 9]
    assert (out[2]["start_pos"], out[2]["end_pos"]) == (0, 9)
    assert out[1]["n_tokens"] == 10


def test_cell_extremes(spark):
    from raptor_rag_spark.operators.extremes import cell_extremes

    # all points in one res-0 cell; square corners + interior point
    rows = [
        (1, 0.1, 0.1),
        (2, 0.9, 0.1),
        (3, 0.9, 0.9),
        (4, 0.1, 0.9),
        (5, 0.5, 0.5),  # interior: wins no direction
    ]
    pts = spark.createDataFrame(rows, "vec_id LONG, x DOUBLE, y DOUBLE")
    out = {r["vec_id"]: r for r in cell_extremes(pts, res=0).collect()}
    assert 5 not in out
    assert set(out) == {1, 2, 3, 4}
    # each corner wins its diagonal + shares two axis directions (ties by id)
    assert sum(r["n_dirs"] for r in out.values()) == 8
    # +x direction (dir 0) tie between 2 and 3 breaks to vec_id 2
    assert out[2]["first_dir"] == 0


def test_host_boilerplate_per_host_strip(spark):
    """Per-host chrome strip: a footer on ≥50% of a host's pages is dropped
    on that host only; the same text on a single page of another host stays.
    Fully-boilerplate pages stay in the output with n_kept=0."""
    from raptor_rag_spark.operators.curation import host_boilerplate

    rows = [
        ("http://a.example/p1", "footer of site a\nreal prose one"),
        ("http://a.example/p2", "footer of site a\nreal prose two"),
        ("http://a.example/p3", "footer of site a"),
        # same footer text, but b.example has it on only 1 of its 2 pages
        ("http://b.example/p1", "footer of site a\nb prose"),
        ("http://b.example/p2", "other b prose"),
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    out = {r["url"]: r for r in host_boilerplate(pages, min_pages=2).collect()}
    assert len(out) == 5  # every page survives
    assert out["http://a.example/p1"]["clean_text"] == "real prose one"
    assert out["http://a.example/p2"]["n_kept"] == 1
    # fully-boilerplate page: kept with empty text, not dropped
    assert out["http://a.example/p3"]["n_kept"] == 0
    assert out["http://a.example/p3"]["clean_text"] == ""
    # per-host isolation: b.example keeps the line (1 of 2 pages < 50%... but
    # 1*100 >= 50*2 is true — so tighten: min_pages=2 is what saves it)
    assert out["http://b.example/p1"]["clean_text"] == "footer of site a\nb prose"
    assert out["http://b.example/p2"]["n_kept"] == 1


def test_host_boilerplate_sql_twin(spark):
    """The DuckDB twin must agree row-for-row on a handcrafted corpus."""
    import duckdb

    from raptor_rag_spark.operators.curation import host_boilerplate, host_boilerplate_sql

    rows = [
        ("http://a.example/p1", "nav\nalpha"),
        ("http://a.example/p2", "nav\nbeta"),
        ("http://c.example/only", "nav\nsolo"),
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    got = {
        (r["url"],): (r["host"], r["n_lines"], r["n_kept"], r["clean_text"])
        for r in host_boilerplate(pages, min_pages=2).collect()
    }
    src = " UNION ALL ".join(
        f"SELECT '{u}' AS url, '{t}' AS text".replace("\n", "' || chr(10) || '")
        for u, t in rows
    )
    con = duckdb.connect()
    want = {
        (r[0],): (r[1], r[2], r[3], r[4])
        for r in con.execute(host_boilerplate_sql(src, min_pages=2)).fetchall()
    }
    assert got == want
    assert got[("http://a.example/p1",)] == ("a.example", 2, 1, "alpha")
    assert got[("http://c.example/only",)] == ("c.example", 2, 2, "nav\nsolo")


def test_decontaminate(spark):
    from raptor_rag_spark.operators.curation import decontaminate, decontaminate_sql
    import duckdb

    leak = "the quick brown fox jumps over the lazy dog near the old river bank today"
    train_rows = [
        (1, "intro words here " + leak + " trailing content of the page"),
        (2, "a completely unrelated document about spark shuffle partitions and "
            "adaptive query execution with enough words to form many grams"),
        (3, "tiny doc"),
    ]
    bench_rows = [(10, leak), (11, "short prompt")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, qtext string")

    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=13).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"] and out[3]["n_grams"] == 1  # short-text fallback

    mk = lambda rows, a, b: " UNION ALL ".join(  # noqa: E731
        f"SELECT {i} AS {a}, '{t}' AS {b}" for i, t in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(decontaminate_sql(mk(train_rows, "doc_id", "text"),
                                   mk(bench_rows, "bench_id", "qtext"), n=13))
        .fetchall()
    )
    got = sorted(tuple(r) for r in decontaminate(train, bench, n=13).collect())
    assert got == want
