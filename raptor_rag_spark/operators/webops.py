"""Web-corpus operators over the pages table (url, warc_ts, html, text, lang).

The webtext half of the graft: URL structure parsing, per-host rollups, and
domain-level quality filtering — the C4/CCNet-style curation steps a crawl
corpus needs before anything else touches it. All pure JVM expressions
(regexp + aggregates), no Python in the hot path.

Scale notes (100 TB): hosts are Zipf-distributed by construction (a few hot
sites dominate — sources/pages.py generates exactly this skew). Per-host
groupBy aggregation is safe because every aggregate here has a map-side
partial (counts, sums, min/max); the only shuffle is on host, and AQE's skew
handling splits oversized partitions. The filter join is broadcast: the
per-host table is |hosts|-sized (millions, not billions of rows), orders of
magnitude smaller than pages.

Reference role: the reference ingests one python string
(raptor/retrieval_augmentation.py:170-175); these operators are the
corpus-scale ingest/curation surface SURVEY.md §2.1 maps it to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G

# one regex, three groups — keep Spark (Java regex) and DuckDB (RE2) inside
# the common syntax subset
URL_RE = "^([a-z][a-z0-9+.-]*)://([^/?#]+)([^?#]*)"


def parse_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, scheme, host, path): structural URL parse via one regexp."""
    u = F.col(url_col)
    return pages.withColumn("scheme", F.regexp_extract(u, URL_RE, 1)).withColumn(
        "host", F.regexp_extract(u, URL_RE, 2)
    ).withColumn("path", F.regexp_extract(u, URL_RE, 3))


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host crawl rollup: page count, distinct languages, total text
    tokens, first/last capture time. One shuffle on host with full map-side
    combine; token counting is the JVM regexp twin (no Python)."""
    parsed = parse_urls(pages).withColumn("n_tokens", G.token_count_col(F.col("text")))
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.date_format(F.min("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def host_quality_filter(
    pages: DataFrame, min_avg_tokens: float = 40.0, lang: str | None = "en"
) -> DataFrame:
    """Domain-level quality gate (the C4 'remove low-quality sources' step):
    keep pages whose HOST's mean tokens-per-page clears ``min_avg_tokens``,
    optionally restricted to one language. The host average is an exact
    decimal sum divided as double (twin-safe across engines); the per-host
    table broadcasts back onto pages."""
    parsed = parse_urls(pages).withColumn("n_tokens", G.token_count_col(F.col("text")))
    per_host = parsed.groupBy("host").agg(
        (
            F.sum(F.col("n_tokens").cast("decimal(28,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_tokens")
    )
    kept = parsed.join(
        F.broadcast(per_host.where(F.col("avg_tokens") >= F.lit(min_avg_tokens))), "host"
    )
    if lang is not None:
        kept = kept.where(F.col("lang") == lang)
    # avg stays an UNROUNDED double: both engines compute decimal-sum → double
    # divided by double, bit-identical; round() tie rules differ across engines
    return kept.select(
        "url", "host", "lang", "n_tokens", F.col("avg_tokens").alias("host_avg_tokens")
    )
