"""Corpus-curation operators over the pages table: paragraph-level dedup,
repetition quality signals, PII scrubbing, URL canonicalization, and link
extraction.

These are the CCNet/C4/Gopher-style cleanup passes a Common-Crawl-scale
pipeline runs between raw ingest and anything that costs money (embedding,
training). The reference ingests a single trusted string
(raptor/retrieval_augmentation.py:170-175); this module is the corpus-scale
ingest hygiene SURVEY.md §2.1 maps that surface to. Everything is pure JVM
expressions (regexp + aggregates) — no Python in any hot path — and every
float op is twin-pinned so the DuckDB oracles hash-match exactly.

Scale notes (100 TB of pages):

- ``line_dedup`` shuffles on md5(line), never on the line text itself, so
  shuffle keys are fixed-width 32 bytes no matter how long the paragraph is.
  The document-frequency table is built from ``distinct(url, hash)`` —
  map-side combinable — and the hot keys (site boilerplate shared by millions
  of pages) are exactly the rows the df-filter *drops*, so the re-join that
  follows only ever carries surviving (rare) lines. The per-doc reassembly is
  one groupBy(url) with map-side combine over struct(pos, line).
- ``repetition_signals`` is two per-doc groupBys (line counts, bigram
  counts); both partial-aggregate map-side, keys are (url, token) — no
  corpus-wide hot keys because everything is per-document.
- ``pii_scrub`` is a pure map (regexp_count/replace in whole-stage codegen);
  zero shuffles.
- ``canonicalize_urls`` is a map; the recrawl-dedup ranking shuffles on
  canon_url (bounded by per-URL recrawl count, not corpus size).
- ``extract_links`` scans html once, explodes hrefs, and collapses to a
  host→host edge list in one groupBy with map-side combine — hosts are
  millions where pages are trillions, so the output is metadata-scale. The
  edge list feeds operators/graph.py's PageRank directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from .webops import URL_RE

NL = "\n"

# regexes kept inside the Java-regex ∩ RE2 common subset (Spark / DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
TRACKING_RE = r"[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"
FRAGMENT_RE = r"#.*"
HREF_RE = r'href="([^"]+)"'


# ------------------------------------------------------------ paragraph dedup


def line_dedup(pages: DataFrame, max_df: int = 1) -> DataFrame:
    """(url, n_lines, n_kept, clean_text): CCNet-style paragraph-level dedup.

    Every text line (paragraph) whose corpus document frequency exceeds
    ``max_df`` is dropped — this is the pass that strips nav bars, cookie
    banners and copyright footers that repeat across a site. Documents whose
    every line is boilerplate disappear entirely (both engines agree).
    """
    lines = pages.select(
        "url", F.posexplode(F.split(F.col("text"), NL)).alias("pos", "line")
    )
    dfreq = (
        lines.select("url", F.md5("line").alias("h"))
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("line_df"))
    )
    totals = lines.groupBy("url").agg(F.count("*").alias("n_lines"))
    kept = (
        lines.withColumn("h", F.md5("line"))
        .join(dfreq, "h")
        .where(F.col("line_df") <= max_df)
    )
    rebuilt = kept.groupBy("url").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            NL,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    return rebuilt.join(totals, "url").select("url", "n_lines", "n_kept", "clean_text")


def line_dedup_sql(pages_sql: str, max_df: int = 1) -> str:
    """DuckDB twin of :func:`line_dedup`."""
    return f"""
WITH lines AS (
  SELECT url, CAST(generate_subscripts(ls, 1) - 1 AS INT) AS pos, unnest(ls) AS line
  FROM (SELECT url, string_split(text, chr(10)) AS ls FROM ({pages_sql}))
),
dfreq AS (
  SELECT h, CAST(count(*) AS BIGINT) AS line_df
  FROM (SELECT DISTINCT url, md5(line) AS h FROM lines) GROUP BY h),
totals AS (SELECT url, CAST(count(*) AS BIGINT) AS n_lines FROM lines GROUP BY url),
kept AS (
  SELECT l.url, l.pos, l.line FROM lines l JOIN dfreq d ON md5(l.line) = d.h
  WHERE d.line_df <= {max_df})
SELECT k.url, t.n_lines, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text
FROM kept k JOIN totals t USING (url)
GROUP BY k.url, t.n_lines
"""


# --------------------------------------------------- repetition quality gates


def repetition_signals(pages: DataFrame) -> DataFrame:
    """(url, n_lines, dup_line_frac, dup_char_frac, top_bigram_frac):
    Gopher-style within-document repetition signals (Rae et al. 2021 §A1.1):
    the fraction of duplicate lines, of characters inside duplicate lines,
    and of tokens covered by the most frequent bigram. High values flag
    machine-generated / template spam before model training sees it."""
    lines = pages.select("url", F.explode(F.split(F.col("text"), NL)).alias("line"))
    lc = lines.groupBy("url", "line").agg(F.count("*").alias("c"))
    line_stats = lc.groupBy("url").agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_lines"),
        F.sum(F.col("c") * F.length("line")).alias("tot_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(F.lit(0))
        ).alias("dup_chars"),
    )
    words = pages.select("url", G.words_col(F.col("text")).alias("ws"))
    pairs = words.select(
        "url",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    ).select("url", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bc = pairs.groupBy("url", "a", "b").agg(F.count("*").alias("c"))
    bigram_stats = bc.groupBy("url").agg(
        F.max("c").alias("top_bigram"), F.sum("c").alias("n_bigrams")
    )
    frac = lambda n, d: F.col(n).cast("double") / F.col(d).cast("double")  # noqa: E731
    # LEFT join: a doc with < 2 word tokens has no bigrams, but it still has
    # line-duplication signals — an inner join would silently exempt exactly
    # the degenerate/spam docs from the quality gate; bigram repetition
    # defaults to 0.0 (no evidence)
    return (
        line_stats.join(bigram_stats, "url", "left")
        .select(
            "url",
            "n_lines",
            frac("dup_lines", "n_lines").alias("dup_line_frac"),
            frac("dup_chars", "tot_chars").alias("dup_char_frac"),
            F.coalesce(frac("top_bigram", "n_bigrams"), F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def repetition_signals_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`repetition_signals`."""
    ws = G.words_sql("text")
    return f"""
WITH lc AS (
  SELECT url, line, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT url, unnest(string_split(text, chr(10))) AS line FROM ({pages_sql}))
  GROUP BY url, line),
line_stats AS (
  SELECT url, CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_lines,
         CAST(sum(c * length(line)) AS BIGINT) AS tot_chars,
         CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS BIGINT) AS dup_chars
  FROM lc GROUP BY url),
t AS (
  SELECT url, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
  FROM (SELECT url, {ws} AS ws FROM ({pages_sql}))),
bc AS (
  SELECT a.url, a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS c
  FROM t a JOIN t b ON a.url = b.url AND b.i = a.i + 1
  GROUP BY a.url, a.w, b.w),
bigram_stats AS (
  SELECT url, CAST(max(c) AS BIGINT) AS top_bigram, CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM bc GROUP BY url)
SELECT l.url, l.n_lines,
       CAST(l.dup_lines AS DOUBLE) / CAST(l.n_lines AS DOUBLE) AS dup_line_frac,
       CAST(l.dup_chars AS DOUBLE) / CAST(l.tot_chars AS DOUBLE) AS dup_char_frac,
       coalesce(CAST(b.top_bigram AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE), 0.0) AS top_bigram_frac
FROM line_stats l LEFT JOIN bigram_stats b USING (url)
"""


# ---------------------------------------------------------------- PII scrub


def pii_scrub(pages: DataFrame) -> DataFrame:
    """(url, n_emails, n_ips, scrubbed): mask emails then IPv4 literals with
    typed placeholders. Pure codegen map — the shape of every
    redaction/decontamination pass (emails first: an address can contain
    digit runs, never vice versa)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return pages.select(
        "url",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


def pii_scrub_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`pii_scrub` (note DuckDB needs the 'g' flag —
    Spark's regexp_replace is global by default)."""
    return f"""
SELECT url,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{IPV4_RE}', '<IP>', 'g') AS scrubbed
FROM ({pages_sql})
"""


# ------------------------------------------------------- URL canonicalization


def canon_url_col(url: Column | str = "url") -> Column:
    """Canonical URL: drop the #fragment, strip tracking params
    (utm_*/ref/fbclid/gclid — each match eats its own ?/& separator, so a
    leading tracked param takes the '?' with it and a kept param retains
    it), lowercase."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, FRAGMENT_RE, "")
    u = F.regexp_replace(u, TRACKING_RE, "")
    return F.lower(u)


def canon_url_sql(url_expr: str = "url") -> str:
    return (
        f"lower(regexp_replace(regexp_replace({url_expr}, '{FRAGMENT_RE}', '', 'g'), "
        f"'{TRACKING_RE}', '', 'g'))"
    )


def canonical_dedup(pages: DataFrame) -> DataFrame:
    """(url, canon_url, fetch_rank, n_fetches): recrawl dedup — group fetches
    by canonical URL, rank by (warc_ts, url); fetch_rank = 1 is the keeper.
    The shuffle key is canon_url; group size is the recrawl count of one
    page, never corpus-scale."""
    c = pages.select("url", "warc_ts", canon_url_col("url").alias("canon_url"))
    w = Window.partitionBy("canon_url").orderBy("warc_ts", "url")
    cw = Window.partitionBy("canon_url")
    return (
        c.withColumn("fetch_rank", F.row_number().over(w))
        .withColumn("n_fetches", F.count("*").over(cw))
        .select("url", "canon_url", "fetch_rank", "n_fetches")
    )


def canonical_dedup_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`canonical_dedup`."""
    canon = canon_url_sql("url")
    return f"""
WITH c AS (SELECT url, warc_ts, {canon} AS canon_url FROM ({pages_sql}))
SELECT url, canon_url,
       CAST(row_number() OVER (PARTITION BY canon_url ORDER BY warc_ts, url) AS INT)
         AS fetch_rank,
       CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_fetches
FROM c
"""


# ------------------------------------------------------------ link extraction


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links): the real host-level link graph, parsed
    out of the raw html bytes (decode → regexp over href attributes). One
    scan, one map-side-combined groupBy; output is host-cardinality, so this
    is the job that turns a trillion-page crawl into the metadata-scale edge
    list PageRank (operators/graph.py) iterates on."""
    hrefs = pages.select(
        F.regexp_extract(F.col("url"), URL_RE, 2).alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.decode(F.col("html"), "UTF-8"), F.lit(HREF_RE), 1)
        ).alias("dst_url"),
    )
    return (
        hrefs.select(
            "src_host", F.regexp_extract(F.col("dst_url"), URL_RE, 2).alias("dst_host")
        )
        .where(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def extract_links_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`extract_links`."""
    return f"""
WITH hrefs AS (
  SELECT regexp_extract(url, '{URL_RE}', 2) AS src_host,
         unnest(regexp_extract_all(decode(html), '{HREF_RE}', 1)) AS dst_url
  FROM ({pages_sql})
)
SELECT src_host, regexp_extract(dst_url, '{URL_RE}', 2) AS dst_host,
       CAST(count(*) AS BIGINT) AS n_links
FROM hrefs
WHERE regexp_extract(dst_url, '{URL_RE}', 2) <> ''
GROUP BY src_host, dst_host
"""

# --------------------------------------------------- per-host boilerplate


def host_boilerplate(
    pages: DataFrame, min_pages: int = 2, min_frac_pct: int = 50
) -> DataFrame:
    """(url, host, n_lines, n_kept, clean_text): per-host boilerplate strip.

    A line is boilerplate when it appears on ≥ ``min_frac_pct``% of its OWN
    host's pages (and on ≥ ``min_pages`` of them) — the CCNet trick that
    catches a site's nav bar / footer without a global frequency table:
    a line shared by 3 pages out of 10^12 globally is prose, the same line
    on 80% of one host's pages is chrome. Complements :func:`line_dedup`
    (global df cutoff). Unlike line_dedup, every input document stays in the
    output — a fully-boilerplate page surfaces as ``n_kept=0, clean_text=''``
    (the keep/drop decision belongs to the caller's quality gate).

    The threshold is integer arithmetic (``df*100 >= pct*pages``) so the
    DuckDB twin is bit-exact with no float rounding.

    Scale (100 TB): the boilerplate key set is (host, md5-hash) — hosts ×
    frequent-lines-per-host, metadata-scale — so the data path is ONE
    explode scan flag-joined (broadcast LEFT) against that set; line counts
    and the cleaned text come out of the same groupBy, no second corpus
    scan. All shuffles key on (host, 32-byte hash) or url, never raw line
    text, and every aggregate is map-side combinable."""
    lines = pages.select(
        "url",
        F.regexp_extract(F.col("url"), URL_RE, 2).alias("host"),
        F.posexplode(F.split(F.col("text"), NL)).alias("pos", "line"),
    )
    host_pages = pages.select(
        F.regexp_extract(F.col("url"), URL_RE, 2).alias("host"), "url"
    ).distinct().groupBy("host").agg(F.count("*").alias("host_pages"))
    dfreq = (
        lines.select("host", "url", F.md5("line").alias("h"))
        .distinct()
        .groupBy("host", "h")
        .agg(F.count("*").alias("line_df"))
    )
    boiler = dfreq.join(host_pages, "host").where(
        (F.col("line_df") >= min_pages)
        & (F.col("line_df") * 100 >= F.lit(min_frac_pct) * F.col("host_pages"))
    ).select("host", "h", F.lit(True).alias("is_boiler"))
    flagged = lines.withColumn("h", F.md5("line")).join(
        F.broadcast(boiler), ["host", "h"], "left"
    )
    keep = F.col("is_boiler").isNull()
    return flagged.groupBy("url", "host").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.concat_ws(
            NL,
            F.transform(
                F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "line")))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    ).select("url", "host", "n_lines", "n_kept", "clean_text")


def host_boilerplate_sql(pages_sql: str, min_pages: int = 2, min_frac_pct: int = 50) -> str:
    """DuckDB twin of :func:`host_boilerplate`."""
    return f"""
WITH lines AS (
  SELECT url, regexp_extract(url, '{URL_RE}', 2) AS host,
         CAST(generate_subscripts(ls, 1) - 1 AS INT) AS pos, unnest(ls) AS line
  FROM (SELECT url, string_split(text, chr(10)) AS ls FROM ({pages_sql}))
),
host_pages AS (
  SELECT host, CAST(count(*) AS BIGINT) AS host_pages
  FROM (SELECT DISTINCT regexp_extract(url, '{URL_RE}', 2) AS host, url
        FROM ({pages_sql})) GROUP BY host),
dfreq AS (
  SELECT host, h, CAST(count(*) AS BIGINT) AS line_df
  FROM (SELECT DISTINCT host, url, md5(line) AS h FROM lines) GROUP BY host, h),
boiler AS (
  SELECT d.host, d.h FROM dfreq d JOIN host_pages p USING (host)
  WHERE d.line_df >= {min_pages} AND d.line_df * 100 >= {min_frac_pct} * p.host_pages)
SELECT l.url, l.host, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE b.h IS NULL) AS BIGINT) AS n_kept,
       coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
                FILTER (WHERE b.h IS NULL), '') AS clean_text
FROM lines l LEFT JOIN boiler b ON b.host = l.host AND b.h = md5(l.line)
GROUP BY l.url, l.host
"""


# ---------------------------------------------------------------- decontamination

def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "qtext",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing a
    word ``n``-gram with the benchmark set (the GPT-3/PaLM-style 13-gram
    collision sweep run before any eval number is trusted).

    Returns one row per training doc: (id_col, n_grams, n_hits,
    contaminated). ``n_grams`` counts the doc's distinct n-grams; ``n_hits``
    how many of them appear anywhere in the benchmark set. Benchmark items
    shorter than ``n`` words fall back to their whole token string (the
    shingles short-text rule), so tiny prompts still decontaminate.

    Scale shape: the benchmark gram set is tiny next to the corpus →
    broadcast; grams are hash63-compressed to fixed-width longs before the
    join so the map-side explode never carries 80-byte strings into the
    aggregate; the only corpus-sized shuffle is the per-doc groupBy with
    map-side combine. No reference analogue (SURVEY §2.1 corpus tooling).
    """
    grams = F.array_distinct(G.shingles_col(F.col(text_col), n))
    tg = train.select(
        id_col, F.explode(grams).alias("gram")
    ).select(id_col, G.hash63_col(F.col("gram")).alias("g"))
    bg = (
        bench.select(
            F.explode(
                F.array_distinct(G.shingles_col(F.col(bench_text_col), n))
            ).alias("gram")
        )
        .select(G.hash63_col(F.col("gram")).alias("g"))
        .distinct()
    )
    hits = (
        tg.join(F.broadcast(bg), "g")
        .groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_hits"))
    )
    base = train.select(id_col, F.size(grams).cast("long").alias("n_grams"))
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    train_sql: str,
    bench_sql: str,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "qtext",
) -> str:
    """DuckDB twin of :func:`decontaminate`."""
    tsh = G.shingles_sql(text_col, n)
    bsh = G.shingles_sql(bench_text_col, n)
    g = G.hash63_sql("gram")
    return f"""
WITH tg AS (
  SELECT {id_col}, {g} AS g
  FROM (SELECT {id_col}, unnest(list_distinct({tsh})) AS gram FROM ({train_sql}))
),
bg AS (
  SELECT DISTINCT {g} AS g
  FROM (SELECT unnest(list_distinct({bsh})) AS gram FROM ({bench_sql}))
),
hits AS (
  SELECT {id_col}, CAST(count(DISTINCT g) AS BIGINT) AS n_hits
  FROM tg JOIN bg USING (g) GROUP BY 1
),
base AS (
  SELECT {id_col}, CAST(len(list_distinct({tsh})) AS BIGINT) AS n_grams
  FROM ({train_sql})
)
SELECT b.{id_col}, b.n_grams,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM base b LEFT JOIN hits h USING ({id_col})
"""


ANCHOR_RE = r'<a href="([^"]+)">([^<]*)</a>'


def anchor_text_profile(pages: DataFrame, top_k: int = 3) -> DataFrame:
    """(dst_host, term, n, rnk): what the web CALLS each host — the top
    ``top_k`` anchor-text terms pointing at every destination host, the
    classic link-context relevance signal (anchor text describes the TARGET,
    not the source, so it is the highest-precision ranking feature a crawl
    yields).

    Scale shape: one html scan (anchor tags exploded, then per-row regexp
    group extraction — all codegen), one map-side-combined groupBy on
    (dst_host, term), and a top-k window partitioned by host over the
    host-cardinality count table. No data-sized window, no Python."""
    tags = pages.select(
        F.explode(
            F.regexp_extract_all(F.decode(F.col("html"), "UTF-8"), F.lit(ANCHOR_RE), 0)
        ).alias("tag")
    )
    parsed = tags.select(
        F.regexp_extract(F.col("tag"), ANCHOR_RE, 1).alias("dst_url"),
        F.regexp_extract(F.col("tag"), ANCHOR_RE, 2).alias("anchor"),
    ).select(
        F.regexp_extract(F.col("dst_url"), URL_RE, 2).alias("dst_host"),
        F.explode(G.words_col(F.col("anchor"))).alias("term"),
    ).where(F.col("dst_host") != "")
    counts = parsed.groupBy("dst_host", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_k)
        .select("dst_host", "term", "n", "rnk")
    )


def anchor_text_profile_sql(pages_sql: str, top_k: int = 3) -> str:
    """DuckDB twin of :func:`anchor_text_profile`."""
    return f"""
WITH tags AS (
  SELECT unnest(regexp_extract_all(decode(html), '{ANCHOR_RE}', 0)) AS tag
  FROM ({pages_sql})),
parsed AS (
  SELECT regexp_extract(regexp_extract(tag, '{ANCHOR_RE}', 1), '{URL_RE}', 2) AS dst_host,
         unnest({G.words_sql("regexp_extract(tag, '" + ANCHOR_RE + "', 2)")}) AS term
  FROM tags),
counts AS (
  SELECT dst_host, term, count(*)::BIGINT AS n FROM parsed
  WHERE dst_host <> '' GROUP BY dst_host, term)
SELECT dst_host, term, n,
       CAST(row_number() OVER (PARTITION BY dst_host ORDER BY n DESC, term) AS BIGINT) AS rnk
FROM counts
QUALIFY rnk <= {top_k}
"""


def c4_gopher_filters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The consolidated C4 + Gopher rule battery as one pure-codegen pass:
    per doc, each classic heuristic as its own flag plus the conjunction.

    Rules (thresholds = the published defaults, fixed constants shared with
    the twin):
    - ``f_len``        50 ≤ words ≤ 100000              (Gopher word count)
    - ``f_meanlen``    3 ≤ mean word chars ≤ 10          (Gopher)
    - ``f_hash``       #/word ratio ≤ 0.1                (Gopher symbol)
    - ``f_ellipsis``   …/word ratio ≤ 0.1                (Gopher symbol)
    - ``f_bullet``     bullet-started lines ≤ 90%        (Gopher)
    - ``f_ellip_end``  ellipsis-ended lines ≤ 30%        (Gopher)
    - ``f_alpha``      ≥ 80% words contain a letter      (Gopher)
    - ``f_stop``       ≥ 2 of the C4 stop list present   (C4 'the, be, to,
                       of, and, that, have, with')
    - ``keep``         AND of all flags

    One select over the corpus, zero shuffle, every flag twin-exact: the
    audit table a curation run signs off on before dropping 40% of a
    crawl."""
    t = F.col(text_col)
    words = G.words_col(t)
    n_words = F.greatest(F.size(words), F.lit(1))
    n_chars_words = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
    )
    mean_len = n_chars_words.cast("double") / n_words.cast("double")
    n_hash = F.size(F.regexp_extract_all(t, F.lit("#"), 0))
    n_ellip = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    )
    n_eend = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stops]),
            lambda s: F.array_contains(words, s),
        )
    )
    flags = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        ((n_words >= 50) & (n_words <= 100000)).alias("f_len"),
        ((mean_len >= 3.0) & (mean_len <= 10.0)).alias("f_meanlen"),
        (n_hash.cast("double") / n_words.cast("double") <= 0.1).alias("f_hash"),
        (n_ellip.cast("double") / n_words.cast("double") <= 0.1).alias("f_ellipsis"),
        (n_bullet.cast("double") / n_lines.cast("double") <= 0.9).alias("f_bullet"),
        (n_eend.cast("double") / n_lines.cast("double") <= 0.3).alias("f_ellip_end"),
        (n_alpha.cast("double") / n_words.cast("double") >= 0.8).alias("f_alpha"),
        (n_stop >= 2).alias("f_stop"),
    )
    keep = (
        F.col("f_len") & F.col("f_meanlen") & F.col("f_hash") & F.col("f_ellipsis")
        & F.col("f_bullet") & F.col("f_ellip_end") & F.col("f_alpha") & F.col("f_stop")
    )
    return flags.withColumn("keep", keep)


def c4_gopher_filters_sql(docs_sql: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`c4_gopher_filters`."""
    w = G.words_sql(text_col)
    stops = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"
    return f"""
WITH base AS (
  SELECT doc_id,
         greatest(len({w}), 1) AS n_words,
         list_sum(list_transform({w}, x -> length(x))) AS n_chars_words,
         len(regexp_extract_all({text_col}, '#')) AS n_hash,
         len(regexp_extract_all({text_col}, '\\.\\.\\.')) AS n_ellip,
         greatest(len(string_split({text_col}, chr(10))), 1) AS n_lines,
         len(list_filter(string_split({text_col}, chr(10)),
             l -> regexp_matches(l, '^\\s*[-*\u2022]'))) AS n_bullet,
         len(list_filter(string_split({text_col}, chr(10)),
             l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS n_eend,
         len(list_filter({w}, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_filter({stops}, s -> list_contains({w}, s))) AS n_stop
  FROM ({docs_sql})),
flags AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         (n_words >= 50 AND n_words <= 100000) AS f_len,
         (CAST(n_chars_words AS DOUBLE) / n_words >= 3.0
          AND CAST(n_chars_words AS DOUBLE) / n_words <= 10.0) AS f_meanlen,
         (CAST(n_hash AS DOUBLE) / n_words <= 0.1) AS f_hash,
         (CAST(n_ellip AS DOUBLE) / n_words <= 0.1) AS f_ellipsis,
         (CAST(n_bullet AS DOUBLE) / n_lines <= 0.9) AS f_bullet,
         (CAST(n_eend AS DOUBLE) / n_lines <= 0.3) AS f_ellip_end,
         (CAST(n_alpha AS DOUBLE) / n_words >= 0.8) AS f_alpha,
         (n_stop >= 2) AS f_stop
  FROM base)
SELECT *, (f_len AND f_meanlen AND f_hash AND f_ellipsis AND f_bullet
           AND f_ellip_end AND f_alpha AND f_stop) AS keep
FROM flags
"""
