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


def snapshot_b(pages: DataFrame) -> DataFrame:
    """Deterministic 'next crawl' snapshot derived from the pages table —
    the second input :func:`crawl_diff` needs, synthesized as a pure
    dataflow (both engines rebuild the identical snapshot from the same
    bits): bucket = hash63(url) mod 10; bucket 0 pages vanish (removed),
    bucket 1 pages get their text edited (changed), bucket 2 pages ALSO
    appear under a new '#v2' url (added); everything else recrawls
    unchanged."""
    bucket = F.pmod(G.hash63_col(F.col("url")), F.lit(10))
    base = pages.select("url", "text", bucket.alias("b"))
    survived = base.where(F.col("b") != 0).select(
        "url",
        F.when(F.col("b") == 1, F.concat(F.col("text"), F.lit("\nupdated.")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = base.where(F.col("b") == 2).select(
        F.concat(F.col("url"), F.lit("#v2")).alias("url"), "text"
    )
    return survived.unionByName(added)


def snapshot_b_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`snapshot_b`."""
    h = G.hash63_sql("url")
    return f"""
WITH base AS (SELECT url, text, ({h}) % 10 AS b FROM ({pages_sql}))
SELECT url, CASE WHEN b = 1 THEN text || CHR(10) || 'updated.' ELSE text END AS text
FROM base WHERE b <> 0
UNION ALL
SELECT url || '#v2' AS url, text FROM base WHERE b = 2
"""


def crawl_diff(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """(host, added, removed, changed, unchanged): per-host diff of two
    crawl snapshots — the recrawl-scheduling signal (hosts with high churn
    get recrawled sooner; dead hosts get dropped from the frontier).

    ONE full-outer join on url (the natural shuffle key, no skew — urls are
    unique) comparing md5(text), then one host-keyed rollup with map-side
    combine. At 100 TB both sides are url-partitioned scans; the join is
    the canonical sort-merge on a unique key."""
    a = snap_a.select("url", F.md5("text").alias("ha"))
    b = snap_b.select("url", F.md5("text").alias("hb"))
    j = a.join(b, "url", "full_outer")
    status = (
        F.when(F.col("ha").isNull(), F.lit("added"))
        .when(F.col("hb").isNull(), F.lit("removed"))
        .when(F.col("ha") != F.col("hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    host = F.regexp_extract("url", URL_RE, 2)
    per = j.select(host.alias("host"), status.alias("status"))
    return (
        per.groupBy("host")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).cast("long").alias("added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).cast("long").alias("removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).cast("long").alias("changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).cast("long").alias("unchanged"),
        )
    )


def crawl_diff_sql(snap_a_sql: str, snap_b_sql: str) -> str:
    """DuckDB twin of :func:`crawl_diff`."""
    return f"""
WITH a AS (SELECT url, md5(text) AS ha FROM ({snap_a_sql})),
b AS (SELECT url, md5(text) AS hb FROM ({snap_b_sql})),
j AS (SELECT coalesce(a.url, b.url) AS url, ha, hb FROM a FULL OUTER JOIN b ON a.url = b.url),
per AS (
  SELECT regexp_extract(url, '{URL_RE}', 2) AS host,
         CASE WHEN ha IS NULL THEN 'added'
              WHEN hb IS NULL THEN 'removed'
              WHEN ha <> hb THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM j)
SELECT host,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS removed,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
FROM per GROUP BY host
"""


def robots_rules(pages: DataFrame) -> DataFrame:
    """(host, prefix, allow): synthetic robots.txt rule set, a deterministic
    dataflow over the crawl's own host list (both engines rebuild the same
    rules): every host allows '/'; hosts with hash63(host)%4 == 0 disallow
    '/p/' but re-allow '/p/1' — the longest-prefix-wins case robots
    semantics require."""
    hosts = parse_urls(pages).select("host").distinct()
    sel = F.pmod(G.hash63_col(F.col("host")), F.lit(4)) == 0
    root = hosts.select("host", F.lit("/").alias("prefix"), F.lit(True).alias("allow"))
    dis = hosts.where(sel).select(
        "host", F.lit("/p/").alias("prefix"), F.lit(False).alias("allow")
    )
    re_allow = hosts.where(sel).select(
        "host", F.lit("/p/1").alias("prefix"), F.lit(True).alias("allow")
    )
    return root.unionByName(dis).unionByName(re_allow)


def robots_filter(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, host, path, matched_prefix, allowed): robots.txt gate with
    longest-prefix-wins semantics — each page matches every rule of its
    host whose prefix starts its path; the LONGEST match decides.

    Scale shape: the rule table is metadata-scale (O(hosts)), so the match
    is a BROADCAST equi-join on host with the startswith predicate applied
    in-join, then one struct-ordered max per url — no shuffle of the pages
    beyond the final groupBy, which AQE coalesces."""
    parsed = parse_urls(pages).select("url", "host", "path")
    j = parsed.join(F.broadcast(rules), "host").where(
        F.col("path").startswith(F.col("prefix"))
    )
    pick = j.groupBy("url", "host", "path").agg(
        F.max(F.struct(F.length("prefix").alias("l"), "allow", "prefix")).alias("m")
    )
    return pick.select(
        "url", "host", "path",
        F.col("m.prefix").alias("matched_prefix"),
        F.col("m.allow").alias("allowed"),
    )


def robots_rules_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`robots_rules`."""
    h = G.hash63_sql("host")
    return f"""
WITH hosts AS (SELECT DISTINCT regexp_extract(url, '{URL_RE}', 2) AS host FROM ({pages_sql}))
SELECT host, '/' AS prefix, true AS allow FROM hosts
UNION ALL
SELECT host, '/p/' AS prefix, false AS allow FROM hosts WHERE ({h}) % 4 = 0
UNION ALL
SELECT host, '/p/1' AS prefix, true AS allow FROM hosts WHERE ({h}) % 4 = 0
"""


def robots_filter_sql(pages_sql: str, rules_sql: str) -> str:
    """DuckDB twin of :func:`robots_filter`."""
    return f"""
WITH parsed AS (
  SELECT url, regexp_extract(url, '{URL_RE}', 2) AS host,
         regexp_extract(url, '{URL_RE}', 3) AS path
  FROM ({pages_sql})),
r AS ({rules_sql}),
j AS (
  SELECT p.url, p.host, p.path, r.prefix, r.allow
  FROM parsed p JOIN r ON p.host = r.host
  WHERE starts_with(p.path, r.prefix)),
pick AS (
  SELECT url, host, path,
         max(struct_pack(l := length(prefix), allow := allow, prefix := prefix)) AS m
  FROM j GROUP BY url, host, path)
SELECT url, host, path, (m).prefix AS matched_prefix, (m).allow AS allowed FROM pick
"""


def crawl_frontier(pages: DataFrame, host_rank: DataFrame) -> DataFrame:
    """(url, host, slot, rank, priority): politeness-aware crawl-frontier
    schedule — the fetch ordering a crawler actually executes. Each host's
    urls get sequential SLOTS (slot k = the k-th request to that host, so
    one-request-per-host-per-round politeness is slot order by
    construction); within a slot, higher-authority hosts (``host_rank``
    from link PageRank) fetch first. ``priority`` is the global fetch
    position.

    Scale shape: one window partitioned BY HOST (per-host sort, no global
    pass) for slots; the global priority NEVER runs a single-partition sort —
    it is assembled from per-SLOT windows plus driver-side cumulative slot
    offsets (slot counts are metadata: one row per slot wave, bounded by the
    deepest host's queue), so the widest partition is one slot wave, not the
    whole frontier. Urls are deterministically sub-ordered by portable-hash
    so the schedule is engine-reproducible."""
    from pyspark.sql import Window

    parsed = parse_urls(pages).select("url", "host")
    wslot = Window.partitionBy("host").orderBy(G.hash63_col(F.col("url")), "url")
    slotted = parsed.withColumn("slot", F.row_number().over(wslot).cast("long"))
    j = slotted.join(F.broadcast(host_rank.select("host", "rank")), "host")
    # priority = cumulative count of earlier slot waves + rank within this
    # wave; identical to a global row_number over (slot, rank DESC, host,
    # url) but with no global sort. Slot counts are driver metadata.
    j = j.localCheckpoint(eager=False)  # two consumers: slot counts + the schedule
    # cumulative offsets as a LAZY window over the slot-counts table (one row
    # per slot wave — bounded by the deepest host queue, never the frontier);
    # no driver collect, no eager jobs, executors absorb the skewed case
    counts = j.groupBy("slot").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off = counts.withColumn("slot_off", F.sum("n").over(w_off) - F.col("n")).select(
        "slot", "slot_off"
    )
    wp = Window.partitionBy("slot").orderBy(F.desc("rank"), "host", "url")
    return (
        j.join(F.broadcast(off), "slot")
        .withColumn("priority", (F.col("slot_off") + F.row_number().over(wp)).cast("long"))
        .select("url", "host", "slot", "rank", "priority")
    )


def crawl_frontier_sql(pages_sql: str, host_rank_sql: str) -> str:
    """DuckDB twin of :func:`crawl_frontier`. ``host_rank_sql`` yields
    (host, rank)."""
    h = G.hash63_sql("url")
    return f"""
WITH parsed AS (
  SELECT url, regexp_extract(url, '{URL_RE}', 2) AS host FROM ({pages_sql})),
slotted AS (
  SELECT url, host,
         CAST(row_number() OVER (PARTITION BY host ORDER BY {h}, url) AS BIGINT) AS slot
  FROM parsed),
j AS (SELECT s.url, s.host, s.slot, r.rank
      FROM slotted s JOIN ({host_rank_sql}) r USING (host))
SELECT url, host, slot, rank,
       CAST(row_number() OVER (ORDER BY slot, rank DESC, host, url) AS BIGINT) AS priority
FROM j
"""


def path_rollup(pages: DataFrame, max_depth: int = 3) -> DataFrame:
    """(host, depth, prefix, n_pages, total_tokens): the URL-space tile
    pyramid — every page rolls up into its path-prefix ancestors (depth 0 =
    the site root '/', depth d = the first d path segments), mirroring how a
    tile pyramid rolls cells into parents. The drill-down surface for "which
    section of this site holds the tokens".

    Scale shape: each page fans out to at most ``max_depth + 1`` prefix rows
    (a constant), then ONE groupBy(host, depth, prefix) with full map-side
    combine — the same bounded-fan-out + single-shuffle shape as the quadkey
    pyramid rollup (operators/heatmap.py). Hot hosts are Zipf-skewed but the
    key includes the prefix, which subdivides them; AQE splits any residual
    hot key."""
    parsed = parse_urls(pages).select(
        "host", "path", G.token_count_col(F.col("text")).alias("n_tokens")
    )
    segs = F.filter(F.split(F.col("path"), "/"), lambda s: s != "")
    fan = F.transform(
        F.sequence(F.lit(0), F.least(F.size(segs), F.lit(max_depth))),
        lambda d: F.struct(
            d.cast("long").alias("depth"),
            F.when(d == 0, F.lit("/"))
            .otherwise(F.concat(F.lit("/"), F.concat_ws("/", F.slice(segs, 1, d))))
            .alias("prefix"),
        ),
    )
    return (
        parsed.select("host", "n_tokens", F.explode(fan).alias("p"))
        .groupBy("host", F.col("p.depth").alias("depth"), F.col("p.prefix").alias("prefix"))
        .agg(F.count("*").alias("n_pages"), F.sum("n_tokens").alias("total_tokens"))
    )


def path_rollup_sql(pages_sql: str, max_depth: int = 3) -> str:
    """DuckDB twin of :func:`path_rollup`; ``pages_sql`` yields (url, text)."""
    return f"""
WITH parsed AS (
  SELECT regexp_extract(url, '{URL_RE}', 2) AS host,
         regexp_extract(url, '{URL_RE}', 3) AS path,
         {G.token_count_sql("text")} AS n_tokens
  FROM ({pages_sql})),
segd AS (
  SELECT host, n_tokens, list_filter(str_split(path, '/'), s -> s <> '') AS segs
  FROM parsed),
fan AS (
  SELECT host, n_tokens, segs,
         unnest(generate_series(0, least(len(segs), {max_depth}))) AS depth
  FROM segd)
SELECT host, depth,
       CASE WHEN depth = 0 THEN '/'
            ELSE '/' || array_to_string(segs[1:depth], '/') END AS prefix,
       count(*)::BIGINT AS n_pages,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM fan GROUP BY 1, 2, 3
"""


def term_bursts(
    pages: DataFrame,
    min_last: int = 3,
    min_prior_periods: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """(term, c_last, avg_prior, lift, rnk): burst detection — terms whose
    count in the LATEST crawl week most exceeds their own prior weekly
    average (lift = c_last / avg_prior). The trend signal a crawl-monitoring
    pipeline alerts on: what is the web suddenly talking about.

    Scale shape: one (term, week) groupBy with map-side combine (the only
    point-set shuffle), then per-term prior aggregation over the
    term-cardinality count table; the latest week is a broadcast 1-row
    aggregate; top-k via orderBy+limit (TakeOrderedAndProject), rank window
    over k rows only. Terms below ``min_last`` in the last week or with
    fewer than ``min_prior_periods`` active prior weeks are dropped (burst
    of nothing is noise)."""
    from pyspark.sql import Window

    wk = F.date_format(F.date_trunc("week", F.col("warc_ts")), "yyyy-MM-dd")
    tw = (
        pages.select(wk.alias("week"), F.explode(G.words_col(F.col("text"))).alias("term"))
        .groupBy("term", "week")
        .agg(F.count("*").alias("c"))
    ).localCheckpoint(eager=False)  # two consumers: last-week counts + priors
    last = tw.agg(F.max("week").alias("last_week"))
    lastc = (
        tw.join(F.broadcast(last), tw["week"] == last["last_week"])
        .select("term", F.col("c").alias("c_last"))
        .where(F.col("c_last") >= min_last)
    )
    prior = (
        tw.join(F.broadcast(last), tw["week"] < last["last_week"])
        .groupBy("term")
        .agg(F.sum("c").alias("prior_sum"), F.count("*").alias("prior_n"))
        .where(F.col("prior_n") >= min_prior_periods)
    )
    scored = lastc.join(prior, "term").select(
        "term",
        "c_last",
        F.round(F.col("prior_sum").cast("double") / F.col("prior_n").cast("double"), 6).alias(
            "avg_prior"
        ),
        F.round(
            F.col("c_last").cast("double")
            / (F.col("prior_sum").cast("double") / F.col("prior_n").cast("double")),
            6,
        ).alias("lift"),
    )
    top = scored.orderBy(F.desc("lift"), "term").limit(top_k)
    w = Window.orderBy(F.desc("lift"), "term")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def term_bursts_sql(
    pages_sql: str, min_last: int = 3, min_prior_periods: int = 2, top_k: int = 20
) -> str:
    """DuckDB twin of :func:`term_bursts`; ``pages_sql`` yields (warc_ts, text)."""
    return f"""
WITH tw AS (
  SELECT term, week, count(*)::BIGINT AS c FROM (
    SELECT strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS week,
           unnest({G.words_sql("text")}) AS term
    FROM ({pages_sql}))
  GROUP BY term, week),
last AS (SELECT max(week) AS last_week FROM tw),
lastc AS (
  SELECT term, c AS c_last FROM tw, last WHERE week = last_week AND c >= {min_last}),
prior AS (
  SELECT term, sum(c)::BIGINT AS prior_sum, count(*)::BIGINT AS prior_n
  FROM tw, last WHERE week < last_week GROUP BY term
  HAVING count(*) >= {min_prior_periods}),
scored AS (
  SELECT term, c_last,
         round(CAST(prior_sum AS DOUBLE) / CAST(prior_n AS DOUBLE), 6) AS avg_prior,
         round(CAST(c_last AS DOUBLE) / (CAST(prior_sum AS DOUBLE) / CAST(prior_n AS DOUBLE)), 6) AS lift
  FROM lastc JOIN prior USING (term))
SELECT term, c_last, avg_prior, lift,
       CAST(row_number() OVER (ORDER BY lift DESC, term) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= {top_k}
"""


RECENCY_ALPHA = 0.8  # weekly decay


def host_recency(pages: DataFrame, alpha: float = RECENCY_ALPHA) -> DataFrame:
    """(host, n_pages, recency_score): recency-weighted crawl mass per host —
    each page contributes alpha^(weeks since the newest capture in the
    corpus), so recently-recrawled hosts outrank stale ones at equal size.
    The freshness prior a recrawl scheduler feeds on.

    Twin-exactness: alpha^d is computed as exp(d·ln(alpha)) with the TWIN
    transcendentals (functions/sqlgen.py exp/ln — pinned-order IEEE, no
    libm), ln(alpha) injected as one Python-computed literal into both
    engines; per-host sums go through exact DECIMAL. Scale shape: the global
    newest timestamp is a broadcast 1-row aggregate; then one host-keyed
    groupBy with map-side combine."""
    from ..functions.sqlgen import exp_col, ln_py

    ln_alpha = ln_py(alpha)  # one shared literal
    latest = pages.agg(F.max("warc_ts").alias("latest_ts"))
    parsed = parse_urls(pages).select("host", "warc_ts")
    d = F.floor(
        F.datediff(F.to_date(F.col("latest_ts")), F.to_date(F.col("warc_ts"))) / F.lit(7)
    ).cast("double")
    weighted = parsed.crossJoin(F.broadcast(latest)).select(
        "host", exp_col(d * F.lit(ln_alpha)).alias("wgt")
    )
    return weighted.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.col("wgt").cast("decimal(28,15)")).cast("double").alias("recency_score"),
    )


def host_recency_sql(pages_sql: str, alpha: float = RECENCY_ALPHA) -> str:
    """DuckDB twin of :func:`host_recency`."""
    from ..functions.hexgen import flit
    from ..functions.sqlgen import exp_sql, ln_py

    ln_alpha = ln_py(alpha)
    return f"""
WITH latest AS (SELECT max(warc_ts) AS latest_ts FROM ({pages_sql})),
parsed AS (
  SELECT regexp_extract(url, '{URL_RE}', 2) AS host, warc_ts FROM ({pages_sql})),
darg AS (
  SELECT host,
         (CAST(floor(datediff('day', CAST(warc_ts AS DATE), CAST(latest_ts AS DATE)) / 7) AS DOUBLE)
          * {flit(ln_alpha)}) AS x
  FROM parsed, latest),
weighted AS (SELECT host, {exp_sql("x")} AS wgt FROM darg)
SELECT host, count(*)::BIGINT AS n_pages,
       CAST(sum(CAST(wgt AS DECIMAL(28,15))) AS DOUBLE) AS recency_score
FROM weighted GROUP BY host
"""


def host_anomaly(pages: DataFrame, min_prior_weeks: int = 3) -> DataFrame:
    """(host, c_last, mean_prior, sd_prior, z): crawl-health anomaly score —
    how many standard deviations the latest week's page count sits from the
    host's own prior weekly history. |z| ≥ 2 is the recrawl-alert threshold
    (site redesign, outage, or a crawler trap).

    Exactness: sum and sum-of-squares go through DECIMAL (cross-row float
    addition is order-dependent; decimals are exact), then mean/variance are
    per-row double arithmetic in pinned order: var = (sumsq − sum²/n)/(n−1).
    Scale shape: one (host, week) groupBy on the page scan, host-cardinality
    everything after (the per-host latest week is one more host-keyed agg +
    join on the same key — no extra shuffle of the page set)."""
    wk = F.date_format(F.date_trunc("week", F.col("warc_ts")), "yyyy-MM-dd")
    hw = (
        parse_urls(pages)
        .select("host", wk.alias("week"))
        .groupBy("host", "week")
        .agg(F.count("*").alias("c"))
    ).localCheckpoint(eager=False)  # consumers: latest counts + prior stats
    # "latest" is PER HOST (its own newest active week): every multi-week
    # host scores, instead of only hosts that happened to appear in the
    # corpus's single newest week
    last = hw.groupBy("host").agg(F.max("week").alias("last_week"))
    lastc = hw.join(last, ["host"]).where(F.col("week") == F.col("last_week")).select(
        "host", F.col("c").alias("c_last")
    )
    prior = (
        hw.join(last, ["host"])
        .where(F.col("week") < F.col("last_week"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c").cast("decimal(28,6)")).cast("double").alias("s"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(28,6)")).cast("double").alias("ss"),
        )
        .where(F.col("n") >= min_prior_weeks)
    )
    mean = F.col("s") / F.col("n").cast("double")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast("double")) / (
        F.col("n").cast("double") - F.lit(1.0)
    )
    # the decimal-exact ss and the rounded s*s/n can put var one ulp below 0
    # for huge constant-ish counts; Spark sqrt would yield NaN while DuckDB
    # sqrt ERRORS on negatives — clamp in BOTH twins
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        lastc.join(prior, "host")
        .select(
            "host",
            "c_last",
            mean.alias("mean_prior"),
            sd.alias("sd_prior"),
            F.when(sd > 0, (F.col("c_last").cast("double") - mean) / sd)
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


def host_anomaly_sql(pages_sql: str, min_prior_weeks: int = 3) -> str:
    """DuckDB twin of :func:`host_anomaly`; ``pages_sql`` yields (url, warc_ts)."""
    return f"""
WITH hw AS (
  SELECT regexp_extract(url, '{URL_RE}', 2) AS host,
         strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS week,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1, 2),
last AS (SELECT host, max(week) AS last_week FROM hw GROUP BY host),
lastc AS (SELECT host, c AS c_last FROM hw JOIN last USING (host) WHERE week = last_week),
prior AS (
  SELECT host, count(*)::BIGINT AS n,
         CAST(sum(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(c * c AS DECIMAL(28,6))) AS DOUBLE) AS ss
  FROM hw JOIN last USING (host) WHERE week < last_week GROUP BY host
  HAVING count(*) >= {min_prior_weeks}),
scored AS (
  SELECT host, c_last, n, s, ss,
         (s / CAST(n AS DOUBLE)) AS mean_prior,
         sqrt(greatest((ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0), 0.0)) AS sd_prior
  FROM lastc JOIN prior USING (host))
SELECT host, c_last, mean_prior, sd_prior,
       CASE WHEN sd_prior > 0
            THEN (CAST(c_last AS DOUBLE) - mean_prior) / sd_prior
            ELSE 0.0 END AS z
FROM scored
"""
