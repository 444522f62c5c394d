"""Corpus-evolution statistics across crawl weeks: drift, trend, concentration.

Three monitoring operators a continuously-recrawled corpus needs
(complementing term_bursts / crawl_diff / host_anomaly in webops.py):

- :func:`term_drift` — Jensen-Shannon divergence between the term
  distributions of consecutive crawl weeks: THE distribution-shift alarm
  for a training-data pipeline (vocabulary drift, scraper breakage, topic
  shocks). Symmetric, bounded [0, ln 2], and exact here: twin ln, DECIMAL
  contribution sums.
- :func:`theil_sen_hosts` — per-host Theil-Sen robust trend of weekly page
  counts: the median of all pairwise slopes. Unlike OLS (trend_surface) a
  single outlier week cannot move it; the estimator of choice for noisy
  per-host crawl volumes.
- :func:`host_gini` — Gini coefficient of the host page-count
  distribution: one number for "how concentrated is the crawl" (0 =
  egalitarian, →1 = a few megahosts dominate), computed exactly from the
  closed form G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx) over rank-ordered hosts.

Scale shape: each starts with ONE corpus-scale groupBy — (term, week),
(host, week), (host) — and everything after runs on vocabulary/host/week
metadata. term_drift's week pairing is a lead() over the tiny distinct-week
list; theil_sen's pair fan-out is K²/2 per host where K = #weeks (a crawl
has tens of weeks, not thousands); host_gini's rank window orders host
metadata, never pages. Integer sums stay integer (Σi·x is exact), float
sums go through DECIMAL(28,15), divisions are pinned and mirrored in the
DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G

DEC = "decimal(28,15)"
_WEEK = "yyyy-MM-dd"


def _week_counts(pages: DataFrame) -> DataFrame:
    wk = F.date_format(F.date_trunc("week", F.col("warc_ts")), _WEEK)
    return (
        pages.select(wk.alias("week"), F.explode(G.words_col(F.col("text"))).alias("term"))
        .groupBy("week", "term")
        .agg(F.count("*").alias("c"))
    )


def term_drift(pages: DataFrame) -> DataFrame:
    """pages: (warc_ts, text). One row per consecutive week pair:
    (week1, week2, n_terms, jsd) — n_terms = union vocabulary size of the
    pair, jsd = JS divergence in nats between the weeks' term frequencies.
    """
    tw = _week_counts(pages).localCheckpoint(eager=False)
    wtot = tw.groupBy("week").agg(F.sum("c").cast("long").alias("t"))
    wlead = Window.orderBy("week")
    pairs = (
        wtot.select("week", "t", F.lead("week").over(wlead).alias("week2"),
                    F.lead("t").over(wlead).alias("t2"))
        .where(F.col("week2").isNotNull())
        .select(F.col("week").alias("week1"), F.col("week2"),
                F.col("t").alias("t1"), F.col("t2"))
    )
    a = tw.join(
        F.broadcast(pairs), tw["week"] == pairs["week1"]
    ).select("week1", "week2", "t1", "t2", "term", F.col("c").alias("c1"))
    b = tw.join(
        F.broadcast(pairs.select("week1", "week2")), tw["week"] == F.col("week2")
    ).select("week1", F.col("week2"), "term", F.col("c").alias("c2"))
    m = a.join(b, ["week1", "week2", "term"], "full_outer").select(
        "week1",
        "week2",
        "term",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    # totals re-attached (full-outer rows from the b side lost t1/t2)
    m = m.join(F.broadcast(pairs), ["week1", "week2"])
    p = F.col("c1").cast("double") / F.col("t1").cast("double")
    q = F.col("c2").cast("double") / F.col("t2").cast("double")
    staged = m.select(
        "week1", "week2", "c1", "c2", p.alias("p"), q.alias("q"),
        ((p + q) * F.lit(0.5)).alias("mid"),
    ).select(
        "week1",
        "week2",
        "p",
        "q",
        F.when(F.col("c1") > 0, F.col("p") / F.col("mid")).otherwise(F.lit(1.0)).alias("a1"),
        F.when(F.col("c2") > 0, F.col("q") / F.col("mid")).otherwise(F.lit(1.0)).alias("a2"),
    )
    contrib = (
        F.lit(0.5) * (F.col("p") * G.ln_col(F.col("a1")))
        + F.lit(0.5) * (F.col("q") * G.ln_col(F.col("a2")))
    )
    return (
        staged.withColumn("contrib", contrib)
        .groupBy("week1", "week2")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(F.col("contrib").cast(DEC)).cast("double"), 6).alias("jsd"),
        )
    )


def term_drift_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`term_drift`; ``pages_sql`` yields (warc_ts, text)."""
    return f"""
WITH tw AS (
  SELECT week, term, count(*)::BIGINT AS c FROM (
    SELECT strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS week,
           unnest({G.words_sql("text")}) AS term
    FROM ({pages_sql}))
  GROUP BY week, term),
wtot AS (SELECT week, CAST(sum(c) AS BIGINT) AS t FROM tw GROUP BY week),
pairs AS (
  SELECT week AS week1, lead(week) OVER (ORDER BY week) AS week2,
         t AS t1, lead(t) OVER (ORDER BY week) AS t2
  FROM wtot QUALIFY week2 IS NOT NULL),
a AS (
  SELECT p.week1, p.week2, tw.term, tw.c AS c1
  FROM tw JOIN pairs p ON tw.week = p.week1),
b AS (
  SELECT p.week1, p.week2, tw.term, tw.c AS c2
  FROM tw JOIN pairs p ON tw.week = p.week2),
m AS (
  SELECT coalesce(a.week1, b.week1) AS week1, coalesce(a.week2, b.week2) AS week2,
         coalesce(a.term, b.term) AS term,
         coalesce(a.c1, 0) AS c1, coalesce(b.c2, 0) AS c2
  FROM a FULL OUTER JOIN b
    ON a.week1 = b.week1 AND a.week2 = b.week2 AND a.term = b.term),
mt AS (
  SELECT m.*, p.t1, p.t2 FROM m JOIN pairs p
    ON m.week1 = p.week1 AND m.week2 = p.week2),
pq AS (
  SELECT week1, week2, c1, c2,
         CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS p,
         CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS q,
         (CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)
          + CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE)) * 0.5 AS mid
  FROM mt),
args AS (
  SELECT week1, week2, p, q,
         CASE WHEN c1 > 0 THEN p / mid ELSE 1.0 END AS a1,
         CASE WHEN c2 > 0 THEN q / mid ELSE 1.0 END AS a2
  FROM pq),
scored AS (
  SELECT week1, week2,
         (0.5 * (p * {G.ln_sql('a1')}) + 0.5 * (q * {G.ln_sql('a2')})) AS contrib
  FROM args)
SELECT week1, week2, CAST(count(*) AS BIGINT) AS n_terms,
       round(CAST(sum(CAST(contrib AS DECIMAL(28,15))) AS DOUBLE), 6) AS jsd
FROM scored GROUP BY week1, week2
"""


# ------------------------------------------------------------- Theil-Sen


def theil_sen_hosts(
    pages: DataFrame, url_re: str, min_weeks: int = 3
) -> DataFrame:
    """pages: (url, warc_ts). Per host with ≥ ``min_weeks`` active weeks:
    (host, n_weeks, n_pairs, slope_med) — the exact lower median of all
    pairwise weekly-count slopes Δcount/Δweek (pages/week units)."""
    wk = F.date_trunc("week", F.col("warc_ts"))
    hw = (
        pages.select(
            F.regexp_extract("url", url_re, 2).alias("host"),
            F.floor(
                F.datediff(wk.cast("date"), F.to_date(F.lit("1970-01-05")))
                / F.lit(7)
            ).cast("long").alias("wi"),
        )
        .groupBy("host", "wi")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)  # host-week metadata; two consumers
    nw = hw.groupBy("host").agg(F.count(F.lit(1)).alias("n_weeks")).where(
        F.col("n_weeks") >= min_weeks
    )
    hwf = hw.join(F.broadcast(nw), "host")
    a = hwf.select("host", "n_weeks", F.col("wi").alias("w1"), F.col("c").alias("c1"))
    b = hwf.select("host", F.col("wi").alias("w2"), F.col("c").alias("c2"))
    slopes = (
        a.join(b, "host")
        .where(F.col("w1") < F.col("w2"))
        .select(
            "host",
            "n_weeks",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("w2") - F.col("w1")).cast("double")
            ).alias("slope"),
        )
    )
    ws = Window.partitionBy("host").orderBy("slope")
    wc = Window.partitionBy("host")
    r = slopes.withColumn("_rn", F.row_number().over(ws)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(wc)
    )
    return (
        r.where(F.col("_rn") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "host",
            "n_weeks",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_med"),
        )
    )


def theil_sen_hosts_sql(pages_sql: str, url_re: str, min_weeks: int = 3) -> str:
    """DuckDB twin of :func:`theil_sen_hosts`; yields (url, warc_ts)."""
    return f"""
WITH hw AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host,
         CAST(floor(datediff('day', DATE '1970-01-05',
                             CAST(date_trunc('week', warc_ts) AS DATE)) / 7)
              AS BIGINT) AS wi,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1, 2),
nw AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_weeks FROM hw GROUP BY host
  HAVING count(*) >= {min_weeks}),
slopes AS (
  SELECT a.host, nw.n_weeks,
         CAST(b.c - a.c AS DOUBLE) / CAST(b.wi - a.wi AS DOUBLE) AS slope
  FROM hw a JOIN hw b ON a.host = b.host AND a.wi < b.wi
  JOIN nw ON a.host = nw.host),
r AS (
  SELECT host, n_weeks, slope,
         row_number() OVER (PARTITION BY host ORDER BY slope) AS _rn,
         count(*) OVER (PARTITION BY host) AS n_pairs
  FROM slopes)
SELECT host, n_weeks, CAST(n_pairs AS BIGINT) AS n_pairs,
       round(slope, 6) AS slope_med
FROM r WHERE _rn = (n_pairs + 1) // 2
"""


# ---------------------------------------------------------------- host Gini


def host_gini(pages: DataFrame, url_re: str) -> DataFrame:
    """pages: (url,). ONE row (n_hosts, total_pages, gini): the Gini
    coefficient of pages-per-host. Integer numerator ⇒ exact."""
    counts = (
        pages.select(F.regexp_extract("url", url_re, 2).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    # rank hosts by (x, host) WITHOUT a global window over every host: hosts
    # tied on x occupy consecutive ranks s..s+c-1 and x is constant in the
    # tie group, so sum(i*x) per group = x*(c*s + c*(c-1)/2) regardless of
    # the within-group order. The only global window runs over DISTINCT
    # page-count values (value-bucket metadata, ≪ hosts); integer
    # arithmetic, so siw is bit-identical to ranking every host.
    per_x = counts.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_off = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("c").over(w_off), F.lit(0)).cast("long") + F.lit(1).cast("long")
    grouped = per_x.withColumn(
        "siw_g",
        F.col("x").cast("long")
        * (F.col("c") * start + F.col("c") * (F.col("c") - 1) / F.lit(2)).cast("long"),
    )
    agg = grouped.agg(
        F.sum("c").cast("long").alias("n_hosts"),
        F.sum(F.col("x") * F.col("c")).cast("long").alias("total_pages"),
        F.sum("siw_g").cast("long").alias("siw"),
    )
    n = F.col("n_hosts").cast("double")
    sx = F.col("total_pages").cast("double")
    gini = (F.lit(2.0) * F.col("siw").cast("double") - (n + F.lit(1.0)) * sx) / (
        n * sx
    )
    return agg.select("n_hosts", "total_pages", F.round(gini, 6).alias("gini"))


def host_gini_sql(pages_sql: str, url_re: str) -> str:
    """DuckDB twin of :func:`host_gini`; yields (url)."""
    return f"""
WITH counts AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host, count(*)::BIGINT AS x
  FROM ({pages_sql}) GROUP BY host),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, host) AS BIGINT) AS i
  FROM counts),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(x) AS BIGINT) AS total_pages,
         CAST(sum(i * x) AS BIGINT) AS siw
  FROM ranked)
SELECT n_hosts, total_pages,
       round((2.0 * CAST(siw AS DOUBLE)
              - (CAST(n_hosts AS DOUBLE) + 1.0) * CAST(total_pages AS DOUBLE))
             / (CAST(n_hosts AS DOUBLE) * CAST(total_pages AS DOUBLE)), 6) AS gini
FROM agg
"""


# ------------------------------------------------------------- burstiness


def term_burstiness(
    docs: DataFrame, min_df: int = 5, top_k: int = 25
) -> DataFrame:
    """Church-Gale term burstiness: the Fano factor var/mean of a term's
    per-document count over ALL documents (zeros included). Function words
    spread Poisson-like (fano ≈ 1); content/topic words "burst" — they
    concentrate in few documents (fano ≫ 1). The top-k burstiest terms are
    the corpus's topical vocabulary, extracted with zero linguistics.

    (term, df, total_tf, mean_tf, fano, rnk) for the ``top_k`` highest-fano
    terms with df ≥ ``min_df`` (ties → term). Moments come from postings
    aggregates alone — the zero documents fold into the closed form
    E[x] = Σtf/N, E[x²] = Σtf²/N — so the corpus is scanned once; integer
    DECIMAL sums, pinned divisions."""
    from ..operators.ranking import bm25_index

    postings = bm25_index(docs)
    n_row = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
    )
    z = per_term.where(F.col("df") >= min_df).crossJoin(F.broadcast(n_row))
    nd = F.col("n_docs").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mean * mean
    scored = z.select(
        "term",
        "df",
        F.col("s1").alias("total_tf"),
        F.round(mean, 6).alias("mean_tf"),
        F.round(var / mean, 6).alias("fano"),
    )
    # distributed top-k FIRST (TakeOrdered), THEN the rank window over
    # ≤ top_k rows — never a single-partition sort of the whole vocabulary
    top = scored.orderBy(F.desc("fano"), "term").limit(top_k)
    w = Window.orderBy(F.desc("fano"), "term")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def term_burstiness_sql(docs_sql: str, min_df: int = 5, top_k: int = 25) -> str:
    """DuckDB twin of :func:`term_burstiness`; yields (doc_id, text)."""
    ws = G.words_sql("text")
    return f"""
WITH postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest({ws}) AS term FROM ({docs_sql}))
  GROUP BY doc_id, term),
n_row AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM ({docs_sql})),
per_term AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS s1, CAST(sum(tf * tf) AS BIGINT) AS s2
  FROM postings GROUP BY term),
scored AS (
  SELECT term, df, s1 AS total_tf,
         round(CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_tf,
         round((CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE)
                - (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)))
               / (CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6) AS fano
  FROM per_term, n_row WHERE df >= {min_df})
SELECT term, df, total_tf, mean_tf, fano,
       CAST(row_number() OVER (ORDER BY fano DESC, term) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= {top_k}
"""


# ---------------------------------------------------------------- CUSUM


def host_cusum(
    pages: DataFrame, url_re: str, min_weeks: int = 4
) -> DataFrame:
    """Page-CUSUM change-point detection per host: over the weekly count
    series, S_t = Σ_{i≤t}(c_i − mean), and the change point is the week
    where |S_t| peaks (Page 1954 / binary-segmentation step 1). Output per
    host with ≥ ``min_weeks`` weeks:
    (host, n_weeks, mean_c, cusum_max, change_wi, rel_shift) —
    rel_shift = cusum_max / (mean·n_weeks) normalizes so hosts of any size
    compare. A host whose crawl volume stepped up/down mid-study scores
    high; flat hosts score ~0.

    Scale shape: one (host, week) groupBy, then host-partitioned windows
    over week metadata (tens of rows per host); exact DECIMAL mean, pinned
    deviations; change week tie → earliest."""
    wk = F.date_trunc("week", F.col("warc_ts"))
    hw = (
        pages.select(
            F.regexp_extract("url", url_re, 2).alias("host"),
            F.floor(
                F.datediff(wk.cast("date"), F.to_date(F.lit("1970-01-05")))
                / F.lit(7)
            ).cast("long").alias("wi"),
        )
        .groupBy("host", "wi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=False)  # host-week metadata; stats + dev consumers
    stats = hw.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        (
            F.sum(F.col("c").cast(DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_c"),
        F.sum("c").cast("long").alias("tot"),
    ).where(F.col("n_weeks") >= min_weeks)
    wcum = (
        Window.partitionBy("host")
        .orderBy("wi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = hw.join(F.broadcast(stats), "host").select(
        "host",
        "wi",
        "n_weeks",
        "mean_c",
        "tot",
        (F.col("c").cast("double") - F.col("mean_c")).alias("d"),
    )
    cum = dev.withColumn(
        "s_t",
        F.sum(F.col("d").cast(DEC)).over(wcum).cast("double"),
    )
    wpick = Window.partitionBy("host").orderBy(
        F.abs(F.col("s_t")).desc(), F.col("wi")
    )
    return (
        cum.withColumn("_rn", F.row_number().over(wpick))
        .where(F.col("_rn") == 1)
        .select(
            "host",
            "n_weeks",
            F.round("mean_c", 6).alias("mean_c"),
            F.round(F.abs(F.col("s_t")), 6).alias("cusum_max"),
            F.col("wi").alias("change_wi"),
            F.round(
                F.abs(F.col("s_t")) / F.col("tot").cast("double"), 6
            ).alias("rel_shift"),
        )
    )


def host_cusum_sql(pages_sql: str, url_re: str, min_weeks: int = 4) -> str:
    """DuckDB twin of :func:`host_cusum`; yields (url, warc_ts)."""
    return f"""
WITH hw AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host,
         CAST(floor(datediff('day', DATE '1970-01-05',
                             CAST(date_trunc('week', warc_ts) AS DATE)) / 7)
              AS BIGINT) AS wi,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1, 2),
stats AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_weeks,
         CAST(sum(CAST(c AS DECIMAL(28,15))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS mean_c,
         CAST(sum(c) AS BIGINT) AS tot
  FROM hw GROUP BY host HAVING count(*) >= {min_weeks}),
dev AS (
  SELECT hw.host, hw.wi, s.n_weeks, s.mean_c, s.tot,
         (CAST(hw.c AS DOUBLE) - s.mean_c) AS d
  FROM hw JOIN stats s ON hw.host = s.host),
cum AS (
  SELECT host, wi, n_weeks, mean_c, tot,
         CAST(sum(CAST(d AS DECIMAL(28,15))) OVER (PARTITION BY host ORDER BY wi
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s_t
  FROM dev),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY abs(s_t) DESC, wi) AS _rn
  FROM cum)
SELECT host, n_weeks, round(mean_c, 6) AS mean_c,
       round(abs(s_t), 6) AS cusum_max, wi AS change_wi,
       round(abs(s_t) / CAST(tot AS DOUBLE), 6) AS rel_shift
FROM pick WHERE _rn = 1
"""


# ------------------------------------------------------------- novelty


def doc_novelty(pages: DataFrame) -> DataFrame:
    """Per-page shingle novelty: the fraction of a page's distinct word
    3-gram shingles whose FIRST appearance in the whole crawl is the
    page's own week — "how much genuinely new text does this capture add".
    The freshness score a training-data pipeline uses to prioritize new
    content over recrawled boilerplate (complement of the dup/containment
    family, which scores sameness).

    (url, week, n_shingles, n_novel, novelty). Scale shape: one
    (url, shingle) distinct + one shingle-keyed groupBy for first weeks +
    ONE shuffle join back on shingle — the inverted-index shape every
    dedup operator here already pays; per-page counts are map-side
    combinable."""
    wk = F.date_format(F.date_trunc("week", F.col("warc_ts")), _WEEK)
    ps = (
        pages.select(
            "url", wk.alias("week"), F.explode(G.shingles_col(F.col("text"))).alias("sh")
        )
        .distinct()
    ).localCheckpoint(eager=False)  # two consumers: first-week + per-page
    first = ps.groupBy("sh").agg(F.min("week").alias("first_week"))
    joined = ps.join(first, "sh")
    return (
        joined.groupBy("url", "week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("first_week") == F.col("week")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "url",
            "week",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def doc_novelty_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`doc_novelty`; yields (url, warc_ts, text)."""
    return f"""
WITH ps AS (
  SELECT DISTINCT url, week, sh FROM (
    SELECT url, strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS week,
           unnest({G.shingles_sql("text")}) AS sh
    FROM ({pages_sql}))),
first AS (SELECT sh, min(week) AS first_week FROM ps GROUP BY sh),
joined AS (SELECT ps.url, ps.week, f.first_week FROM ps JOIN first f ON ps.sh = f.sh)
SELECT url, week, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN first_week = week THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN first_week = week THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM joined GROUP BY url, week
"""


# ----------------------------------------------------------- SES forecast


def host_ses_forecast(
    pages: DataFrame, url_re: str, alpha: float = 0.4, min_weeks: int = 4
) -> DataFrame:
    """One-step simple-exponential-smoothing backtest of weekly host crawl
    volume: the closed form s_T = α·Σ_{i<T} (1−α)^{T−1−i}·x_i +
    (1−α)^{T−1}·x_0 (s_0 = x_0) forecasts the LAST week from the prior
    ones; output the forecast, the actual, and the absolute percentage
    error per host — the capacity-planning sanity check.

    Engine-exactness: the geometric weights (1−α)^k are PLAN-TIME Python
    doubles joined in from a lag-literal table (no runtime pow), the
    weighted sum is DECIMAL, weeks are dense-indexed per host by
    row_number so gaps don't break the decay. (host, n_weeks, actual,
    forecast, ape)."""
    wk = F.date_trunc("week", F.col("warc_ts"))
    hw = (
        pages.select(
            F.regexp_extract("url", url_re, 2).alias("host"),
            F.floor(
                F.datediff(wk.cast("date"), F.to_date(F.lit("1970-01-05")))
                / F.lit(7)
            ).cast("long").alias("wi"),
        )
        .groupBy("host", "wi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=False)
    wo = Window.partitionBy("host").orderBy("wi")
    idx = hw.withColumn("t", F.row_number().over(wo).cast("long"))
    nw = idx.groupBy("host").agg(F.max("t").cast("long").alias("n_weeks")).where(
        F.col("n_weeks") >= min_weeks
    )
    j = idx.join(F.broadcast(nw), "host")
    # weight of x_t (1-based) in the forecast of week n: for t >= 2 it is
    # α·(1−α)^(n−1−t); x_1 carries α·(1−α)^(n−3)... plus the s_0 carry
    # (1−α)^(n−2)·x_1 — fold both into per-(n, t) literals
    # weight table cap — hosts with more than max_n weeks fall out of the
    # join (identically in both twins); raise for longer histories. For
    # t = 1 the algebra α(1−α)^{n−2} + (1−α)^{n−1} = (1−α)^{n−2} carries
    # the s_1 = x_1 initialization; both twins share the same Python float.
    max_n = 64
    rows = []
    for n in range(2, max_n + 1):
        for t in range(1, n):
            w = alpha * (1.0 - alpha) ** (n - 1 - t)
            if t == 1:
                w += (1.0 - alpha) ** (n - 1)
            rows.append((n, t, w))
    wt = pages.sparkSession.createDataFrame(rows, "n INT, wt_t INT, w DOUBLE")
    fc = (
        j.where(F.col("t") < F.col("n_weeks"))
        .join(
            F.broadcast(wt),
            (F.col("n_weeks") == F.col("n")) & (F.col("t") == F.col("wt_t")),
        )
        .groupBy("host")
        .agg(
            F.sum((F.col("c").cast("double") * F.col("w")).cast(DEC))
            .cast("double")
            .alias("forecast_raw")
        )
    )
    actual = j.where(F.col("t") == F.col("n_weeks")).select(
        "host", "n_weeks", F.col("c").alias("actual")
    )
    return actual.join(fc, "host").select(
        "host",
        "n_weeks",
        "actual",
        F.round("forecast_raw", 6).alias("forecast"),
        F.round(
            F.abs(F.col("forecast_raw") - F.col("actual").cast("double"))
            / F.col("actual").cast("double"),
            6,
        ).alias("ape"),
    )


def host_ses_forecast_sql(
    pages_sql: str, url_re: str, alpha: float = 0.4, min_weeks: int = 4
) -> str:
    """DuckDB twin of :func:`host_ses_forecast`."""
    max_n = 64
    rows = []
    for n in range(2, max_n + 1):
        for t in range(1, n):
            w = alpha * (1.0 - alpha) ** (n - 1 - t)
            if t == 1:
                w += (1.0 - alpha) ** (n - 1)
            rows.append(f"({n}, {t}, {w!r})")
    vals = ", ".join(rows)
    return f"""
WITH hw AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host,
         CAST(floor(datediff('day', DATE '1970-01-05',
                             CAST(date_trunc('week', warc_ts) AS DATE)) / 7)
              AS BIGINT) AS wi,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1, 2),
idx AS (
  SELECT host, wi, c,
         CAST(row_number() OVER (PARTITION BY host ORDER BY wi) AS BIGINT) AS t
  FROM hw),
nw AS (
  SELECT host, CAST(max(t) AS BIGINT) AS n_weeks FROM idx GROUP BY host
  HAVING max(t) >= {min_weeks}),
wt(n, t, w) AS (VALUES {vals}),
fc AS (
  SELECT j.host,
         CAST(sum(CAST(CAST(j.c AS DOUBLE) * wt.w AS DECIMAL(28,15))) AS DOUBLE)
           AS forecast_raw
  FROM (SELECT idx.*, nw.n_weeks FROM idx JOIN nw ON idx.host = nw.host) j
  JOIN wt ON j.n_weeks = wt.n AND j.t = wt.t
  WHERE j.t < j.n_weeks
  GROUP BY j.host),
actual AS (
  SELECT idx.host, nw.n_weeks, idx.c AS actual
  FROM idx JOIN nw ON idx.host = nw.host WHERE idx.t = nw.n_weeks)
SELECT a.host, a.n_weeks, a.actual,
       round(f.forecast_raw, 6) AS forecast,
       round(abs(f.forecast_raw - CAST(a.actual AS DOUBLE))
             / CAST(a.actual AS DOUBLE), 6) AS ape
FROM actual a JOIN fc f ON a.host = f.host
"""


# ------------------------------------------------------- MAD robust anomaly


def host_mad_anomaly(
    pages: DataFrame, url_re: str, min_weeks: int = 5, top_k: int = 50
) -> DataFrame:
    """Robust anomaly score for the LATEST week's volume per host:
    z_mad = (x_last − median_prior) / (1.4826·MAD_prior) — the
    median/median-absolute-deviation sibling of host_anomaly's mean/σ
    z-score, immune to a single outlier week inflating its own baseline.

    (host, n_prior, x_last, med_prior, mad_prior, z_mad, rnk) for the
    ``top_k`` largest |z_mad| (MAD > 0; ties → host). Both medians are
    exact type-1 rank picks over per-host week metadata; the 1.4826
    normal-consistency constant is a plan literal."""
    wk = F.date_trunc("week", F.col("warc_ts"))
    hw = (
        pages.select(
            F.regexp_extract("url", url_re, 2).alias("host"),
            F.floor(
                F.datediff(wk.cast("date"), F.to_date(F.lit("1970-01-05")))
                / F.lit(7)
            ).cast("long").alias("wi"),
        )
        .groupBy("host", "wi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=False)
    last = hw.groupBy("host").agg(F.max("wi").alias("last_wi"))
    j = hw.join(F.broadcast(last), "host")
    cur = j.where(F.col("wi") == F.col("last_wi")).select(
        "host", F.col("c").alias("x_last")
    )
    prior = j.where(F.col("wi") < F.col("last_wi")).select("host", "c")
    wmed = Window.partitionBy("host").orderBy("c", "host")
    cnt = Window.partitionBy("host")
    med = (
        prior.withColumn("_rn", F.row_number().over(wmed))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .where(
            (F.col("_n") >= min_weeks)
            & (F.col("_rn") == F.expr("(_n + 1) div 2"))
        )
        .select("host", F.col("_n").cast("long").alias("n_prior"),
                F.col("c").cast("double").alias("med_prior"))
    )
    dev = prior.join(F.broadcast(med), "host").select(
        "host", "n_prior", "med_prior",
        F.abs(F.col("c").cast("double") - F.col("med_prior")).alias("ad"),
    )
    wmad = Window.partitionBy("host").orderBy("ad", "host")
    mad = (
        dev.withColumn("_rn", F.row_number().over(wmad))
        .where(F.col("_rn") == F.expr("(n_prior + 1) div 2"))
        .select("host", "n_prior", "med_prior", F.col("ad").alias("mad_prior"))
        .where(F.col("mad_prior") > 0)
    )
    scored = cur.join(mad, "host").select(
        "host", "n_prior", "x_last",
        F.round("med_prior", 6).alias("med_prior"),
        F.round("mad_prior", 6).alias("mad_prior"),
        F.round(
            (F.col("x_last").cast("double") - F.col("med_prior"))
            / (F.lit(1.4826) * F.col("mad_prior")),
            6,
        ).alias("z_mad"),
    )
    # distributed top-k FIRST (TakeOrdered), THEN the rank window over
    # ≤ top_k rows — never a single-partition sort of every host
    top = scored.orderBy(F.abs(F.col("z_mad")).desc(), "host").limit(top_k)
    rw = Window.orderBy(F.abs(F.col("z_mad")).desc(), "host")
    return top.withColumn("rnk", F.row_number().over(rw).cast("long"))


def host_mad_anomaly_sql(
    pages_sql: str, url_re: str, min_weeks: int = 5, top_k: int = 50
) -> str:
    """DuckDB twin of :func:`host_mad_anomaly`."""
    return f"""
WITH hw AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host,
         CAST(floor(datediff('day', DATE '1970-01-05',
                             CAST(date_trunc('week', warc_ts) AS DATE)) / 7)
              AS BIGINT) AS wi,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1, 2),
last AS (SELECT host, max(wi) AS last_wi FROM hw GROUP BY host),
cur AS (
  SELECT hw.host, hw.c AS x_last
  FROM hw JOIN last ON hw.host = last.host AND hw.wi = last.last_wi),
prior AS (
  SELECT hw.host, hw.c
  FROM hw JOIN last ON hw.host = last.host AND hw.wi < last.last_wi),
med AS (
  SELECT host, CAST(_n AS BIGINT) AS n_prior, CAST(c AS DOUBLE) AS med_prior
  FROM (
    SELECT host, c,
           row_number() OVER (PARTITION BY host ORDER BY c, host) AS _rn,
           count(*) OVER (PARTITION BY host) AS _n
    FROM prior)
  WHERE _n >= {min_weeks} AND _rn = (_n + 1) // 2),
dev AS (
  SELECT p.host, m.n_prior, m.med_prior,
         abs(CAST(p.c AS DOUBLE) - m.med_prior) AS ad
  FROM prior p JOIN med m ON p.host = m.host),
mad AS (
  SELECT host, n_prior, med_prior, ad AS mad_prior
  FROM (
    SELECT host, n_prior, med_prior, ad,
           row_number() OVER (PARTITION BY host ORDER BY ad, host) AS _rn
    FROM dev)
  WHERE _rn = (n_prior + 1) // 2 AND ad > 0),
scored AS (
  SELECT c.host, m.n_prior, c.x_last,
         round(m.med_prior, 6) AS med_prior, round(m.mad_prior, 6) AS mad_prior,
         round((CAST(c.x_last AS DOUBLE) - m.med_prior)
               / (1.4826 * m.mad_prior), 6) AS z_mad
  FROM cur c JOIN mad m ON c.host = m.host)
SELECT host, n_prior, x_last, med_prior, mad_prior, z_mad,
       CAST(row_number() OVER (ORDER BY abs(z_mad) DESC, host) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= {top_k}
"""


def seasonal_decompose(pages: DataFrame) -> DataFrame:
    """Additive seasonal decomposition of the corpus's DAILY crawl-volume
    series, period 7: trend = centered 7-day moving average (defined only
    where all 7 days exist), seasonal = zero-centered per-weekday mean of
    the detrended series, resid = y − trend − seasonal. One row per day
    with a defined trend: (di, dow, c, trend, seasonal, resid); di = days
    since epoch, dow = di % 7.

    The series is calendar-bounded METADATA (one row per crawl day) after a
    single groupBy, so the unpartitioned RANGE window is a fixed-size frame
    over the time axis, and all means are DECIMAL-exact before the 6-dp
    round. Gaps in the calendar leave trend undefined (count < 7) exactly
    like statsmodels' boundary NaNs."""
    daily = (
        pages.select(
            F.datediff(F.col("warc_ts").cast("date"), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=False)  # day metadata; trend + seasonal consumers
    wma = Window.orderBy("di").rangeBetween(-3, 3)
    trended = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(wma) == 7,
            (F.sum(F.col("c").cast(DEC)).over(wma) / F.lit(7)).cast("double"),
        ),
    ).where(F.col("trend").isNotNull())
    det = trended.withColumn("dow", F.pmod(F.col("di"), F.lit(7)).cast("long")).withColumn(
        "d", F.col("c").cast("double") - F.col("trend")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.col("d").cast(DEC)).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("s_raw")
    )
    center = seas.agg(
        (
            F.sum(F.col("s_raw").cast(DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("s_mean")
    )
    seas_c = seas.crossJoin(F.broadcast(center)).select(
        "dow", (F.col("s_raw") - F.col("s_mean")).alias("seasonal")
    )
    return (
        det.join(F.broadcast(seas_c), "dow")
        .select(
            "di",
            "dow",
            "c",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("c").cast("double") - F.col("trend") - F.col("seasonal"), 6
            ).alias("resid"),
        )
    )


def seasonal_decompose_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`seasonal_decompose`; yields (warc_ts)."""
    return f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(warc_ts AS DATE)) AS BIGINT) AS di,
         count(*)::BIGINT AS c
  FROM ({pages_sql}) GROUP BY 1),
trended AS (
  SELECT di, c, trend FROM (
    SELECT di, c,
           CASE WHEN count(*) OVER w = 7
                THEN CAST(sum(CAST(c AS {DEC})) OVER w AS DOUBLE) / 7 END AS trend
    FROM daily
    WINDOW w AS (ORDER BY di RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))
  WHERE trend IS NOT NULL),
det AS (
  SELECT di, di % 7 AS dow, c, trend, CAST(c AS DOUBLE) - trend AS d FROM trended),
seas AS (
  SELECT dow, CAST(sum(CAST(d AS {DEC})) AS DOUBLE) / count(*) AS s_raw
  FROM det GROUP BY dow),
center AS (
  SELECT CAST(sum(CAST(s_raw AS {DEC})) AS DOUBLE) / count(*) AS s_mean FROM seas),
seas_c AS (
  SELECT dow, s_raw - (SELECT s_mean FROM center) AS seasonal FROM seas)
SELECT t.di, t.dow, t.c,
       round(t.trend, 6) AS trend,
       round(s.seasonal, 6) AS seasonal,
       round(CAST(t.c AS DOUBLE) - t.trend - s.seasonal, 6) AS resid
FROM det t JOIN seas_c s ON s.dow = t.dow
"""


def psi_drift(
    pages: DataFrame, n_bins: int = 10, text_col: str = "text"
) -> DataFrame:
    """Population Stability Index of the doc-quality distribution between
    consecutive crawl weeks — the standard ML-monitoring drift number for a
    numeric feature (PSI < 0.1 stable, > 0.25 action). Quality scores bin
    into ``n_bins`` fixed [0,1] buckets; per week pair:
    (week1, week2, psi) with PSI = Σ_bins (p−q)·ln(p/q) over
    Laplace-smoothed shares (+1 per bin, so empty bins stay finite and the
    twin ln is always in-domain).

    Scale shape: one corpus pass to (week, bin) counts; everything after is
    week×bin metadata; week pairing via lead over the distinct-week list."""
    wk = F.date_format(F.date_trunc("week", F.col("warc_ts")), _WEEK)
    q = G.quality_score_cols(F.col(text_col))
    binned = (
        pages.select(
            wk.alias("week"),
            F.least(
                F.floor(q * F.lit(float(n_bins))).cast("long"), F.lit(n_bins - 1)
            ).alias("bin"),
        )
        .groupBy("week", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=False)  # week×bin metadata; totals + pair consumers
    wtot = binned.groupBy("week").agg(F.sum("c").cast("long").alias("t"))
    wlead = Window.orderBy("week")
    pairs = (
        wtot.select(
            "week",
            F.col("t").alias("t1"),
            F.lead("week").over(wlead).alias("week2"),
            F.lead("t").over(wlead).alias("t2"),
        )
        .where(F.col("week2").isNotNull())
        .select(F.col("week").alias("week1"), "week2", "t1", "t2")
    )
    bins = pages.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    grid = pairs.crossJoin(F.broadcast(bins))
    c1 = binned.select(F.col("week").alias("week1"), "bin", F.col("c").alias("c1"))
    c2 = binned.select(F.col("week").alias("week2"), "bin", F.col("c").alias("c2"))
    m = (
        grid.join(c1, ["week1", "bin"], "left")
        .join(c2, ["week2", "bin"], "left")
        .select(
            "week1",
            "week2",
            "bin",
            (F.coalesce("c1", F.lit(0)) + 1).cast("double").alias("a"),
            (F.coalesce("c2", F.lit(0)) + 1).cast("double").alias("b"),
            (F.col("t1") + n_bins).cast("double").alias("ta"),
            (F.col("t2") + n_bins).cast("double").alias("tb"),
        )
    )
    p = F.col("a") / F.col("ta")
    qq = F.col("b") / F.col("tb")
    staged = m.select(
        "week1", "week2", p.alias("p"), qq.alias("q")
    ).withColumn("term", (F.col("p") - F.col("q")) * G.ln_col(F.col("p") / F.col("q")))
    return staged.groupBy("week1", "week2").agg(
        F.round(F.sum(F.col("term").cast(DEC)).cast("double"), 6).alias("psi")
    )


def psi_drift_sql(pages_sql: str, n_bins: int = 10, text_col: str = "text") -> str:
    """DuckDB twin of :func:`psi_drift`; yields (warc_ts, text)."""
    q = G.quality_score_sql(text_col)
    return f"""
WITH binned AS (
  SELECT week, bin, count(*)::BIGINT AS c FROM (
    SELECT strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS week,
           least(CAST(floor({q} * {float(n_bins)!r}) AS BIGINT), {n_bins - 1}) AS bin
    FROM ({pages_sql}))
  GROUP BY week, bin),
wtot AS (SELECT week, CAST(sum(c) AS BIGINT) AS t FROM binned GROUP BY week),
pairs AS (
  SELECT week AS week1, lead(week) OVER (ORDER BY week) AS week2,
         t AS t1, lead(t) OVER (ORDER BY week) AS t2
  FROM wtot QUALIFY week2 IS NOT NULL),
grid AS (
  SELECT p.*, b.bin FROM pairs p CROSS JOIN
    (SELECT unnest(range(0, {n_bins})) AS bin) b),
m AS (
  SELECT g.week1, g.week2, g.bin,
         CAST(COALESCE(a.c, 0) + 1 AS DOUBLE) AS a,
         CAST(COALESCE(b2.c, 0) + 1 AS DOUBLE) AS b,
         CAST(g.t1 + {n_bins} AS DOUBLE) AS ta,
         CAST(g.t2 + {n_bins} AS DOUBLE) AS tb
  FROM grid g
  LEFT JOIN binned a ON a.week = g.week1 AND a.bin = g.bin
  LEFT JOIN binned b2 ON b2.week = g.week2 AND b2.bin = g.bin),
staged AS (
  SELECT week1, week2, p, q, (p - q) * {G.ln_sql("(p / q)")} AS term
  FROM (SELECT week1, week2, a / ta AS p, b / tb AS q FROM m))
SELECT week1, week2,
       round(CAST(sum(CAST(term AS {DEC})) AS DOUBLE), 6) AS psi
FROM staged GROUP BY week1, week2
"""


def lorenz_curve(pages: DataFrame, url_re: str) -> DataFrame:
    """Lorenz curve of crawl concentration: hosts ordered by page count
    ascending; one point per DISTINCT count value v — (host_frac,
    page_frac) = (share of hosts with count ≤ v, share of pages they
    hold). The drawable curve behind host_gini's single number (how far
    below the diagonal the crawl bends = megahost dominance).

    Scale shape: one host groupBy, then distinct-count-value metadata with
    a cumulative window — the same value-bucket discipline as host_gini;
    exact integer cumulative sums."""
    counts = (
        pages.select(F.regexp_extract("url", url_re, 2).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    per_x = counts.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_x.select(
        "x",
        F.sum("c").over(wcum).cast("long").alias("hosts_cum"),
        F.sum(F.col("x") * F.col("c")).over(wcum).cast("long").alias("pages_cum"),
    )
    tot = per_x.agg(
        F.sum("c").cast("long").alias("n_hosts"),
        F.sum(F.col("x") * F.col("c")).cast("long").alias("n_pages"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "x",
        F.round(
            F.col("hosts_cum").cast("double") / F.col("n_hosts").cast("double"), 6
        ).alias("host_frac"),
        F.round(
            F.col("pages_cum").cast("double") / F.col("n_pages").cast("double"), 6
        ).alias("page_frac"),
    )


def lorenz_curve_sql(pages_sql: str, url_re: str) -> str:
    """DuckDB twin of :func:`lorenz_curve`; yields (url)."""
    return f"""
WITH counts AS (
  SELECT regexp_extract(url, '{url_re}', 2) AS host, count(*)::BIGINT AS x
  FROM ({pages_sql}) GROUP BY host),
per_x AS (SELECT x, count(*)::BIGINT AS c FROM counts GROUP BY x),
cum AS (
  SELECT x,
         CAST(sum(c) OVER w AS BIGINT) AS hosts_cum,
         CAST(sum(x * c) OVER w AS BIGINT) AS pages_cum
  FROM per_x
  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_hosts,
               CAST(sum(x * c) AS BIGINT) AS n_pages FROM per_x)
SELECT x,
       round(CAST(hosts_cum AS DOUBLE) / CAST(n_hosts AS DOUBLE), 6) AS host_frac,
       round(CAST(pages_cum AS DOUBLE) / CAST(n_pages AS DOUBLE), 6) AS page_frac
FROM cum CROSS JOIN tot
"""
