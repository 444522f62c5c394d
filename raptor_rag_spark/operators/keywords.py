"""TextRank keyword extraction over the document corpus.

Classic TextRank (Mihalcea & Tarau 2004): build an undirected word
co-occurrence graph — an edge per adjacent word pair (window = 2), weighted
by corpus co-occurrence count — then run PageRank over it and read the
top-ranked words as corpus keywords. The graph × text crossover: the engine
already owns an exact fixed-round PageRank twin (``operators/graph.py``),
so keywords cost only a new edge extractor.

Scale shape: pairs come from zipping each token array with its tail
(pure codegen, zero shuffle until the pair groupBy, map-side combine);
the resulting edge list is *vocabulary*-cardinality — metadata-scale next
to the corpus — so every PageRank round is a broadcast join + one small
groupBy exactly like the host graph. ``min_count`` prunes hapax pairs
before the graph is built, bounding the vocabulary graph independent of
corpus size.

Exactness: counts are integers; PageRank sums in DECIMAL(28,15) with a
pinned evaluation order on both engines (see ``graph.pagerank``), so the
DuckDB twin is hash-exact including the float ranks.

Reference role: the reference has no keyword extraction; this is corpus
analytics the SURVEY §2 text-analysis family implies (keyword surfacing
for tile labeling pairs with ``tile_labels``/``doc_top_terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from .graph import link_pagerank, link_pagerank_sql

MIN_LEN = 4  # drop short function words — cheap deterministic stopword proxy


def cooccur_edges(docs: DataFrame, min_len: int = MIN_LEN, min_count: int = 2) -> DataFrame:
    """(src_host, dst_host, n_links): undirected adjacent-word co-occurrence
    edges, canonicalized (least, greatest), emitted in BOTH directions so
    the directed-PageRank kernel sees an undirected graph. Column names are
    the host-graph contract so :func:`graph.link_pagerank` applies as-is."""
    words = docs.select(G.words_col(F.col("text")).alias("ws"))
    pairs = words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(
        F.least("p.a", "p.b").alias("ta"), F.greatest("p.a", "p.b").alias("tb")
    ).where(
        (F.length("ta") >= min_len) & (F.length("tb") >= min_len) & (F.col("ta") != F.col("tb"))
    )
    und = pairs.groupBy("ta", "tb").agg(F.count("*").alias("n")).where(F.col("n") >= min_count)
    fwd = und.select(
        F.col("ta").alias("src_host"), F.col("tb").alias("dst_host"), F.col("n").alias("n_links")
    )
    rev = und.select(
        F.col("tb").alias("src_host"), F.col("ta").alias("dst_host"), F.col("n").alias("n_links")
    )
    return fwd.unionByName(rev)


def cooccur_edges_sql(docs_sql: str, min_len: int = MIN_LEN, min_count: int = 2) -> str:
    """DuckDB twin of :func:`cooccur_edges` (positional self-join bigrams —
    identical pair multiset to the Spark zip; ``docs_sql`` yields (text))."""
    ws = G.words_sql("text")
    return f"""
WITH w_{min_len} AS (
  SELECT row_number() OVER () AS rid, {ws} AS ws FROM ({docs_sql})),
t AS (SELECT rid, unnest(ws) AS w, generate_subscripts(ws, 1) AS i FROM w_{min_len}),
und AS (
  SELECT least(a.w, b.w) AS ta, greatest(a.w, b.w) AS tb,
         CAST(count(*) AS BIGINT) AS n
  FROM t a JOIN t b ON a.rid = b.rid AND b.i = a.i + 1
  WHERE length(least(a.w, b.w)) >= {min_len}
    AND length(greatest(a.w, b.w)) >= {min_len}
    AND a.w <> b.w
  GROUP BY 1, 2 HAVING count(*) >= {min_count})
SELECT ta AS src_host, tb AS dst_host, n AS n_links FROM und
UNION ALL
SELECT tb AS src_host, ta AS dst_host, n AS n_links FROM und
"""


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 5,
    top_k: int = 20,
    min_len: int = MIN_LEN,
    min_count: int = 2,
) -> DataFrame:
    """(term, out_deg, rank, rnk): top-k corpus keywords by TextRank."""
    pr = link_pagerank(cooccur_edges(docs, min_len, min_count), iterations)
    top = pr.orderBy(F.desc("rank"), "host").limit(top_k)
    w = Window.orderBy(F.desc("rank"), "host")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(F.col("host").alias("term"), "out_deg", "rank", "rnk")
    )


def textrank_keywords_sql(
    docs_sql: str,
    iterations: int = 5,
    top_k: int = 20,
    min_len: int = MIN_LEN,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`textrank_keywords`."""
    inner = link_pagerank_sql(cooccur_edges_sql(docs_sql, min_len, min_count), iterations)
    return f"""
SELECT host AS term, out_deg, rank, rnk FROM (
  SELECT host, out_deg, rank,
         CAST(row_number() OVER (ORDER BY rank DESC, host) AS BIGINT) AS rnk
  FROM ({inner})) WHERE rnk <= {top_k}
"""


# RAKE (Rose et al. 2010) — stopword-delimited candidate phrases scored by
# word degree/frequency. The list is FIXED (part of the operator contract,
# shared verbatim with the DuckDB twin): a standard small English set.
RAKE_STOPWORDS = (
    "a an and are as at be but by for from has have if in into is it its of on "
    "or that the their then there these they this to was were will with not no "
    "we you he she i them his her our your my me him us do does did so than "
    "too very can could should would may might must shall about after before "
    "between during over under again further once here when where why how all "
    "any both each few more most other some such only own same"
)
RAKE_STOP_SET = tuple(sorted(set(RAKE_STOPWORDS.split())))


def rake_keywords(
    docs: DataFrame,
    top_k: int = 25,
    max_phrase_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(phrase, n, score): top-``top_k`` RAKE keyphrases of the corpus.

    Candidate phrases are maximal runs of non-stopword tokens (runs longer
    than ``max_phrase_len`` are dropped, bounding phrase cardinality); each
    word scores deg(w)/freq(w) with freq = occurrences in candidates and
    deg = Σ length of the candidates containing it; a phrase scores the sum
    of its word scores. Ordering: (score desc, phrase).

    Scale shape: one posexplode of the token stream; phrase ids from a
    per-doc cumulative stopword count (doc-partitioned window, never
    global); word stats are vocabulary-cardinality groupBys with map-side
    combine; final ranking is distributed top-k (orderBy+limit) before the
    ≤ top_k rank window. All integer counts; score rounded at 6 dp for the
    twin hash."""
    toks = docs.select(
        "doc_id", F.posexplode(G.words_col(F.col(text_col))).alias("pos", "w")
    )
    is_stop = F.col("w").isin(*RAKE_STOP_SET)
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    words = (
        toks.withColumn("pid", F.sum(is_stop.cast("long")).over(wcum))
        .where(~is_stop)
        .select("doc_id", "pid", "pos", "w")
    )
    phrases = (
        words.groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .where(F.col("plen") <= max_phrase_len)
    )
    occ = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    wstats = occ.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    scored = (
        occ.join(wstats, "w")
        .groupBy("phrase")
        .agg(
            (
                F.sum(
                    (F.col("deg").cast("double") / F.col("freq").cast("double")).cast(
                        "decimal(28,15)"
                    )
                ).cast("double")
            ).alias("raw"),
            F.count(F.lit(1)).cast("long").alias("n_words_tot"),
        )
    )
    # raw summed every occurrence's word scores; one phrase occurrence
    # contributes plen word terms, so per-occurrence score = raw / n_occ
    counts = phrases.groupBy("phrase").agg(F.count(F.lit(1)).cast("long").alias("n"))
    per = (
        scored.join(counts, "phrase")
        .select(
            "phrase",
            "n",
            F.round(F.col("raw") / F.col("n").cast("double"), 6).alias("score"),
        )
    )
    top = per.orderBy(F.desc("score"), "phrase").limit(top_k)
    w = Window.orderBy(F.desc("score"), "phrase")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def rake_keywords_sql(
    docs_sql: str, top_k: int = 25, max_phrase_len: int = 4, text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`rake_keywords`."""
    stops = ", ".join(f"'{w}'" for w in RAKE_STOP_SET)
    return f"""
WITH toks AS (
  SELECT doc_id, u.pos, u.w FROM (
    SELECT doc_id,
           generate_subscripts({G.words_sql(text_col)}, 1) AS pos,
           unnest({G.words_sql(text_col)}) AS w
    FROM ({docs_sql})) u),
marked AS (
  SELECT doc_id, pos, w, (w IN ({stops})) AS is_stop FROM toks),
runs AS (
  SELECT doc_id, pos, w,
         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
  FROM marked),
words AS (SELECT doc_id, pid, pos, w FROM runs
          WHERE w NOT IN ({stops})),
phrases AS (
  SELECT doc_id, pid, string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS plen
  FROM words GROUP BY doc_id, pid
  HAVING count(*) <= {max_phrase_len}),
occ AS (
  SELECT phrase, plen, unnest(string_split(phrase, ' ')) AS w FROM phrases),
wstats AS (
  SELECT w, count(*)::BIGINT AS freq, sum(plen)::BIGINT AS deg
  FROM occ GROUP BY w),
scored AS (
  SELECT o.phrase,
         CAST(sum(CAST(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE)
                       AS DECIMAL(28,15))) AS DOUBLE) AS raw
  FROM occ o JOIN wstats s ON s.w = o.w GROUP BY o.phrase),
counts AS (SELECT phrase, count(*)::BIGINT AS n FROM phrases GROUP BY phrase),
per AS (
  SELECT s.phrase, c.n, round(s.raw / CAST(c.n AS DOUBLE), 6) AS score
  FROM scored s JOIN counts c ON c.phrase = s.phrase)
SELECT phrase, n, score,
       CAST(row_number() OVER (ORDER BY score DESC, phrase) AS BIGINT) AS rnk
FROM per ORDER BY score DESC, phrase LIMIT {top_k}
"""
