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
