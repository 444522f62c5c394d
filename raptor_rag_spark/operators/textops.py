"""Text-analysis operators over the documents table (training-data pipeline).

Each operator is JVM-side expressions generated in functions/sqlgen.py, so it
has an *exact* DuckDB oracle twin (same arithmetic, same hashes). No Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        G.token_count_col(F.col("text")).alias("n_tokens"),
        F.size(G.words_col(F.col("text"))).alias("n_words"),
        F.length("text").alias("n_chars_text"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "lang", G.lang_id_cols(F.col("text")).alias("lang_guess"))


def quality_scores(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.round(G.quality_score_cols(F.col("text")), 6).alias("quality"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Exact-dedup fingerprint + rolling min-hash document fingerprint."""
    sh = G.shingles_col(F.col("text"), 8)
    rolling = F.when(F.size(sh) == 0, F.lit(0)).otherwise(
        F.array_min(F.transform(sh, lambda s: G.hash63_col(s)))
    )
    return docs.select(
        "doc_id",
        G.fingerprint_col(F.col("text")).alias("fingerprint"),
        rolling.alias("rolling_fp"),
    )


def normalize_texts(docs: DataFrame, col: str = "text", prefix_len: int = 80) -> DataFrame:
    """SQuAD-style normalization of a text prefix (F7 metric surface)."""
    return docs.select(
        "doc_id",
        G.normalize_answer_col(F.substring(col, 1, prefix_len)).alias("normalized"),
    )


def lm_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): per-doc mean log-likelihood under the
    corpus's own unigram MLE language model — the classic perplexity-style
    quality gate a training pipeline runs AFTER the cheap heuristic
    ``quality_scores`` (gibberish and boilerplate both sit far from the
    corpus distribution). avg_logprob = Σ_w tf_w·ln(c_w / total) / doclen.

    Scale shape: one postings shuffle (doc_id, term, tf), one vocab-sized
    term-count aggregate, a term-keyed join back (AQE picks broadcast when
    the vocab is small), cross-row sums in exact DECIMAL. ln is the sqlgen
    twin, so the whole statistic is hash-exact against DuckDB. Empty docs
    carry no tokens and drop out (no 0/0)."""
    words = docs.select(F.col("doc_id"), G.words_col(F.col("text")).alias("ws"))
    dl = words.select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
    postings = (
        words.select("doc_id", F.explode("ws").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = postings.groupBy("term").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("tot"))
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    contrib = F.col("tf").cast("double") * G.ln_col(F.col("p"))
    per_doc = (
        postings.join(counts, "term")
        .join(F.broadcast(total))
        .withColumn("p", p)
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.sum(F.col("contrib").cast("decimal(28,15)")).cast("double").alias("s"))
    )
    return per_doc.join(dl, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.col("s") / F.col("n_tokens").cast("double")).alias("avg_logprob"),
    )


def lm_scores_sql(docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB twin of :func:`lm_scores`."""
    ws = G.words_sql("text")
    return f"""
WITH words AS (SELECT doc_id, {ws} AS ws FROM ({docs_sql})),
dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM words),
postings AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM words) GROUP BY doc_id, term),
counts AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM postings GROUP BY term),
total AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM counts),
m AS MATERIALIZED (
  SELECT doc_id, CAST(tf AS DOUBLE) AS tfd, (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) AS p
  FROM postings JOIN counts USING (term) CROSS JOIN total),
agg AS (
  SELECT doc_id,
         CAST(sum(CAST(tfd * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS s
  FROM m GROUP BY doc_id)
SELECT doc_id, n_tokens, (s / CAST(n_tokens AS DOUBLE)) AS avg_logprob
FROM agg JOIN dl USING (doc_id)
"""


def curate_corpus(
    docs: DataFrame,
    clusters: DataFrame,
    min_quality: float = 0.48,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end training-corpus curation — the composition a 100-TB
    pipeline actually runs: near-dup keep-list (connected-components
    canonical resolution) ∩ language filter ∩ quality gate, with token
    counts for downstream budget accounting.

    One anti-join (broadcast of the small drop set) + pure JVM expression
    filters fused into the scan — the language/quality predicates are
    Catalyst-pushable, so at scale the dropped rows never leave the
    executors. All arithmetic comes from the sqlgen twins, so the whole
    composite has an exact DuckDB oracle."""
    from .dedup import apply_dedup

    kept = apply_dedup(docs, clusters)
    out = kept.select(
        "doc_id",
        G.lang_id_cols(F.col("text")).alias("lang_guess"),
        F.round(G.quality_score_cols(F.col("text")), 6).alias("quality"),
        G.token_count_col(F.col("text")).alias("n_tokens"),
    )
    return out.filter(
        F.col("lang_guess").isin(*langs) & (F.col("quality") >= F.lit(min_quality))
    )
