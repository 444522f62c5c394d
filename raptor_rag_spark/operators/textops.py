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
