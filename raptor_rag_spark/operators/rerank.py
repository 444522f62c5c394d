"""Reranking (W3/O4): deterministic relevance re-scoring + window reorder.

Reference role: BaseReRanker / CrossEncoderReRanker / LLMReRanker
(raptor/reranker.py:8-46) — applied after candidate selection with
``top_k=len(selected)``, i.e. as a pure reorder (tree_retriever.py:122-125).
The cross-encoder score is replaced by a deterministic lexical-overlap score
(weighted word-overlap with idf-free normalization) that is a pure JVM
expression, so ranking has an exact DuckDB oracle and stays inside
whole-stage codegen. A model-based scorer can be slotted in as a pandas_udf
returning the same ``score`` column without touching the window logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def overlap_score(text: Column, query_text: str) -> Column:
    """|words(text) ∩ words(query)| / (|words(text)| + 1) — deterministic
    lexical relevance, exact-twin expressible (sqlgen words regex)."""
    q_words = sorted(set(query_text.lower().split()))
    toks = G.words_col(text)
    qarr = F.array(*[F.lit(w) for w in q_words])
    inter = F.size(F.array_intersect(F.array_distinct(toks), qarr))
    return inter.cast("double") / (F.size(toks).cast("double") + F.lit(1.0))


def overlap_score_sql(text_expr: str, query_text: str) -> str:
    q_words = sorted(set(query_text.lower().split()))
    toks = G.words_sql(text_expr)
    inter = f"len(list_intersect(list_distinct({toks}), {q_words!r}))"
    return f"({inter}::DOUBLE / (len({toks})::DOUBLE + 1.0))"


def rerank(
    candidates: DataFrame,
    query_text: str,
    top_k: int | None = None,
    text_col: str = "text",
    partition_cols: tuple[str, ...] = ("query_id",),
    tiebreak_col: str = "node_id",
) -> DataFrame:
    """Re-score and reorder candidates; ``top_k=None`` = pure reorder (the
    reference default). Adds ``score`` and replaces ``rank``."""
    w = Window.partitionBy(*partition_cols).orderBy(F.desc("score"), tiebreak_col)
    out = (
        candidates.withColumn("score", F.round(overlap_score(F.col(text_col), query_text), 6))
        .withColumn("rank", F.row_number().over(w))
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out
