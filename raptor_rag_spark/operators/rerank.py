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

from abc import ABC, abstractmethod
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G

# a scorer maps (text column, query text) -> relevance score column; any
# pandas_udf-backed model scorer with this shape slots into rerank() —
# the Spark analogue of the reference's pluggable scoring model inside
# BaseReRanker.rerank (raptor/reranker.py:8-11, CrossEncoder :14-32)
Scorer = Callable[[Column, str], Column]


class BaseReRanker(ABC):
    """Reranker contract (reference raptor/reranker.py:8-11), batch shape:
    rescore a candidate DataFrame instead of a node list. Implementations
    provide ``scorer``; the window reorder is shared."""

    @abstractmethod
    def scorer(self, text: Column, query_text: str) -> Column: ...

    def rerank(self, candidates: DataFrame, query_text: str, top_k: int | None = None) -> DataFrame:
        return rerank(candidates, query_text, top_k=top_k, scorer=self.scorer)


class LexicalOverlapReRanker(BaseReRanker):
    """Default deterministic reranker — the engine's stand-in for the
    reference CrossEncoderReRanker (raptor/reranker.py:14-32): pure JVM
    lexical-overlap scoring with an exact DuckDB twin."""

    def scorer(self, text: Column, query_text: str) -> Column:
        return overlap_score(text, query_text)


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
    scorer: Scorer | None = None,
) -> DataFrame:
    """Re-score and reorder candidates; ``top_k=None`` = pure reorder (the
    reference default, tree_retriever.py:122-125). Adds ``score`` and
    replaces ``rank``. ``scorer`` injects any scoring model returning a
    score Column (e.g. a pandas_udf cross-encoder); the deterministic
    lexical overlap is the default."""
    score_fn = scorer if scorer is not None else overlap_score
    w = Window.partitionBy(*partition_cols).orderBy(F.desc("score"), tiebreak_col)
    out = (
        candidates.withColumn("score", F.round(score_fn(F.col(text_col), query_text), 6))
        .withColumn("rank", F.row_number().over(w))
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out
