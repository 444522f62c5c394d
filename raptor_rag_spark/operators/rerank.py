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


# ---------------------------------------------------------------- MMR

def mmr_select(
    cand: DataFrame,
    docs: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """(query_id, doc_id, pick, rel, mmr): maximal-marginal-relevance
    diversified selection (Carbonell & Goldstein 1998) over a per-query
    candidate list — the diversity stage a RAG retriever runs after top-k so
    the context window isn't k near-duplicates of the same passage.

        pick_i = argmax_{d ∉ S} [ λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) ]

    ``cand`` is (query_id, doc_id, rel) — any top-N list (BM25, QL, kNN);
    ``docs`` is (doc_id, text). sim = Jaccard over DISTINCT word sets:
    |A∩B|/|A∪B|, an exact integer ratio (one IEEE division), so the k-step
    argmax chain is bit-identical in the DuckDB twin (:func:`mmr_select_sql`,
    the same steps unrolled as MATERIALIZED CTEs).

    Scale shape: candidates are top-N-bounded per query (metadata scale
    regardless of corpus size); the pairwise-similarity join is N² per query
    keyed on query_id (shuffle-hash, never cartesian across queries); the k
    selection rounds are a bounded driver loop of pure DataFrame ops — one
    anti-join + one max-aggregation + one per-query window each, with
    localCheckpoint truncating plan growth per round (the build_tree
    pattern). Nothing collects to the driver."""
    ws = docs.select("doc_id", F.array_distinct(G.words_col(F.col("text"))).alias("ws"))
    c = (
        cand.join(ws, "doc_id")
        .select("query_id", "doc_id", "rel", "ws")
        .localCheckpoint(eager=True)
    )
    pairs = (
        c.alias("a")
        .join(
            c.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("other_id"),
            (
                F.size(F.array_intersect("a.ws", "b.ws")).cast("double")
                / F.size(F.array_union("a.ws", "b.ws")).cast("double")
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    one_minus = 1.0 - lam
    w = Window.partitionBy("query_id").orderBy(F.desc("mmr"), "doc_id")
    # step 1: S = {} -> the penalty term is identically 0.0 (kept in the
    # expression so both engines run the same a - b*0.0 op sequence)
    sel = (
        c.withColumn("mmr", F.lit(lam) * F.col("rel") - F.lit(one_minus) * F.lit(0.0))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", "doc_id", "rel", "mmr", F.lit(1).alias("pick"))
        .localCheckpoint(eager=True)
    )
    for i in range(2, k + 1):
        rem = c.join(sel.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        # every remaining candidate has a pairs row to every selected doc
        # (pairs covers all within-query ordered pairs), so inner joins are
        # total for i >= 2 and maxsim is always defined
        ms = (
            pairs.join(
                sel.select("query_id", F.col("doc_id").alias("other_id")),
                ["query_id", "other_id"],
            )
            .groupBy("query_id", "doc_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        step = (
            rem.join(ms, ["query_id", "doc_id"])
            .withColumn(
                "mmr", F.lit(lam) * F.col("rel") - F.lit(one_minus) * F.col("maxsim")
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("query_id", "doc_id", "rel", "mmr", F.lit(i).alias("pick"))
        )
        sel = sel.unionByName(step).localCheckpoint(eager=True)
    return sel.select("query_id", "doc_id", "pick", "rel", "mmr")


def mmr_select_sql(
    cand_sql: str,
    docs_sql: str = "SELECT doc_id, text FROM documents",
    k: int = 5,
    lam: float = 0.7,
) -> str:
    """DuckDB twin of :func:`mmr_select` — the k argmax rounds unrolled as
    MATERIALIZED CTEs (each round references the previous selection twice,
    so un-materialized inlining would grow the plan exponentially).
    ``cand_sql`` must yield (query_id, doc_id, rel)."""
    ws = G.words_sql("text")
    one_minus = 1.0 - lam
    ctes = [
        f"wsets AS (SELECT doc_id, list_distinct({ws}) AS ws FROM ({docs_sql}))",
        f"""c AS MATERIALIZED (
  SELECT q.query_id, q.doc_id, q.rel, w.ws
  FROM ({cand_sql}) q JOIN wsets w USING (doc_id))""",
        """pairs AS MATERIALIZED (
  SELECT a.query_id, a.doc_id, b.doc_id AS other_id,
         CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE) AS sim
  FROM c a JOIN c b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id)""",
        f"""sel1 AS MATERIALIZED (
  SELECT query_id, doc_id, rel, mmr, 1 AS pick FROM (
    SELECT query_id, doc_id, rel, ({lam!r} * rel - {one_minus!r} * 0.0) AS mmr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ({lam!r} * rel - {one_minus!r} * 0.0) DESC, doc_id) AS rn
    FROM c) WHERE rn = 1)""",
    ]
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        ctes.append(
            f"""ms{i} AS (
  SELECT p.query_id, p.doc_id, max(p.sim) AS maxsim
  FROM pairs p JOIN {prev} s ON p.query_id = s.query_id AND p.other_id = s.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM {prev} s2
                    WHERE s2.query_id = p.query_id AND s2.doc_id = p.doc_id)
  GROUP BY p.query_id, p.doc_id)"""
        )
        ctes.append(
            f"""sel{i} AS MATERIALIZED (
  SELECT query_id, doc_id, rel, mmr, pick FROM {prev}
  UNION ALL
  SELECT query_id, doc_id, rel, mmr, {i} AS pick FROM (
    SELECT c.query_id, c.doc_id, c.rel,
           ({lam!r} * c.rel - {one_minus!r} * m.maxsim) AS mmr,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY ({lam!r} * c.rel - {one_minus!r} * m.maxsim) DESC, c.doc_id) AS rn
    FROM c JOIN ms{i} m ON c.query_id = m.query_id AND c.doc_id = m.doc_id
  ) WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, doc_id, pick, rel, mmr FROM sel{k}"
    )
