"""Distributed evaluation metrics (A8/A9/U4 + F7 of SURVEY.md §2).

The reference computes token-F1 with Python Counters one pair at a time
(benchmarks/_metrics.py:36-51). Here the multiset intersection is a real
dataflow: explode normalized tokens on both sides, count per (pair, token),
take least(pred_count, gold_count), sum — which scales to any number of
(prediction, gold) pairs and has an exact DuckDB oracle (integer counts,
division only at the end in identical order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G


def _norm_tokens(col):
    return F.split(G.normalize_answer_col(col), " ")


def token_f1_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """pairs(id, prediction, gold) -> (id, f1). Token-multiset F1 per pair,
    computed via explode + groupBy least-count intersection."""
    base = pairs.select(
        id_col,
        _norm_tokens(F.col("prediction")).alias("pred_toks"),
        _norm_tokens(F.col("gold")).alias("gold_toks"),
    ).select(
        id_col,
        F.filter("pred_toks", lambda t: t != "").alias("pred_toks"),
        F.filter("gold_toks", lambda t: t != "").alias("gold_toks"),
    )
    sizes = base.select(
        id_col, F.size("pred_toks").alias("n_pred"), F.size("gold_toks").alias("n_gold")
    )

    pred = base.select(id_col, F.explode("pred_toks").alias("tok")).groupBy(id_col, "tok").agg(
        F.count("*").alias("c_pred")
    )
    gold = base.select(id_col, F.explode("gold_toks").alias("tok")).groupBy(id_col, "tok").agg(
        F.count("*").alias("c_gold")
    )
    overlap = (
        pred.join(gold, [id_col, "tok"])
        .groupBy(id_col)
        .agg(F.sum(F.least("c_pred", "c_gold")).alias("n_overlap"))
    )

    joined = sizes.join(overlap, id_col, "left").fillna({"n_overlap": 0})
    p = F.col("n_overlap").cast("double") / F.col("n_pred").cast("double")
    r = F.col("n_overlap").cast("double") / F.col("n_gold").cast("double")
    f1 = F.lit(2.0) * p * r / (p + r)
    return joined.select(
        id_col,
        F.when((F.col("n_pred") == 0) & (F.col("n_gold") == 0), F.lit(1.0))
        .when((F.col("n_pred") == 0) | (F.col("n_gold") == 0) | (F.col("n_overlap") == 0), F.lit(0.0))
        .otherwise(F.round(f1, 6))
        .alias("f1"),
    )


def token_f1_sql(pairs_sql: str, id_col: str = "pair_id") -> str:
    """DuckDB oracle twin of token_f1_pairs; ``pairs_sql`` must yield
    (id, prediction, gold)."""
    norm_p = G.normalize_answer_sql("prediction")
    norm_g = G.normalize_answer_sql("gold")
    return f"""
WITH pairs AS ({pairs_sql}),
base AS (
  SELECT {id_col},
         list_filter(string_split({norm_p}, ' '), t -> t <> '') AS pred_toks,
         list_filter(string_split({norm_g}, ' '), t -> t <> '') AS gold_toks
  FROM pairs
),
sizes AS (SELECT {id_col}, len(pred_toks) AS n_pred, len(gold_toks) AS n_gold FROM base),
pred AS (
  SELECT {id_col}, tok, count(*) AS c_pred
  FROM (SELECT {id_col}, unnest(pred_toks) AS tok FROM base) GROUP BY 1, 2
),
gold AS (
  SELECT {id_col}, tok, count(*) AS c_gold
  FROM (SELECT {id_col}, unnest(gold_toks) AS tok FROM base) GROUP BY 1, 2
),
overlap AS (
  SELECT pred.{id_col} AS {id_col}, CAST(sum(least(c_pred, c_gold)) AS BIGINT) AS n_overlap
  FROM pred JOIN gold USING ({id_col}, tok) GROUP BY 1
)
SELECT s.{id_col} AS {id_col},
       CASE WHEN n_pred = 0 AND n_gold = 0 THEN 1.0
            WHEN n_pred = 0 OR n_gold = 0 OR coalesce(n_overlap, 0) = 0 THEN 0.0
            ELSE round(2.0 * (coalesce(n_overlap,0)::DOUBLE / n_pred::DOUBLE)
                           * (coalesce(n_overlap,0)::DOUBLE / n_gold::DOUBLE)
                     / ((coalesce(n_overlap,0)::DOUBLE / n_pred::DOUBLE)
                      + (coalesce(n_overlap,0)::DOUBLE / n_gold::DOUBLE)), 6) END AS f1
FROM sizes s LEFT JOIN overlap o ON s.{id_col} = o.{id_col}
"""


def rouge_l_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """(id, rouge_l): LCS ROUGE-L F1 per pair — a DP kernel, so a scalar
    pandas_udf (F8; reference benchmarks/_metrics.py:71-97). Not
    SQL-expressible → rows-only oracle check."""
    import pandas as pd

    from ..kernels.metrics import rouge_l

    @F.pandas_udf("double")
    def _rouge(pred, gold):
        return pd.Series(
            [round(rouge_l(p or "", g or ""), 6) for p, g in zip(pred, gold)]
        )

    return pairs.select(id_col, _rouge(F.col("prediction"), F.col("gold")).alias("rouge_l"))


def meteor_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """(id, meteor): exact-unigram METEOR per pair (F9; reference
    benchmarks/_metrics.py:100-121). Alignment + chunk counting is a scalar
    kernel → pandas_udf; rows-only oracle check like ROUGE-L."""
    import pandas as pd

    from ..kernels.metrics import meteor

    @F.pandas_udf("double")
    def _meteor(pred, gold):
        return pd.Series(
            [round(meteor(p or "", g or ""), 6) for p, g in zip(pred, gold)]
        )

    return pairs.select(id_col, _meteor(F.col("prediction"), F.col("gold")).alias("meteor"))


def accuracy_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """Normalized exact-match accuracy per pair (F9)."""
    return pairs.select(
        id_col,
        (
            G.normalize_answer_col(F.col("prediction")) == G.normalize_answer_col(F.col("gold"))
        ).cast("double").alias("acc"),
    )
