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
    pandas_udf (F8; reference benchmarks/_metrics.py:71-97). Exact oracle:
    rouge_l_sql re-derives the same LCS in a DuckDB recursive CTE, so the
    result must stay an UNROUNDED double — identical IEEE op order on both
    sides gives bit-identical values, whereas Python round() (banker's) and
    SQL round() (half-away) disagree on exact ties like 0.0390625."""
    import pandas as pd

    from ..kernels.metrics import rouge_l

    @F.pandas_udf("double")
    def _rouge(pred, gold):
        return pd.Series([rouge_l(p or "", g or "") for p, g in zip(pred, gold)])

    return pairs.select(id_col, _rouge(F.col("prediction"), F.col("gold")).alias("rouge_l"))


def rouge_l_sql(pairs_sql: str, id_col: str = "pair_id") -> str:
    """DuckDB oracle twin of rouge_l_pairs; ``pairs_sql`` must yield
    (id, prediction, gold).

    The row-at-a-time LCS recurrence dp[i][j] = max(dp[i-1][j], dp[i][j-1],
    match ? dp[i-1][j-1]+1) has an in-row dependency (dp[i][j-1]) that SQL
    can't express elementwise — but because every DP row is monotone
    non-decreasing, it collapses to dp[i][j] = max(dp[i-1][j],
    max_{k<=j, pred[i]==gold[k]} dp[i-1][k-1]+1), i.e. prev-row value vs a
    prefix max over match candidates: one recursive-CTE step per pred token,
    carrying the DP row as a LIST. O(m*n^2) list ops per pair, fine for
    bounded answer strings. Verified bit-identical to the numpy-free kernel
    (kernels/metrics.py rouge_l) over the full sf0.01 pair set."""
    norm_p = G.normalize_answer_sql("prediction")
    norm_g = G.normalize_answer_sql("gold")
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
base AS (
  SELECT {id_col},
         list_filter(string_split({norm_p}, ' '), t -> t <> '') AS p,
         list_filter(string_split({norm_g}, ' '), t -> t <> '') AS g
  FROM pairs
),
dp AS (
  SELECT {id_col}, p, g, 0 AS i,
         list_transform(range(0, len(g) + 1), x -> 0) AS row
  FROM base WHERE len(p) > 0 AND len(g) > 0
  UNION ALL
  SELECT {id_col}, p, g, i + 1,
    list_prepend(0,
      list_transform(range(1, len(g) + 1), j ->
        greatest(
          row[j + 1],
          list_max(list_transform(range(1, j + 1), k ->
            CASE WHEN p[i + 1] = g[k] THEN row[k] + 1 ELSE 0 END))
        )))
  FROM dp WHERE i < len(p)
),
lcs AS (
  SELECT {id_col}, row[len(g) + 1] AS l, len(p) AS m, len(g) AS n
  FROM dp WHERE i = len(p)
)
SELECT b.{id_col} AS {id_col},
       CASE WHEN len(b.p) = 0 AND len(b.g) = 0 THEN 1.0
            WHEN len(b.p) = 0 OR len(b.g) = 0 OR coalesce(l.l, 0) = 0 THEN 0.0
            ELSE ((2.0 * (CAST(l.l AS DOUBLE) / CAST(l.m AS DOUBLE)))
                        * (CAST(l.l AS DOUBLE) / CAST(l.n AS DOUBLE)))
                 / ((CAST(l.l AS DOUBLE) / CAST(l.m AS DOUBLE))
                  + (CAST(l.l AS DOUBLE) / CAST(l.n AS DOUBLE))) END AS rouge_l
FROM base b LEFT JOIN lcs l USING ({id_col})
"""


def meteor_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """(id, meteor): exact-unigram METEOR per pair (F9; reference
    benchmarks/_metrics.py:100-121). Alignment + chunk counting is a scalar
    kernel → pandas_udf; exact oracle via meteor_sql. Unrounded double for
    the same tie-breaking reason as rouge_l_pairs."""
    import pandas as pd

    from ..kernels.metrics import meteor

    @F.pandas_udf("double")
    def _meteor(pred, gold):
        return pd.Series([meteor(p or "", g or "") for p, g in zip(pred, gold)])

    return pairs.select(id_col, _meteor(F.col("prediction"), F.col("gold")).alias("meteor"))


def meteor_sql(pairs_sql: str, id_col: str = "pair_id") -> str:
    """DuckDB oracle twin of meteor_pairs.

    The kernel's greedy alignment (each pred position takes the FIRST unused
    identical ref position) is order-equivalent to: the k-th occurrence of
    token t in pred matches the k-th occurrence of t in ref — so it is a
    plain equi-join on (pair, token, occurrence-rank), no iteration needed.
    Chunks are lag-window breaks over (pred_pos, ref_pos) runs. Verified
    bit-identical to kernels/metrics.py meteor over the full sf0.01 pair
    set (raw whitespace split, no normalization — matching the kernel)."""
    return f"""
WITH
pairs AS ({pairs_sql}),
base AS (
  SELECT {id_col},
         list_filter(string_split_regex(prediction, '\\s+'), t -> t <> '') AS p,
         list_filter(string_split_regex(gold, '\\s+'), t -> t <> '') AS g
  FROM pairs
),
pred_occ AS (
  SELECT {id_col}, i, p[i] AS tok,
         row_number() OVER (PARTITION BY {id_col}, p[i] ORDER BY i) AS occ
  FROM (SELECT {id_col}, p, unnest(range(1, len(p) + 1)) AS i FROM base)
),
ref_occ AS (
  SELECT {id_col}, i, g[i] AS tok,
         row_number() OVER (PARTITION BY {id_col}, g[i] ORDER BY i) AS occ
  FROM (SELECT {id_col}, g, unnest(range(1, len(g) + 1)) AS i FROM base)
),
matches AS (
  SELECT p.{id_col} AS {id_col}, p.i AS pi, r.i AS ri
  FROM pred_occ p
  JOIN ref_occ r ON p.{id_col} = r.{id_col} AND p.tok = r.tok AND p.occ = r.occ
),
chunked AS (
  SELECT {id_col},
         CASE WHEN lag(pi) OVER w IS NULL OR pi <> lag(pi) OVER w + 1
                   OR ri <> lag(ri) OVER w + 1 THEN 1 ELSE 0 END AS brk
  FROM matches WINDOW w AS (PARTITION BY {id_col} ORDER BY pi)
),
stats AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS m, CAST(sum(brk) AS BIGINT) AS chunks
  FROM chunked GROUP BY {id_col}
)
SELECT b.{id_col} AS {id_col},
       CASE WHEN len(b.p) = 0 OR len(b.g) = 0 OR coalesce(s.m, 0) = 0 THEN 0.0
            ELSE (((CAST(s.m AS DOUBLE) / CAST(len(b.p) AS DOUBLE))
                   * (CAST(s.m AS DOUBLE) / CAST(len(b.g) AS DOUBLE)))
                  / ((0.9 * (CAST(s.m AS DOUBLE) / CAST(len(b.p) AS DOUBLE)))
                   + (0.1 * (CAST(s.m AS DOUBLE) / CAST(len(b.g) AS DOUBLE)))))
                 * (1.0 - (0.5 * (((CAST(s.chunks AS DOUBLE) / CAST(s.m AS DOUBLE))
                                   * (CAST(s.chunks AS DOUBLE) / CAST(s.m AS DOUBLE)))
                                  * (CAST(s.chunks AS DOUBLE) / CAST(s.m AS DOUBLE))))) END AS meteor
FROM base b LEFT JOIN stats s USING ({id_col})
"""


def accuracy_pairs(pairs: DataFrame, id_col: str = "pair_id") -> DataFrame:
    """Normalized exact-match accuracy per pair (F9)."""
    return pairs.select(
        id_col,
        (
            G.normalize_answer_col(F.col("prediction")) == G.normalize_answer_col(F.col("gold"))
        ).cast("double").alias("acc"),
    )
