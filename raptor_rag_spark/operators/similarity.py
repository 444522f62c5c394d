"""Similarity search over embedding columns: exact top-k and bucketed ANN.

- ``brute_force_topk``: broadcast the (small) query side, exact-order cosine
  expression, window top-k — the exact baseline with a DuckDB oracle.
- ``ivf_topk``: IVF-style approximate path — vectors are bucketed by their
  home tile at a coarse resolution (the xy projection is the coarse
  quantizer); each query probes its own tile + 8 neighbors. Bounded
  candidates ⇒ scales linearly with probes, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.embedder import DEFAULT_DIM


def brute_force_topk(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = DEFAULT_DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """queries: (query_id, q_embedding). Exact cosine top-k per query."""
    sim = G.cosine_sim_cols(F.col("q_embedding"), F.col("embedding"), dim)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), id_col)
    return (
        vecs.join(F.broadcast(queries))
        .withColumn("cos_sim", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cos_sim")
    )


def brute_force_topk_dist(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = DEFAULT_DIM,
    metric: str = "cosine",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by ascending distance under any supported metric
    (cosine/L1/L2/Linf — reference raptor/utils.py:84-102 dispatch, here as
    the distributed retrieval path rather than a dead kernel)."""
    d = G.dist_cols(F.col("q_embedding"), F.col("embedding"), dim, metric)
    w = Window.partitionBy("query_id").orderBy("dist", id_col)
    return (
        vecs.join(F.broadcast(queries))
        .withColumn("dist", F.round(d, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "dist")
    )


def ivf_topk(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 3,
    dim: int = DEFAULT_DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the query's coarse tile + 8 neighbors.

    Probe cells are pure column expressions (explode of the 3×3 ring) — no
    driver round trip, so the query side can itself be a large DataFrame."""
    from .knn import query_homes, ring_cells

    x, y = G.xy_cols(F.col("embedding"), dim)
    bucketed = vecs.select(id_col, "embedding", G.cell_col(x, y, res).alias("bucket"))

    probes = ring_cells(query_homes(queries, [res], dim), F.lit(1)).select(
        "query_id", F.col("cell_id").alias("bucket")
    )
    cand = bucketed.join(F.broadcast(probes), "bucket").join(
        F.broadcast(queries), "query_id"
    )
    sim = G.cosine_sim_cols(F.col("q_embedding"), F.col("embedding"), dim)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), id_col)
    return (
        cand.withColumn("cos_sim", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cos_sim")
    )
