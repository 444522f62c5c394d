"""Leaf-node pipeline operators: chunk → embed → project → cell-assign.

Spark-first shapes (SURVEY.md §3.1 Spark lifecycle):
- chunking: pandas UDF returning ARRAY<STRING> + ``posexplode`` (UDTF-shape,
  reference: raptor/tree_builder.py:149-162);
- embedding: Arrow-batched pandas UDF (reference thread-pool fan-out at
  raptor/tree_builder.py:136-147 becomes partition parallelism);
- xy + cell id: pure column expressions from functions/sqlgen.py — JVM-side,
  whole-stage-codegen'd, bit-identical to the DuckDB oracle;
- node ids: 60-bit portable hash of (doc id, chunk idx) — stable across runs
  and partitionings, which is what makes resume and the N-vs-4N exact-match
  checks possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..functions.udfs import make_chunk_udf, make_embed_udf
from ..kernels.embedder import DEFAULT_DIM


def chunk_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_tokens: int = 100, overlap: int = 0
) -> DataFrame:
    """One row per chunk: (doc id, chunk_idx, text)."""
    chunk_udf = make_chunk_udf(max_tokens, overlap)
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_udf(F.col(text_col))).alias("chunk_idx", "chunk_text"),
    ).withColumnsRenamed({"chunk_text": "text"})


def with_embedding(df: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM) -> DataFrame:
    embed_udf = make_embed_udf(dim)
    return df.withColumn("embedding", embed_udf(F.col(text_col)))


def with_xy(df: DataFrame, dim: int = DEFAULT_DIM, embedding_col: str = "embedding") -> DataFrame:
    x, y = G.xy_cols(F.col(embedding_col), dim)
    return df.withColumn("x", x).withColumn("y", y)


def with_cell(df: DataFrame, res: int, x_col: str = "x", y_col: str = "y") -> DataFrame:
    return df.withColumn("cell_id", G.cell_col(F.col(x_col), F.col(y_col), res))


def leaf_nodes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 100,
    res: int = 12,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Full leaf pipeline → level-0 nodes DataFrame (SURVEY.md §1.2 schema)."""
    chunks = chunk_documents(docs, id_col, text_col, max_tokens)
    nodes = with_embedding(chunks, "text", dim)
    nodes = with_cell(with_xy(nodes, dim), res)
    return nodes.select(
        G.hash63_col(F.concat_ws(":", F.col(id_col).cast("string"), F.col("chunk_idx"))).alias("node_id"),
        F.lit(0).alias("level"),
        F.col("cell_id"),
        F.col(id_col).cast("string").alias("url"),
        F.col("chunk_idx"),
        F.col("text"),
        F.col("embedding"),
        F.col("x"),
        F.col("y"),
        F.array().cast("array<long>").alias("children"),
        G.token_count_col(F.col("text")).cast("int").alias("token_count"),
        F.lit(1).cast("long").alias("n_leaves"),
    )
