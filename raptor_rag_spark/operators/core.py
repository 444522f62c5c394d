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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..functions.udfs import make_chunk_udf, make_embed_udf
from ..kernels.chunker import split_text
from ..kernels.embedder import DEFAULT_DIM, embed_texts
from ..kernels.tokenizer import RegexTokenizer


def chunk_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_tokens: int = 100, overlap: int = 0
) -> DataFrame:
    """One row per chunk: (doc id, chunk_idx, text)."""
    chunk_udf = make_chunk_udf(max_tokens, overlap)
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_udf(F.col(text_col))).alias("chunk_idx", "chunk_text"),
    ).withColumnsRenamed({"chunk_text": "text"})


def with_embedding(
    df: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM, model=None
) -> DataFrame:
    embed_udf = make_embed_udf(dim, model)
    return df.withColumn("embedding", embed_udf(F.col(text_col)))


def with_xy(df: DataFrame, dim: int = DEFAULT_DIM, embedding_col: str = "embedding") -> DataFrame:
    x, y = G.xy_cols(F.col(embedding_col), dim)
    return df.withColumn("x", x).withColumn("y", y)


def with_cell(
    df: DataFrame, res: int, x_col: str = "x", y_col: str = "y", lattice: str = "quad"
) -> DataFrame:
    """Cell assignment on the configured lattice: ``quad`` = the 64-bit
    quadkey grid (sqlgen.cell_col), ``hex`` = the H3-style hexagonal lattice
    (hexgen.hex_cell_col) — same packed-id layout, so every downstream
    groupBy/parent join is lattice-agnostic."""
    if lattice == "hex":
        from ..functions.hexgen import hex_cell_col

        return df.withColumn("cell_id", hex_cell_col(F.col(x_col), F.col(y_col), res))
    if lattice != "quad":
        raise ValueError(f"unknown lattice {lattice!r} (expected 'quad' or 'hex')")
    return df.withColumn("cell_id", G.cell_col(F.col(x_col), F.col(y_col), res))


def chunk_embed_fused(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 100,
    dim: int = DEFAULT_DIM,
    overlap: int = 0,
    models: dict | None = None,
    cluster_model: str = "default",
    lattice: str = "quad",
) -> DataFrame:
    """Chunk + embed in ONE Python round trip (mapInPandas).

    The split chunk-UDF → posexplode → embed-UDF pipeline pays two JVM↔Python
    Arrow pipes over the full text volume; fusing them halves the IPC, which
    measurably dominates at high parallelism (syscall-heavy virtualized
    hosts). Kernels are identical (split_text + embed_texts), so output is
    bit-identical to the composed path.

    With >1 entry in ``models`` (name → BaseEmbeddingModel), an extra
    ``embeddings MAP<STRING, ARRAY<FLOAT>>`` column carries every model's
    vector (reference multi-model surface, raptor/tree_structures.py:9 and
    tree_builder.py:125-127) and the flat ``embedding`` is the
    ``cluster_model`` entry — the one that drives cell assignment
    (reference retrieval_augmentation.py:56-64 routing)."""
    base = docs.select(F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text"))
    multi = models is not None and len(models) > 1
    if models is not None and cluster_model not in models:
        raise ValueError("cluster_embedding_model must be a key in the embedding_models dictionary")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = RegexTokenizer()
        for pdf in batches:
            ids: list[str] = []
            idxs: list[int] = []
            texts: list[str] = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                chunks = split_text(t or "", tok, max_tokens, overlap)
                ids.extend([did] * len(chunks))
                idxs.extend(range(len(chunks)))
                texts.extend(chunks)
            out = {"doc_id": ids, "chunk_idx": idxs, "text": texts}
            if models is None:
                out["embedding"] = list(embed_texts(texts, dim))
            else:
                per_model = {name: m.embed_batch(texts) for name, m in models.items()}
                out["embedding"] = list(per_model[cluster_model])
                if multi:
                    out["embeddings"] = [
                        {name: per_model[name][i] for name in per_model}
                        for i in range(len(texts))
                    ]
            yield pd.DataFrame(out)

    schema = "doc_id STRING, chunk_idx INT, text STRING, embedding ARRAY<FLOAT>"
    if multi:
        schema += ", embeddings MAP<STRING, ARRAY<FLOAT>>"
    return base.mapInPandas(gen, schema)


def leaf_nodes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 100,
    res: int = 12,
    dim: int = DEFAULT_DIM,
    overlap: int = 0,
    models: dict | None = None,
    cluster_model: str = "default",
    lattice: str = "quad",
) -> DataFrame:
    """Full leaf pipeline → level-0 nodes DataFrame (SURVEY.md §1.2 schema).

    One fused Python pass (chunk+embed), then everything else — xy
    projection, cell encode, node ids, token counts — is JVM column
    expressions inside whole-stage codegen."""
    nodes = chunk_embed_fused(docs, id_col, text_col, max_tokens, dim, overlap, models, cluster_model)
    nodes = with_cell(with_xy(nodes, dim), res, lattice=lattice)
    cols = [
        G.hash63_col(F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))).alias("node_id"),
        F.lit(0).alias("level"),
        F.col("cell_id"),
        F.col("doc_id").alias("url"),
        F.col("chunk_idx"),
        F.col("text"),
        F.col("embedding"),
        F.col("x"),
        F.col("y"),
        F.array().cast("array<long>").alias("children"),
        G.token_count_col(F.col("text")).cast("int").alias("token_count"),
        F.lit(1).cast("long").alias("n_leaves"),
    ]
    if "embeddings" in nodes.columns:
        cols.append(F.col("embeddings"))
    return nodes.select(*cols)
