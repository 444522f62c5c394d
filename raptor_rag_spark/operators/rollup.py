"""Per-cell rollups: parent-node construction and raster-band tile stats.

``build_parent_nodes`` is the engine's A1 (group-by-cluster summarize,
reference: raptor/cluster_tree_builder.py:62-79): level-k nodes grouped by the
parent cell one resolution coarser; each group becomes one parent node whose
text is a deterministic extractive summary, embedding is the summary's
embedding, children = sorted member ids. Hot cells (token sum >
max_length_in_cluster, reference's recluster gate at
raptor/cluster_utils.py:116-122) are *salted* into deterministic sub-buckets —
the explicit skew handling the north rule demands: the salt map is tiny
(only hot cells) and broadcast, the expensive grouped-map then runs on
(cell, salt) keys with bounded group size.

``tile_stats`` is A5 (per-level tile rollup → raster bands): pure JVM
aggregations, no UDF.

Determinism: each applyInPandas group sorts members by node_id before any
float reduction, so results are independent of partitioning/parallelism.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.embedder import DEFAULT_DIM, embed_texts
from ..kernels.summarize import extractive_summary, get_text
from ..kernels.textstats import portable_hash63
from ..kernels.tokenizer import RegexTokenizer

NODES_SCHEMA = (
    "node_id LONG, level INT, cell_id LONG, url STRING, chunk_idx INT, text STRING, "
    "embedding ARRAY<FLOAT>, x DOUBLE, y DOUBLE, children ARRAY<LONG>, "
    "token_count INT, n_leaves LONG"
)


def _parent_cell_expr(lattice: str) -> F.Column:
    """Packed parent-cell expression on the configured lattice (both are
    pure column arithmetic with the same id layout)."""
    if lattice == "hex":
        from ..functions.hexgen import hex_parent_packed_col

        return hex_parent_packed_col(F.col("cell_id"))
    if lattice != "quad":
        raise ValueError(f"unknown lattice {lattice!r} (expected 'quad' or 'hex')")
    return G.cell_parent_col(F.col("cell_id"), 1)


def _salt_map(nodes: DataFrame, parent_cell: F.Column, max_length_in_cluster: int) -> DataFrame:
    """(parent_cell, n_buckets) for hot cells only — broadcastable."""
    return (
        nodes.groupBy(parent_cell.alias("parent_cell"))
        .agg(F.sum("token_count").alias("tok_sum"), F.count("*").alias("n_members"))
        .filter(F.col("tok_sum") > max_length_in_cluster)
        .select(
            "parent_cell",
            F.least(
                F.ceil(F.col("tok_sum") / F.lit(max_length_in_cluster)), F.col("n_members")
            ).cast("int").alias("n_buckets"),
        )
    )


def build_parent_nodes(
    nodes: DataFrame,
    next_level: int,
    summarization_length: int = 100,
    max_length_in_cluster: int = 3500,
    dim: int = DEFAULT_DIM,
    models: dict | None = None,
    cluster_model: str = "default",
    lattice: str = "quad",
) -> DataFrame:
    """One parent node per (parent cell, salt bucket) of the given nodes.

    Two-stage shape chosen for scale: the shuffle-side grouping is a pure JVM
    hash aggregation (``collect_list`` of (node_id, text, x, y) structs,
    sorted in-engine → partition-order independent), and the Python kernel
    runs ONCE PER ARROW BATCH of grouped rows via ``mapInPandas`` — the
    summary embeddings are computed vectorized across all groups in the batch
    instead of one applyInPandas call (and one embed call) per group, which
    is ~10× less Python overhead when cells are small.

    With >1 entry in ``models``, every parent also gets the full per-model
    ``embeddings`` map computed on its summary text (reference
    tree_builder.py:125-127: parent embeddings are re-embedded per model)."""
    multi = models is not None and len(models) > 1
    parent_cell = _parent_cell_expr(lattice)
    salt_df = F.broadcast(_salt_map(nodes, parent_cell, max_length_in_cluster))

    staged = (
        nodes.withColumn("parent_cell", parent_cell)
        .join(salt_df, "parent_cell", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_buckets").isNotNull(),
                F.pmod(F.col("node_id"), F.col("n_buckets").cast("long")).cast("int"),
            ).otherwise(F.lit(0)),
        )
    )

    grouped = staged.groupBy("parent_cell", "salt").agg(
        F.sort_array(F.collect_list(F.struct("node_id", "text", "x", "y"))).alias("members"),
        F.sum("n_leaves").alias("n_leaves_sum"),
    )

    tokenizer = RegexTokenizer()

    def summarize_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            summaries = []
            for _, r in pdf.iterrows():
                members = r["members"]  # sorted by node_id (struct sort order)
                texts = [m["text"] for m in members]
                summary = extractive_summary(
                    get_text(texts), summarization_length, tokenizer
                )
                summaries.append(summary)
                cell, salt = int(r["parent_cell"]), int(r["salt"])
                rows.append(
                    {
                        "node_id": portable_hash63(f"L{next_level}|{cell}|{salt}"),
                        "level": next_level,
                        "cell_id": cell,
                        "url": None,
                        "chunk_idx": None,
                        "text": summary,
                        "x": float(np.mean(np.array([m["x"] for m in members]))),
                        "y": float(np.mean(np.array([m["y"] for m in members]))),
                        "children": sorted(int(m["node_id"]) for m in members),
                        "token_count": tokenizer.count(summary),
                        "n_leaves": int(r["n_leaves_sum"]),
                    }
                )
            cols = [
                "node_id", "level", "cell_id", "url", "chunk_idx", "text",
                "embedding", "x", "y", "children", "token_count", "n_leaves",
            ]
            if models is None:
                embs = embed_texts(summaries, dim)  # one vectorized call per batch
                for row, emb in zip(rows, embs):
                    row["embedding"] = emb
            else:
                per_model = {name: m.embed_batch(summaries) for name, m in models.items()}
                for i, row in enumerate(rows):
                    row["embedding"] = per_model[cluster_model][i]
                    if multi:
                        row["embeddings"] = {name: per_model[name][i] for name in per_model}
                if multi:
                    cols.append("embeddings")
            yield pd.DataFrame(rows, columns=cols)

    schema = NODES_SCHEMA + (", embeddings MAP<STRING, ARRAY<FLOAT>>" if multi else "")
    return grouped.mapInPandas(summarize_batches, schema)


def tile_stats(nodes: DataFrame, round_to: int = 6) -> DataFrame:
    """Raster bands per (level, cell): counts, token stats, centroid.
    Pure JVM aggregation (A5 — reference: benchmarks/run_compression.py:30-57).

    Centroids sum coordinates through DECIMAL(28,15): double addition is not
    associative, so a plain avg(x) depends on partition order — decimal sums
    make the bands bit-identical across parallelism levels (and against the
    DuckDB twin)."""
    dec15 = "decimal(28,15)"
    return (
        nodes.groupBy("level", "cell_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("token_count").alias("token_sum"),
            F.round(F.avg("token_count"), round_to).alias("token_avg"),
            F.min("token_count").alias("token_min"),
            F.max("token_count").alias("token_max"),
            F.round(
                F.sum(F.col("x").cast(dec15)).cast("double") / F.count("*"), round_to
            ).alias("centroid_x"),
            F.round(
                F.sum(F.col("y").cast(dec15)).cast("double") / F.count("*"), round_to
            ).alias("centroid_y"),
            F.sum("n_leaves").alias("leaf_sum"),
        )
    )


def tile_vectorize(nodes: DataFrame, round_to: int = 6) -> DataFrame:
    """Raster→vector export: one row per (level, cell) with the cell's
    boundary square (closed-form from the cell-id bit layout, same geometry
    as pipjoin.cell_polygons) and its raster-band values from tile_stats.
    This is the vector half of the raster↔vector rollup pair — tile_stats
    aggregates points into per-cell bands (rasterize); this emits each cell
    back out as a polygon feature carrying those bands (vectorize). Flat
    (x0, y0, x1, y1) corners rather than a nested ring so downstream sinks
    and the oracle hash stay on scalar columns; all geometry is JVM bit
    arithmetic — no UDF, no shuffle beyond the tile_stats aggregation."""
    from ..kernels.grid import COORD_BITS, COORD_MASK, RES_SHIFT

    res = F.shiftrightunsigned(F.col("cell_id"), RES_SHIFT)
    ix = F.shiftrightunsigned(F.col("cell_id"), COORD_BITS).bitwiseAND(F.lit(COORD_MASK))
    iy = F.col("cell_id").bitwiseAND(F.lit(COORD_MASK))
    size = F.lit(1.0) / F.pow(F.lit(2.0), res.cast("double"))
    return tile_stats(nodes, round_to).select(
        "level",
        "cell_id",
        res.cast("long").alias("res"),
        (ix.cast("double") * size).alias("x0"),
        (iy.cast("double") * size).alias("y0"),
        ((ix.cast("double") + F.lit(1.0)) * size).alias("x1"),
        ((iy.cast("double") + F.lit(1.0)) * size).alias("y1"),
        "n",
        "token_sum",
        "token_avg",
        "centroid_x",
        "centroid_y",
        "leaf_sum",
    )


def viewport_tiles(
    nodes: DataFrame,
    bbox: tuple[float, float, float, float],
    level: int,
    round_to: int = 6,
) -> DataFrame:
    """Tile-server read path: the vector tiles of ONE level that intersect a
    viewport bbox (x0, y0, x1, y1) — what a map client requests per pan/zoom.

    The level predicate prunes to one partition of the level-partitioned tree
    table and the bbox test is pure arithmetic on the cell's closed-form
    bounds (open intervals: touching edges do not intersect), so at 100 TB
    the scan reads one level and Catalyst pushes the cheap filters down —
    nothing about the viewport ever shuffles more than the level's cells."""
    vx0, vy0, vx1, vy1 = (float(v) for v in bbox)
    tiles = tile_vectorize(nodes.where(F.col("level") == level), round_to)
    return tiles.where(
        (F.col("x1") > F.lit(vx0))
        & (F.col("x0") < F.lit(vx1))
        & (F.col("y1") > F.lit(vy0))
        & (F.col("y0") < F.lit(vy1))
    )


def drill_down(
    nodes: DataFrame, parent_cell: int, level: int, round_to: int = 6
) -> DataFrame:
    """Tile-server drill-down: the child tiles (one resolution finer, one
    tree level lower) of ``parent_cell`` — the query a map client issues on
    zoom-in. The child relation is the cell-id bit shift (parent(cell) ==
    parent_cell), so the filter is pushed-down arithmetic over one level
    partition; at most 4 child cells exist, so the result is always tiny."""
    kids = nodes.where(
        (F.col("level") == level)
        & (G.cell_parent_col(F.col("cell_id"), 1) == F.lit(int(parent_cell)))
    )
    return tile_stats(kids, round_to)


def level_stats(nodes: DataFrame) -> DataFrame:
    """Per-layer tree stats incl. compression ratio vs leaf tokens
    (reference: benchmarks/run_compression.py:30-57)."""
    per_level = nodes.groupBy("level").agg(
        F.count("*").alias("n_nodes"),
        F.sum("token_count").alias("token_sum"),
        F.round(F.avg("token_count"), 6).alias("token_avg"),
        F.min("token_count").alias("token_min"),
        F.max("token_count").alias("token_max"),
    )
    leaf = per_level.filter(F.col("level") == 0).select(
        F.col("token_sum").alias("leaf_token_sum")
    )
    return per_level.crossJoin(F.broadcast(leaf)).select(
        "level",
        "n_nodes",
        "token_sum",
        "token_avg",
        "token_min",
        "token_max",
        F.round(F.col("token_sum") / F.col("leaf_token_sum"), 6).alias("compression_ratio"),
    )


def salt_bucket_count(tok_sum: int, n_members: int, max_length_in_cluster: int) -> int:
    """Python twin of the salt sizing (for tests)."""
    return min(math.ceil(tok_sum / max_length_in_cluster), n_members)
