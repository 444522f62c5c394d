"""kNN retrieval joins — collapsed-tree, cell-pruned, and flat (leaf-only).

J1/J8 + W1 of SURVEY.md §2: the reference's per-query in-memory scan
(raptor/tree_retriever.py:127-151; FAISS flat search faiss_retriever.py:140-145)
becomes a *batch* broadcast join: the small query side is broadcast against
the nodes table, cosine distance is a JVM column expression (exact-order
arithmetic from sqlgen — no UDF in the hot path), ranking is a window, and
the token budget is a cumulative-sum frame (rowsBetween unboundedPreceding).

Semantics preserved from the reference:
- rank ties broken by node order (argsort stability → orderBy(dist, node_id));
- budget: take ranked nodes while cumulative token_count ≤ max_tokens (the
  reference *breaks* at the first overflow; cumulative sums are monotone so
  the filter is equivalent — tree_retriever.py:137-146);
- "threshold" selection mode keeps nodes with distance > threshold — the
  reference's (deliberately preserved) inverted comparison
  (tree_retriever.py:164-165, SURVEY.md P3).

Scale path: ``cell_pruned_knn`` prunes candidates to the query's cell
neighborhood at each level via an equi-join on cell_id (broadcast of
query×neighborhood pairs) — the "broadcast-spatial-index kNN over cell-pruned
candidates" of the north star. Approximate by design (embedding-space kNN
pruned by tile locality); brute-force is the exact oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.embedder import DEFAULT_DIM
from ..kernels.grid import cell_neighbors

RESULT_COLS = ("query_id", "node_id", "level", "rank", "dist", "text", "token_count")


def _distance(dim: int) -> F.Column:
    return F.lit(1.0) - G.cosine_sim_cols(F.col("q_embedding"), F.col("embedding"), dim)


def _rank_and_budget(scored: DataFrame, top_k: int, max_tokens: int | None) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy("dist", "node_id")
    out = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= top_k)
    if max_tokens is not None:
        cum = F.sum("token_count").over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn("cum_tokens", cum).filter(F.col("cum_tokens") <= max_tokens)
    return out.select(*RESULT_COLS)


def collapsed_knn(
    nodes: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    max_tokens: int | None = 3500,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Exact kNN over all levels (collapsed tree). queries: (query_id,
    q_embedding). Broadcast-nested-loop on the tiny query side."""
    scored = nodes.join(F.broadcast(queries)).withColumn("dist", _distance(dim))
    return _rank_and_budget(scored, top_k, max_tokens)


def flat_knn(
    nodes: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    max_tokens: int | None = 3500,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Leaf-only kNN (the FAISS-flat equivalent, J8)."""
    return collapsed_knn(nodes.filter(F.col("level") == 0), queries, top_k, max_tokens, dim)


def query_cells(queries: DataFrame, levels_res: dict[int, int], dim: int = DEFAULT_DIM) -> DataFrame:
    """(query_id, cell_id) candidate pairs: home + 8 neighbors per level.

    ONE driver round trip for all levels (the query side is small by
    contract); the result is the tiny broadcast spatial index."""
    x, y = G.xy_cols(F.col("q_embedding"), dim)
    homes = [G.cell_col(x, y, res).alias(f"home_{res}") for res in sorted(set(levels_res.values()))]
    rows = queries.select("query_id", *homes).collect()
    pairs = {
        (r["query_id"], c)
        for r in rows
        for res in set(levels_res.values())
        for c in [int(r[f"home_{res}"]), *cell_neighbors(int(r[f"home_{res}"]))]
    }
    return queries.sparkSession.createDataFrame(
        sorted(pairs), "query_id long, cell_id long"
    )


def cell_pruned_knn(
    nodes: DataFrame,
    queries: DataFrame,
    levels_res: dict[int, int],
    top_k: int = 10,
    max_tokens: int | None = 3500,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """kNN restricted to each query's cell neighborhood (equi-join pruning).

    levels_res: {level: resolution} as built by the tree plan. The candidate
    pair set is broadcast; the join on cell_id is a hash join that Catalyst
    can prune partitions with."""
    cand = query_cells(queries, levels_res, dim)
    pruned = nodes.join(F.broadcast(cand), "cell_id")
    scored = pruned.join(F.broadcast(queries), "query_id").withColumn("dist", _distance(dim))
    return _rank_and_budget(scored, top_k, max_tokens)


def retrieval_context(results: DataFrame) -> DataFrame:
    """Per-query context string, byte-identical to the reference's get_text
    (raptor/utils.py:115-118): rank-ordered texts with intra-node newlines
    collapsed, '\\n\\n'-joined, trailing '\\n\\n'."""
    cleaned = F.regexp_replace(F.regexp_replace("text", r"\r\n|\r|\n", "\n"), r"\n", " ")
    per_node = results.withColumn("clean_text", cleaned)
    return (
        per_node.groupBy("query_id")
        .agg(
            F.concat(
                F.concat_ws("\n\n", F.array_sort(F.collect_list(F.struct("rank", "clean_text"))).getField("clean_text")),
                F.lit("\n\n"),
            ).alias("context"),
            F.sort_array(F.collect_list(F.struct("rank", "node_id", "level"))).alias("layer_information"),
        )
    )
