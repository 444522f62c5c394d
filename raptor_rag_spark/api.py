"""RetrievalAugmentation facade — the reference's top-level API, Spark-backed.

Mirrors raptor/retrieval_augmentation.py (reference :18-239): the same
add_documents / retrieve / answer_question / save lifecycle and the same
guard behaviors (overwrite warning on re-add :171-173, ValueError when
retrieving with no tree :187-189, type check on load :148-151), but the tree
is a level-partitioned DataFrame built by the distributed plan, retrieval is
a batch broadcast kNN join, and persistence is the manifest checkpoint (an
atomic, resumable commit per level) instead of a pickle blob (:234-239).

``answer_question`` composes retrieve with a pluggable QA callable; the
default is deterministic-extractive (LLM QA stays outside the engine core,
SURVEY.md §3.3).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import (
    ClusterTreeConfig,
    RetrievalAugmentationConfig,
    TreeRetrieverConfig,
    default_qa_model,
)
from .operators.core import with_embedding
from .operators.knn import collapsed_knn, retrieval_context
from .operators.traverse import traversal_retrieve
from .plans.build_tree import build_tree, load_tree
from .sources.checkpoint import TreeCheckpoint

logger = logging.getLogger(__name__)


class RetrievalAugmentation:
    def __init__(
        self,
        spark: SparkSession,
        config: RetrievalAugmentationConfig | ClusterTreeConfig | None = None,
        retriever_config: TreeRetrieverConfig | None = None,
        tree: DataFrame | str | None = None,
    ):
        self.spark = spark
        if isinstance(config, RetrievalAugmentationConfig):
            # unified config (reference retrieval_augmentation.py:18-122):
            # one object routes builder, retriever and QA model
            self.config = config.tree_builder_config
            self.retriever_config = (
                retriever_config if retriever_config is not None else config.tree_retriever_config
            )
            self.qa_model = config.qa_model
        else:
            self.config = config if config is not None else ClusterTreeConfig()
            self.retriever_config = (
                retriever_config if retriever_config is not None else TreeRetrieverConfig()
            )
            self.qa_model = default_qa_model
        if tree is None:
            self.tree = None
        elif isinstance(tree, str):
            self.tree = load_tree(spark, tree)
        elif isinstance(tree, DataFrame):
            self.tree = tree
        else:
            # reference raises on wrong pickle content (:148-151)
            raise ValueError("tree must be a DataFrame, a checkpoint path, or None")

    # ------------------------------------------------------- cached metadata
    # Interactive latency surface (round-3 audit): everything per-TREE —
    # max level, {level: resolution}, per-cell counts — is computed once
    # when the tree is (re)assigned or on first use, never per question.
    @property
    def tree(self) -> DataFrame | None:
        return self._tree

    @tree.setter
    def tree(self, df: DataFrame | None) -> None:
        self._tree = df
        self._max_level: int | None = None
        self._levels_res: dict[int, int] | None = None
        self._cell_counts: DataFrame | None = None

    def _warm(self) -> None:
        """One metadata-scale collect caches max level + per-level
        resolutions; one localCheckpoint materializes corpus_cell_counts.
        After this, single-question retrieve issues exactly ONE Spark
        action (the result collect)."""
        from .kernels.grid import RES_SHIFT

        if self._max_level is None:
            rows = (
                self._tree.select(
                    "level",
                    F.shiftrightunsigned(F.col("cell_id"), RES_SHIFT).cast("int").alias("res"),
                )
                .distinct()
                .collect()
            )
            self._levels_res = {r["level"]: r["res"] for r in rows}
            self._max_level = max(self._levels_res)

    @property
    def cell_counts(self) -> DataFrame:
        """Materialized per-cell node counts for the cell-pruned retrieval
        path (operators/knn.py:corpus_cell_counts), cached per tree."""
        if self._cell_counts is None:
            from .operators.knn import corpus_cell_counts

            self._cell_counts = corpus_cell_counts(self._tree)
        return self._cell_counts

    # ------------------------------------------------------------------ build
    def add_documents(
        self,
        docs: DataFrame | str,
        checkpoint_dir: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Build (or overwrite) the tree from a documents DataFrame, or — for
        reference-API parity — a single text string."""
        if self.tree is not None:
            logger.warning(
                "Overwriting existing tree."  # reference warning (:171-173)
            )
        if isinstance(docs, str):
            docs = self.spark.createDataFrame([(0, docs)], f"{id_col} long, {text_col} string")
        self.tree = build_tree(
            docs, self.config, checkpoint_dir, id_col=id_col, text_col=text_col
        ).cache()

    def update_documents(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Fold new documents into the EXISTING tree by incremental
        dirty-tile recompute (plans/build_tree.py:update_tree) — node-for-
        node identical to rebuilding over the union corpus, at O(new data)
        cost. The reference's add_documents is rebuild-only
        (retrieval_augmentation.py:170-178); this is the engine's scale
        surface for daily crawl deltas."""
        if self.tree is None:
            self.add_documents(docs, id_col=id_col, text_col=text_col)
            return
        from .plans.build_tree import update_tree

        self.tree = update_tree(
            self.tree, docs, self.config, id_col=id_col, text_col=text_col
        ).cache()

    # --------------------------------------------------------------- retrieve
    def _context_model(self) -> tuple[str | None, object]:
        """(node-side map key or None, query-side embedding model).

        Reference routing (retrieval_augmentation.py:56-64): the retriever's
        ``context_embedding_model`` names which per-node vector to rank by;
        the query is embedded with the matching builder model."""
        name = self.retriever_config.context_embedding_model
        multi = self.tree is not None and "embeddings" in self.tree.columns
        q_model = self.config.embedding_models.get(name)
        if multi:
            if name not in self.config.embedding_models:
                raise ValueError(
                    "context_embedding_model must be a key in the embedding_models dictionary"
                )
            return name, q_model
        return None, q_model

    def _query_df(self, question: str | list[str], q_model=None) -> DataFrame:
        """Interactive query-side embedding runs ON THE DRIVER with the same
        kernel the Arrow UDF wraps (functions/udfs.py:make_embed_udf) — the
        question list here is always interactive-scale (one, or a handful),
        so shipping it through a Python-worker stage is pure latency (one
        extra stage + worker round trip per retrieve; measured ~0.5 s of the
        warm single-question wall). The float32 cast mirrors the UDF's
        ArrayType(FloatType()) coercion bit-for-bit (both are IEEE
        round-to-nearest double→float), so retrieval results are identical —
        tests/test_api_facade.py's byte-identical-context checks cover it.
        Batch-scale embedding stays distributed via retrieve_batch."""
        import numpy as np

        from .kernels.embedder import embed_texts

        questions = [question] if isinstance(question, str) else list(question)
        batch = ["" if q is None else q for q in questions]
        mat = embed_texts(batch) if q_model is None else q_model.embed_batch(batch)
        mat = np.asarray(mat, dtype=np.float32)
        rows = [(i, [float(v) for v in mat[i]]) for i in range(len(batch))]
        return self.spark.createDataFrame(rows, "query_id long, q_embedding array<float>")

    def retrieve(
        self,
        question: str | list[str],
        start_layer: int | None = None,
        num_layers: int | None = None,
        top_k: int = 10,
        max_tokens: int = 3500,
        collapse_tree: bool = True,
        return_layer_information: bool = True,
    ):
        """Returns (context, layer_information) for one question, or the
        per-query result DataFrame for a batch (the engine's native shape).

        Routed through the same plan as ``retrieve_batch`` (round-3 audit:
        the batch engine is the right surface for both): on a warm facade
        (tree metadata cached by _warm) a single question costs exactly one
        Spark action — the result collect."""
        if self.tree is None:
            raise ValueError(
                "There are no trees to retrieve, please add documents first."
            )  # reference message shape (:187-189)
        model, q_model = self._context_model()
        queries = self._query_df(question, q_model)
        results = self._results(
            queries,
            top_k=top_k,
            max_tokens=max_tokens,
            collapse_tree=collapse_tree,
            model=model,
            start_layer=start_layer,
            num_layers=num_layers,
        )
        if self.retriever_config.reranker is not None and isinstance(question, str):
            # reference applies the reranker as a pure reorder over the
            # selected nodes (tree_retriever.py:122-125, top_k=len(selected));
            # batch (list) retrieval keeps engine order — a per-query text
            # scorer needs the query string, which rerank() takes scalar
            results = self.retriever_config.reranker.rerank(results, question).drop(
                "score", "cum_tokens"
            )
        ctx = retrieval_context(results)
        if isinstance(question, list):
            return ctx
        # Interactive-latency scope (round-5 audit): a single-question
        # retrieve shuffles at most top_k candidate rows after the scan, so
        # 32 shuffle partitions + AQE's per-stage re-planning are pure
        # driver/scheduler overhead (~0.4 s of the warm wall). Pin ONE
        # post-shuffle partition and skip AQE for exactly this action, then
        # restore — the scan stage's partitioning (the cached tree) is
        # unaffected, and batch retrieval keeps the session settings.
        conf = self.spark.conf
        prev_sp = conf.get("spark.sql.shuffle.partitions")
        prev_aqe = conf.get("spark.sql.adaptive.enabled")
        conf.set("spark.sql.shuffle.partitions", "1")
        conf.set("spark.sql.adaptive.enabled", "false")
        try:
            row = ctx.collect()[0]
        finally:
            conf.set("spark.sql.shuffle.partitions", prev_sp)
            conf.set("spark.sql.adaptive.enabled", prev_aqe)
        if return_layer_information:
            layer_info = [
                {"node_index": r["node_id"], "layer_number": r["level"]}
                for r in row["layer_information"]
            ]
            return row["context"], layer_info
        return row["context"]

    def _results(
        self,
        queries: DataFrame,
        top_k: int,
        max_tokens: int,
        collapse_tree: bool | str,
        model: str | None,
        start_layer: int | None = None,
        num_layers: int | None = None,
    ) -> DataFrame:
        """The shared retrieval plan behind retrieve AND retrieve_batch.
        ``collapse_tree``: True = exact all-levels kNN; "cell" = cell-pruned
        approximate kNN using the facade-cached corpus_cell_counts;
        False = top-down traversal. Tree metadata (max level, per-level
        resolutions) comes from the per-tree cache, not a per-call agg."""
        if collapse_tree == "cell":
            from .operators.knn import cell_pruned_knn

            self._warm()
            return cell_pruned_knn(
                self.tree,
                queries,
                self._levels_res,
                top_k=top_k,
                max_tokens=max_tokens,
                cell_counts=self.cell_counts,
            )
        if collapse_tree:
            return collapsed_knn(
                self.tree, queries, top_k=top_k, max_tokens=max_tokens, model=model
            )
        self._warm()
        sl = self._max_level if start_layer is None else start_layer
        nl = sl + 1 if num_layers is None else num_layers
        return traversal_retrieve(
            self.tree,
            queries,
            start_layer=sl,
            num_layers=nl,
            top_k=self.retriever_config.top_k,
            selection_mode=self.retriever_config.selection_mode,
            threshold=self.retriever_config.threshold,
            model=model,
        )

    def retrieve_batch(
        self,
        questions: DataFrame,
        query_id_col: str = "query_id",
        text_col: str = "qtext",
        top_k: int = 10,
        max_tokens: int = 3500,
        collapse_tree: bool = True,
    ) -> DataFrame:
        """Batch retrieval over a QUESTIONS DATAFRAME — the engine's native
        throughput surface (SURVEY.md §3.3: batching is the main win over the
        reference's one-question-at-a-time loop,
        raptor/retrieval_augmentation.py:180-201). Returns one row per
        question: (query_id, context, layer_information); the single kNN
        broadcast join amortizes over every question, so retrieving 10^4
        questions costs the same number of Spark actions as retrieving one.
        No driver-side collects — callers compose further or write a sink."""
        if self.tree is None:
            raise ValueError(
                "There are no trees to retrieve, please add documents first."
            )
        model, q_model = self._context_model()
        queries = with_embedding(
            questions.select(F.col(query_id_col).alias("query_id"), text_col),
            text_col,
            model=q_model,
        ).select("query_id", F.col("embedding").alias("q_embedding"))
        results = self._results(
            queries, top_k=top_k, max_tokens=max_tokens, collapse_tree=collapse_tree, model=model
        )
        return retrieval_context(results)

    # --------------------------------------------------------------------- qa
    def answer_question(
        self,
        question: str,
        qa_fn=None,
        top_k: int = 10,
        max_tokens: int = 3500,
        return_layer_information: bool = False,
    ):
        """retrieve → QA. ``qa_fn(context, question) -> str`` is pluggable
        (reference BaseQAModel, qa_models.py:7-10); default is extractive."""
        context, layer_info = self.retrieve(
            question, top_k=top_k, max_tokens=max_tokens, return_layer_information=True
        )
        fn = qa_fn if qa_fn is not None else self.qa_model
        answer = fn(context, question)
        if return_layer_information:
            return answer, layer_info
        return answer

    # ------------------------------------------------------------------- save
    def save(self, path: str) -> None:
        if self.tree is None:
            raise ValueError("There is no tree to save.")  # reference :235-236
        ckpt = TreeCheckpoint(path, self.config.config_hash())
        levels = sorted(r["level"] for r in self.tree.select("level").distinct().collect())
        for lv in levels:
            ckpt.write_level(self.tree.filter(F.col("level") == lv), lv)
        ckpt.mark_complete(len(levels))
