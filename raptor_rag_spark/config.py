"""Engine configuration, mirroring the reference's defaults and validation.

Defaults and ValueError messages follow the reference config classes
(raptor/tree_builder.py:18-96, raptor/tree_retriever.py:21-78,
raptor/cluster_tree_builder.py:16-29, raptor/retrieval_augmentation.py:18-122)
so the mirrored config unit tests hold. Model defaults are this engine's
deterministic kernels (hash-ngram embedder, extractive summarizer, regex
tokenizer) instead of network-bound LiteLLM models.
"""

from __future__ import annotations

from .kernels.chunker import BaseTextSplitter, DefaultTextSplitter
from .kernels.embedder import BaseEmbeddingModel, HashNgramEmbeddingModel
from .kernels.summarize import BaseSummarizationModel, ExtractiveSummarizationModel
from .kernels.tokenizer import BaseTokenizer, DEFAULT_TOKENIZER


class TreeBuilderConfig:
    def __init__(
        self,
        tokenizer=None,
        max_tokens=None,
        num_layers=None,
        threshold=None,
        top_k=None,
        selection_mode=None,
        summarization_length=None,
        summarization_model=None,
        embedding_models=None,
        cluster_embedding_model=None,
        text_splitter=None,
    ):
        self.tokenizer: BaseTokenizer = tokenizer if tokenizer is not None else DEFAULT_TOKENIZER

        if max_tokens is None:
            max_tokens = 100
        if not isinstance(max_tokens, int) or max_tokens < 1:
            raise ValueError("max_tokens must be an integer and at least 1")
        self.max_tokens = max_tokens

        if num_layers is None:
            num_layers = 5
        if not isinstance(num_layers, int) or num_layers < 1:
            raise ValueError("num_layers must be an integer and at least 1")
        self.num_layers = num_layers

        if threshold is None:
            threshold = 0.5
        if not isinstance(threshold, (int, float)) or not (0 <= threshold <= 1):
            raise ValueError("threshold must be a number between 0 and 1")
        self.threshold = threshold

        if top_k is None:
            top_k = 5
        if not isinstance(top_k, int) or top_k < 1:
            raise ValueError("top_k must be an integer and at least 1")
        self.top_k = top_k

        if selection_mode is None:
            selection_mode = "top_k"
        if selection_mode not in ("top_k", "threshold"):
            raise ValueError("selection_mode must be either 'top_k' or 'threshold'")
        self.selection_mode = selection_mode

        self.summarization_length = 100 if summarization_length is None else summarization_length

        if summarization_model is None:
            summarization_model = ExtractiveSummarizationModel(self.tokenizer)
        if not isinstance(summarization_model, BaseSummarizationModel):
            raise ValueError("summarization_model must be an instance of BaseSummarizationModel")
        self.summarization_model = summarization_model

        if embedding_models is None:
            embedding_models = {"default": HashNgramEmbeddingModel()}
        if not isinstance(embedding_models, dict):
            raise ValueError("embedding_models must be a dictionary of model_name: instance pairs")
        for model in embedding_models.values():
            if not isinstance(model, BaseEmbeddingModel):
                raise ValueError("All embedding models must be an instance of BaseEmbeddingModel")
        self.embedding_models = embedding_models

        if cluster_embedding_model is None:
            cluster_embedding_model = "default"
        if cluster_embedding_model not in self.embedding_models:
            raise ValueError("cluster_embedding_model must be a key in the embedding_models dictionary")
        self.cluster_embedding_model = cluster_embedding_model

        if text_splitter is None:
            text_splitter = DefaultTextSplitter()
        if not isinstance(text_splitter, BaseTextSplitter):
            raise ValueError("text_splitter must be an instance of BaseTextSplitter")
        self.text_splitter = text_splitter


class ClusterTreeConfig(TreeBuilderConfig):
    """Adds the clustering/tiling knobs (raptor/cluster_tree_builder.py:16-29)."""

    def __init__(
        self,
        reduction_dimension=10,
        max_length_in_cluster=3500,
        clustering_threshold=0.1,
        *,
        max_resolution=12,
        soft_buffer=0.02,
        lattice="quad",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.reduction_dimension = reduction_dimension
        self.max_length_in_cluster = max_length_in_cluster
        self.clustering_threshold = clustering_threshold
        # tiling recast knobs: finest cell resolution for level 0, and the
        # soft-assignment boundary buffer (the GMM-threshold analogue)
        self.max_resolution = max_resolution
        self.soft_buffer = soft_buffer
        if lattice not in ("quad", "hex"):
            raise ValueError(f"unknown lattice {lattice!r} (expected 'quad' or 'hex')")
        # which hierarchical lattice the tree tiles on: the quadkey grid or
        # the H3-style hexagonal lattice (same packed-id layout end to end)
        self.lattice = lattice

    def config_hash(self) -> str:
        """sha256 cache key over every build-affecting field — the
        config-keyed tree cache of reference benchmarks/_tree_cache.py:27-29.
        Two configs with the same hash produce bit-identical trees; a
        checkpoint dir written under a different hash refuses to resume."""
        import hashlib

        def model_key(m) -> str:
            return "|".join(
                [type(m).__name__, str(getattr(m, "dim", "")), str(getattr(m, "seed", ""))]
            )

        fields = [
            f"max_tokens={self.max_tokens}",
            f"num_layers={self.num_layers}",
            f"threshold={self.threshold}",
            f"top_k={self.top_k}",
            f"selection_mode={self.selection_mode}",
            f"summarization_length={self.summarization_length}",
            f"reduction_dimension={self.reduction_dimension}",
            f"max_length_in_cluster={self.max_length_in_cluster}",
            f"clustering_threshold={self.clustering_threshold}",
            f"max_resolution={self.max_resolution}",
            f"soft_buffer={self.soft_buffer}",
            f"lattice={self.lattice}",
            f"tokenizer={type(self.tokenizer).__name__}",
            f"text_splitter={type(self.text_splitter).__name__}",
            f"summarization_model={type(self.summarization_model).__name__}",
            f"cluster_embedding_model={self.cluster_embedding_model}",
            "embedding_models="
            + ",".join(f"{k}:{model_key(m)}" for k, m in sorted(self.embedding_models.items())),
        ]
        return hashlib.sha256("|".join(fields).encode("utf-8")).hexdigest()


class TreeRetrieverConfig:
    def __init__(
        self,
        tokenizer=None,
        threshold=None,
        top_k=None,
        selection_mode=None,
        context_embedding_model=None,
        embedding_model=None,
        num_layers=None,
        start_layer=None,
        reranker=None,
    ):
        self.tokenizer: BaseTokenizer = tokenizer if tokenizer is not None else DEFAULT_TOKENIZER

        if threshold is None:
            threshold = 0.5
        if not isinstance(threshold, (int, float)) or not (0 <= threshold <= 1):
            raise ValueError("threshold must be a number between 0 and 1")
        self.threshold = threshold

        if top_k is None:
            top_k = 5
        if not isinstance(top_k, int) or top_k < 1:
            raise ValueError("top_k must be an integer and at least 1")
        self.top_k = top_k

        if selection_mode is None:
            selection_mode = "top_k"
        if not isinstance(selection_mode, str) or selection_mode not in ("top_k", "threshold"):
            raise ValueError("selection_mode must be a string and either 'top_k' or 'threshold'")
        self.selection_mode = selection_mode

        if context_embedding_model is None:
            context_embedding_model = "default"
        if not isinstance(context_embedding_model, str):
            raise ValueError("context_embedding_model must be a string")
        self.context_embedding_model = context_embedding_model

        if embedding_model is None:
            embedding_model = HashNgramEmbeddingModel()
        if not isinstance(embedding_model, BaseEmbeddingModel):
            raise ValueError("embedding_model must be an instance of BaseEmbeddingModel")
        self.embedding_model = embedding_model

        if num_layers is not None and (not isinstance(num_layers, int) or num_layers < 0):
            raise ValueError("num_layers must be an integer and at least 0")
        self.num_layers = num_layers

        if start_layer is not None and (not isinstance(start_layer, int) or start_layer < 0):
            raise ValueError("start_layer must be an integer and at least 0")
        self.start_layer = start_layer

        # post-retrieval reranker (reference tree_retriever.py:76-78): None,
        # or a BaseReRanker whose scorer rescores the candidate DataFrame
        from .operators.rerank import BaseReRanker

        if reranker is not None and not isinstance(reranker, BaseReRanker):
            raise ValueError("reranker must be an instance of BaseReRanker")
        self.reranker = reranker


def default_qa_model(context: str, question: str) -> str:
    """Deterministic extractive QA callable — the engine-core default where
    the reference defaults to LiteLLMQAModel (qa_models.py:13+); LLM QA stays
    outside the core (SURVEY.md §3.3), pluggable via the same signature."""
    from .kernels.summarize import extractive_summary
    from .kernels.tokenizer import RegexTokenizer

    return extractive_summary(context, 100, RegexTokenizer())


class RetrievalAugmentationConfig:
    """Unified config with ``tb_*``/``tr_*`` prefix routing — the reference's
    top-level config (raptor/retrieval_augmentation.py:18-122): every
    ``tb_``-prefixed argument routes to ClusterTreeConfig, every ``tr_``-
    prefixed one to TreeRetrieverConfig, and the ``embedding_model`` /
    ``summarization_model`` shortcuts unify both sides (:56-74) — a single
    embedding model becomes {"EMB": model} on the builder AND the retriever's
    context/query model, erroring if the long-form argument was also given.

    ``qa_model`` is a callable ``(context, question) -> str`` (the engine's
    pluggable QA contract; reference BaseQAModel, qa_models.py:7-10)."""

    def __init__(
        self,
        tree_builder_config=None,
        tree_retriever_config=None,
        qa_model=None,
        embedding_model=None,
        summarization_model=None,
        tree_builder_type="cluster",
        # TreeRetrieverConfig arguments (reference :27-37)
        tr_tokenizer=None,
        tr_threshold=0.5,
        tr_top_k=5,
        tr_selection_mode="top_k",
        tr_context_embedding_model="default",
        tr_embedding_model=None,
        tr_num_layers=None,
        tr_start_layer=None,
        tr_reranker=None,
        # TreeBuilderConfig arguments (reference :38-49)
        tb_tokenizer=None,
        tb_max_tokens=100,
        tb_num_layers=5,
        tb_threshold=0.5,
        tb_top_k=5,
        tb_selection_mode="top_k",
        tb_summarization_length=100,
        tb_summarization_model=None,
        tb_embedding_models=None,
        tb_cluster_embedding_model="default",
        tb_text_splitter=None,
        # tiling recast knobs, routed to ClusterTreeConfig
        tb_max_resolution=12,
        tb_soft_buffer=0.02,
        tb_lattice="quad",
    ):
        supported_tree_builders = {"cluster": ClusterTreeConfig}
        if tree_builder_type not in supported_tree_builders:
            raise ValueError(
                f"tree_builder_type must be one of {list(supported_tree_builders.keys())}"
            )

        if qa_model is not None and not callable(qa_model):
            raise ValueError("qa_model must be a callable (context, question) -> str")

        if embedding_model is not None and not isinstance(embedding_model, BaseEmbeddingModel):
            raise ValueError("embedding_model must be an instance of BaseEmbeddingModel")
        elif embedding_model is not None:
            # single-model unification (reference :56-64)
            if tb_embedding_models is not None:
                raise ValueError(
                    "Only one of 'tb_embedding_models' or 'embedding_model' "
                    "should be provided, not both."
                )
            tb_embedding_models = {"EMB": embedding_model}
            tr_embedding_model = embedding_model
            tb_cluster_embedding_model = "EMB"
            tr_context_embedding_model = "EMB"

        if summarization_model is not None and not isinstance(
            summarization_model, BaseSummarizationModel
        ):
            raise ValueError(
                "summarization_model must be an instance of BaseSummarizationModel"
            )
        elif summarization_model is not None:
            if tb_summarization_model is not None:
                raise ValueError(
                    "Only one of 'tb_summarization_model' or 'summarization_model' "
                    "should be provided, not both."
                )
            tb_summarization_model = summarization_model

        config_class = supported_tree_builders[tree_builder_type]
        if tree_builder_config is None:
            tree_builder_config = config_class(
                tokenizer=tb_tokenizer,
                max_tokens=tb_max_tokens,
                num_layers=tb_num_layers,
                threshold=tb_threshold,
                top_k=tb_top_k,
                selection_mode=tb_selection_mode,
                summarization_length=tb_summarization_length,
                summarization_model=tb_summarization_model,
                embedding_models=tb_embedding_models,
                cluster_embedding_model=tb_cluster_embedding_model,
                text_splitter=tb_text_splitter,
                max_resolution=tb_max_resolution,
                soft_buffer=tb_soft_buffer,
                lattice=tb_lattice,
            )
        elif not isinstance(tree_builder_config, config_class):
            raise ValueError(
                f"tree_builder_config must be a direct instance of {config_class} "
                f"for tree_builder_type '{tree_builder_type}'"
            )

        if tree_retriever_config is None:
            tree_retriever_config = TreeRetrieverConfig(
                tokenizer=tr_tokenizer,
                threshold=tr_threshold,
                top_k=tr_top_k,
                selection_mode=tr_selection_mode,
                context_embedding_model=tr_context_embedding_model,
                embedding_model=tr_embedding_model,
                num_layers=tr_num_layers,
                start_layer=tr_start_layer,
                reranker=tr_reranker,
            )
        elif not isinstance(tree_retriever_config, TreeRetrieverConfig):
            raise ValueError(
                "tree_retriever_config must be an instance of TreeRetrieverConfig"
            )

        self.tree_builder_config = tree_builder_config
        self.tree_retriever_config = tree_retriever_config
        self.qa_model = qa_model if qa_model is not None else default_qa_model
        self.tree_builder_type = tree_builder_type
