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
