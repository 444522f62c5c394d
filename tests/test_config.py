"""Config defaults + validation messages (reference: tests/test_config.py)."""

import pytest

from raptor_rag_spark.config import ClusterTreeConfig, TreeBuilderConfig, TreeRetrieverConfig
from raptor_rag_spark.kernels.embedder import HashNgramEmbeddingModel


def test_tree_builder_defaults():
    c = TreeBuilderConfig()
    assert c.max_tokens == 100
    assert c.num_layers == 5
    assert c.threshold == 0.5
    assert c.top_k == 5
    assert c.selection_mode == "top_k"
    assert c.summarization_length == 100
    assert "default" in c.embedding_models
    assert c.cluster_embedding_model == "default"


def test_tree_builder_validation():
    with pytest.raises(ValueError, match="max_tokens must be an integer and at least 1"):
        TreeBuilderConfig(max_tokens=0)
    with pytest.raises(ValueError, match="num_layers must be an integer and at least 1"):
        TreeBuilderConfig(num_layers=-1)
    with pytest.raises(ValueError, match="threshold must be a number between 0 and 1"):
        TreeBuilderConfig(threshold=1.5)
    with pytest.raises(ValueError, match="top_k must be an integer and at least 1"):
        TreeBuilderConfig(top_k=0)
    with pytest.raises(ValueError, match="selection_mode must be either 'top_k' or 'threshold'"):
        TreeBuilderConfig(selection_mode="best")
    with pytest.raises(ValueError, match="embedding_models must be a dictionary"):
        TreeBuilderConfig(embedding_models=[1, 2])
    with pytest.raises(ValueError, match="cluster_embedding_model must be a key"):
        TreeBuilderConfig(cluster_embedding_model="missing")


def test_cluster_tree_defaults():
    c = ClusterTreeConfig()
    assert c.reduction_dimension == 10
    assert c.max_length_in_cluster == 3500
    assert c.clustering_threshold == 0.1
    assert 0 < c.max_resolution <= 28
    assert c.soft_buffer >= 0


def test_retriever_defaults():
    c = TreeRetrieverConfig()
    assert c.threshold == 0.5
    assert c.top_k == 5
    assert c.selection_mode == "top_k"
    assert c.context_embedding_model == "default"
    assert isinstance(c.embedding_model, HashNgramEmbeddingModel)
    assert c.num_layers is None and c.start_layer is None


def test_retriever_validation():
    with pytest.raises(ValueError, match="threshold must be a number between 0 and 1"):
        TreeRetrieverConfig(threshold=2)
    with pytest.raises(ValueError, match="top_k must be an integer and at least 1"):
        TreeRetrieverConfig(top_k=0)
    with pytest.raises(ValueError, match="selection_mode must be a string and either"):
        TreeRetrieverConfig(selection_mode="nope")
    with pytest.raises(ValueError, match="num_layers must be an integer and at least 0"):
        TreeRetrieverConfig(num_layers=-1)
    with pytest.raises(ValueError, match="start_layer must be an integer and at least 0"):
        TreeRetrieverConfig(start_layer=-2)
    with pytest.raises(ValueError, match="embedding_model must be an instance of BaseEmbeddingModel"):
        TreeRetrieverConfig(embedding_model="not-a-model")
