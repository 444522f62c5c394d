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


# ---------------------------------------------------------------------------
# unified RetrievalAugmentationConfig (reference retrieval_augmentation.py:18-122;
# tests mirror reference tests/test_config.py::TestRetrievalAugmentationConfig)
# ---------------------------------------------------------------------------

def _rac(**overrides):
    from raptor_rag_spark.config import RetrievalAugmentationConfig

    return RetrievalAugmentationConfig(**overrides)


def test_rac_defaults():
    cfg = _rac()
    assert cfg.tree_builder_type == "cluster"
    assert isinstance(cfg.tree_builder_config, ClusterTreeConfig)
    assert isinstance(cfg.tree_retriever_config, TreeRetrieverConfig)
    assert callable(cfg.qa_model)


def test_rac_prefix_routing():
    cfg = _rac(tb_max_tokens=64, tb_num_layers=3, tr_top_k=7, tr_threshold=0.25,
               tb_lattice="hex", tb_max_resolution=8)
    assert cfg.tree_builder_config.max_tokens == 64
    assert cfg.tree_builder_config.num_layers == 3
    assert cfg.tree_builder_config.lattice == "hex"
    assert cfg.tree_builder_config.max_resolution == 8
    assert cfg.tree_retriever_config.top_k == 7
    assert cfg.tree_retriever_config.threshold == 0.25


def test_rac_invalid_tree_builder_type():
    with pytest.raises(ValueError, match="tree_builder_type"):
        _rac(tree_builder_type="invalid")


def test_rac_invalid_qa_model():
    with pytest.raises(ValueError, match="qa_model"):
        _rac(qa_model="not_a_model")


def test_rac_invalid_embedding_model():
    with pytest.raises(ValueError, match="embedding_model"):
        _rac(embedding_model="not_a_model")


def test_rac_invalid_summarization_model():
    with pytest.raises(ValueError, match="summarization_model"):
        _rac(summarization_model="not_a_model")


def test_rac_shortcut_embedding_model():
    """Providing embedding_model unifies both tb and tr sides (reference
    :56-64): builder gets {"EMB": model}, retriever's context model = "EMB",
    retriever query model = the same instance."""
    emb = HashNgramEmbeddingModel(seed="unify")
    cfg = _rac(embedding_model=emb)
    assert cfg.tree_builder_config.embedding_models == {"EMB": emb}
    assert cfg.tree_builder_config.cluster_embedding_model == "EMB"
    assert cfg.tree_retriever_config.context_embedding_model == "EMB"
    assert cfg.tree_retriever_config.embedding_model is emb


def test_rac_both_embedding_model_and_tb_raises():
    with pytest.raises(ValueError, match="Only one of"):
        _rac(embedding_model=HashNgramEmbeddingModel(),
             tb_embedding_models={"test": HashNgramEmbeddingModel()})


def test_rac_both_summarization_model_and_tb_raises():
    from raptor_rag_spark.kernels.summarize import ExtractiveSummarizationModel

    with pytest.raises(ValueError, match="Only one of"):
        _rac(summarization_model=ExtractiveSummarizationModel(),
             tb_summarization_model=ExtractiveSummarizationModel())


def test_rac_custom_reranker():
    from raptor_rag_spark.operators.rerank import LexicalOverlapReRanker

    rr = LexicalOverlapReRanker()
    cfg = _rac(tr_reranker=rr)
    assert cfg.tree_retriever_config.reranker is rr


def test_rac_invalid_reranker():
    with pytest.raises(ValueError, match="reranker must be an instance of BaseReRanker"):
        _rac(tr_reranker="not_a_reranker")


def test_rac_prebuilt_configs_pass_through():
    tb = ClusterTreeConfig(max_tokens=48)
    tr = TreeRetrieverConfig(top_k=9)
    cfg = _rac(tree_builder_config=tb, tree_retriever_config=tr)
    assert cfg.tree_builder_config is tb
    assert cfg.tree_retriever_config is tr
    with pytest.raises(ValueError, match="tree_builder_config must be a direct instance"):
        _rac(tree_builder_config="nope")
    with pytest.raises(ValueError, match="tree_retriever_config must be an instance"):
        _rac(tree_retriever_config="nope")
