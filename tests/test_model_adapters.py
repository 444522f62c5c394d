"""Real-model adapter shims (kernels/adapters.py) driven by fake backends:
retry policy, newline-strip, empty-summary guard + extractive fallback,
lazy once-per-worker loading — the reference behaviors
(embedding_models.py:17-19, summarization_models.py:27-48) the engine keeps
outside the model object. No Spark needed; pure contract tests."""

import numpy as np
import pytest

from raptor_rag_spark.kernels.adapters import (
    GuardedSummarizationModel,
    RetryingEmbeddingModel,
    SentenceTransformerEmbeddingModel,
)
from raptor_rag_spark.kernels.summarize import extractive_summary


def test_retrying_embedder_retries_then_succeeds():
    calls, waits = [], []

    def loader():
        def encode(texts):
            calls.append(list(texts))
            if len(calls) < 3:
                raise ConnectionError("transient")
            return np.ones((len(texts), 4))

        return encode

    m = RetryingEmbeddingModel(loader, attempts=6, sleep=waits.append)
    out = m.embed_batch(["a\nb", "c"])
    assert out.shape == (2, 4) and out.dtype == np.float32
    assert len(calls) == 3
    # reference newline-strip before embed (P5)
    assert calls[0][0] == "a b"
    # deterministic exponential backoff 1, 2 (capped at 20)
    assert waits == [1.0, 2.0]


def test_retrying_embedder_gives_up_after_attempts():
    n = []

    def loader():
        def encode(texts):
            n.append(1)
            raise TimeoutError("down")

        return encode

    m = RetryingEmbeddingModel(loader, attempts=3, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        m.embed_batch(["x"])
    assert len(n) == 3


def test_retrying_embedder_rejects_bad_backend_shape():
    m = RetryingEmbeddingModel(
        lambda: (lambda texts: np.ones(3)), attempts=1, sleep=lambda s: None
    )
    with pytest.raises(RuntimeError):
        m.embed_batch(["a", "b"])


def test_loader_runs_once_per_instance():
    loads = []

    def loader():
        loads.append(1)
        return lambda texts: np.zeros((len(texts), 2))

    m = RetryingEmbeddingModel(loader, sleep=lambda s: None)
    m.embed_batch(["a"])
    m.embed_batch(["b"])
    m.create_embedding("c")
    assert len(loads) == 1  # once-per-worker lifecycle


def test_guarded_summarizer_retries_empty_then_returns():
    outs = iter(["", "   ", "a real summary"])

    m = GuardedSummarizationModel(
        lambda: (lambda prompt, mt: next(outs)), attempts=6, sleep=lambda s: None
    )
    assert m.summarize("some context", max_tokens=50) == "a real summary"


def test_guarded_summarizer_falls_back_to_extractive():
    """After every attempt returns empty (or raises), the deterministic
    extractive summary stands in — a build never emits an empty node (P8)."""
    ctx = "First sentence here. Second sentence follows. Third one too."
    m = GuardedSummarizationModel(
        lambda: (lambda prompt, mt: ""), attempts=2, sleep=lambda s: None
    )
    out = m.summarize(ctx, max_tokens=8)
    assert out == extractive_summary(ctx, max_tokens=8)
    assert out.strip()

    boom = GuardedSummarizationModel(
        lambda: (lambda prompt, mt: 1 / 0), attempts=2, sleep=lambda s: None
    )
    assert boom.summarize(ctx, max_tokens=8) == extractive_summary(ctx, max_tokens=8)


def test_guarded_summarizer_uses_reference_prompt():
    seen = []

    def loader():
        def complete(prompt, mt):
            seen.append((prompt, mt))
            return "ok"

        return complete

    m = GuardedSummarizationModel(loader, sleep=lambda s: None)
    m.summarize("CTX", max_tokens=9)
    assert seen == [(GuardedSummarizationModel.PROMPT.format(context="CTX"), 9)]


def test_sentence_transformer_adapter_import_error_is_deferred():
    """Constructing the adapter must NOT import sentence_transformers (the
    driver may not have it); the ImportError with install guidance surfaces
    on first use, from the loader (reference embedding_models.py:26-31)."""
    m = SentenceTransformerEmbeddingModel("any-model", attempts=1, sleep=lambda s: None)
    with pytest.raises((ImportError, RuntimeError)) as ei:
        m.embed_batch(["x"])
    # the underlying cause carries the guidance
    msg = str(ei.value) + str(ei.value.__cause__)
    assert "sentence-transformers" in msg


def test_adapters_satisfy_config_contract(monkeypatch):
    """The shims drop into ClusterTreeConfig's validated slots."""
    from raptor_rag_spark.config import ClusterTreeConfig

    emb = RetryingEmbeddingModel(
        lambda: (lambda texts: np.zeros((len(texts), 64), dtype=np.float32)),
        sleep=lambda s: None,
    )
    summ = GuardedSummarizationModel(lambda: (lambda p, mt: "s"), sleep=lambda s: None)
    cfg = ClusterTreeConfig(
        embedding_models={"default": emb}, summarization_model=summ
    )
    assert cfg.embedding_models["default"] is emb
    assert cfg.summarization_model is summ
