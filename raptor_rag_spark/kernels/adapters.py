"""Real-model adapter shims — plug network/GPU models into the engine's slots.

The engine core is deterministic and sandbox-runnable; production users
swap in real embedders/summarizers through the SAME pluggability contracts
(BaseEmbeddingModel, BaseSummarizationModel). These shims supply the two
behaviors the reference bakes into its model classes and that a distributed
engine must keep OUTSIDE the model:

- **Bounded retry with exponential backoff** — reference
  ``raptor/embedding_models.py:17`` / ``summarization_models.py:27`` wrap
  every call in tenacity ``retry(wait_random_exponential(1, 20),
  stop_after_attempt(6))``. :class:`RetryingEmbeddingModel` reproduces that
  policy (deterministic backoff, injectable sleep so tests don't wait).
- **Empty-summary guard** — reference ``summarization_models.py:39-48``
  raises on empty content so tenacity re-prompts; after final failure the
  engine must still produce a non-empty node.
  :class:`GuardedSummarizationModel` retries, then falls back to the
  deterministic extractive summary (SURVEY.md §2 P8) so a tree build never
  dies mid-level because one cell's LLM call returned "".

Executor-side lifecycle: a model object is constructed lazily ONCE PER
WORKER (not per batch, not per row) — the ``_load`` callable runs inside
the Arrow UDF on first use, so heavyweight backends (sentence-transformers
weights, HTTP sessions) are paid once per executor process, and the driver
never needs the package installed. See docs/REAL_MODELS.md for the worked
sentence-transformers + LLM example.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Sequence

import numpy as np

from .embedder import BaseEmbeddingModel
from .summarize import BaseSummarizationModel, extractive_summary

logger = logging.getLogger(__name__)


class RetryingEmbeddingModel(BaseEmbeddingModel):
    """Wrap a batch ``encode(list[str]) -> array`` callable with the
    reference's retry policy (embedding_models.py:17): up to ``attempts``
    tries, exponential backoff capped at ``max_wait`` seconds.

    ``loader`` is called lazily on first use and its result cached —
    worker-lifetime model loading for Arrow UDFs. ``sleep`` is injectable
    for tests (defaults to time.sleep)."""

    def __init__(
        self,
        loader: Callable[[], Callable[[Sequence[str]], "np.ndarray"]],
        attempts: int = 6,
        base_wait: float = 1.0,
        max_wait: float = 20.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._loader = loader
        self._encode: Callable | None = None
        self.attempts = attempts
        self.base_wait = base_wait
        self.max_wait = max_wait
        self._sleep = sleep

    def _backend(self):
        if self._encode is None:
            self._encode = self._loader()
        return self._encode

    def embed_batch(self, texts) -> np.ndarray:
        # reference newline-strip before embed (embedding_models.py:19,
        # SURVEY.md §2 P5)
        cleaned = [(t or "").replace("\n", " ") for t in texts]
        last: Exception | None = None
        for i in range(self.attempts):
            try:
                out = np.asarray(self._backend()(cleaned), dtype=np.float32)
                if out.ndim != 2 or out.shape[0] != len(cleaned):
                    raise ValueError(f"backend returned shape {out.shape} for {len(cleaned)} texts")
                return out
            except Exception as e:  # noqa: BLE001 — network/backend errors retry
                last = e
                if i + 1 < self.attempts:
                    self._sleep(min(self.base_wait * (2.0**i), self.max_wait))
        raise RuntimeError(f"embedding backend failed after {self.attempts} attempts") from last

    def create_embedding(self, text: str) -> list:
        return self.embed_batch([text])[0].tolist()


class GuardedSummarizationModel(BaseSummarizationModel):
    """Wrap an LLM ``complete(prompt, max_tokens) -> str`` callable with the
    reference's empty-summary guard (summarization_models.py:39-48): an
    empty/whitespace response counts as a failure and retries; after the
    final attempt the deterministic extractive summary stands in, so the
    build NEVER emits an empty parent node (SURVEY.md §2 P8)."""

    PROMPT = (
        "Write a summary of the following, including as many key details as "
        "possible: {context}:"
    )  # reference user_prompt_template, summarization_models.py:21

    def __init__(
        self,
        loader: Callable[[], Callable[[str, int], str]],
        attempts: int = 6,
        base_wait: float = 1.0,
        max_wait: float = 20.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._loader = loader
        self._complete: Callable | None = None
        self.attempts = attempts
        self.base_wait = base_wait
        self.max_wait = max_wait
        self._sleep = sleep

    def _backend(self):
        if self._complete is None:
            self._complete = self._loader()
        return self._complete

    def summarize(self, context: str, max_tokens: int = 150) -> str:
        prompt = self.PROMPT.format(context=context)
        for i in range(self.attempts):
            try:
                out = self._backend()(prompt, max_tokens)
                if out and out.strip():
                    return out
                logger.warning(
                    "Empty summarization: attempt=%d, max_tokens=%d, context_len=%d",
                    i + 1, max_tokens, len(context),
                )  # reference warning shape, summarization_models.py:40-46
            except Exception:  # noqa: BLE001
                logger.warning("Summarization backend error on attempt %d", i + 1, exc_info=True)
            if i + 1 < self.attempts:
                self._sleep(min(self.base_wait * (2.0**i), self.max_wait))
        # final fallback: deterministic, never empty for non-empty context
        return extractive_summary(context, max_tokens=max_tokens)


class SentenceTransformerEmbeddingModel(RetryingEmbeddingModel):
    """Reference SBert/HuggingFace adapters (embedding_models.py:24-49) on
    the engine's batch contract. The package import happens lazily INSIDE
    the loader — i.e. on the executor, once per worker — so clusters ship
    weights via their image, and this module imports fine without it."""

    def __init__(self, model_name: str = "sentence-transformers/multi-qa-mpnet-base-cos-v1",
                 device: str | None = None, normalize: bool = True, **kw):
        def _load():
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError:  # same guidance shape as the reference :26-31
                raise ImportError(
                    "sentence-transformers is required for "
                    "SentenceTransformerEmbeddingModel; install it on the executors"
                ) from None
            model = SentenceTransformer(model_name, device=device)

            def encode(texts):
                return model.encode(list(texts), normalize_embeddings=normalize)

            return encode

        super().__init__(_load, **kw)
