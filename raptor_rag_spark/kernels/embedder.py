"""Deterministic hash-ngram text embedder.

Plays the role of the reference's embedding models (raptor/embedding_models.py:
7-49 — LiteLLM / SBERT / HF, all network- or model-file-bound and unavailable
here). The contract the engine needs is only: ``text -> ARRAY<FLOAT>``,
deterministic per text, L2-normalized (the reference normalizes at
raptor/embedding_models.py:48), batchable.

Design: feature-hash each token and each char-3gram into ``dim`` signed
buckets (md5-based stable hash — never Python's seeded ``hash``), accumulate,
then L2-normalize. Deterministic across processes, partitions and runs, which
is what makes the whole pipeline's output independent of parallelism.

Batch path: tokens are deduplicated per batch and hashed once (dict cache), so
the per-row Python work is bounded by unique-token count, with numpy
``np.add.at`` accumulation — suitable for Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .distances import l2_normalize

DEFAULT_DIM = 64
_WORD_RE = re.compile(r"[a-z0-9]+")


def _feature_hash(feature: str) -> int:
    digest = hashlib.md5(feature.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big")


def _features(text: str) -> list[str]:
    """Lowercased word tokens + char trigrams of each token."""
    words = _WORD_RE.findall(text.lower().replace("\n", " "))
    feats: list[str] = []
    for w in words:
        feats.append("w:" + w)
        padded = f"^{w}$"
        feats.extend("g:" + padded[i : i + 3] for i in range(len(padded) - 2))
    return feats


# word -> dense bucket-delta vector, persistent per worker process. Bounded
# clear at 1M entries (vocab of real corpora is Zipfian; the cap only guards
# adversarial inputs). Keyed by (dim, word).
_WORD_VECS: dict[tuple[int, str], np.ndarray] = {}
_WORD_VECS_MAX = 1_000_000


def _word_vec(w: str, dim: int) -> np.ndarray:
    key = (dim, w)
    vec = _WORD_VECS.get(key)
    if vec is None:
        if len(_WORD_VECS) >= _WORD_VECS_MAX:
            _WORD_VECS.clear()
        vec = np.zeros(dim, dtype=np.float64)
        padded = f"^{w}$"
        for f in ["w:" + w] + ["g:" + padded[i : i + 3] for i in range(len(padded) - 2)]:
            h = _feature_hash(f)
            vec[h % dim] += 1.0 if (h >> 62) & 1 else -1.0
        _WORD_VECS[key] = vec
    return vec


def embed_texts(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embed an iterable of strings -> (n, dim) float32, rows L2-normalized.

    Empty/feature-less texts embed to the zero vector.

    Per-word dense deltas are cached across batches (worker-lifetime), so the
    hot path allocates almost nothing — this kernel is memory-allocation
    bound otherwise, which caps scaling on virtualized hosts. Bit-exact with
    the per-feature formulation: bucket values are sums of ±1 (exact
    integers in float64), so accumulation order cannot change the result.
    """
    texts = list(texts)
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float64)
    for row, text in enumerate(texts):
        if not isinstance(text, str) or not text:
            continue
        words = _WORD_RE.findall(text.lower().replace("\n", " "))
        if not words:
            continue
        acc = out[row]
        for w in words:
            acc += _word_vec(w, dim)
    return l2_normalize(out).astype(np.float32)


def embed_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    return embed_texts([text], dim)[0].tolist()


class BaseEmbeddingModel:
    """Pluggability contract mirroring raptor/embedding_models.py:7-10."""

    def create_embedding(self, text: str) -> list[float]:
        raise NotImplementedError


class HashNgramEmbeddingModel(BaseEmbeddingModel):
    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def create_embedding(self, text: str) -> list[float]:
        return embed_text(text, self.dim)
