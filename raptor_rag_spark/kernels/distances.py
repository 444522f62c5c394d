"""Vectorized distance kernels (reference: raptor/utils.py:84-102).

The reference dispatches per-row to scipy (cosine / cityblock / euclidean /
chebyshev). scipy is absent here and would be per-row anyway; these are
matrix-vectorized numpy equivalents with the same exact values (asserted in
tests against the reference's exact-value fixtures: cosine(identical)=0,
orthogonal=1, opposite=2; L1([0,0],[3,4])=7; L2=5; Linf=4).
"""

from __future__ import annotations

import numpy as np

SUPPORTED_METRICS = ("cosine", "L1", "L2", "Linf")


def distance_matrix(query: np.ndarray, embeddings: np.ndarray, metric: str = "cosine") -> np.ndarray:
    """Distances from one query vector to each row of ``embeddings``.

    query: shape (d,); embeddings: shape (n, d); returns shape (n,) float64.
    """
    q = np.asarray(query, dtype=np.float64)
    e = np.asarray(embeddings, dtype=np.float64)
    if e.ndim == 1:
        e = e[None, :]
    if metric == "cosine":
        qn = np.linalg.norm(q)
        en = np.linalg.norm(e, axis=1)
        denom = qn * en
        # scipy semantics: cosine distance = 1 - dot/(|q||e|)
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = (e @ q) / denom
        sim = np.where(denom == 0, 0.0, sim)
        return 1.0 - sim
    if metric == "L1":
        return np.abs(e - q).sum(axis=1)
    if metric == "L2":
        return np.sqrt(((e - q) ** 2).sum(axis=1))
    if metric == "Linf":
        return np.abs(e - q).max(axis=1)
    raise ValueError(
        f"Unsupported distance metric '{metric}'. Supported metrics are: {list(SUPPORTED_METRICS)}"
    )


def distances_from_embeddings(
    query_embedding: list[float],
    embeddings: list[list[float]],
    distance_metric: str = "cosine",
) -> list[float]:
    """Reference-compatible list-in/list-out wrapper."""
    if len(embeddings) == 0:
        return []
    return distance_matrix(np.asarray(query_embedding), np.asarray(embeddings), distance_metric).tolist()


def indices_of_nearest_neighbors_from_distances(distances) -> np.ndarray:
    """Ascending argsort (reference: raptor/utils.py:121-122)."""
    return np.argsort(distances, kind="stable")


def pairwise_cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, d) x (m, d) -> (n, m) cosine similarity, zero-norm safe."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    an = np.linalg.norm(a, axis=1, keepdims=True)
    bn = np.linalg.norm(b, axis=1, keepdims=True)
    an = np.where(an == 0, 1.0, an)
    bn = np.where(bn == 0, 1.0, bn)
    return (a / an) @ (b / bn).T


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=-1, keepdims=True)
    return mat / np.where(norms == 0, 1.0, norms)
