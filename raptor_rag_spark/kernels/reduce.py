"""Deterministic dimensionality reduction (the UMAP stand-in).

The reference reduces embeddings with UMAP before clustering (reference:
raptor/cluster_utils.py:15-31; global dim = min(10, n-2), local dim = 10).
UMAP is unavailable and non-deterministic anyway; the north rule wants a
seeded, vectorized reduction. Two kernels:

1. ``reduce_embeddings`` — seeded PCA (numpy eigh, deterministic sign fix) for
   the clustering path; satisfies the reference's structural test contracts
   (output shape (n, dim), deterministic).

2. ``project_xy`` — the *tiling* reduction: a fixed seeded linear projection to
   2 coordinates squashed into (0,1) by the algebraic sigmoid
   ``0.5 + z / (2 * (1 + |z|))``. Chosen over tanh deliberately: it uses only
   +,*,/,abs, so the *same arithmetic in the same order* can be generated as a
   Spark column expression and as DuckDB oracle SQL, giving bit-identical cell
   assignments across engines and across parallelism levels. The weights are
   9-decimal literals (parse identically to double in every engine) and the
   dot product is summed strictly left-to-right (see functions/cellexpr.py).
"""

from __future__ import annotations

import numpy as np

RANDOM_SEED = 224  # reference: raptor/cluster_utils.py:12
XY_SEED = 224


def projection_weights(in_dim: int, out_dim: int = 2, seed: int = XY_SEED) -> np.ndarray:
    """Fixed seeded projection matrix (out_dim, in_dim), 9-decimal rounded."""
    rng = np.random.default_rng(seed + 1000 * out_dim + in_dim)
    # unit-variance weights: for L2-normalized inputs, z = w·e ~ N(0,1), so the
    # squashed coordinates use the full (0,1) tile range instead of clumping at 0.5
    w = rng.standard_normal((out_dim, in_dim))
    return np.round(w, 9)


def squash01(z: np.ndarray) -> np.ndarray:
    """Algebraic sigmoid onto (0,1): 0.5 + z / (2 * (1 + |z|))."""
    z = np.asarray(z, dtype=np.float64)
    return 0.5 + z / (2.0 * (1.0 + np.abs(z)))


def project_xy(embeddings: np.ndarray, seed: int = XY_SEED) -> np.ndarray:
    """(n, d) embeddings -> (n, 2) coordinates in (0,1).

    Matches the generated Spark/DuckDB expressions bit-for-bit: the dot
    product is evaluated as a strict left-to-right scalar fold, not np.dot
    (whose pairwise/SIMD summation order differs).
    """
    e = np.asarray(embeddings, dtype=np.float64)
    if e.ndim == 1:
        e = e[None, :]
    w = projection_weights(e.shape[1], 2, seed)
    out = np.zeros((e.shape[0], 2), dtype=np.float64)
    for axis in range(2):
        acc = np.zeros(e.shape[0], dtype=np.float64)
        for i in range(e.shape[1]):  # strict left-to-right fold, same as SQL a+b+c
            acc = acc + e[:, i] * w[axis, i]
        out[:, axis] = squash01(acc)
    return out


def reduce_embeddings(embeddings: np.ndarray, dim: int, seed: int = RANDOM_SEED) -> np.ndarray:
    """Seeded deterministic PCA to ``dim`` components (UMAP role).

    Input-order invariant up to row permutation (covariance is symmetric in
    rows), deterministic sign convention: each component's largest-|loading|
    entry is made positive.
    """
    x = np.asarray(embeddings, dtype=np.float64)
    n, d = x.shape
    dim = max(1, min(dim, d))
    mu = x.mean(axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals, kind="stable")[::-1][:dim]
    comps = vecs[:, order]
    # deterministic sign: largest-|loading| coordinate positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip = np.where(flip == 0, 1.0, flip)
    comps = comps * flip
    return xc @ comps
