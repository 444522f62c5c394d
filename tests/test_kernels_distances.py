"""Exact-value distance contracts (reference: tests/test_utils.py:94-155)."""

import numpy as np
import pytest

from raptor_rag_spark.kernels.distances import (
    distances_from_embeddings,
    indices_of_nearest_neighbors_from_distances,
    l2_normalize,
    pairwise_cosine_similarity,
)


def test_cosine_identical():
    assert distances_from_embeddings([1.0, 0.0], [[1.0, 0.0]])[0] == pytest.approx(0.0)


def test_cosine_orthogonal():
    assert distances_from_embeddings([1.0, 0.0], [[0.0, 1.0]])[0] == pytest.approx(1.0)


def test_cosine_opposite():
    assert distances_from_embeddings([1.0, 0.0], [[-1.0, 0.0]])[0] == pytest.approx(2.0)


def test_l1():
    assert distances_from_embeddings([0.0, 0.0], [[3.0, 4.0]], "L1")[0] == pytest.approx(7.0)


def test_l2():
    assert distances_from_embeddings([0.0, 0.0], [[3.0, 4.0]], "L2")[0] == pytest.approx(5.0)


def test_linf():
    assert distances_from_embeddings([0.0, 0.0], [[3.0, 4.0]], "Linf")[0] == pytest.approx(4.0)


def test_unsupported_metric():
    with pytest.raises(ValueError, match="Unsupported distance metric"):
        distances_from_embeddings([1.0], [[1.0]], "manhattan")


def test_argsort_order():
    order = indices_of_nearest_neighbors_from_distances([0.5, 0.1, 0.9, 0.3])
    assert list(order) == [1, 3, 0, 2]


def test_empty_embeddings():
    assert distances_from_embeddings([1.0, 0.0], []) == []


def test_pairwise_cosine_shape_and_values():
    a = np.eye(3)
    sim = pairwise_cosine_similarity(a, a)
    assert sim.shape == (3, 3)
    assert np.allclose(np.diag(sim), 1.0)
    assert sim[0, 1] == pytest.approx(0.0)


def test_l2_normalize_zero_safe():
    out = l2_normalize(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert np.allclose(out[0], 0.0)
    assert np.linalg.norm(out[1]) == pytest.approx(1.0)
