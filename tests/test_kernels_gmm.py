"""Clustering kernel contracts (reference: tests/test_cluster_utils.py).

Assertions are structural (shapes, counts, ranges, separation) exactly like
the reference suite — not sklearn-value-exact (SURVEY.md §5.1).
"""

import numpy as np

from raptor_rag_spark.kernels.gmm import get_optimal_clusters, gmm_cluster, perform_clustering
from raptor_rag_spark.kernels.reduce import project_xy, reduce_embeddings


def test_optimal_clusters_tight_blob():
    x = np.random.default_rng(42).standard_normal((20, 5)) * 0.01
    k = get_optimal_clusters(x, max_clusters=10)
    assert 1 <= k <= 9


def test_optimal_clusters_two_blobs():
    rng = np.random.default_rng(42)
    a = rng.standard_normal((30, 5)) + np.array([10, 0, 0, 0, 0])
    b = rng.standard_normal((30, 5)) - np.array([10, 0, 0, 0, 0])
    x = np.vstack([a, b])
    k = get_optimal_clusters(x, max_clusters=10)
    assert k >= 2


def test_gmm_cluster_shapes():
    x = np.random.default_rng(42).standard_normal((30, 5))
    labels, n = gmm_cluster(x, threshold=0.1)
    assert len(labels) == 30
    assert n >= 1
    for lab in labels:
        assert isinstance(lab, np.ndarray)
        assert all(0 <= v < n for v in lab)


def test_gmm_cluster_high_threshold_can_drop():
    x = np.random.default_rng(42).standard_normal((30, 4))
    labels, _ = gmm_cluster(x, threshold=0.99)
    assert len(labels) == 30  # rows keep a slot even if empty label set


def test_perform_clustering_one_array_per_point():
    x = np.random.default_rng(42).standard_normal((40, 10))
    clusters = perform_clustering(x, dim=5, threshold=0.1)
    assert len(clusters) == 40


def test_perform_clustering_two_blobs_separate():
    rng = np.random.default_rng(42)
    a = rng.standard_normal((25, 8)) + np.array([5.0] + [0] * 7)
    b = rng.standard_normal((25, 8)) - np.array([5.0] + [0] * 7)
    x = np.vstack([a, b])
    clusters = perform_clustering(x, dim=4, threshold=0.3)
    labels_a = {int(v) for lab in clusters[:25] for v in lab}
    labels_b = {int(v) for lab in clusters[25:] for v in lab}
    assert labels_a and labels_b
    # the dominant labels of the two blobs differ
    assert labels_a != labels_b or len(labels_a | labels_b) > 1


def test_perform_clustering_tiny_input_single_cluster():
    x = np.random.default_rng(42).standard_normal((5, 8))
    clusters = perform_clustering(x, dim=10, threshold=0.1)
    assert all(lab.tolist() == [0] for lab in clusters)


def test_perform_clustering_duplicate_rows_ok():
    # the reference's embedding-equality rejoin (cluster_utils.py:80) breaks on
    # duplicates; our index-carrying version must not (SURVEY §2.3/J3)
    x = np.tile(np.random.default_rng(42).standard_normal((5, 6)), (4, 1))
    clusters = perform_clustering(x, dim=3, threshold=0.1)
    assert len(clusters) == 20


def test_reduce_shapes_and_determinism():
    x = np.random.default_rng(42).standard_normal((40, 10))
    r1 = reduce_embeddings(x, 4)
    r2 = reduce_embeddings(x, 4)
    assert r1.shape == (40, 4)
    assert np.array_equal(r1, r2)
    # dim clamped to input dim
    assert reduce_embeddings(x, 50).shape == (40, 10)


def test_project_xy_range_and_determinism():
    x = np.random.default_rng(7).standard_normal((100, 64))
    xy = project_xy(x)
    assert xy.shape == (100, 2)
    assert np.all((xy > 0) & (xy < 1))
    assert np.array_equal(xy, project_xy(x))
    # distinct inputs spread out (not collapsed)
    assert np.std(xy[:, 0]) > 0.01 and np.std(xy[:, 1]) > 0.01
