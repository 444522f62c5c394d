"""Pluggable GMM soft-clustering operator — the reference's RaptorClustering
as a distributed grouped kernel.

The engine's default tree build replaces GMM with grid assignment (the
geospatial recast), but the reference's clustering contract
(raptor/cluster_utils.py:90-126: reduce → GMM(BIC) → soft labels
prob > threshold, per-level) remains available as an operator: nodes are
grouped by a partition key (e.g. a coarse cell — bounding each group, which
is what makes this scale: the global UMAP+GMM of the reference is
single-machine by construction) and the numpy kernel runs per group inside
applyInPandas. Soft multi-membership comes back as one row per (node,
cluster) — the explode shape of SURVEY.md §1.1.

Determinism: members are sorted by node_id before the kernel (reference
sorts by index at utils.py:105-108), and the kernel is seeded, so output is
partition-order independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.gmm import perform_clustering

CLUSTER_SCHEMA = "group_key LONG, node_id LONG, cluster_id LONG, n_clusters INT"


def gmm_soft_cluster(
    nodes: DataFrame,
    group_col: str = "cell_id",
    reduction_dimension: int = 10,
    threshold: float = 0.1,
) -> DataFrame:
    """(group_key, node_id, cluster_id, n_clusters): soft GMM assignment per
    group. cluster_id is local to the group; soft membership = multiple rows
    per node_id."""

    def cluster_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("node_id")
        emb = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        labels = perform_clustering(emb, reduction_dimension, threshold)
        n_clusters = int(max((int(l.max()) for l in labels if len(l)), default=-1)) + 1
        rows = []
        for node_id, ls in zip(pdf["node_id"], labels):
            for c in sorted(set(int(v) for v in ls)):
                rows.append(
                    {
                        "group_key": int(key[0]),
                        "node_id": int(node_id),
                        "cluster_id": c,
                        "n_clusters": n_clusters,
                    }
                )
        return pd.DataFrame(rows, columns=["group_key", "node_id", "cluster_id", "n_clusters"])

    return (
        nodes.select(F.col(group_col).alias("group_key"), "node_id", "embedding")
        .groupBy("group_key")
        .applyInPandas(cluster_group, CLUSTER_SCHEMA)
    )
