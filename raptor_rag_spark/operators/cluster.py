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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.gmm import perform_clustering, perform_clustering_export

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


# ---------------------------------------------------------------- fit/assign split
# The EM fit stays a grouped numpy kernel (like the embedder), but its FINAL
# state — local reduced coordinates per (node, global-cluster) and the fitted
# per-cluster (log_norm, mean, -0.5/var) — is exported as plain rows. The
# soft-assignment step (quadratic form → stabilized softmax → threshold) then
# runs as a distributed JVM dataflow over those rows, using only twin-safe
# arithmetic (left-assoc folds + sqlgen.exp_col), so a DuckDB oracle reading
# the same parquet dump recomputes it bit-for-bit. This is the split that
# upgrades the GMM contract query from rows-only to an exact twin.

EXPORT_SCHEMA = (
    "group_key LONG, kind STRING, g INT, node_id LONG, coords ARRAY<DOUBLE>, "
    "cluster_id LONG, log_norm DOUBLE, mean ARRAY<DOUBLE>, nhiv ARRAY<DOUBLE>"
)
_EXPORT_COLS = [
    "group_key", "kind", "g", "node_id", "coords", "cluster_id", "log_norm", "mean", "nhiv",
]


def gmm_fit_export(
    nodes: DataFrame,
    group_col: str = "cell_id",
    reduction_dimension: int = 10,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-group EM fit exporting model state instead of labels: ``kind='pt'``
    rows carry (g, node_id, local reduced coords), ``kind='pm'`` rows carry
    (g, final cluster_id, log_norm, mean, nhiv). Deterministic: members sorted
    by node_id, seeded kernels (see kernels.gmm.perform_clustering_export)."""

    def fit_group(key, pdf):
        pdf = pdf.sort_values("node_id")
        emb = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        pts, pms = perform_clustering_export(emb, reduction_dimension, threshold)
        node_ids = pdf["node_id"].to_numpy()
        gk = int(key[0])
        rows = [
            {
                "group_key": gk, "kind": "pt", "g": p["g"],
                "node_id": int(node_ids[p["row"]]), "coords": p["coords"],
                "cluster_id": None, "log_norm": None, "mean": None, "nhiv": None,
            }
            for p in pts
        ] + [
            {
                "group_key": gk, "kind": "pm", "g": m["g"], "node_id": None,
                "coords": None, "cluster_id": m["cluster_id"],
                "log_norm": m["log_norm"], "mean": m["mean"], "nhiv": m["nhiv"],
            }
            for m in pms
        ]
        return pd.DataFrame(rows, columns=_EXPORT_COLS)

    return (
        nodes.select(F.col(group_col).alias("group_key"), "node_id", "embedding")
        .groupBy("group_key")
        .applyInPandas(fit_group, EXPORT_SCHEMA)
    )


def gmm_assign_from_params(
    points: DataFrame, params: DataFrame, threshold: float = 0.1
) -> DataFrame:
    """Distributed soft assignment from exported model state.

    points: (group_key, node_id, g, coords) — one row per global membership.
    params: (group_key, g, cluster_id, log_norm, mean, nhiv) — broadcast side.

    Joint log prob s = log_norm + Σ_d (x_d-μ_d)²·nhiv_d (left-assoc fold, the
    same order as DiagGMM._log_prob's row sum); softmax stabilized by the
    per-(node, g) max; responsibility > threshold decided as
    e_k > threshold·Σe_j with the Σ folded over cluster_id order — every op
    twin-exact, so the DuckDB oracle over the same dump matches bit-for-bit.
    Scale shape: params is cluster-count sized (broadcast); the single shuffle
    is the window partition on (group_key, node_id, g)."""
    quad = F.aggregate(
        F.zip_with(
            F.zip_with(F.col("coords"), F.col("mean"), lambda a, b: (a - b) * (a - b)),
            F.col("nhiv"),
            lambda d2, v: d2 * v,
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    pairs = points.join(F.broadcast(params), ["group_key", "g"]).select(
        "group_key", "node_id", "g", "cluster_id", (F.col("log_norm") + quad).alias("s")
    )
    w = Window.partitionBy("group_key", "node_id", "g")
    scored = pairs.withColumn("e", G.exp_col(F.col("s") - F.max("s").over(w)))
    total = F.aggregate(
        F.array_sort(F.collect_list(F.struct("cluster_id", "e")).over(w)),
        F.lit(0.0),
        lambda acc, t: acc + t["e"],
    )
    nclus = params.groupBy("group_key").agg(F.count("*").cast("int").alias("n_clusters"))
    return (
        scored.withColumn("tot", total)
        .where(F.col("e") > F.lit(threshold) * F.col("tot"))
        .join(F.broadcast(nclus), "group_key")
        .select("group_key", "node_id", "cluster_id", "n_clusters")
    )
