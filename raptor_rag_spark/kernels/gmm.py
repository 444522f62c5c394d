"""From-scratch Gaussian-mixture EM + BIC model selection (numpy only).

Mirrors the *contracts* of the reference's sklearn-backed clustering
(reference: raptor/cluster_utils.py:34-87): ``get_optimal_clusters`` scans
k = 1..max_clusters-1 and argmins BIC; ``gmm_cluster`` soft-assigns each row
every component with posterior probability > threshold; ``perform_clustering``
runs global reduce→GMM then per-global-cluster local reduce→GMM with label
offsetting. The reference's tests assert structure (label-array per row,
optimal-k bounds, separation of well-separated blobs), not sklearn-exact
values — this implementation satisfies the same contracts deterministically.

Deliberate fix vs the reference: members are carried by *row index*, never
re-matched by embedding equality (reference: raptor/cluster_utils.py:80 — a
latent bug where duplicate embeddings collide; SURVEY.md §2.3/J3).

Diagonal covariance, deterministic seeded k-means++-style init, fixed
iteration budget — deterministic for a given input order. Callers must sort
rows (the reference sorts nodes by index before clustering,
raptor/utils.py:105-108 — we keep that contract).
"""

from __future__ import annotations

import numpy as np

from .reduce import RANDOM_SEED, reduce_embeddings

_REG = 1e-6


class DiagGMM:
    def __init__(self, n_components: int, random_state: int = 0, max_iter: int = 60):
        self.k = max(1, int(n_components))
        self.random_state = random_state
        self.max_iter = max_iter

    def _init_means(self, x: np.ndarray) -> np.ndarray:
        """Seeded k-means++-style farthest-point init."""
        rng = np.random.default_rng(self.random_state)
        n = len(x)
        means = [x[int(rng.integers(n))]]
        for _ in range(1, self.k):
            d2 = np.min(
                [((x - m) ** 2).sum(axis=1) for m in means], axis=0
            )
            total = d2.sum()
            if total <= 0:
                means.append(x[int(rng.integers(n))])
                continue
            probs = d2 / total
            means.append(x[int(rng.choice(n, p=probs))])
        return np.array(means)

    def fit(self, x: np.ndarray) -> "DiagGMM":
        x = np.asarray(x, dtype=np.float64)
        n, d = x.shape
        self.k = min(self.k, n)
        means = self._init_means(x)
        var = np.full((self.k, d), x.var(axis=0) + _REG)
        weights = np.full(self.k, 1.0 / self.k)
        prev_ll = -np.inf
        for _ in range(self.max_iter):
            log_resp = self._log_prob(x, means, var, weights)
            ll = np.logaddexp.reduce(log_resp, axis=1)
            resp = np.exp(log_resp - ll[:, None])
            new_ll = ll.mean()
            nk = resp.sum(axis=0) + 1e-12
            means = (resp.T @ x) / nk[:, None]
            var = (resp.T @ (x**2)) / nk[:, None] - means**2 + _REG
            var = np.maximum(var, _REG)
            weights = nk / n
            if abs(new_ll - prev_ll) < 1e-7:
                break
            prev_ll = new_ll
        self.means_, self.var_, self.weights_ = means, var, weights
        return self

    @staticmethod
    def _log_prob(x, means, var, weights):
        # (n, k) joint log prob: log w_k + log N(x | mu_k, diag var_k)
        n, d = x.shape
        lp = np.empty((n, len(means)))
        for k in range(len(means)):
            diff2 = (x - means[k]) ** 2 / var[k]
            lp[:, k] = (
                np.log(weights[k] + 1e-300)
                - 0.5 * (d * np.log(2 * np.pi) + np.log(var[k]).sum() + diff2.sum(axis=1))
            )
        return lp

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        lp = self._log_prob(np.asarray(x, dtype=np.float64), self.means_, self.var_, self.weights_)
        ll = np.logaddexp.reduce(lp, axis=1)
        return np.exp(lp - ll[:, None])

    def bic(self, x: np.ndarray) -> float:
        x = np.asarray(x, dtype=np.float64)
        n, d = x.shape
        lp = self._log_prob(x, self.means_, self.var_, self.weights_)
        ll = np.logaddexp.reduce(lp, axis=1).sum()
        n_params = self.k * d + self.k * d + (self.k - 1)
        return float(-2.0 * ll + n_params * np.log(n))


def get_optimal_clusters(
    embeddings: np.ndarray, max_clusters: int = 50, random_state: int = RANDOM_SEED
) -> int:
    """BIC-argmin k over 1..max_clusters-1 (reference: cluster_utils.py:34-43)."""
    embeddings = np.asarray(embeddings, dtype=np.float64)
    max_clusters = min(max_clusters, len(embeddings))
    if max_clusters <= 1:
        return 1
    candidates = np.arange(1, max_clusters)
    bics = []
    for k in candidates:
        gm = DiagGMM(int(k), random_state=random_state).fit(embeddings)
        bics.append(gm.bic(embeddings))
    return int(candidates[int(np.argmin(bics))])


def gmm_cluster(embeddings: np.ndarray, threshold: float, random_state: int = 0):
    """Soft labels: every component with posterior > threshold
    (reference: cluster_utils.py:46-52; note the reference's random_state
    inconsistency — BIC scan seeded 224, final fit seeded 0 — preserved)."""
    n_clusters = get_optimal_clusters(embeddings)
    gm = DiagGMM(n_clusters, random_state=random_state).fit(embeddings)
    probs = gm.predict_proba(embeddings)
    labels = [np.where(p > threshold)[0] for p in probs]
    return labels, n_clusters


def perform_clustering_export(
    embeddings: np.ndarray, dim: int, threshold: float
) -> tuple[list[dict], list[dict]]:
    """Same control flow as ``perform_clustering``, but instead of label
    arrays it exports the *final* model state so the soft-assignment step can
    be recomputed as a distributed dataflow (and by a DuckDB oracle) from a
    parquet dump of these rows:

    - point rows: one per (row, global-cluster membership g) with that row's
      local reduced coordinates (``perform_clustering`` assigns within g from
      ``reduce_embeddings(members, dim)``).
    - param rows: one per final local cluster with the global-offset final
      ``cluster_id``, ``log_norm`` = log w_j - 0.5*(d log 2π + Σ log var_jd),
      the mean vector, and ``nhiv`` = -0.5/var (so the joint log prob is
      log_norm + Σ_d (x_d-μ_d)² · nhiv_d, matching ``DiagGMM._log_prob``).

    Trivial fits (n ≤ dim+1 globally or locally — ``perform_clustering``'s
    single-cluster fallbacks) export log_norm=0.0 with empty mean/nhiv and
    empty point coords: the quadratic form folds to 0, exp(0-0)=1, and the
    softmax assigns every member to that cluster — same labels, same algebra.
    """
    embeddings = np.asarray(embeddings, dtype=np.float64)
    n = len(embeddings)
    points: list[dict] = []
    params: list[dict] = []

    def _trivial(g: int, cluster_id: int, member_rows) -> None:
        params.append(
            {"g": g, "cluster_id": cluster_id, "log_norm": 0.0, "mean": [], "nhiv": []}
        )
        for row in member_rows:
            points.append({"g": g, "row": int(row), "coords": []})

    if n <= dim + 1:
        _trivial(0, 0, range(n))
        return points, params

    reduced_global = reduce_embeddings(embeddings, min(dim, n - 2))
    global_labels, n_global = gmm_cluster(reduced_global, threshold)

    total = 0
    for g in range(n_global):
        member_idx = np.array([i for i in range(n) if g in global_labels[i]], dtype=np.int64)
        if len(member_idx) == 0:
            continue
        members = embeddings[member_idx]
        if len(members) <= dim + 1:
            _trivial(g, total, member_idx)
            total += 1
            continue
        reduced_local = reduce_embeddings(members, dim)
        # mirror gmm_cluster exactly: BIC scan seeded RANDOM_SEED, final fit seed 0
        n_local = get_optimal_clusters(reduced_local)
        gm = DiagGMM(n_local, random_state=0).fit(reduced_local)
        log_norms = (
            np.log(gm.weights_ + 1e-300)
            - 0.5
            * (
                reduced_local.shape[1] * np.log(2 * np.pi)
                + np.log(gm.var_).sum(axis=1)
            )
        )
        for j in range(n_local):
            params.append(
                {
                    "g": g,
                    "cluster_id": total + j,
                    "log_norm": float(log_norms[j]),
                    "mean": [float(v) for v in gm.means_[j]],
                    "nhiv": [float(v) for v in (-0.5 / gm.var_[j])],
                }
            )
        for pos, row in enumerate(member_idx):
            points.append({"g": g, "row": int(row), "coords": [float(v) for v in reduced_local[pos]]})
        total += n_local
    return points, params


def perform_clustering(embeddings: np.ndarray, dim: int, threshold: float) -> list[np.ndarray]:
    """Global reduce+GMM, then local reduce+GMM per global cluster; returns
    one label array per input row (reference: cluster_utils.py:55-87)."""
    embeddings = np.asarray(embeddings, dtype=np.float64)
    n = len(embeddings)
    if n <= dim + 1:
        return [np.array([0]) for _ in range(n)]

    reduced_global = reduce_embeddings(embeddings, min(dim, n - 2))
    global_labels, n_global = gmm_cluster(reduced_global, threshold)

    all_local: list[np.ndarray] = [np.array([], dtype=np.int64) for _ in range(n)]
    total = 0
    for g in range(n_global):
        member_idx = np.array([i for i in range(n) if g in global_labels[i]], dtype=np.int64)
        if len(member_idx) == 0:
            continue
        members = embeddings[member_idx]
        if len(members) <= dim + 1:
            local_labels = [np.array([0]) for _ in member_idx]
            n_local = 1
        else:
            reduced_local = reduce_embeddings(members, dim)
            local_labels, n_local = gmm_cluster(reduced_local, threshold)
        for j in range(n_local):
            for pos, row in enumerate(member_idx):  # carry row indices (J3 fix)
                if j in local_labels[pos]:
                    all_local[row] = np.append(all_local[row], j + total)
        total += n_local
    return all_local
