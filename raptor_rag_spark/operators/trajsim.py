"""Trajectory similarity: Hausdorff, discrete Fréchet, and DTW distances.

Movement analytics over per-entity point sequences (user sessions walking the
embedding plane, crawl paths, GPS traces). Three classic measures between
candidate trajectory PAIRS:

- **Hausdorff** (symmetric, order-free): max over points of the distance to
  the nearest point of the other trajectory. Pure relational: a within-pair
  point join → per-point min → per-pair max, both directions. No Python.
- **Discrete Fréchet** (order-aware, the "dog-leash" distance) and **DTW**
  (order-aware, cumulative): O(n·m) dynamic programs per pair, run as ONE
  Arrow-batched ``applyInPandas`` kernel (grouped by pair — the same shape as
  the ROUGE-L/METEOR DP kernels in operators/evalmetrics.py; SQL cannot
  express the recurrence row-wise).

The DuckDB twin for the DP pair runs the IDENTICAL recurrence as a recursive
CTE over ANTI-DIAGONALS: cells (i, j) with i + j = k depend only on diagonals
k−1 and k−2, so each recursion step is an element-wise ``list_transform`` over
a fixed-length list (no intra-step dependency), with +infinity padding for
off-grid cells. Both engines evaluate the same IEEE max/min/add tree on the
same float64 inputs, so results are bit-identical and the oracle hash-matches.

Scale shape: the operator takes an explicit ``pairs`` DataFrame — candidate
pairs come from blocking (stay-point overlap, bbox_overlay_join, shared cells),
NEVER all-pairs; the per-pair cost is O(n·m) bounded by the trajectory length
cap the caller enforces. The point join shuffles on pair_id only; the DP
kernel is one grouped Arrow pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INF = "CAST('infinity' AS DOUBLE)"


def _sides(trajs: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """(pair_id, side, seq, x, y) — both trajectories of every pair."""
    a = pairs.join(
        trajs.withColumnRenamed(id_col, "a_id"), "a_id"
    ).select("pair_id", F.lit(0).alias("side"), "seq", "x", "y")
    b = pairs.join(
        trajs.withColumnRenamed(id_col, "b_id"), "b_id"
    ).select("pair_id", F.lit(1).alias("side"), "seq", "x", "y")
    return a.unionByName(b)


def traj_hausdorff(
    trajs: DataFrame, pairs: DataFrame, id_col: str = "traj_id"
) -> DataFrame:
    """(pair_id, h_ab, h_ba, hausdorff) — directed and symmetric Hausdorff
    distance per candidate pair. ``trajs``: (id_col, seq, x, y); ``pairs``:
    (pair_id, a_id, b_id). Min/max run on squared distances (monotone), one
    sqrt at the end."""
    pts = _sides(trajs, pairs, id_col)
    a = pts.where(F.col("side") == 0).select(
        "pair_id", F.col("seq").alias("ai"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = pts.where(F.col("side") == 1).select(
        "pair_id", F.col("seq").alias("bj"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    cross = a.join(b, "pair_id").select("pair_id", "ai", "bj", d2.alias("d2"))
    h_ab = (
        cross.groupBy("pair_id", "ai")
        .agg(F.min("d2").alias("m"))
        .groupBy("pair_id")
        .agg(F.max("m").alias("h2_ab"))
    )
    h_ba = (
        cross.groupBy("pair_id", "bj")
        .agg(F.min("d2").alias("m"))
        .groupBy("pair_id")
        .agg(F.max("m").alias("h2_ba"))
    )
    return h_ab.join(h_ba, "pair_id").select(
        "pair_id",
        F.sqrt("h2_ab").alias("h_ab"),
        F.sqrt("h2_ba").alias("h_ba"),
        F.sqrt(F.greatest("h2_ab", "h2_ba")).alias("hausdorff"),
    )


def traj_hausdorff_sql(trajs_sql: str, pairs_sql: str, id_col: str = "traj_id") -> str:
    """DuckDB twin of :func:`traj_hausdorff`."""
    return f"""
WITH t AS (SELECT {id_col} AS tid, seq, x, y FROM ({trajs_sql})),
p AS (SELECT pair_id, a_id, b_id FROM ({pairs_sql})),
cr AS (
  SELECT p.pair_id, pa.seq AS ai, pb.seq AS bj,
         (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y) AS d2
  FROM p JOIN t pa ON pa.tid = p.a_id JOIN t pb ON pb.tid = p.b_id),
hab AS (SELECT pair_id, max(m) AS h2_ab
        FROM (SELECT pair_id, ai, min(d2) AS m FROM cr GROUP BY pair_id, ai)
        GROUP BY pair_id),
hba AS (SELECT pair_id, max(m) AS h2_ba
        FROM (SELECT pair_id, bj, min(d2) AS m FROM cr GROUP BY pair_id, bj)
        GROUP BY pair_id)
SELECT hab.pair_id, sqrt(h2_ab) AS h_ab, sqrt(h2_ba) AS h_ba,
       sqrt(greatest(h2_ab, h2_ba)) AS hausdorff
FROM hab JOIN hba ON hab.pair_id = hba.pair_id
"""


def _dp_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-pair discrete-Fréchet + DTW dynamic programs (float64 exact)."""
    a = pdf[pdf["side"] == 0].sort_values("seq")
    b = pdf[pdf["side"] == 1].sort_values("seq")
    ax, ay = a["x"].to_numpy(np.float64), a["y"].to_numpy(np.float64)
    bx, by = b["x"].to_numpy(np.float64), b["y"].to_numpy(np.float64)
    n, m = len(ax), len(bx)
    dx = ax[:, None] - bx[None, :]
    dy = ay[:, None] - by[None, :]
    d2 = dx * dx + dy * dy
    dt = np.sqrt(d2)
    ff = np.empty((n, m))
    gg = np.empty((n, m))
    inf = float("inf")
    for i in range(n):
        for j in range(m):
            pu = ff[i - 1, j] if i > 0 else inf        # F(i-1, j)
            pl = ff[i, j - 1] if j > 0 else inf        # F(i, j-1)
            pd_ = ff[i - 1, j - 1] if i > 0 and j > 0 else inf
            best = min(pu, pl, pd_)
            ff[i, j] = d2[i, j] if best == inf else max(d2[i, j], best)
            qu = gg[i - 1, j] if i > 0 else inf
            ql = gg[i, j - 1] if j > 0 else inf
            qd = gg[i - 1, j - 1] if i > 0 and j > 0 else inf
            qb = min(qu, ql, qd)
            gg[i, j] = dt[i, j] if qb == inf else dt[i, j] + qb
    return pd.DataFrame(
        {
            "pair_id": [int(pdf["pair_id"].iloc[0])],
            "frechet": [float(np.sqrt(ff[n - 1, m - 1]))],
            "dtw": [float(gg[n - 1, m - 1])],
        }
    )


def traj_dp_distances(
    trajs: DataFrame, pairs: DataFrame, id_col: str = "traj_id"
) -> DataFrame:
    """(pair_id, frechet, dtw) — discrete Fréchet and DTW per candidate pair.
    One grouped Arrow pass; inputs as in :func:`traj_hausdorff`."""
    pts = _sides(trajs, pairs, id_col)
    return pts.groupBy("pair_id").applyInPandas(
        _dp_kernel, "pair_id long, frechet double, dtw double"
    )


def traj_dp_distances_sql(
    trajs_sql: str, pairs_sql: str, maxlen: int, id_col: str = "traj_id"
) -> str:
    """DuckDB twin of :func:`traj_dp_distances` — the identical DP run as a
    recursive CTE over anti-diagonals. ``maxlen`` is the trajectory length
    cap (list slots); cells off a pair's actual grid carry +infinity via the
    LEFT-JOIN sentinel, so shorter pairs are handled by the same lists. Lists
    are 1-based: slot i+1 holds row index i of the diagonal."""
    n = int(maxlen)
    idx = f"generate_series(0, {n - 1})"
    inf_list = f"list_transform({idx}, i -> {_INF})"

    def step(prev: str, prev2: str, combine: str) -> str:
        # cell (i, k+1-i): F(i-1,j) = prev[i], F(i,j-1) = prev[i+1],
        # F(i-1,j-1) = prev2[i]; i = 0 underflows the 1-based list -> +inf.
        least = (
            f"least(CASE WHEN i = 0 THEN {_INF} ELSE coalesce({prev}[i], {_INF}) END, "
            f"coalesce({prev}[i + 1], {_INF}), "
            f"CASE WHEN i = 0 THEN {_INF} ELSE coalesce({prev2}[i], {_INF}) END)"
        )
        return (
            f"list_transform({idx}, i -> CASE WHEN dd.dl[i + 1] = {_INF} "
            f"THEN {_INF} ELSE {combine.format(least=least)} END)"
        )

    f_step = step("r.ff", "r.fp", "greatest(dd.dl[i + 1], {least})")
    g_step = step("r.gg", "r.gp", "sqrt(dd.dl[i + 1]) + {least}")
    return f"""
WITH RECURSIVE
t AS (SELECT {id_col} AS tid, seq, x, y FROM ({trajs_sql})),
p AS (SELECT pair_id, a_id, b_id FROM ({pairs_sql})),
lens AS (SELECT tid, count(*) AS n FROM t GROUP BY tid),
meta AS (SELECT p.pair_id, p.a_id, p.b_id, la.n AS nlen, lb.n AS mlen
         FROM p JOIN lens la ON la.tid = p.a_id JOIN lens lb ON lb.tid = p.b_id),
dmat AS (
  SELECT m.pair_id, pa.seq AS i, pb.seq AS j,
         (pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y) AS d2
  FROM meta m JOIN t pa ON pa.tid = m.a_id JOIN t pb ON pb.tid = m.b_id),
grid AS (
  SELECT m.pair_id, kk.k, ii.i FROM meta m
  CROSS JOIN (SELECT unnest(generate_series(0, {2 * n - 2})) AS k) kk
  CROSS JOIN (SELECT unnest({idx}) AS i) ii
  WHERE kk.k <= m.nlen + m.mlen - 2),
dd AS (
  SELECT g.pair_id, g.k, list(coalesce(dm.d2, {_INF}) ORDER BY g.i) AS dl
  FROM grid g LEFT JOIN dmat dm
    ON dm.pair_id = g.pair_id AND dm.i = g.i AND dm.j = g.k - g.i
  GROUP BY g.pair_id, g.k),
rec AS (
  SELECT m.pair_id, 0 AS k,
         list_transform({idx}, i -> CASE WHEN i = 0 THEN dd.dl[1] ELSE {_INF} END) AS ff,
         {inf_list} AS fp,
         list_transform({idx}, i -> CASE WHEN i = 0 THEN sqrt(dd.dl[1]) ELSE {_INF} END) AS gg,
         {inf_list} AS gp,
         m.nlen + m.mlen - 2 AS kmax, m.nlen AS nlen
  FROM meta m JOIN dd ON dd.pair_id = m.pair_id AND dd.k = 0
  UNION ALL
  SELECT r.pair_id, r.k + 1,
         {f_step} AS ff, r.ff AS fp,
         {g_step} AS gg, r.gg AS gp,
         r.kmax, r.nlen
  FROM rec r JOIN dd ON dd.pair_id = r.pair_id AND dd.k = r.k + 1
  WHERE r.k < r.kmax)
SELECT pair_id, sqrt(ff[nlen]) AS frechet, gg[nlen] AS dtw
FROM rec WHERE k = kmax
"""
