"""Distributed Lloyd's k-means over the embedding plane (tile space).

The coarse-quantizer trainer the similarity stack is missing: ivf_topk
(operators/similarity.py) probes fixed grid cells; a k-means codebook is the
data-adaptive alternative (FAISS IVF training, Spark MLlib KMeans). This
implementation is deterministic and twin-exact so it can carry a DuckDB
oracle — something MLlib's sampled init cannot.

Design for 100 TB:
- assignment is a PURE MAP: the k centroids are folded into a single sorted
  array (one tiny aggregate), cross-joined as a broadcast 1-row relation,
  and the nearest centroid is an F.aggregate argmin over that array — the
  points are never shuffled, windowed, or grouped for assignment.
- the ONLY corpus-sized shuffle per iteration is the recenter
  groupBy(cluster): k keys, partial-aggregated map-side, so each partition
  emits ≤k rows regardless of data volume.
- init = the k points with the smallest ids via orderBy().limit(k) (Spark's
  distributed TakeOrdered, no global sort stage), no RNG.
- determinism across engines and partitionings: centroid means use exact
  DECIMAL(28,15) sums (double summation order would differ); nearest ties
  break on the lower cluster index (the argmin scans clusters in index
  order and keeps the first strict minimum).
- empty clusters drop out of the groupBy on both engines identically;
  later iterations assign over the surviving centroids.

The DuckDB twin unrolls the same dataflow: c0 → assign → c1 → … (one CTE
pair per Lloyd step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "DECIMAL(28,15)"
_FAR = 1e18


def _assign(pts: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Map-side nearest-centroid: broadcast the k-row centroid table as one
    sorted array column, argmin it per point with F.aggregate."""
    packed = cents.agg(
        F.array_sort(F.collect_list(F.struct("c", "cx", "cy"))).alias("cs")
    )

    def step(acc, s):
        d = (
            (F.col("x") - s["cx"]) * (F.col("x") - s["cx"])
            + (F.col("y") - s["cy"]) * (F.col("y") - s["cy"])
        )
        better = d < acc["d"]
        return F.struct(
            F.when(better, s["c"]).otherwise(acc["c"]).alias("c"),
            F.when(better, d).otherwise(acc["d"]).alias("d"),
        )

    best = F.aggregate(
        F.col("cs"),
        F.struct(
            F.lit(-1).cast("long").alias("c"), F.lit(_FAR).alias("d")
        ),
        step,
    )
    return (
        pts.crossJoin(F.broadcast(packed))
        .withColumn("best", best)
        .select(id_col, "x", "y", F.col("best.c").alias("c"), F.col("best.d").alias("d"))
    )


def _recenter(assigned: DataFrame) -> DataFrame:
    return assigned.groupBy("c").agg(
        (F.sum(F.col("x").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("cx"),
        (F.sum(F.col("y").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("cy"),
    )


def kmeans_xy(
    pts: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """pts: (id_col, x, y). Returns the final assignment
    (id_col, cluster, dist, cx, cy) after ``iters`` Lloyd iterations from
    the deterministic smallest-id init. ``dist`` is the squared L2 to the
    owning centroid; cx/cy the owning centroid, all rounded to 6 dp."""
    seeds = pts.orderBy(id_col).limit(k)
    cents = seeds.withColumn(
        "c", F.row_number().over(Window.orderBy(id_col)).cast("long") - 1
    ).select("c", F.col("x").alias("cx"), F.col("y").alias("cy"))
    for _ in range(iters):
        cents = _recenter(_assign(pts, cents, id_col))
    final = _assign(pts, cents, id_col).join(F.broadcast(cents), "c")
    return final.select(
        id_col,
        F.col("c").alias("cluster"),
        F.round("d", 6).alias("dist"),
        F.round("cx", 6).alias("cx"),
        F.round("cy", 6).alias("cy"),
    )


def _lloyd_sql_ctes(
    pts_sql: str, k: int, iters: int, id_col: str
) -> tuple[list[str], str]:
    """Shared CTE chain for the Lloyd twins: pts → c0 → (assign, recenter)×
    iters → afinal. Returns (ctes, final-centroid cte name)."""

    def assign(cent_cte: str, name: str) -> str:
        return f"""{name} AS (
  SELECT {id_col}, x, y, c, d FROM (
    SELECT p.{id_col}, p.x, p.y, t.c,
           (p.x - t.cx) * (p.x - t.cx) + (p.y - t.cy) * (p.y - t.cy) AS d,
           row_number() OVER (PARTITION BY p.{id_col}
                              ORDER BY (p.x - t.cx) * (p.x - t.cx)
                                     + (p.y - t.cy) * (p.y - t.cy), t.c) AS rn
    FROM pts p, {cent_cte} t
  ) WHERE rn = 1
)"""

    def recenter(assign_cte: str, name: str) -> str:
        return f"""{name} AS (
  SELECT c,
         CAST(sum(CAST(x AS {DEC})) AS DOUBLE) / count(*) AS cx,
         CAST(sum(CAST(y AS {DEC})) AS DOUBLE) / count(*) AS cy
  FROM {assign_cte} GROUP BY c
)"""

    ctes = [
        f"pts AS ({pts_sql})",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 AS BIGINT) AS c,
         x AS cx, y AS cy
  FROM pts ORDER BY {id_col} LIMIT {k}
)""",
    ]
    cent = "c0"
    for i in range(1, iters + 1):
        ctes.append(assign(cent, f"a{i}"))
        ctes.append(recenter(f"a{i}", f"c{i}"))
        cent = f"c{i}"
    ctes.append(assign(cent, "afinal"))
    return ctes, cent


def kmeans_xy_sql(
    pts_sql: str,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`kmeans_xy` — the iteration loop unrolled into
    one CTE pair (assign, recenter) per Lloyd step. The window argmin
    (ORDER BY d, c, pick first) is the set formulation of the Spark side's
    first-strict-minimum array scan."""
    ctes, cent = _lloyd_sql_ctes(pts_sql, k, iters, id_col)
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT a.{id_col}, a.c AS cluster, round(a.d, 6) AS dist,
       round(t.cx, 6) AS cx, round(t.cy, 6) AS cy
FROM afinal a JOIN {cent} t USING (c)
"""


def kmeans_silhouette(
    pts: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """(cluster, n, mean_sil): simplified (centroid-based) silhouette per
    final Lloyd cluster — a(i) = distance to the owning centroid, b(i) =
    distance to the nearest OTHER centroid, s = (b−a)/max(a,b) (0 when the
    point sits exactly on its centroid). The medoid-free variant every
    distributed evaluator uses: full silhouette is all-pairs; this is one
    broadcast argmin + one k-key groupBy, exact enough to rank k choices.

    Determinism: distances in doubles with the same first-strict-minimum
    scan as assignment; per-cluster means sum s in DECIMAL(28,15)."""
    seeds = pts.orderBy(id_col).limit(k)
    cents = seeds.withColumn(
        "c", F.row_number().over(Window.orderBy(id_col)).cast("long") - 1
    ).select("c", F.col("x").alias("cx"), F.col("y").alias("cy"))
    for _ in range(iters):
        cents = _recenter(_assign(pts, cents, id_col))
    assigned = _assign(pts, cents, id_col)

    packed = cents.agg(
        F.array_sort(F.collect_list(F.struct("c", "cx", "cy"))).alias("cs")
    )

    def step(acc, s):
        d = (
            (F.col("x") - s["cx"]) * (F.col("x") - s["cx"])
            + (F.col("y") - s["cy"]) * (F.col("y") - s["cy"])
        )
        better = (d < acc["d"]) & (s["c"] != F.col("c"))
        return F.struct(
            F.when(better, d).otherwise(acc["d"]).alias("d"),
        )

    b2 = F.aggregate(
        F.col("cs"), F.struct(F.lit(_FAR).alias("d")), step
    )["d"]
    ab = (
        assigned.crossJoin(F.broadcast(packed))
        .withColumn("a_d", F.sqrt(F.col("d")))
        .withColumn("b_d", F.sqrt(b2))
    )
    sil = ab.withColumn(
        "s",
        F.when(F.greatest("a_d", "b_d") == 0.0, F.lit(0.0)).otherwise(
            (F.col("b_d") - F.col("a_d")) / F.greatest("a_d", "b_d")
        ),
    )
    return sil.groupBy(F.col("c").alias("cluster")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("s").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_sil"),
    )


def kmeans_silhouette_sql(
    pts_sql: str,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`kmeans_silhouette` — reuses the Lloyd CTE chain,
    then b(i) = min distance over the other centroids via a filtered min."""
    ctes, cent = _lloyd_sql_ctes(pts_sql, k, iters, id_col)
    body = ",\n".join(ctes)
    return f"""
WITH {body},
ab AS (
  SELECT a.{id_col}, a.c, sqrt(a.d) AS a_d,
         sqrt(min(CASE WHEN t.c <> a.c
                       THEN (a.x - t.cx) * (a.x - t.cx) + (a.y - t.cy) * (a.y - t.cy)
                       ELSE {_FAR!r} END)) AS b_d
  FROM afinal a, {cent} t
  GROUP BY a.{id_col}, a.c, a.d, a.x, a.y),
sil AS (
  SELECT c, CASE WHEN greatest(a_d, b_d) = 0.0 THEN 0.0
                 ELSE (b_d - a_d) / greatest(a_d, b_d) END AS s
  FROM ab)
SELECT c AS cluster, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(s AS {DEC})) AS DOUBLE) / count(*), 6) AS mean_sil
FROM sil GROUP BY c
"""
