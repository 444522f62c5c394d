"""Grid-bounded Local Outlier Factor over the embedding plane.

LOF (Breunig et al. 2000) — the standard density-based anomaly score: a
point is anomalous when its local reachability density is low relative to
its neighbors'. LOF ≈ 1 inside uniform regions, ≫ 1 for isolated points —
here: pages whose embedding sits far from any topical cluster, a curation
signal no global density threshold can give.

This is the GRID-BOUNDED variant: the k nearest neighbors are taken within
the 3×3 block of home cells at a data-adaptive resolution (dedup.
adaptive_res keeps expected cell population bounded as the corpus grows, so
candidate generation stays near-linear — a fixed res would go quadratic).
Points beyond the block are treated as non-neighbors; an isolated point
with NO same-block neighbor is dropped (document-level truants are exactly
what cell_extremes already reports). The classic sequential algorithm
becomes four declarative passes over a ~N·k pair set:

  1. candidate pairs: 9-offset cell join, exact Euclidean distance
  2. kNN + k-distance: one row_number window, ties broken by neighbor id
  3. reachability: reach(p,o) = max(kdist(o), d(p,o)) — one join back
  4. lrd + LOF: two ordered folds (by kNN rank) so every float sum is
     bit-identical in the DuckDB twin

A 1e-12 reachability floor keeps lrd finite for exactly-coincident points
(their LOF degenerates to ~1 = inlier, the right answer for duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import adaptive_res

REACH_FLOOR = 1e-12
_OFFS9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def lof(
    pts: DataFrame,
    k: int = 8,
    res: int | None = None,
    id_col: str = "id",
) -> DataFrame:
    """pts: (id, x, y) with x, y in [0, 1). Returns (id, n_k, lof) for every
    point with ≥ 1 same-block neighbor; lof rounded to 6 dp."""
    if res is None:
        res = adaptive_res(pts.count())
    n = 1 << res
    cl = lambda c: F.greatest(  # noqa: E731
        F.least(F.floor(c * n).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    p = pts.select(
        F.col(id_col).alias("pid"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        cl(F.col("x")).alias("ix"),
        cl(F.col("y")).alias("iy"),
    )
    o = pts.select(
        F.col(id_col).alias("oid"),
        F.col("x").alias("ox"),
        F.col("y").alias("oy"),
        cl(F.col("x")).alias("oix"),
        cl(F.col("y")).alias("oiy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFS9
        ]
    )
    cand = (
        p.select("*", F.explode(offs).alias("m"))
        .select(
            "pid",
            "px",
            "py",
            (F.col("ix") + F.col("m.dx")).alias("oix"),
            (F.col("iy") + F.col("m.dy")).alias("oiy"),
        )
        .join(o, ["oix", "oiy"])
        .where(F.col("oid") != F.col("pid"))
        .select(
            "pid",
            "oid",
            F.sqrt(
                (F.col("px") - F.col("ox")) * (F.col("px") - F.col("ox"))
                + (F.col("py") - F.col("oy")) * (F.col("py") - F.col("oy"))
            ).alias("d"),
        )
    )
    w = Window.partitionBy("pid").orderBy("d", "oid")
    knn = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    kd = knn.groupBy("pid").agg(
        F.max("d").alias("kdist"), F.count(F.lit(1)).alias("kn")
    )
    reach = knn.join(
        kd.select(F.col("pid").alias("oid"), F.col("kdist").alias("okdist")),
        "oid",
    ).select(
        "pid",
        "oid",
        "rank",
        F.greatest(F.col("okdist"), F.col("d"), F.lit(REACH_FLOOR)).alias(
            "reach"
        ),
    )
    fold = lambda c: F.aggregate(  # noqa: E731
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", c))), lambda s: s[c]
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    lrd = (
        reach.groupBy("pid")
        .agg(fold("reach").alias("s_reach"))
        .join(kd, "pid")
        .select(
            "pid",
            "kn",
            (F.col("kn").cast("double") / F.col("s_reach")).alias("lrd"),
        )
    )
    scores = (
        reach.join(
            lrd.select(F.col("pid").alias("oid"), F.col("lrd").alias("olrd")),
            "oid",
        )
        .groupBy("pid")
        .agg(fold("olrd").alias("s_olrd"))
        .join(lrd, "pid")
        .select(
            F.col("pid").alias("id"),
            F.col("kn").cast("long").alias("n_k"),
            F.round(
                F.col("s_olrd") / F.col("kn").cast("double") / F.col("lrd"), 6
            ).alias("lof"),
        )
    )
    return scores


def lof_sql(
    pts_sql: str,
    k: int = 8,
    res_sql: str | None = None,
    id_col: str = "id",
) -> str:
    """DuckDB twin of :func:`lof`. ``pts_sql`` yields (id, x, y);
    ``res_sql`` a scalar subquery/expression for the grid resolution
    (default: dedup.adaptive_res_sql over the same source)."""
    from .dedup import adaptive_res_sql

    if res_sql is None:
        res_sql = adaptive_res_sql(f"SELECT count(*) FROM ({pts_sql})")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS9)
    n = "(1::BIGINT << res)"
    clx = f"greatest(least(floor(x * {n}::DOUBLE)::BIGINT, {n} - 1), 0)"
    cly = f"greatest(least(floor(y * {n}::DOUBLE)::BIGINT, {n} - 1), 0)"
    return f"""
WITH rp AS (SELECT {res_sql} AS res),
src AS MATERIALIZED (SELECT {id_col} AS id, x, y FROM ({pts_sql})),
pts AS MATERIALIZED (
  SELECT id, x, y, {clx} AS ix, {cly} AS iy FROM src, rp),
offs(dx, dy) AS (VALUES {offs}),
cand AS (
  SELECT p.id AS pid, o.id AS oid,
         sqrt((p.x - o.x) * (p.x - o.x) + (p.y - o.y) * (p.y - o.y)) AS d
  FROM pts p CROSS JOIN offs m
  JOIN pts o ON o.ix = p.ix + m.dx AND o.iy = p.iy + m.dy
  WHERE o.id <> p.id),
knn AS MATERIALIZED (
  SELECT * FROM (
    SELECT pid, oid, d,
           row_number() OVER (PARTITION BY pid ORDER BY d, oid) AS rank
    FROM cand)
  WHERE rank <= {k}),
kd AS MATERIALIZED (
  SELECT pid, max(d) AS kdist, CAST(count(*) AS BIGINT) AS kn
  FROM knn GROUP BY pid),
reach AS MATERIALIZED (
  SELECT knn.pid, knn.oid, knn.rank,
         greatest(o.kdist, knn.d, {REACH_FLOOR!r}) AS reach
  FROM knn JOIN kd o ON o.pid = knn.oid),
lrd AS MATERIALIZED (
  SELECT s.pid, kd.kn,
         CAST(kd.kn AS DOUBLE) / s.s_reach AS lrd
  FROM (SELECT pid,
               list_reduce(list_prepend(0.0, list(reach ORDER BY rank)),
                           (a, b) -> a + b) AS s_reach
        FROM reach GROUP BY pid) s
  JOIN kd USING (pid))
SELECT s.pid AS id, l.kn AS n_k,
       round(s.s_olrd / CAST(l.kn AS DOUBLE) / l.lrd, 6) AS lof
FROM (SELECT r.pid,
             list_reduce(list_prepend(0.0, list(o.lrd ORDER BY r.rank)),
                         (a, b) -> a + b) AS s_olrd
      FROM reach r JOIN lrd o ON o.pid = r.oid GROUP BY r.pid) s
JOIN lrd l USING (pid)"""
