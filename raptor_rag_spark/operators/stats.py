"""Exact distribution statistics: per-group quantiles by rank selection.

``approx_percentile`` sketches are the usual scale answer, but a corpus
curation report (token-length distribution per language, chunk-size audit,
shard balance) wants EXACT, engine-portable numbers — and exactness is what
makes the DuckDB oracle byte-match. Type-1 (lower) quantile: the value at
sorted position ``(n-1)·q // 100 + 1`` — pure integer arithmetic, identical
in both engines, no interpolation floats.

Scale shape: one rank window per group. Groups are metadata-scale (languages,
shards, hosts), so the per-group sort is the same shuffle any per-group
top-k already pays; for a single global group use a two-level rank (per-
partition counts → offset join) instead. Ties need no tiebreak: the value at
a sorted position is invariant to tie order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """(group, n, v_min, v_max, p<q>…): exact per-group quantiles.

    NULL values are excluded up front: Spark windows order NULLS FIRST while
    DuckDB defaults to NULLS LAST, so leaving them in would shift _rn and
    desync the twins (and quantiles over NULLs are meaningless anyway)."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    cw = Window.partitionBy(group_col)
    r = df.select(group_col, value_col).where(F.col(value_col).isNotNull()).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count("*").over(cw))
    picks = [
        F.max(
            F.when(
                F.col("_rn") == F.expr(f"((_n - 1) * {q}) div 100 + 1"),
                F.col(value_col),
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    return r.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        *picks,
    )


def group_quantiles_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    qs: Sequence[int] = (50, 90, 99),
) -> str:
    """DuckDB twin of :func:`group_quantiles`. ``src_sql`` must yield
    (``group_col``, ``value_col``)."""
    picks = ",\n       ".join(
        f"max(CASE WHEN _rn = ((_n - 1) * {q}) // 100 + 1 THEN {value_col} END) AS p{q}"
        for q in qs
    )
    return f"""
WITH t AS (
  SELECT {group_col}, {value_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS _rn,
         count(*) OVER (PARTITION BY {group_col}) AS _n
  FROM ({src_sql}) WHERE {value_col} IS NOT NULL)
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       min({value_col}) AS v_min, max({value_col}) AS v_max,
       {picks}
FROM t GROUP BY {group_col}
"""


# ---------------------------------------------------------------- Ripley's K

def ripley_k(
    points: DataFrame,
    radii: Sequence[float],
    id_col: str = "vec_id",
    area: float = 1.0,
) -> DataFrame:
    """Ripley's K and L functions at each radius — the classic
    point-pattern clustering-vs-dispersion statistic (K(r) above πr² ⇒
    clustered at scale r; below ⇒ dispersed).

    Naive (no edge-correction) estimator over the unit-square study area:
    K(r) = area · 2·|{i<j : d_ij < r}| / (n·(n−1)), L(r) = sqrt(K/π);
    ``l_minus_r`` > 0 flags clustering. One grid-pruned DWithin self-join at
    max(radii) (operators/pipjoin.py:dwithin_join — the only corpus-sized
    job), then each radius counts from the materialized pair distances;
    n·(n−1) comes from a broadcast 1-row count, no driver action.
    """
    import math

    rmax = max(radii)
    from .pipjoin import dwithin_join

    pairs = dwithin_join(points, rmax, id_col=id_col)
    n_df = points.agg(F.count(F.lit(1)).cast("double").alias("n_pts"))
    radii_df = points.sparkSession.createDataFrame(
        [(float(r),) for r in radii], "r double"
    )
    per_r = (
        pairs.crossJoin(F.broadcast(radii_df))
        .where(F.col("dist") < F.col("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lt"))
    )
    k = (
        F.lit(2.0 * area)
        * F.coalesce(F.col("n_lt"), F.lit(0)).cast("double")
        / (F.col("n_pts") * (F.col("n_pts") - 1.0))
    )
    out = (
        radii_df.join(per_r, "r", "left")
        .crossJoin(F.broadcast(n_df))
        .withColumn("k_est", k)
        .withColumn("l_est", F.sqrt(F.col("k_est") / F.lit(math.pi)))
    )
    return out.select(
        "r",
        F.coalesce("n_lt", F.lit(0)).cast("long").alias("n_pairs"),
        F.round("k_est", 9).alias("k_est"),
        F.round("l_est", 9).alias("l_est"),
        F.round(F.col("l_est") - F.col("r"), 9).alias("l_minus_r"),
    )


def ripley_k_sql(
    pts_sql: str,
    radii: Sequence[float],
    id_col: str = "vec_id",
    area: float = 1.0,
) -> str:
    """DuckDB twin of :func:`ripley_k` (quadratic pair join — the oracle
    formulation the pruned Spark join must match exactly)."""
    import math

    rmax = max(radii)
    rlist = ", ".join(repr(float(r)) for r in radii)
    return f"""
WITH pts AS MATERIALIZED ({pts_sql}),
pairs AS (
  SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
  FROM pts a JOIN pts b ON a.{id_col} < b.{id_col}
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        < {rmax!r} * {rmax!r}
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_pts FROM pts),
radii AS (SELECT CAST(unnest([{rlist}]) AS DOUBLE) AS r),
per_r AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_lt
  FROM radii JOIN pairs ON pairs.dist < radii.r GROUP BY r
),
scored AS (
  SELECT radii.r, coalesce(per_r.n_lt, 0) AS n_pairs,
         {2.0 * area!r} * CAST(coalesce(per_r.n_lt, 0) AS DOUBLE)
           / (n.n_pts * (n.n_pts - 1.0)) AS k_est
  FROM radii LEFT JOIN per_r USING (r), n
)
SELECT r, n_pairs, round(k_est, 9) AS k_est,
       round(sqrt(k_est / {math.pi!r}), 9) AS l_est,
       round(sqrt(k_est / {math.pi!r}) - r, 9) AS l_minus_r
FROM scored
"""


# ------------------------------------------------- Clark-Evans NN index

_CE_SE = 0.26136  # SE constant of the mean NN distance under CSR


def clark_evans(pts: DataFrame, res: int = 6, id_col: str = "vec_id") -> DataFrame:
    """ONE row (n, mean_nn, expected, r_index, z): Clark & Evans (1954)
    nearest-neighbor index over the unit square — THE first-glance
    clustered/random/dispersed verdict (R < 1 clustered, ≈ 1 CSR, → 2.15
    perfectly dispersed). expected = 0.5/√λ, z = (mean−expected)/SE with
    SE = 0.26136/√(n·λ); edge correction omitted (documented — the torus
    term matters below n ≈ 100).

    Scale shape: the per-point NN distance rides the PROVABLY-EXACT grid
    ring search (operators/knn.py: grid_knn, k = 2 self-included — the true
    neighbor is always inside the covering radius), so the all-pairs n²
    the textbook formula implies never materializes; the final reduce is
    one DECIMAL aggregate. The DuckDB oracle IS the brute-force n² twin —
    agreement doubles as a recall proof for the ring search."""
    from .knn import grid_knn

    q = pts.select(F.col(id_col).alias("query_id"), "x", "y")
    nn = (
        grid_knn(pts, q, res=res, k=2, id_col=id_col)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("dist").alias("nn_dist"))
    )
    agg = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.col("nn_dist").cast("decimal(28,15)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_nn"),
    )
    nd = F.col("n").cast("double")
    expected = F.lit(0.5) / F.sqrt(nd)  # λ = n / unit area
    se = F.lit(_CE_SE) / F.sqrt(nd * nd)  # 0.26136 / sqrt(n·λ)
    return agg.select(
        "n",
        F.round("mean_nn", 6).alias("mean_nn"),
        F.round(expected, 6).alias("expected"),
        F.round(F.col("mean_nn") / expected, 6).alias("r_index"),
        F.round((F.col("mean_nn") - expected) / se, 6).alias("z"),
    )


def clark_evans_sql(pts_sql: str, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`clark_evans` — deliberately the brute-force n²
    nearest neighbor (fine at oracle scale), so a hash match certifies the
    Spark side's ring search found the TRUE nearest neighbor for every
    point."""
    return f"""
WITH pts AS ({pts_sql}),
nn AS (
  SELECT a.{id_col} AS query_id,
         round(min(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))), 6)
           AS nn_dist
  FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col}
  GROUP BY 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(nn_dist AS DECIMAL(28,15))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_nn
  FROM nn)
SELECT n, round(mean_nn, 6) AS mean_nn,
       round(0.5 / sqrt(CAST(n AS DOUBLE)), 6) AS expected,
       round(mean_nn / (0.5 / sqrt(CAST(n AS DOUBLE))), 6) AS r_index,
       round((mean_nn - 0.5 / sqrt(CAST(n AS DOUBLE)))
             / ({_CE_SE!r} / sqrt(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS z
FROM agg
"""


# ---------------------------------------------------------------- G-function

_PI = 3.141592653589793


def gfunction(
    pts: DataFrame,
    radii: Sequence[float] = (0.005, 0.01, 0.02, 0.04),
    res: int = 6,
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-neighbor distance ECDF — Diggle's G-function, the
    distributional refinement of :func:`clark_evans` (which only tests the
    MEAN NN distance). Per radius: (r, n_le, g_emp, g_csr) with
    g_emp = P(NN dist ≤ r) and the CSR reference g_csr = 1 − exp(−λπr²)
    (twin exp ⇒ engine-exact); g_emp ≫ g_csr at small r ⇒ clustering.

    Scale shape: per-point NN distance rides the provably-exact grid ring
    search (grid_knn, k=2), so no n² pair join ever materializes; the ECDF
    is one broadcast radii fan-out + groupBy over per-point minima. The
    DuckDB oracle is the brute-force n² twin — agreement doubles as a
    recall proof, same contract as clark_evans."""
    from pyspark.sql import functions as F

    from ..functions import sqlgen as G
    from .knn import grid_knn

    q = pts.select(F.col(id_col).alias("query_id"), "x", "y")
    nn = (
        grid_knn(pts, q, res=res, k=2, id_col=id_col)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("dist").alias("nn_dist"))
    )
    n_row = nn.agg(F.count(F.lit(1)).cast("long").alias("n"))
    radii_df = pts.sparkSession.createDataFrame(
        [(float(r),) for r in radii], "r double"
    )
    per_r = (
        nn.crossJoin(F.broadcast(radii_df))
        .groupBy("r")
        .agg(F.sum((F.col("nn_dist") <= F.col("r")).cast("long")).alias("n_le"))
    )
    z = per_r.crossJoin(F.broadcast(n_row))
    lam_arg = (
        -F.col("n").cast("double") * F.lit(_PI) * (F.col("r") * F.col("r"))
    )
    return z.select(
        "r",
        "n_le",
        F.round(F.col("n_le").cast("double") / F.col("n").cast("double"), 6).alias(
            "g_emp"
        ),
        F.round(F.lit(1.0) - G.exp_col(lam_arg), 6).alias("g_csr"),
    )


def gfunction_sql(
    pts_sql: str,
    radii: Sequence[float] = (0.005, 0.01, 0.02, 0.04),
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`gfunction` — brute-force n² nearest neighbor."""
    from ..functions import sqlgen as G
    from ..functions.hexgen import flit

    rvals = ", ".join(f"({flit(r)})" for r in radii)
    return f"""
WITH pts AS ({pts_sql}),
nn AS (
  SELECT a.{id_col} AS query_id,
         round(min(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))), 6)
           AS nn_dist
  FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col}
  GROUP BY 1),
n_row AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nn),
radii(r) AS (VALUES {rvals}),
per_r AS (
  SELECT r, CAST(coalesce(sum(CASE WHEN nn_dist <= r THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_le
  FROM nn, radii GROUP BY r),
z AS (
  SELECT r, n_le, n,
         -CAST(n AS DOUBLE) * {_PI!r} * (r * r) AS lam_arg
  FROM per_r, n_row)
SELECT r, n_le,
       round(CAST(n_le AS DOUBLE) / CAST(n AS DOUBLE), 6) AS g_emp,
       round(1.0 - {G.exp_sql('lam_arg')}, 6) AS g_csr
FROM z
"""


def jfunction(
    pts: DataFrame,
    radii: Sequence[float] = (0.005, 0.01, 0.02, 0.04),
    res: int = 6,
    grid_n: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """F-function (empty-space) + J-function, completing the G/F/J point-
    process trio. F(r) = P(dist from a REGULAR probe grid point to the
    nearest data point ≤ r); J(r) = (1 − G(r))/(1 − F(r)) — the
    van Lieshout-Baddeley ratio: J < 1 clustered, ≈ 1 CSR, > 1 dispersed,
    with the sampling-intensity dependence of G and F cancelling out.

    Per radius: (r, g_emp, f_emp, csr, j). Probe points are the ``grid_n``²
    cell centers ((i+0.5)/g, (j+0.5)/g) — deterministic, no RNG. Both NN
    passes ride the exact grid ring search; the DuckDB oracle is brute
    force n², so agreement again doubles as a recall proof."""
    from pyspark.sql import functions as F

    from ..functions import sqlgen as G
    from .knn import corpus_cell_counts, grid_knn

    # one cell-counts materialization shared by BOTH ring searches (the
    # r2-audit amortization API — corpus-dependent, query-independent)
    cc = corpus_cell_counts(
        pts.select(
            F.col(id_col).alias("neighbor_id"),
            G.cell_col(F.col("x"), F.col("y"), res).alias("cell_id"),
        )
    )
    # G: nearest data-data neighbor distances
    q_data = pts.select(F.col(id_col).alias("query_id"), "x", "y")
    nn_g = (
        grid_knn(pts, q_data, res=res, k=2, id_col=id_col, cell_counts=cc)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("dist").alias("nn_dist"))
    )
    # F: nearest data neighbor from the probe grid
    g = grid_n
    probes = pts.sparkSession.range(g * g).select(
        F.col("id").alias("query_id"),
        ((F.col("id") / g).cast("long").cast("double") + F.lit(0.5)) / F.lit(float(g)),
        ((F.col("id") % g).cast("double") + F.lit(0.5)) / F.lit(float(g)),
    ).toDF("query_id", "x", "y")
    nn_f = (
        grid_knn(pts, probes, res=res, k=1, id_col=id_col, cell_counts=cc)
        .groupBy("query_id")
        .agg(F.min("dist").alias("nn_dist"))
    )
    n_row = nn_g.agg(F.count(F.lit(1)).cast("long").alias("n"))
    radii_df = pts.sparkSession.createDataFrame(
        [(float(r),) for r in radii], "r double"
    )
    per_g = (
        nn_g.crossJoin(F.broadcast(radii_df))
        .groupBy("r")
        .agg(F.sum((F.col("nn_dist") <= F.col("r")).cast("long")).alias("n_le_g"))
    )
    per_f = (
        nn_f.crossJoin(F.broadcast(radii_df))
        .groupBy("r")
        .agg(F.sum((F.col("nn_dist") <= F.col("r")).cast("long")).alias("n_le_f"))
    )
    z = per_g.join(per_f, "r").crossJoin(F.broadcast(n_row))
    g_emp = F.col("n_le_g").cast("double") / F.col("n").cast("double")
    f_emp = F.col("n_le_f").cast("double") / F.lit(float(g * g))
    lam_arg = -F.col("n").cast("double") * F.lit(_PI) * (F.col("r") * F.col("r"))
    jv = (F.lit(1.0) - g_emp) / (F.lit(1.0) - f_emp)
    return z.select(
        "r",
        F.round(g_emp, 6).alias("g_emp"),
        F.round(f_emp, 6).alias("f_emp"),
        F.round(F.lit(1.0) - G.exp_col(lam_arg), 6).alias("csr"),
        F.round(
            F.when(f_emp < F.lit(1.0), jv).otherwise(F.lit(0.0)), 6
        ).alias("j"),
    )


def jfunction_sql(
    pts_sql: str,
    radii: Sequence[float] = (0.005, 0.01, 0.02, 0.04),
    grid_n: int = 20,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`jfunction` — brute-force n² NN on both sides."""
    from ..functions import sqlgen as G
    from ..functions.hexgen import flit

    g = grid_n
    rvals = ", ".join(f"({flit(r)})" for r in radii)
    return f"""
WITH pts AS ({pts_sql}),
nn_g AS (
  SELECT a.{id_col} AS query_id,
         round(min(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))), 6)
           AS nn_dist
  FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col}
  GROUP BY 1),
probes AS (
  SELECT i AS query_id,
         (CAST(CAST(i // {g} AS BIGINT) AS DOUBLE) + 0.5) / {flit(float(g))} AS x,
         (CAST(i % {g} AS DOUBLE) + 0.5) / {flit(float(g))} AS y
  FROM range({g * g}) t(i)),
nn_f AS (
  SELECT p.query_id,
         round(min(sqrt((p.x - b.x) * (p.x - b.x) + (p.y - b.y) * (p.y - b.y))), 6)
           AS nn_dist
  FROM probes p JOIN pts b ON TRUE
  GROUP BY 1),
n_row AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nn_g),
radii(r) AS (VALUES {rvals}),
per_g AS (
  SELECT r, CAST(coalesce(sum(CASE WHEN nn_dist <= r THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_le_g
  FROM nn_g, radii GROUP BY r),
per_f AS (
  SELECT r, CAST(coalesce(sum(CASE WHEN nn_dist <= r THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_le_f
  FROM nn_f, radii GROUP BY r),
z AS (
  SELECT per_g.r, n_le_g, n_le_f, n,
         CAST(n_le_g AS DOUBLE) / CAST(n AS DOUBLE) AS g_emp,
         CAST(n_le_f AS DOUBLE) / {flit(float(g * g))} AS f_emp,
         -CAST(n AS DOUBLE) * {_PI!r} * (per_g.r * per_g.r) AS lam_arg
  FROM per_g JOIN per_f ON per_g.r = per_f.r, n_row)
SELECT r, round(g_emp, 6) AS g_emp, round(f_emp, 6) AS f_emp,
       round(1.0 - {G.exp_sql('lam_arg')}, 6) AS csr,
       round(CASE WHEN f_emp < 1.0 THEN (1.0 - g_emp) / (1.0 - f_emp)
                  ELSE 0.0 END, 6) AS j
FROM z
"""


def colocation_quotient(
    pts: DataFrame,
    res: int = 6,
    id_col: str = "vec_id",
    cat_col: str = "cat",
) -> DataFrame:
    """Colocation quotient CLQ(A→B) (Leslie & Kronenfeld 2011): of the
    points in category A, what fraction have their nearest neighbor in
    category B, relative to B's global share?

        CLQ(A→B) = (C_{A→B} / N_A) / (N_B' / (N−1))

    with N_B' = N_B − 1 when A = B (a point cannot be its own neighbor).
    CLQ > 1: A points sit disproportionately next to B — the categorical
    colocation matrix (which languages/types cluster next to which).

    Returns one row per ordered (cat_a, cat_b) pair with ≥1 NN link:
    (cat_a, cat_b, n_a, n_b, c_ab, clq). The NN search rides the exact
    grid ring search (k=2, self excluded); everything after is a
    category-pair groupBy over metadata."""
    from pyspark.sql import functions as F

    from .knn import grid_knn

    base = pts.select(F.col(id_col).alias("pid"), "x", "y", F.col(cat_col).alias("cat"))
    q = base.select(F.col("pid").alias("query_id"), "x", "y")
    nn = (
        grid_knn(base.select(F.col("pid").alias(id_col), "x", "y"), q, res=res, k=2,
                 id_col=id_col)
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    nn1 = nn.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    cats = base.select("pid", "cat")
    links = (
        nn1.join(cats.withColumnRenamed("pid", "query_id").withColumnRenamed("cat", "cat_a"),
                 "query_id")
        .join(cats.withColumnRenamed("pid", "neighbor_id").withColumnRenamed("cat", "cat_b"),
              "neighbor_id")
    )
    counts = links.groupBy("cat_a", "cat_b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    sizes = cats.groupBy("cat").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_row = cats.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    z = (
        counts.join(F.broadcast(sizes.select(F.col("cat").alias("cat_a"), F.col("n").alias("n_a"))), "cat_a")
        .join(F.broadcast(sizes.select(F.col("cat").alias("cat_b"), F.col("n").alias("n_b"))), "cat_b")
        .crossJoin(F.broadcast(n_row))
    )
    nb_eff = F.when(F.col("cat_a") == F.col("cat_b"), F.col("n_b") - 1).otherwise(
        F.col("n_b")
    ).cast("double")
    clq = (F.col("c_ab").cast("double") / F.col("n_a").cast("double")) / (
        nb_eff / (F.col("n_tot") - F.lit(1)).cast("double")
    )
    return z.select(
        "cat_a", "cat_b", "n_a", "n_b", "c_ab", F.round(clq, 6).alias("clq")
    )


def colocation_quotient_sql(
    pts_sql: str, id_col: str = "vec_id", cat_col: str = "cat"
) -> str:
    """DuckDB twin of :func:`colocation_quotient` — brute-force n² nearest
    neighbor with the identical (dist, neighbor_id) tiebreak."""
    return f"""
WITH pts AS ({pts_sql}),
nn AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.{id_col} AS query_id, b.{id_col} AS neighbor_id,
           row_number() OVER (
             PARTITION BY a.{id_col}
             ORDER BY round(sqrt((a.x - b.x) * (a.x - b.x)
                                 + (a.y - b.y) * (a.y - b.y)), 6), b.{id_col})
             AS _rn
    FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col})
  WHERE _rn = 1),
links AS (
  SELECT ca.{cat_col} AS cat_a, cb.{cat_col} AS cat_b
  FROM nn JOIN pts ca ON nn.query_id = ca.{id_col}
  JOIN pts cb ON nn.neighbor_id = cb.{id_col}),
counts AS (
  SELECT cat_a, cat_b, CAST(count(*) AS BIGINT) AS c_ab
  FROM links GROUP BY cat_a, cat_b),
sizes AS (SELECT {cat_col} AS cat, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1),
n_row AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM pts)
SELECT c.cat_a, c.cat_b, sa.n AS n_a, sb.n AS n_b, c.c_ab,
       round((CAST(c.c_ab AS DOUBLE) / CAST(sa.n AS DOUBLE))
             / (CAST(CASE WHEN c.cat_a = c.cat_b THEN sb.n - 1 ELSE sb.n END AS DOUBLE)
                / CAST(n_tot - 1 AS DOUBLE)), 6) AS clq
FROM counts c
JOIN sizes sa ON c.cat_a = sa.cat
JOIN sizes sb ON c.cat_b = sb.cat, n_row
"""


def kneedle_eps(
    pts: DataFrame,
    k: int = 5,
    res: int = 6,
    id_col: str = "vec_id",
    buckets_bits: int = 8,
) -> DataFrame:
    """ONE row (n, kdist_min, kdist_max, knee_rank, eps, knee_gap): the
    Kneedle knee of the sorted k-distance curve — the standard recipe for
    choosing DBSCAN's eps (Ester et al. suggest eyeballing the k-dist
    plot; Satopää's Kneedle automates it): sort every point's distance to
    its k-th neighbor descending, normalize both axes to [0,1], and take
    the point furthest above the descending diagonal
    (max d = y_norm + x_norm − 1). eps = the k-distance at the knee — the
    engine derives grid_dbscan's hyperparameter from its own exact kNN.

    Scale shape: k-distances ride the exact grid ring search; the global
    ordering of the curve uses the two-level value-bucket prefix sum
    (quality_rank's trick — NO global sort); the knee pick is one max
    over an arg-max window on bucketed metadata plus a 1-row reduce."""
    from pyspark.sql import functions as F

    from ..functions import sqlgen as G
    from .knn import grid_knn

    q = pts.select(F.col(id_col).alias("query_id"), "x", "y")
    # k-th non-self distance by RANK pick (not max over the remainder):
    # exact even when duplicate coordinates push the self row out of the
    # top-(k+1) — mirrors the oracle's rank-k semantics bit for bit
    w_k = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    kd = (
        grid_knn(pts, q, res=res, k=k + 1, id_col=id_col)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_rk", F.row_number().over(w_k))
        .where(F.col("_rk") == k)
        .select("query_id", F.col("dist").alias("kdist"))
    ).localCheckpoint(eager=False)
    nb = 1 << buckets_bits
    sq2 = 1.4142135623730951
    vb = F.least(
        F.floor(F.col("kdist") / F.lit(sq2) * F.lit(float(nb))).cast("long"),
        F.lit(nb - 1),
    )
    base = kd.withColumn("vb", vb)
    w_in = Window.partitionBy("vb").orderBy(F.desc("kdist"), "query_id")
    within = base.withColumn("rn_in", F.row_number().over(w_in).cast("long"))
    totals = base.groupBy("vb").agg(F.count("*").alias("tot"))
    w_off = Window.orderBy(F.desc("vb")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn("off", F.sum("tot").over(w_off) - F.col("tot")).select(
        "vb", "off"
    )
    g = kd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("kdist").alias("k_min"),
        F.max("kdist").alias("k_max"),
    )
    ranked = (
        within.join(F.broadcast(offsets), "vb")
        .crossJoin(F.broadcast(g))
        .select(
            "kdist",
            "n",
            "k_min",
            "k_max",
            (F.col("off") + F.col("rn_in")).alias("rnk"),
        )
    )
    x_n = (F.col("rnk") - 1).cast("double") / (F.col("n") - 1).cast("double")
    y_n = (F.col("kdist") - F.col("k_min")) / (F.col("k_max") - F.col("k_min"))
    scored = ranked.select(
        "kdist", "n", "k_min", "k_max", "rnk",
        (y_n + x_n - F.lit(1.0)).alias("d"),
    )
    wk = Window.orderBy(F.desc("d"), "rnk")
    return (
        scored.withColumn("_r", F.row_number().over(wk))
        .where(F.col("_r") == 1)
        .select(
            "n",
            F.round("k_min", 6).alias("kdist_min"),
            F.round("k_max", 6).alias("kdist_max"),
            F.col("rnk").alias("knee_rank"),
            F.round("kdist", 6).alias("eps"),
            F.round("d", 6).alias("knee_gap"),
        )
    )


def kneedle_eps_sql(
    pts_sql: str, k: int = 5, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`kneedle_eps` — brute-force n² k-distances and
    a plain global sort; agreement proves both the ring search's recall
    AND the two-level rank reconstruction."""
    return f"""
WITH pts AS ({pts_sql}),
kd AS (
  SELECT query_id, max(dist) AS kdist FROM (
    SELECT a.{id_col} AS query_id,
           round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
             AS dist,
           row_number() OVER (
             PARTITION BY a.{id_col}
             ORDER BY round(sqrt((a.x - b.x) * (a.x - b.x)
                                 + (a.y - b.y) * (a.y - b.y)), 6), b.{id_col})
             AS _rn
    FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col})
  WHERE _rn <= {k} GROUP BY query_id),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, min(kdist) AS k_min, max(kdist) AS k_max
  FROM kd),
ranked AS (
  SELECT kdist, n, k_min, k_max,
         CAST(row_number() OVER (ORDER BY kdist DESC, query_id) AS BIGINT) AS rnk
  FROM kd, g),
scored AS (
  SELECT kdist, n, k_min, k_max, rnk,
         ((kdist - k_min) / (k_max - k_min)
          + CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) - 1.0) AS d
  FROM ranked)
SELECT n, round(k_min, 6) AS kdist_min, round(k_max, 6) AS kdist_max,
       rnk AS knee_rank, round(kdist, 6) AS eps, round(d, 6) AS knee_gap
FROM scored QUALIFY row_number() OVER (ORDER BY d DESC, rnk) = 1
"""


def kaplan_meier(
    events: DataFrame,
    horizon_ts: str | None = None,
    censor_margin_s: int = 86400,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier survival curve of entity activity lifetimes: per
    entity, duration = last event − first event (seconds); an entity whose
    last event falls within ``censor_margin_s`` of the observation horizon
    (default: the global max timestamp) is right-CENSORED — still alive
    when the study ended. Output one row per distinct death time t:
    (t, n_risk, n_events, s_hat) with Ŝ(t) = Π_{t_i ≤ t}(1 − d_i/n_i),
    the product realized as exp(Σ ln(1−d/n)) via the bit-exact twin
    exp/ln so both engines agree to the rounding digit.

    Scale shape: one groupBy per entity → duration metadata; the curve
    itself is a cumulative window over DISTINCT death times (study-bounded
    metadata). The crawl analytics use: how long does a host/user stay
    active before going dark, with proper censoring instead of survivor
    bias."""
    from ..functions import sqlgen as G

    t = F.unix_timestamp(ts_col).cast("long")
    spans = events.groupBy(id_col).agg(
        F.min(t).alias("t0"), F.max(t).alias("t1")
    )
    if horizon_ts is None:
        hor = events.agg(F.max(t).alias("hor"))
        spans = spans.crossJoin(F.broadcast(hor))
    else:
        spans = spans.withColumn(
            "hor", F.unix_timestamp(F.lit(horizon_ts)).cast("long")
        )
    obs = spans.select(
        (F.col("t1") - F.col("t0")).alias("dur"),
        (F.col("t1") < F.col("hor") - F.lit(censor_margin_s)).alias("died"),
    )
    n_total = obs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    deaths = obs.where(F.col("died")).groupBy(F.col("dur").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    # entities (censored or not) still at risk at t: dur >= t. Computed
    # declaratively: n_risk(t) = n_total - (# with dur < t) via a cumulative
    # count over the distinct-duration metadata, never a per-entity scan per t.
    all_durs = obs.groupBy(F.col("dur").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("c_at")
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = all_durs.withColumn(
        "before", F.coalesce(F.sum("c_at").over(wcum), F.lit(0)).cast("long")
    )
    j = deaths.join(risk.select("t", "before"), "t").crossJoin(F.broadcast(n_total))
    staged = j.select(
        "t",
        (F.col("n_total") - F.col("before")).alias("n_risk"),
        "n_events",
    ).withColumn(
        "lnterm",
        G.ln_col(
            F.lit(1.0)
            - F.col("n_events").cast("double") / F.col("n_risk").cast("double")
        ),
    )
    wprod = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s_hat = G.exp_col(F.sum(F.col("lnterm").cast("decimal(28,15)")).over(wprod).cast("double"))
    return staged.select(
        "t", "n_risk", "n_events", F.round(s_hat, 6).alias("s_hat")
    ).where(F.col("n_risk") > F.col("n_events"))


def kaplan_meier_sql(
    events_sql: str, censor_margin_s: int = 86400, id_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`kaplan_meier` (default horizon = max ts)."""
    from ..functions import sqlgen as G

    return f"""
WITH ev AS ({events_sql}),
spans AS (
  SELECT {id_col},
         CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS t1
  FROM ev GROUP BY {id_col}),
hor AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS hor FROM ev),
obs AS (
  SELECT t1 - t0 AS dur, t1 < (SELECT hor FROM hor) - {censor_margin_s} AS died
  FROM spans),
n_total AS (SELECT count(*)::BIGINT AS n_total FROM obs),
deaths AS (
  SELECT dur AS t, count(*)::BIGINT AS n_events FROM obs WHERE died GROUP BY dur),
all_durs AS (SELECT dur AS t, count(*)::BIGINT AS c_at FROM obs GROUP BY dur),
risk AS (
  SELECT t, coalesce(sum(c_at) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS before
  FROM all_durs),
staged AS (
  SELECT d.t, (n.n_total - r.before)::BIGINT AS n_risk, d.n_events,
         {G.ln_sql("(1.0 - CAST(d.n_events AS DOUBLE) / CAST(n.n_total - r.before AS DOUBLE))")} AS lnterm
  FROM deaths d JOIN risk r ON r.t = d.t CROSS JOIN n_total n),
cumln AS (
  SELECT t, n_risk, n_events,
         CAST(sum(CAST(lnterm AS DECIMAL(28,15)))
              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS lsum
  FROM staged),
curve AS (
  SELECT t, n_risk, n_events, {G.exp_sql("lsum")} AS s_hat FROM cumln)
SELECT t, n_risk, n_events, round(s_hat, 6) AS s_hat
FROM curve WHERE n_risk > n_events
"""


def eb_shrink_rates(
    events: DataFrame,
    id_col: str = "user_id",
    flag: str = "event_type = 'error'",
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-entity event rates:
    raw rates x/n for small-n entities are noise; fit a Beta(α, β) prior
    across entities by method of moments (μ, σ² of raw rates ⇒
    α+β = μ(1−μ)/σ² − 1), then report the posterior mean
    (x+α)/(n+α+β) — small-n entities shrink toward the corpus rate,
    large-n entities keep their evidence. THE ranking-by-rate fix
    (error-rate leaderboards, host quality rates) every monitoring
    pipeline needs.

    Output per entity: (id, n, x, raw_rate, shrunk_rate, alpha, beta).
    Degenerate prior (σ² ≥ μ(1−μ), no overdispersion to fit) falls back
    to α = β = 1 (uniform), identically in the twin.

    Scale shape: one groupBy to entity metadata; the prior is a 1-row
    DECIMAL-moment aggregate broadcast back. No iteration."""
    from ..functions import sqlgen as G  # noqa: F401  (twin symmetry)

    DECs = "decimal(28,15)"
    per = events.groupBy(F.col(id_col).alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.expr(flag), 1).otherwise(0)).cast("long").alias("x"),
    ).withColumn("raw_rate", F.col("x").cast("double") / F.col("n").cast("double"))
    mom = per.agg(
        (
            F.sum(F.col("raw_rate").cast(DECs)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu"),
        (
            F.sum((F.col("raw_rate") * F.col("raw_rate")).cast(DECs)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m2"),
    )
    var = F.col("m2") - F.col("mu") * F.col("mu")
    k = F.col("mu") * (F.lit(1.0) - F.col("mu")) / var - F.lit(1.0)
    ok = (var > 0) & (var < F.col("mu") * (F.lit(1.0) - F.col("mu"))) & (k > 0)
    prior = mom.select(
        F.when(ok, F.col("mu") * k).otherwise(F.lit(1.0)).alias("alpha"),
        F.when(ok, (F.lit(1.0) - F.col("mu")) * k).otherwise(F.lit(1.0)).alias("beta"),
    )
    j = per.crossJoin(F.broadcast(prior))
    shrunk = (F.col("x").cast("double") + F.col("alpha")) / (
        F.col("n").cast("double") + F.col("alpha") + F.col("beta")
    )
    return j.select(
        "id",
        "n",
        "x",
        F.round("raw_rate", 6).alias("raw_rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
    )


def eb_shrink_rates_sql(
    events_sql: str, id_col: str = "user_id", flag: str = "event_type = 'error'"
) -> str:
    """DuckDB twin of :func:`eb_shrink_rates`."""
    DECs = "DECIMAL(28,15)"
    return f"""
WITH per AS (
  SELECT {id_col} AS id, count(*)::BIGINT AS n,
         CAST(sum(CASE WHEN {flag} THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM ({events_sql}) GROUP BY 1),
rated AS (
  SELECT id, n, x, CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate FROM per),
mom AS (
  SELECT CAST(sum(CAST(raw_rate AS {DECs})) AS DOUBLE) / count(*) AS mu,
         CAST(sum(CAST(raw_rate * raw_rate AS {DECs})) AS DOUBLE) / count(*) AS m2
  FROM rated),
prior AS (
  SELECT CASE WHEN ok THEN mu * k ELSE 1.0 END AS alpha,
         CASE WHEN ok THEN (1.0 - mu) * k ELSE 1.0 END AS beta
  FROM (
    SELECT mu, m2,
           mu * (1.0 - mu) / (m2 - mu * mu) - 1.0 AS k,
           (m2 - mu * mu) > 0 AND (m2 - mu * mu) < mu * (1.0 - mu)
             AND (mu * (1.0 - mu) / (m2 - mu * mu) - 1.0) > 0 AS ok
    FROM mom))
SELECT r.id, r.n, r.x, round(r.raw_rate, 6) AS raw_rate,
       round((CAST(r.x AS DOUBLE) + p.alpha)
             / (CAST(r.n AS DOUBLE) + p.alpha + p.beta), 6) AS shrunk_rate,
       round(p.alpha, 6) AS alpha, round(p.beta, 6) AS beta
FROM rated r CROSS JOIN prior p
"""


def ks_two_sample(
    a: DataFrame, b: DataFrame, value_col: str
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two value
    distributions: D = max over observed values of |F_a − F_b|, with the
    ECDFs evaluated at every distinct value of the pooled sample. One row:
    (n_a, n_b, d_stat, c_alpha) where c_alpha = D·sqrt(n_a·n_b/(n_a+n_b))
    — compare against 1.358 for the 5% level. The distribution-shift gate
    between two crawls/sources that PSI's fixed bins can blur.

    Scale shape: both sides reduce to (value → count) tables (one groupBy
    each, vocabulary/value-cardinality); the ECDF gap is a cumulative
    window over the POOLED DISTINCT values — value metadata, never rows.
    Integer cumulative counts ⇒ the max gap is exact."""
    ca = a.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("na_v")
    )
    cb = b.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("nb_v")
    )
    pooled = ca.join(cb, "v", "full_outer").select(
        "v",
        F.coalesce("na_v", F.lit(0)).alias("na_v"),
        F.coalesce("nb_v", F.lit(0)).alias("nb_v"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pooled.select(
        "v",
        F.sum("na_v").over(wcum).cast("long").alias("ca"),
        F.sum("nb_v").over(wcum).cast("long").alias("cb"),
    )
    tot = pooled.agg(
        F.sum("na_v").cast("long").alias("n_a"), F.sum("nb_v").cast("long").alias("n_b")
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("ca").cast("double") / F.col("n_a").cast("double")
            - F.col("cb").cast("double") / F.col("n_b").cast("double")
        ).alias("gap"),
    )
    out = gaps.groupBy("n_a", "n_b").agg(F.max("gap").alias("d_stat"))
    scale = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return out.select(
        "n_a",
        "n_b",
        F.round("d_stat", 6).alias("d_stat"),
        F.round(F.col("d_stat") * scale, 6).alias("c_alpha"),
    )


def ks_two_sample_sql(a_sql: str, b_sql: str, value_col: str) -> str:
    """DuckDB twin of :func:`ks_two_sample`."""
    return f"""
WITH ca AS (SELECT {value_col} AS v, count(*)::BIGINT AS na_v
            FROM ({a_sql}) GROUP BY 1),
cb AS (SELECT {value_col} AS v, count(*)::BIGINT AS nb_v
       FROM ({b_sql}) GROUP BY 1),
pooled AS (
  SELECT coalesce(ca.v, cb.v) AS v,
         coalesce(na_v, 0) AS na_v, coalesce(nb_v, 0) AS nb_v
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
cum AS (
  SELECT v,
         CAST(sum(na_v) OVER w AS BIGINT) AS ca,
         CAST(sum(nb_v) OVER w AS BIGINT) AS cb
  FROM pooled
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (SELECT CAST(sum(na_v) AS BIGINT) AS n_a, CAST(sum(nb_v) AS BIGINT) AS n_b
        FROM pooled),
gaps AS (
  SELECT t.n_a, t.n_b,
         abs(CAST(c.ca AS DOUBLE) / CAST(t.n_a AS DOUBLE)
             - CAST(c.cb AS DOUBLE) / CAST(t.n_b AS DOUBLE)) AS gap
  FROM cum c CROSS JOIN tot t),
agg AS (SELECT n_a, n_b, max(gap) AS d_stat FROM gaps GROUP BY n_a, n_b)
SELECT n_a, n_b, round(d_stat, 6) AS d_stat,
       round(d_stat * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE)), 6) AS c_alpha
FROM agg
"""


def mann_whitney_u(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between two samples, with
    midrank tie handling and the tie-corrected normal approximation. One
    row: (n_a, n_b, u_stat, z) — the nonparametric "is distribution A
    stochastically larger" companion to the KS max-gap test.

    Exactness: U computed from the closed form over pooled DISTINCT-value
    counts — U_a = Σ_v a_v·(cb_below_v + b_v/2) where cb_below is B's
    cumulative count strictly below v — all integer/half-integer
    arithmetic (×2 staging keeps it integer), so no rank window over rows
    and no float-order hazard. The tie-correction term uses the same
    pooled counts. Scale shape: two value-cardinality groupBys + one
    distinct-value cumulative window."""
    from ..functions import sqlgen as G  # noqa: F401  (twin symmetry)

    ca = a.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("av")
    )
    cb = b.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("bv")
    )
    pooled = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("av", F.lit(0)).alias("av"),
            F.coalesce("bv", F.lit(0)).alias("bv"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    staged = pooled.withColumn(
        "cb_below", F.coalesce(F.sum("bv").over(wcum), F.lit(0)).cast("long")
    )
    # 2·U_a stays integer: Σ av·(2·cb_below + bv)
    sums = staged.agg(
        F.sum("av").cast("long").alias("n_a"),
        F.sum("bv").cast("long").alias("n_b"),
        F.sum(F.col("av") * (2 * F.col("cb_below") + F.col("bv")))
        .cast("long")
        .alias("u2"),
        F.sum(
            (F.col("av") + F.col("bv"))
            * (F.col("av") + F.col("bv"))
            * (F.col("av") + F.col("bv"))
            - (F.col("av") + F.col("bv"))
        )
        .cast("long")
        .alias("tie_term"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u = F.col("u2").cast("double") / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    var = (na * nb / F.lit(12.0)) * (
        (n + F.lit(1.0)) - F.col("tie_term").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = F.when(var > 0, (u - mu) / F.sqrt(var)).otherwise(F.lit(0.0))
    return sums.select(
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z"),
    )


def mann_whitney_u_sql(a_sql: str, b_sql: str, value_col: str) -> str:
    """DuckDB twin of :func:`mann_whitney_u`."""
    return f"""
WITH ca AS (SELECT {value_col} AS v, count(*)::BIGINT AS av FROM ({a_sql}) GROUP BY 1),
cb AS (SELECT {value_col} AS v, count(*)::BIGINT AS bv FROM ({b_sql}) GROUP BY 1),
pooled AS (
  SELECT coalesce(ca.v, cb.v) AS v, coalesce(av, 0) AS av, coalesce(bv, 0) AS bv
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
staged AS (
  SELECT v, av, bv,
         coalesce(sum(bv) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cb_below
  FROM pooled),
sums AS (
  SELECT CAST(sum(av) AS BIGINT) AS n_a, CAST(sum(bv) AS BIGINT) AS n_b,
         CAST(sum(av * (2 * cb_below + bv)) AS BIGINT) AS u2,
         CAST(sum((av + bv) * (av + bv) * (av + bv) - (av + bv)) AS BIGINT) AS tie_term
  FROM staged)
SELECT n_a, n_b,
       round(CAST(u2 AS DOUBLE) / 2.0, 6) AS u_stat,
       round(CASE WHEN (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                       * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                          - CAST(tie_term AS DOUBLE)
                            / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0
             THEN (CAST(u2 AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                  / sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                         * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                            - CAST(tie_term AS DOUBLE)
                              / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
             ELSE 0.0 END, 6) AS z
FROM sums
"""


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact Spearman rank correlation with midrank tie handling between
    two per-row metrics: ranks come from the distinct-value cumulative
    reconstruction (midrank(v) = count_below(v) + (count_at(v)+1)/2 —
    value-cardinality metadata, never a global row sort), then Pearson on
    the midranks with DECIMAL moment sums. One row: (n, rho). The monotone
    -association companion to Pearson that quality/readability/rate
    metrics need (outlier-robust, scale-free).

    ×2 staging keeps midranks half-integer-exact: rank2 = 2·count_below +
    count_at + 1 is an integer; all moments accumulate on rank2 and the
    ×2 factors cancel in rho."""
    vals = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y")).localCheckpoint(
        eager=False
    )  # consumed by two rank maps + the moment pass

    def midrank2(col):
        c = vals.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("n_v")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return c.select(
            "v",
            (
                2 * F.coalesce(F.sum("n_v").over(w), F.lit(0)) + F.col("n_v") + 1
            ).cast("long").alias("r2"),
        )
    rx = midrank2("x").withColumnRenamed("v", "x").withColumnRenamed("r2", "rx2")
    ry = midrank2("y").withColumnRenamed("v", "y").withColumnRenamed("r2", "ry2")
    ranked = vals.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    DECs = "decimal(28,15)"
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("rx2").cast(DECs)).cast("double").alias("sx"),
        F.sum(F.col("ry2").cast(DECs)).cast("double").alias("sy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(DECs)).cast("double").alias("sxy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(DECs)).cast("double").alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(DECs)).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6).alias("rho"),
    )


def spearman_corr_sql(src_sql: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`spearman_corr`."""
    DECs = "DECIMAL(28,15)"
    return f"""
WITH vals AS MATERIALIZED (
  SELECT {x_col} AS x, {y_col} AS y FROM ({src_sql})),
rx AS (
  SELECT v AS x,
         (2 * coalesce(sum(n_v) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + n_v + 1)::BIGINT AS rx2
  FROM (SELECT x AS v, count(*)::BIGINT AS n_v FROM vals GROUP BY x)),
ry AS (
  SELECT v AS y,
         (2 * coalesce(sum(n_v) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + n_v + 1)::BIGINT AS ry2
  FROM (SELECT y AS v, count(*)::BIGINT AS n_v FROM vals GROUP BY y)),
ranked AS (
  SELECT v.x, v.y, rx.rx2, ry.ry2
  FROM vals v JOIN rx ON rx.x = v.x JOIN ry ON ry.y = v.y),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(rx2 AS {DECs})) AS DOUBLE) AS sx,
         CAST(sum(CAST(ry2 AS {DECs})) AS DOUBLE) AS sy,
         CAST(sum(CAST(rx2 * ry2 AS {DECs})) AS DOUBLE) AS sxy,
         CAST(sum(CAST(rx2 * rx2 AS {DECs})) AS DOUBLE) AS sxx,
         CAST(sum(CAST(ry2 * ry2 AS {DECs})) AS DOUBLE) AS syy
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n,
       round(CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
                  THEN (n * sxy - sx * sy)
                       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                  ELSE 0.0 END, 6) AS rho
FROM m
"""
