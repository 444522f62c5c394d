"""Point-pattern statistics: join counts, quadrat CSR test, radius of gyration.

Three classical tests the spatial-stats family (kde_moran / kde_geary /
getis_ord / ripley_k / clark_evans) still lacked:

- :func:`join_counts` — Cliff-Ord join-count statistics for a BINARY mark
  (the categorical sibling of Moran's I): count Black-Black / White-White /
  Black-White rook-adjacent cell pairs and compare with the nonfree-sampling
  CSR expectation E[BB] = J·n_B(n_B−1)/(n(n−1)). BB ≫ E[BB] ⇒ the marked
  class clusters spatially (e.g. spam pages concentrating in embedding
  tiles).
- :func:`quadrat_test` — the quadrat-count chi-square test of complete
  spatial randomness: partition the study square into ALL 4^res quadrats
  (empty ones included — that is what distinguishes it from the sparse-
  raster stats), χ² = Σ(c_i − λ)²/λ with λ = N/m; the variance-mean ratio
  VMR = χ²/(m−1) reads >1 clustered, <1 dispersed.
- :func:`radius_gyration` — per-entity mobility summary (González et al.
  2008): centroid, r_g = √(Σ‖p−c‖²/n), plus the visit-location Shannon
  entropy over grid cells (twin ln ⇒ engine-exact).

Scale shape: join_counts and quadrat_test reduce the corpus with ONE
groupBy to ≤ 4^res cell rows and run everything after on that metadata
(quadrat_test folds the empty quadrats into the closed form
Σ(c−λ)² = Σc² − N²/m, so the full grid is never even generated).
radius_gyration is two groupBys per entity
(moments, then cell-visit entropy) with DECIMAL(28,15) sums so every float
is partition-order independent. No windows over the corpus, no self-joins
over points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.grid import COORD_BITS

DEC = "decimal(28,15)"
_MASK = (1 << COORD_BITS) - 1


# ------------------------------------------------------------- join counts


def join_counts(pts: DataFrame, res: int = 4) -> DataFrame:
    """pts: (x, y, mark BOOLEAN). ONE row:
    (n_cells, n_b, n_w, j_tot, bb, ww, bw, e_bb, e_bw, bb_ratio, bw_ratio).

    Cell color: Black iff marked points are at least half the cell's points
    (2·Σmark ≥ n — pure integer, no float threshold). Adjacency: rook
    (4-neighbor) edges between POPULATED cells, each counted once via the
    east/south probe. CSR expectations use nonfree sampling on the observed
    (n_B, n_W) over the realized edge set J."""
    cells = (
        pts.select(
            G.cell_col(F.col("x"), F.col("y"), res).alias("cell"),
            F.col("mark").cast("long").alias("m"),
        )
        .groupBy("cell")
        .agg(F.sum("m").alias("nm"), F.count(F.lit(1)).alias("nt"))
        .select(
            F.shiftrightunsigned(F.col("cell"), COORD_BITS)
            .bitwiseAND(F.lit(_MASK))
            .alias("ix"),
            F.col("cell").bitwiseAND(F.lit(_MASK)).alias("iy"),
            (F.col("nm") * 2 >= F.col("nt")).alias("black"),
        )
    ).localCheckpoint(eager=False)  # metadata; probes + edge join + cell_agg
    # east + south probes: each undirected rook edge appears exactly once
    probes = cells.select(
        "ix", "iy", F.col("black").alias("b1"),
        F.explode(
            F.array(
                F.struct((F.col("ix") + 1).alias("tx"), F.col("iy").alias("ty")),
                F.struct(F.col("ix").alias("tx"), (F.col("iy") + 1).alias("ty")),
            )
        ).alias("t"),
    ).select("b1", F.col("t.tx").alias("tx"), F.col("t.ty").alias("ty"))
    edges = probes.join(
        cells.select(
            F.col("ix").alias("tx"), F.col("iy").alias("ty"), F.col("black").alias("b2")
        ),
        ["tx", "ty"],
    )
    edge_agg = edges.agg(
        F.count(F.lit(1)).alias("j_tot"),
        F.sum((F.col("b1") & F.col("b2")).cast("long")).alias("bb"),
        F.sum(((~F.col("b1")) & (~F.col("b2"))).cast("long")).alias("ww"),
        F.sum((F.col("b1") != F.col("b2")).cast("long")).alias("bw"),
    )
    cell_agg = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("black").cast("long")).alias("n_b"),
    )
    z = cell_agg.crossJoin(F.broadcast(edge_agg))
    n = F.col("n_cells").cast("double")
    nb = F.col("n_b").cast("double")
    nw = (F.col("n_cells") - F.col("n_b")).cast("double")
    j = F.col("j_tot").cast("double")
    e_bb = j * nb * (nb - F.lit(1.0)) / (n * (n - F.lit(1.0)))
    e_bw = j * F.lit(2.0) * nb * nw / (n * (n - F.lit(1.0)))
    return z.select(
        "n_cells",
        "n_b",
        (F.col("n_cells") - F.col("n_b")).alias("n_w"),
        "j_tot",
        "bb",
        "ww",
        "bw",
        F.round(e_bb, 6).alias("e_bb"),
        F.round(e_bw, 6).alias("e_bw"),
        F.round(F.col("bb").cast("double") / e_bb, 6).alias("bb_ratio"),
        F.round(F.col("bw").cast("double") / e_bw, 6).alias("bw_ratio"),
    )


def join_counts_sql(pts_sql: str, res: int = 4) -> str:
    """DuckDB twin of :func:`join_counts`. ``pts_sql`` yields (x, y, mark)."""
    return f"""
WITH p AS ({pts_sql}),
cells AS (
  SELECT ({G.cell_sql('x', 'y', res)} >> {COORD_BITS}) & {_MASK} AS ix,
         {G.cell_sql('x', 'y', res)} & {_MASK} AS iy,
         (2 * sum(CASE WHEN mark THEN 1 ELSE 0 END) >= count(*)) AS black
  FROM p GROUP BY 1, 2),
probes AS (
  SELECT black AS b1, ix + dx AS tx, iy + dy AS ty
  FROM cells, (VALUES (1, 0), (0, 1)) o(dx, dy)),
edges AS (
  SELECT p.b1, c.black AS b2
  FROM probes p JOIN cells c ON p.tx = c.ix AND p.ty = c.iy),
edge_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS j_tot,
         CAST(coalesce(sum(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS bb,
         CAST(coalesce(sum(CASE WHEN NOT b1 AND NOT b2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS ww,
         CAST(coalesce(sum(CASE WHEN b1 <> b2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS bw
  FROM edges),
cell_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(CASE WHEN black THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM cells)
SELECT n_cells, n_b, n_cells - n_b AS n_w, j_tot, bb, ww, bw,
       round(CAST(j_tot AS DOUBLE) * CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)
             / (CAST(n_cells AS DOUBLE) * (CAST(n_cells AS DOUBLE) - 1.0)), 6) AS e_bb,
       round(CAST(j_tot AS DOUBLE) * 2.0 * CAST(n_b AS DOUBLE)
             * CAST(n_cells - n_b AS DOUBLE)
             / (CAST(n_cells AS DOUBLE) * (CAST(n_cells AS DOUBLE) - 1.0)), 6) AS e_bw,
       round(CAST(bb AS DOUBLE)
             / (CAST(j_tot AS DOUBLE) * CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)
                / (CAST(n_cells AS DOUBLE) * (CAST(n_cells AS DOUBLE) - 1.0))), 6) AS bb_ratio,
       round(CAST(bw AS DOUBLE)
             / (CAST(j_tot AS DOUBLE) * 2.0 * CAST(n_b AS DOUBLE)
                * CAST(n_cells - n_b AS DOUBLE)
                / (CAST(n_cells AS DOUBLE) * (CAST(n_cells AS DOUBLE) - 1.0))), 6) AS bw_ratio
FROM cell_agg, edge_agg
"""


# ------------------------------------------------------------ quadrat test


def quadrat_test(pts: DataFrame, res: int = 3) -> DataFrame:
    """pts: (x, y). ONE row: (n_pts, n_quadrats, lambda, chi2, vmr).

    All 4^res quadrats participate — empty quadrats contribute (0−λ)²/λ
    each, which is exactly what makes the test sensitive to clustering."""
    m = 1 << (2 * res)
    counts = (
        pts.select(G.cell_col(F.col("x"), F.col("y"), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("n_pts"),
        F.sum((F.col("c") * F.col("c")).cast("long")).alias("s2"),
        F.count(F.lit(1)).alias("occ"),
    )
    # chi2 = Σ(c−λ)²/λ over ALL m quadrats = (Σc² − N²/m)/λ — the Σ over
    # empty quadrats folds into the closed form, so no grid join is needed
    # and the whole test is one groupBy + scalar algebra.
    n = F.col("n_pts").cast("double")
    lam = n / F.lit(float(m))
    chi2 = (F.col("s2").cast("double") - n * n / F.lit(float(m))) / lam
    return tot.select(
        "n_pts",
        F.lit(m).cast("long").alias("n_quadrats"),
        F.round(lam, 6).alias("lambda"),
        F.round(chi2, 6).alias("chi2"),
        F.round(chi2 / F.lit(float(m - 1)), 6).alias("vmr"),
    )


def quadrat_test_sql(pts_sql: str, res: int = 3) -> str:
    """DuckDB twin of :func:`quadrat_test`. ``pts_sql`` yields (x, y)."""
    m = 1 << (2 * res)
    return f"""
WITH p AS ({pts_sql}),
counts AS (
  SELECT {G.cell_sql('x', 'y', res)} AS cell, CAST(count(*) AS BIGINT) AS c
  FROM p GROUP BY 1),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_pts, CAST(sum(c * c) AS BIGINT) AS s2
  FROM counts)
SELECT n_pts, CAST({m} AS BIGINT) AS n_quadrats,
       round(CAST(n_pts AS DOUBLE) / {float(m)!r}, 6) AS lambda,
       round((CAST(s2 AS DOUBLE)
              - CAST(n_pts AS DOUBLE) * CAST(n_pts AS DOUBLE) / {float(m)!r})
             / (CAST(n_pts AS DOUBLE) / {float(m)!r}), 6) AS chi2,
       round(((CAST(s2 AS DOUBLE)
               - CAST(n_pts AS DOUBLE) * CAST(n_pts AS DOUBLE) / {float(m)!r})
              / (CAST(n_pts AS DOUBLE) / {float(m)!r})) / {float(m - 1)!r}, 6) AS vmr
FROM tot
"""


# -------------------------------------------------------- radius of gyration


def radius_gyration(
    events_xy: DataFrame, res: int = 5, id_col: str = "user_id", top_k: int = 200
) -> DataFrame:
    """events_xy: (id_col, x, y). Per entity, the ``top_k`` most-travelled:
    (user_id, n_ev, cx, cy, rg, n_cells, h_cells, rank).

    r_g = √(Σ‖p−c‖²/n) via the moment identity Σ‖p−c‖²/n = (Σx²+Σy²)/n −
    (c_x²+c_y²) — ONE pass, DECIMAL moment sums. h_cells = −Σ p·ln p over
    the entity's grid-cell visit distribution (twin ln). Ranked by r_g
    descending (ties → user_id) so the output is a stable top-k."""
    from pyspark.sql import Window

    m = events_xy.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC)).cast("double").alias("syy"),
    )
    n = F.col("n_ev").cast("double")
    cx = F.col("sx") / n
    cy = F.col("sy") / n
    msd = (F.col("sxx") + F.col("syy")) / n - (cx * cx + cy * cy)
    mo = m.select(
        id_col,
        "n_ev",
        cx.alias("cx"),
        cy.alias("cy"),
        F.sqrt(F.greatest(msd, F.lit(0.0))).alias("rg"),
    )

    visits = (
        events_xy.select(
            id_col, G.cell_col(F.col("x"), F.col("y"), res).alias("cell")
        )
        .groupBy(id_col, "cell")
        .agg(F.count(F.lit(1)).alias("cv"))
    )
    vt = visits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("cv").alias("tv")
    )
    ent = (
        visits.join(vt, id_col)
        .withColumn("p", F.col("cv").cast("double") / F.col("tv").cast("double"))
        .withColumn("lp", G.ln_col(F.col("p")))
        .groupBy(id_col)
        .agg(
            F.max("n_cells").alias("n_cells"),
            (-F.sum((F.col("p") * F.col("lp")).cast(DEC)).cast("double")).alias("h_raw"),
        )
    )
    # distributed top-k FIRST (TakeOrdered), THEN the rank window over
    # ≤ top_k rows — never a single-partition sort of every user
    joined = mo.join(ent, id_col).orderBy(F.desc("rg"), id_col).limit(top_k)
    w = Window.orderBy(F.desc("rg"), id_col)
    return (
        joined
        .withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            "n_ev",
            F.round("cx", 6).alias("cx"),
            F.round("cy", 6).alias("cy"),
            F.round("rg", 6).alias("rg"),
            "n_cells",
            F.round("h_raw", 6).alias("h_cells"),
            "rank",
        )
    )


def radius_gyration_sql(
    events_xy_sql: str, res: int = 5, id_col: str = "user_id", top_k: int = 200
) -> str:
    """DuckDB twin of :func:`radius_gyration`."""
    return f"""
WITH ev AS ({events_xy_sql}),
m AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,15))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(28,15))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(28,15))) AS DOUBLE) AS syy
  FROM ev GROUP BY 1),
mo AS (
  SELECT {id_col}, n_ev,
         sx / CAST(n_ev AS DOUBLE) AS cx, sy / CAST(n_ev AS DOUBLE) AS cy,
         sqrt(greatest(
           (sxx + syy) / CAST(n_ev AS DOUBLE)
           - ((sx / CAST(n_ev AS DOUBLE)) * (sx / CAST(n_ev AS DOUBLE))
              + (sy / CAST(n_ev AS DOUBLE)) * (sy / CAST(n_ev AS DOUBLE))), 0.0))
           AS rg
  FROM m),
visits AS (
  SELECT {id_col}, {G.cell_sql('x', 'y', res)} AS cell,
         CAST(count(*) AS BIGINT) AS cv
  FROM ev GROUP BY 1, 2),
vt AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(cv) AS BIGINT) AS tv
  FROM visits GROUP BY 1),
pv AS (
  SELECT v.{id_col}, vt.n_cells,
         CAST(v.cv AS DOUBLE) / CAST(vt.tv AS DOUBLE) AS p
  FROM visits v JOIN vt ON v.{id_col} = vt.{id_col}),
ent AS (
  SELECT {id_col}, max(n_cells) AS n_cells,
         -CAST(sum(CAST(p * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS h_raw
  FROM pv GROUP BY 1),
ranked AS (
  SELECT mo.{id_col}, mo.n_ev, mo.cx, mo.cy, mo.rg, ent.n_cells, ent.h_raw,
         row_number() OVER (ORDER BY mo.rg DESC, mo.{id_col}) AS rank
  FROM mo JOIN ent ON mo.{id_col} = ent.{id_col})
SELECT {id_col}, n_ev, round(cx, 6) AS cx, round(cy, 6) AS cy,
       round(rg, 6) AS rg, n_cells, round(h_raw, 6) AS h_cells,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}
"""


# ------------------------------------------------------------ skew diagnostic


def cell_skew(pts: DataFrame, res: int = 6) -> DataFrame:
    """ONE row (n_pts, n_cells, avg_c, max_c, p50_c, p99_c, skew_ratio,
    top_share, salt_factor): the hot-cell skew report for a tiling run —
    the number the salting / adaptive-split machinery (operators/rollup.py,
    quadtree.adaptive_tiles) needs BEFORE deciding how to partition.

    skew_ratio = max/avg occupancy; top_share = hottest cell's fraction of
    all points; salt_factor = ceil(max_c / p99_c) — splitting the hottest
    cell into that many salt buckets levels it to the p99 cell. Quantiles
    are exact type-1 picks (rank window over occupied-cell metadata, ≤ 4^res
    rows — the corpus itself is reduced by ONE groupBy)."""
    from pyspark.sql import Window

    cells = (
        pts.select(G.cell_col(F.col("x"), F.col("y"), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)  # metadata; rank window + totals + picks
    w = Window.orderBy("c", "cell")
    ranked = cells.withColumn("_rn", F.row_number().over(w).cast("long"))
    # quantile picks need the total next to each rank — broadcast the
    # 1-row count against the ≤4^res metadata instead of a nested window
    tot = cells.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    picks = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.max(
                F.when(F.col("_rn") == F.expr("(nc - 1) * 50 div 100 + 1"), F.col("c"))
            ).alias("p50_c"),
            F.max(
                F.when(F.col("_rn") == F.expr("(nc - 1) * 99 div 100 + 1"), F.col("c"))
            ).alias("p99_c"),
        )
    )
    base = (
        cells.agg(
            F.sum("c").cast("long").alias("n_pts"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.max("c").cast("long").alias("max_c"),
        )
        .crossJoin(F.broadcast(picks))
    )
    avg = F.col("n_pts").cast("double") / F.col("n_cells").cast("double")
    return base.select(
        "n_pts",
        "n_cells",
        F.round(avg, 6).alias("avg_c"),
        "max_c",
        F.col("p50_c").cast("long").alias("p50_c"),
        F.col("p99_c").cast("long").alias("p99_c"),
        F.round(F.col("max_c").cast("double") / avg, 6).alias("skew_ratio"),
        F.round(
            F.col("max_c").cast("double") / F.col("n_pts").cast("double"), 6
        ).alias("top_share"),
        F.expr("(max_c + p99_c - 1) div p99_c").cast("long").alias("salt_factor"),
    )


def cell_skew_sql(pts_sql: str, res: int = 6) -> str:
    """DuckDB twin of :func:`cell_skew`. ``pts_sql`` yields (x, y)."""
    return f"""
WITH p AS ({pts_sql}),
cells AS (
  SELECT {G.cell_sql('x', 'y', res)} AS cell, count(*)::BIGINT AS c
  FROM p GROUP BY 1),
ranked AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c, cell) AS BIGINT) AS _rn,
         CAST(count(*) OVER () AS BIGINT) AS nc
  FROM cells),
picks AS (
  SELECT max(CASE WHEN _rn = (nc - 1) * 50 // 100 + 1 THEN c END) AS p50_c,
         max(CASE WHEN _rn = (nc - 1) * 99 // 100 + 1 THEN c END) AS p99_c
  FROM ranked),
base AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_pts, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(max(c) AS BIGINT) AS max_c
  FROM cells)
SELECT n_pts, n_cells,
       round(CAST(n_pts AS DOUBLE) / CAST(n_cells AS DOUBLE), 6) AS avg_c,
       max_c, CAST(p50_c AS BIGINT) AS p50_c, CAST(p99_c AS BIGINT) AS p99_c,
       round(CAST(max_c AS DOUBLE)
             / (CAST(n_pts AS DOUBLE) / CAST(n_cells AS DOUBLE)), 6) AS skew_ratio,
       round(CAST(max_c AS DOUBLE) / CAST(n_pts AS DOUBLE), 6) AS top_share,
       CAST((max_c + p99_c - 1) // p99_c AS BIGINT) AS salt_factor
FROM base, picks
"""


# ------------------------------------------------------------ segregation


def segregation(
    pts: DataFrame, res: int = 4
) -> DataFrame:
    """Residential-segregation indices over tiles, for a categorical mark:
    ONE row (n_groups, n_cells, dissimilarity, theil_h).

    - dissimilarity D (Duncan & Duncan 1955) between the two LARGEST
      groups: D = ½ Σ_cells |a_i/A − b_i/B| — share of either group that
      would have to move for an even spread.
    - Theil's multigroup entropy index H (Theil 1972):
      H = Σ_cells (t_i/T)·(E − E_i)/E with E the global and E_i the
      per-cell category entropy (twin ln) — 0 = every tile mirrors the
      corpus mix, 1 = total separation.

    pts: (x, y, cat). Scale shape: ONE corpus groupBy to (cell, cat)
    counts; both indices are then DECIMAL reductions over cell×category
    metadata; the two largest groups come from a broadcast top-2."""
    from pyspark.sql import Window

    cc = (
        pts.select(G.cell_col(F.col("x"), F.col("y"), res).alias("cell"), "cat")
        .groupBy("cell", "cat")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    gtot = cc.groupBy("cat").agg(F.sum("c").cast("long").alias("g"))
    wtop = Window.orderBy(F.desc("g"), "cat")
    top2 = gtot.withColumn("_r", F.row_number().over(wtop)).where(F.col("_r") <= 2)
    # dissimilarity over the top-2 groups
    ab = (
        cc.join(F.broadcast(top2.select("cat", "g", "_r")), "cat")
        .groupBy("cell")
        .agg(
            F.sum(F.when(F.col("_r") == 1, F.col("c")).otherwise(0)).alias("a_i"),
            F.max(F.when(F.col("_r") == 1, F.col("g"))).alias("a_tot"),
            F.sum(F.when(F.col("_r") == 2, F.col("c")).otherwise(0)).alias("b_i"),
            F.max(F.when(F.col("_r") == 2, F.col("g"))).alias("b_tot"),
        )
    )
    # a_tot/b_tot are constant; re-broadcast the global values to fill the
    # NULLs on cells that lack one of the groups
    tots = top2.groupBy().agg(
        F.max(F.when(F.col("_r") == 1, F.col("g"))).alias("a_all"),
        F.max(F.when(F.col("_r") == 2, F.col("g"))).alias("b_all"),
    )
    d_row = (
        ab.crossJoin(F.broadcast(tots))
        .select(
            (
                F.abs(
                    F.col("a_i").cast("double") / F.col("a_all").cast("double")
                    - F.col("b_i").cast("double") / F.col("b_all").cast("double")
                )
            ).alias("term")
        )
        .agg(
            (F.lit(0.5) * F.sum(F.col("term").cast(DEC)).cast("double")).alias("dissim")
        )
    )

    # Theil H: global entropy E and per-cell E_i, both via twin ln
    n_row = cc.agg(F.sum("c").cast("long").alias("n_tot"))
    ge = (
        gtot.crossJoin(F.broadcast(n_row))
        .select(
            (F.col("g").cast("double") / F.col("n_tot").cast("double")).alias("p")
        )
        .select((F.col("p") * G.ln_col(F.col("p"))).alias("plp"))
        .agg((-F.sum(F.col("plp").cast(DEC)).cast("double")).alias("e_glob"))
    )
    ct = cc.groupBy("cell").agg(F.sum("c").cast("long").alias("t_i"))
    ce = (
        cc.join(ct, "cell")
        .select(
            "cell",
            "t_i",
            (F.col("c").cast("double") / F.col("t_i").cast("double")).alias("p"),
        )
        .select("cell", "t_i", (F.col("p") * G.ln_col(F.col("p"))).alias("plp"))
        .groupBy("cell")
        .agg(
            F.max("t_i").alias("t_i"),
            (-F.sum(F.col("plp").cast(DEC)).cast("double")).alias("e_i"),
        )
    )
    h_row = (
        ce.crossJoin(F.broadcast(ge))
        .crossJoin(F.broadcast(n_row))
        .select(
            (
                (F.col("t_i").cast("double") / F.col("n_tot").cast("double"))
                * ((F.col("e_glob") - F.col("e_i")) / F.col("e_glob"))
            ).alias("term")
        )
        .agg(F.sum(F.col("term").cast(DEC)).cast("double").alias("theil_h"))
    )
    counts_row = cc.agg(
        F.countDistinct("cat").cast("long").alias("n_groups"),
        F.countDistinct("cell").cast("long").alias("n_cells"),
    )
    return (
        counts_row.crossJoin(F.broadcast(d_row))
        .crossJoin(F.broadcast(h_row))
        .select(
            "n_groups",
            "n_cells",
            F.round("dissim", 6).alias("dissimilarity"),
            F.round("theil_h", 6).alias("theil_h"),
        )
    )


def segregation_sql(pts_sql: str, res: int = 4) -> str:
    """DuckDB twin of :func:`segregation`. ``pts_sql`` yields (x, y, cat)."""
    return f"""
WITH p AS ({pts_sql}),
cc AS (
  SELECT {G.cell_sql('x', 'y', res)} AS cell, cat, CAST(count(*) AS BIGINT) AS c
  FROM p GROUP BY 1, 2),
gtot AS (SELECT cat, CAST(sum(c) AS BIGINT) AS g FROM cc GROUP BY cat),
top2 AS (
  SELECT cat, g, row_number() OVER (ORDER BY g DESC, cat) AS _r
  FROM gtot QUALIFY _r <= 2),
ab AS (
  SELECT cell,
         CAST(sum(CASE WHEN _r = 1 THEN c ELSE 0 END) AS BIGINT) AS a_i,
         CAST(sum(CASE WHEN _r = 2 THEN c ELSE 0 END) AS BIGINT) AS b_i
  FROM cc JOIN top2 USING (cat) GROUP BY cell),
tots AS (
  SELECT max(CASE WHEN _r = 1 THEN g END) AS a_all,
         max(CASE WHEN _r = 2 THEN g END) AS b_all
  FROM top2),
d_row AS (
  SELECT 0.5 * CAST(sum(CAST(abs(CAST(a_i AS DOUBLE) / CAST(a_all AS DOUBLE)
                                 - CAST(b_i AS DOUBLE) / CAST(b_all AS DOUBLE))
                           AS DECIMAL(28,15))) AS DOUBLE) AS dissim
  FROM ab, tots),
n_row AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM cc),
gp AS (
  SELECT CAST(g AS DOUBLE) / CAST(n_tot AS DOUBLE) AS p FROM gtot, n_row),
ge AS (
  SELECT -CAST(sum(CAST(p * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS e_glob
  FROM gp),
ct AS (SELECT cell, CAST(sum(c) AS BIGINT) AS t_i FROM cc GROUP BY cell),
cp AS (
  SELECT cc.cell, ct.t_i, CAST(cc.c AS DOUBLE) / CAST(ct.t_i AS DOUBLE) AS p
  FROM cc JOIN ct ON cc.cell = ct.cell),
ce AS (
  SELECT cell, max(t_i) AS t_i,
         -CAST(sum(CAST(p * {G.ln_sql('p')} AS DECIMAL(28,15))) AS DOUBLE) AS e_i
  FROM cp GROUP BY cell),
h_row AS (
  SELECT CAST(sum(CAST((CAST(t_i AS DOUBLE) / CAST(n_tot AS DOUBLE))
                       * ((e_glob - e_i) / e_glob) AS DECIMAL(28,15))) AS DOUBLE)
           AS theil_h
  FROM ce, ge, n_row),
counts_row AS (
  SELECT CAST(count(DISTINCT cat) AS BIGINT) AS n_groups,
         CAST(count(DISTINCT cell) AS BIGINT) AS n_cells
  FROM cc)
SELECT n_groups, n_cells, round(dissim, 6) AS dissimilarity,
       round(theil_h, 6) AS theil_h
FROM counts_row, d_row, h_row
"""


# ------------------------------------------------------- box-counting dim


def box_dimension(
    pts: DataFrame, res_lo: int = 2, res_hi: int = 8
) -> DataFrame:
    """Box-counting (Minkowski) fractal dimension of the point pattern:
    occupied-cell counts N(s) at every resolution res_lo..res_hi, then the
    OLS slope of ln N against res·ln 2 (box size s = 2^−res). Dimension ≈ 2
    for space-filling scatter, ≈ 0 for a few point masses; web-corpus
    embeddings typically land in between — a one-number summary of how
    "surface-like" the embedding manifold's 2-D shadow is.

    ONE row (n_res, dim, intercept, r2). Scale shape: one corpus groupBy at
    the FINEST resolution, then integer parent rollups (the pyramid trick)
    for every coarser count — the corpus is scanned once; the OLS runs on
    (res_hi − res_lo + 1) metadata rows with twin ln + DECIMAL moments."""
    base = (
        pts.select(G.cell_col(F.col("x"), F.col("y"), res_hi).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    cur = base.select("cell")
    levels = [base.agg(F.lit(res_hi).alias("res"), F.count(F.lit(1)).cast("long").alias("n_cells"))]
    for r in range(res_hi - 1, res_lo - 1, -1):
        cur = cur.select(G.cell_parent_col(F.col("cell")).alias("cell")).distinct()
        cur = cur.localCheckpoint(eager=False)
        levels.append(
            cur.agg(F.lit(r).alias("res"), F.count(F.lit(1)).cast("long").alias("n_cells"))
        )
    lv = levels[0]
    for nxt in levels[1:]:
        lv = lv.unionByName(nxt)
    ln2 = 0.6931471805599453
    staged = lv.select(
        (F.col("res").cast("double") * F.lit(ln2)).alias("xr"),
        F.col("n_cells").cast("double").alias("nc"),
    )
    pts2 = staged.select("xr", G.ln_col(F.col("nc")).alias("ly"))
    s = pts2.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xr").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("ly").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("xr") * F.col("ly")).cast(DEC)).cast("double").alias("sxy"),
        F.sum((F.col("xr") * F.col("xr")).cast(DEC)).cast("double").alias("sxx"),
        F.sum((F.col("ly") * F.col("ly")).cast(DEC)).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    s2 = s.select("n", "sx", "sy", "sxy", "sxx", "syy", slope.alias("dim"))
    b0 = (F.col("sy") - F.col("dim") * F.col("sx")) / F.col("n").cast("double")
    s3 = s2.select("n", "sx", "sy", "sxy", "sxx", "syy", "dim", b0.alias("b0"))
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n").cast("double")
    ss_res = (
        F.col("syy")
        + F.col("dim") * F.col("dim") * F.col("sxx")
        + F.col("n").cast("double") * F.col("b0") * F.col("b0")
        - F.lit(2.0) * F.col("dim") * F.col("sxy")
        - F.lit(2.0) * F.col("b0") * F.col("sy")
        + F.lit(2.0) * F.col("dim") * F.col("b0") * F.col("sx")
    )
    return s3.select(
        F.col("n").alias("n_res"),
        F.round("dim", 6).alias("dim"),
        F.round("b0", 6).alias("intercept"),
        F.round(F.lit(1.0) - ss_res / ss_tot, 6).alias("r2"),
    )


def box_dimension_sql(pts_sql: str, res_lo: int = 2, res_hi: int = 8) -> str:
    """DuckDB twin of :func:`box_dimension`."""
    ln2 = 0.6931471805599453
    selects = []
    for r in range(res_lo, res_hi + 1):
        shift = res_hi - r
        selects.append(
            f"SELECT {r} AS res, CAST(count(DISTINCT "
            f"((((cell >> {COORD_BITS}) & {_MASK}) >> {shift}) << 32) "
            f"| ((cell & {_MASK}) >> {shift})) AS BIGINT) AS n_cells FROM base"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH base AS (
  SELECT {G.cell_sql('x', 'y', res_hi)} AS cell FROM ({pts_sql}) GROUP BY 1),
lv AS ({union}),
staged AS (
  SELECT CAST(res AS DOUBLE) * {ln2!r} AS xr, CAST(n_cells AS DOUBLE) AS nc
  FROM lv),
pts2 AS (SELECT xr, {G.ln_sql('nc')} AS ly FROM staged),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(xr AS DECIMAL(28,15))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ly AS DECIMAL(28,15))) AS DOUBLE) AS sy,
         CAST(sum(CAST(xr * ly AS DECIMAL(28,15))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(xr * xr AS DECIMAL(28,15))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(ly * ly AS DECIMAL(28,15))) AS DOUBLE) AS syy
  FROM pts2),
s2 AS (
  SELECT *, (CAST(n AS DOUBLE) * sxy - sx * sy)
            / (CAST(n AS DOUBLE) * sxx - sx * sx) AS dim
  FROM s),
s3 AS (SELECT *, (sy - dim * sx) / CAST(n AS DOUBLE) AS b0 FROM s2)
SELECT n AS n_res, round(dim, 6) AS dim, round(b0, 6) AS intercept,
       round(1.0 - (syy + dim * dim * sxx + CAST(n AS DOUBLE) * b0 * b0
                    - 2.0 * dim * sxy - 2.0 * b0 * sy + 2.0 * dim * b0 * sx)
                   / (syy - sy * sy / CAST(n AS DOUBLE)), 6) AS r2
FROM s3
"""
