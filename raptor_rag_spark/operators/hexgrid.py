"""Hexagonal-lattice operators: assignment, hierarchy, ring-smoothed density.

The hex twin of the quadkey operators (operators/heatmap.py's square-cell
binning): H3-style axial hexagons from functions/hexgen.py. Reference
analogue: each coarser hex resolution plays one RAPTOR layer
(raptor/cluster_tree_builder.py:84-129); ring-1 smoothing is the hexagonal
focal mean (6 equidistant neighbors — the reason hex grids beat square grids
for density work: no diagonal-vs-edge anisotropy).

Scale shape: assignment is a pure codegen Project (zero shuffles); density is
ONE map-side-combinable groupBy on the packed hex id; ring smoothing fans
each non-empty hex out 7× (self + 6 axial neighbors — grid-bounded metadata,
NOT the point set) and re-groups, so its cost is O(occupied hexes), never
O(points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hexgen as H


def hex_assign(points: DataFrame, res: int, id_col: str = "vec_id") -> DataFrame:
    """(id, hex_q, hex_r, hex_id, parent_id): exact hexagon of each (x, y)
    point plus its H3-style center-containment parent one resolution coarser.
    Pure column arithmetic — survives any scale as a scan-fused Project."""
    if res < 1:
        raise ValueError("hex_assign needs res >= 1 (parents are emitted at res - 1)")
    q, r = H.hex_qr_cols(F.col("x"), F.col("y"), res)
    pts = points.select(id_col, "x", "y", q.alias("hex_q"), r.alias("hex_r"))
    pq, pr = H.hex_parent_cols(F.col("hex_q"), F.col("hex_r"), res)
    return pts.select(
        id_col,
        "hex_q",
        "hex_r",
        H.hex_pack_cols(F.col("hex_q"), F.col("hex_r"), res).alias("hex_id"),
        H.hex_pack_cols(pq, pr, res - 1).alias("parent_id"),
    )


def hex_density(points: DataFrame, res: int) -> DataFrame:
    """(hex_q, hex_r, cnt, ring_cnt): per-hex point count and the ring-1
    smoothed count (sum over self + 6 neighbors). One groupBy over the point
    set, then a 7× explode over a literal offset array grouped straight back
    — the fan-out touches occupied-hex metadata, NOT the point set, and the
    self/neighbor split folds into the same aggregation (no re-join). Empty
    hexes (reached only as neighbors) are dropped, matching the occupied-hex
    output contract."""
    q, r = H.hex_qr_cols(F.col("x"), F.col("y"), res)
    counts = (
        points.select(q.alias("hex_q"), r.alias("hex_r"))
        .groupBy("hex_q", "hex_r")
        .agg(F.count("*").alias("cnt"))
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dq).cast("long").alias("dq"), F.lit(dr).cast("long").alias("dr"))
            for dq, dr in ((0, 0), *H.AXIAL_NEIGHBORS)
        ]
    )
    fanned = counts.select(
        "hex_q", "hex_r", "cnt", F.explode(offsets).alias("o")
    ).select(
        (F.col("hex_q") + F.col("o.dq")).alias("tq"),
        (F.col("hex_r") + F.col("o.dr")).alias("tr"),
        "cnt",
        ((F.col("o.dq") == 0) & (F.col("o.dr") == 0)).alias("is_self"),
    )
    return (
        fanned.groupBy("tq", "tr")
        .agg(
            F.sum(F.when(F.col("is_self"), F.col("cnt"))).alias("cnt"),
            F.sum("cnt").alias("ring_cnt"),
        )
        .where(F.col("cnt").isNotNull())
        .select(F.col("tq").alias("hex_q"), F.col("tr").alias("hex_r"), "cnt", "ring_cnt")
    )


def hex_density_sql(points_sql: str, res: int) -> str:
    """DuckDB twin of :func:`hex_density`; ``points_sql`` yields (x, y)."""
    q, r = H.hex_qr_sql("x", "y", res)
    offs = ", ".join(f"({dq}, {dr})" for dq, dr in ((0, 0), *H.AXIAL_NEIGHBORS))
    return f"""
WITH pts AS (SELECT x, y FROM ({points_sql})),
assigned AS (SELECT {q} AS hex_q, {r} AS hex_r FROM pts),
counts AS (SELECT hex_q, hex_r, count(*)::BIGINT AS cnt FROM assigned GROUP BY hex_q, hex_r),
offs(dq, dr) AS (VALUES {offs}),
fanned AS (
  SELECT c.hex_q + o.dq AS tq, c.hex_r + o.dr AS tr, c.cnt,
         (o.dq = 0 AND o.dr = 0) AS is_self
  FROM counts c CROSS JOIN offs o)
SELECT tq AS hex_q, tr AS hex_r,
       CAST(sum(CASE WHEN is_self THEN cnt END) AS BIGINT) AS cnt,
       CAST(sum(cnt) AS BIGINT) AS ring_cnt
FROM fanned GROUP BY tq, tr
HAVING sum(CASE WHEN is_self THEN cnt END) IS NOT NULL
"""


def hex_assign_sql(points_sql: str, res: int, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`hex_assign`; ``points_sql`` yields (id, x, y)."""
    if res < 1:
        raise ValueError("hex_assign_sql needs res >= 1 (parents are emitted at res - 1)")
    q, r = H.hex_qr_sql("x", "y", res)
    pq, pr = H.hex_parent_sql("hex_q", "hex_r")
    return f"""
WITH pts AS (SELECT {id_col}, x, y FROM ({points_sql})),
assigned AS (SELECT {id_col}, {q} AS hex_q, {r} AS hex_r FROM pts),
withparent AS (SELECT {id_col}, hex_q, hex_r, {pq} AS pq, {pr} AS pr FROM assigned)
SELECT {id_col}, hex_q, hex_r,
       {H.hex_pack_sql("hex_q", "hex_r", res)} AS hex_id,
       {H.hex_pack_sql("pq", "pr", res - 1)} AS parent_id
FROM withparent
"""


def hex_pyramid(points: DataFrame, res: int, levels: int = 3) -> DataFrame:
    """(res, hex_q, hex_r, cnt): the hexagonal tile pyramid — per-hex point
    counts at ``res``, rolled up parent-by-parent for ``levels`` resolutions.
    Rollup uses H3's child→parent semantics (a child aggregates into the hex
    containing its CENTER one resolution coarser), exactly how H3 pipelines
    build coarse tiles from fine ones without re-touching the point set.

    Scale shape: the point set is aggregated ONCE (map-side-combinable
    groupBy at the finest res); every coarser level is a groupBy over the
    previous level's occupied-hex metadata — the same geometric-decay cost
    as the quadkey pyramid (operators/heatmap.py), only over hexes."""
    q, r = H.hex_qr_cols(F.col("x"), F.col("y"), res)
    cur = (
        points.select(q.alias("hex_q"), r.alias("hex_r"))
        .groupBy("hex_q", "hex_r")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit(res).cast("int").alias("res"), "hex_q", "hex_r", "cnt")
        # materialize once: each level of the final UNION is a separate plan
        # branch, and without this the point-set aggregation re-runs per
        # level; checkpointed, every level chains off occupied-hex metadata
        .localCheckpoint(eager=False)
    )
    out = cur
    for lvl in range(1, levels):
        r_child = res - lvl + 1
        pq, pr = H.hex_parent_cols(F.col("hex_q"), F.col("hex_r"), r_child)
        cur = (
            cur.select(pq.alias("hex_q"), pr.alias("hex_r"), "cnt")
            .groupBy("hex_q", "hex_r")
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.lit(r_child - 1).cast("int").alias("res"), "hex_q", "hex_r", "cnt")
            # per-level checkpoint: each UNION branch would otherwise replay
            # every intermediate aggregation (level 1 runs levels-1 times)
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(cur)
    return out


def hex_pyramid_sql(points_sql: str, res: int, levels: int = 3) -> str:
    """DuckDB twin of :func:`hex_pyramid`; ``points_sql`` yields (x, y)."""
    q, r = H.hex_qr_sql("x", "y", res)
    ctes = [
        f"pts AS (SELECT x, y FROM ({points_sql}))",
        f"assigned AS (SELECT {q} AS hex_q, {r} AS hex_r FROM pts)",
        f"""lvl0 AS (
  SELECT {res}::INT AS res, hex_q, hex_r, count(*)::BIGINT AS cnt
  FROM assigned GROUP BY hex_q, hex_r)""",
    ]
    pq, pr = H.hex_parent_sql("hex_q", "hex_r")
    for lvl in range(1, levels):
        r_child = res - lvl + 1
        ctes.append(
            f"""lvl{lvl} AS (
  SELECT {r_child - 1}::INT AS res, pq AS hex_q, pr AS hex_r,
         CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (SELECT {pq} AS pq, {pr} AS pr, cnt FROM lvl{lvl - 1})
  GROUP BY pq, pr)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM lvl{i}" for i in range(levels))
    return "WITH " + ",\n".join(ctes) + "\n" + union


def hex_soft_assign(
    points: DataFrame, res: int, eps: float = 0.15, id_col: str = "vec_id"
) -> DataFrame:
    """(id, hex_q, hex_r, is_home, hexdist): soft multi-cell HEX assignment —
    the GMM prob-threshold recast (reference raptor/cluster_utils.py:46-52)
    on the hexagonal lattice: every point keeps its home hexagon and
    additionally any of the 6 neighbors whose boundary polygon, expanded by
    ``eps``·apothem, still contains the point. The hexagon point-in-polygon
    test is closed-form (no ray casting needed for a regular hexagon):
    p is inside the hex at center c iff
    max(|dy|, |dx·√3/2 + dy/2|, |dx·√3/2 − dy/2|) ≤ apothem — the three
    edge-normal projections of p−c.

    Scale shape: a literal 7-offset explode (constant fan-out per point), all
    arithmetic scan-fused JVM expressions, no join, no shuffle — downstream
    consumers aggregate. ``hexdist`` is the normalized hex-norm (1.0 = on
    the boundary), so a consumer can re-threshold without recomputing."""
    b = H.SQRT3 / 2.0
    apothem = H.hex_size(res) * b
    q, r = H.hex_qr_cols(F.col("x"), F.col("y"), res)
    offsets = F.array(
        *[
            F.struct(F.lit(dq).cast("long").alias("dq"), F.lit(dr).cast("long").alias("dr"))
            for dq, dr in ((0, 0), *H.AXIAL_NEIGHBORS)
        ]
    )
    fanned = points.select(
        id_col, "x", "y", q.alias("hq"), r.alias("hr"), F.explode(offsets).alias("o")
    ).select(
        id_col,
        "x",
        "y",
        (F.col("hq") + F.col("o.dq")).alias("hex_q"),
        (F.col("hr") + F.col("o.dr")).alias("hex_r"),
        ((F.col("o.dq") == 0) & (F.col("o.dr") == 0)).alias("is_home"),
    )
    cx, cy = H.hex_center_cols(F.col("hex_q"), F.col("hex_r"), res)
    dx = F.col("x") - cx
    dy = F.col("y") - cy
    m = F.greatest(
        F.abs(dy),
        F.abs(dx * F.lit(b) + dy * F.lit(0.5)),
        F.abs(dx * F.lit(b) - dy * F.lit(0.5)),
    )
    return (
        fanned.withColumn("hexdist", m / F.lit(apothem))
        .where(F.col("hexdist") <= F.lit(1.0 + eps))
        .select(id_col, "hex_q", "hex_r", "is_home", "hexdist")
    )


def hex_soft_assign_sql(
    points_sql: str, res: int, eps: float = 0.15, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`hex_soft_assign`."""
    b = H.SQRT3 / 2.0
    apothem = H.hex_size(res) * b
    q, r = H.hex_qr_sql("x", "y", res)
    offs = ", ".join(f"({dq}, {dr})" for dq, dr in ((0, 0), *H.AXIAL_NEIGHBORS))
    cx, cy = H.hex_center_sql("hex_q", "hex_r", res)
    return f"""
WITH pts AS (SELECT {id_col}, x, y FROM ({points_sql})),
assigned AS (SELECT {id_col}, x, y, {q} AS hq, {r} AS hr FROM pts),
offs(dq, dr) AS (VALUES {offs}),
fanned AS (
  SELECT {id_col}, x, y, hq + dq AS hex_q, hr + dr AS hex_r,
         (dq = 0 AND dr = 0) AS is_home
  FROM assigned CROSS JOIN offs),
centered AS (
  SELECT {id_col}, x, y, hex_q, hex_r, is_home, {cx} AS cx, {cy} AS cy FROM fanned),
scored AS (
  SELECT {id_col}, hex_q, hex_r, is_home,
         greatest(abs(y - cy),
                  abs((x - cx) * {H.flit(b)} + (y - cy) * 0.5),
                  abs((x - cx) * {H.flit(b)} - (y - cy) * 0.5)) / {H.flit(apothem)} AS hexdist
  FROM centered)
SELECT {id_col}, hex_q, hex_r, is_home, hexdist FROM scored
WHERE hexdist <= {H.flit(1.0 + eps)}
"""
