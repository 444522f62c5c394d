"""Exact point-in-polygon spatial join (New-J in SURVEY.md §2.3).

Replaces the reference's GMM soft membership (raptor/cluster_utils.py:46-52)
with geometry: points are pruned to candidate polygons by an equi-join on the
polygon's home-cell neighborhood (the broadcast spatial index), then verified
with the exact ray-cast PIP kernel in a vectorized Arrow batch.

Two paths:
- ``soft_assignments``: the engine's hot path — cell polygons are axis-aligned
  squares, so the buffered PIP test lowers to pure range expressions
  (JVM-side, no UDF). Used by the tree build.
- ``pip_join``: the general operator for arbitrary polygon rings
  (ARRAY<ARRAY<DOUBLE>>), mapInPandas over the pruned pairs with the numpy
  ray-cast kernel. Used when polygons are not grid cells.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..kernels.grid import COORD_BITS, COORD_MASK, RES_SHIFT, point_in_polygon


def cell_polygons(nodes: DataFrame, buffer: float = 0.0) -> DataFrame:
    """(cell_id, ring) boundary polygons for every distinct cell — generated
    by expressions from the cell id bit layout."""
    res = F.shiftrightunsigned(F.col("cell_id"), RES_SHIFT)
    ix = F.shiftrightunsigned(F.col("cell_id"), COORD_BITS).bitwiseAND(F.lit(COORD_MASK))
    iy = F.col("cell_id").bitwiseAND(F.lit(COORD_MASK))
    size = F.lit(1.0) / F.pow(F.lit(2.0), res.cast("double"))
    x0 = ix.cast("double") * size - F.lit(buffer)
    y0 = iy.cast("double") * size - F.lit(buffer)
    x1 = (ix.cast("double") + 1) * size + F.lit(buffer)
    y1 = (iy.cast("double") + 1) * size + F.lit(buffer)
    ring = F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1), F.array(x0, y1)
    )
    return nodes.select("cell_id").distinct().select("cell_id", ring.alias("ring"))


def soft_assignments(nodes: DataFrame, res: int, buffer_frac: float = 0.1) -> DataFrame:
    """Soft multi-cell assignment (node_id, cell_id, is_home): home cell plus
    any neighbor whose square, buffered by ``buffer_frac``·cell_size, contains
    the point. Axis-aligned ⇒ the PIP lowers to range checks; the neighbor
    candidates are generated inline with bit arithmetic (no join needed)."""
    size = 1.0 / (1 << res)
    buf = buffer_frac * size
    n = 1 << res

    home = G.cell_col(F.col("x"), F.col("y"), res)
    df = nodes.withColumn("home_cell", home)
    ix = F.shiftrightunsigned(F.col("home_cell"), COORD_BITS).bitwiseAND(F.lit(COORD_MASK))
    iy = F.col("home_cell").bitwiseAND(F.lit(COORD_MASK))

    neighbor_structs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx = ix + F.lit(dx)
            jy = iy + F.lit(dy)
            cell = (
                F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
                .bitwiseOR(F.shiftleft(jx, COORD_BITS))
                .bitwiseOR(jy)
            )
            in_grid = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
            # buffered square of neighbor cell (dx,dy): range-check PIP
            cx0 = jx.cast("double") * size - buf
            cy0 = jy.cast("double") * size - buf
            cx1 = (jx.cast("double") + 1) * size + buf
            cy1 = (jy.cast("double") + 1) * size + buf
            contains = (
                (F.col("x") > cx0) & (F.col("x") < cx1) & (F.col("y") > cy0) & (F.col("y") < cy1)
            )
            keep = in_grid & (contains | ((F.lit(dx) == 0) & (F.lit(dy) == 0)))
            neighbor_structs.append(
                F.when(keep, F.struct(cell.alias("cell_id"), F.lit(dx == 0 and dy == 0).alias("is_home")))
            )
    cells = F.filter(F.array(*neighbor_structs), lambda s: s.isNotNull())
    return (
        df.select("node_id", F.explode(cells).alias("m"))
        .select("node_id", F.col("m.cell_id").alias("cell_id"), F.col("m.is_home").alias("is_home"))
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    prune_res: int = 4,
    id_col: str = "node_id",
    poly_id_col: str = "cell_id",
) -> DataFrame:
    """General exact PIP join: points(id, x, y) ⋈ polygons(poly_id, ring).

    Prune: both sides are bucketed to cells at ``prune_res`` (polygons via
    their bbox cells, driver-free expressions on the ring array); equi-join on
    the bucket; exact ray-cast verify in an Arrow-batched kernel."""
    xs = F.transform(F.col("ring"), lambda p: F.element_at(p, 1))
    ys = F.transform(F.col("ring"), lambda p: F.element_at(p, 2))
    polys = polygons.select(
        poly_id_col,
        "ring",
        F.array_min(xs).alias("px0"),
        F.array_max(xs).alias("px1"),
        F.array_min(ys).alias("py0"),
        F.array_max(ys).alias("py1"),
    )
    n = 1 << prune_res
    bx0 = F.greatest(F.least(F.floor(F.col("px0") * n).cast("long"), F.lit(n - 1)), F.lit(0))
    bx1 = F.greatest(F.least(F.floor(F.col("px1") * n).cast("long"), F.lit(n - 1)), F.lit(0))
    by0 = F.greatest(F.least(F.floor(F.col("py0") * n).cast("long"), F.lit(n - 1)), F.lit(0))
    by1 = F.greatest(F.least(F.floor(F.col("py1") * n).cast("long"), F.lit(n - 1)), F.lit(0))
    buckets = F.flatten(
        F.transform(
            F.sequence(bx0, bx1),
            lambda i: F.transform(F.sequence(by0, by1), lambda j: i * F.lit(n) + j),
        )
    )
    polys_b = polys.withColumn("bucket", F.explode(buckets))

    pts_b = points.select(
        id_col,
        "x",
        "y",
        (
            F.greatest(F.least(F.floor(F.col("x") * n).cast("long"), F.lit(n - 1)), F.lit(0)) * n
            + F.greatest(F.least(F.floor(F.col("y") * n).cast("long"), F.lit(n - 1)), F.lit(0))
        ).alias("bucket"),
    )

    pairs = pts_b.join(F.broadcast(polys_b), "bucket").select(id_col, "x", "y", poly_id_col, "ring")

    out_schema = f"{id_col} LONG, {poly_id_col} LONG"

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xs_ = pdf["x"].to_numpy()
            ys_ = pdf["y"].to_numpy()
            # group rows by polygon to vectorize over points per polygon
            for _, idx in pdf.groupby(poly_id_col).indices.items():
                ring = np.array([list(p) for p in pdf["ring"].iloc[idx[0]]])
                keep[idx] = point_in_polygon(xs_[idx], ys_[idx], ring)
            yield pdf.loc[keep, [id_col, poly_id_col]]

    return pairs.mapInPandas(verify, out_schema).dropDuplicates([id_col, poly_id_col])


def dwithin_join(points: DataFrame, d: float, id_col: str = "node_id") -> DataFrame:
    """All point pairs within euclidean distance ``d`` (ST_DWithin self-join):
    (id_a, id_b, dist) with id_a < id_b.

    Plan: bucket both sides at the coarsest resolution whose cell size >= d
    (so a 3×3 neighborhood provably covers the radius — the join is EXACT,
    not approximate), explode the left side to its 9 candidate cells with
    inline bit arithmetic, equi-join on the right side's home cell, verify
    with the exact squared distance. Each surviving pair appears exactly once
    (the right home cell is unique), so no dedup shuffle. At 100 TB the only
    shuffle is the equi-join on cell; skewed hot cells are AQE-split, and the
    candidate count per point is bounded by the 9-cell population, which the
    resolution choice ties to the radius — not to corpus size.

    The distance test is twin arithmetic ((xa-xb)² + (ya-yb)² < d², then
    sqrt), so a DuckDB quadratic-join oracle must hash-match exactly: any
    pair the pruning missed would break the match.
    """
    # coarsest res with cell_size = 2^-res >= d; capped by the grid depth
    res = max(0, min(16, -math.ceil(math.log2(d))) if d < 1.0 else 0)
    n = 1 << res

    home = G.cell_col(F.col("x"), F.col("y"), res)
    # narrow barrier (round-4 codegen-fallback fix): callers often pass x/y
    # as unmaterialized 64-term projection folds; fused into the 9-cell
    # candidate explode each neighbor cell re-inlines the fold trees and the
    # generated method exceeds the JVM's 64 KB bytecode limit. Materialized,
    # every downstream reference is a leaf column read.
    pts = (
        points.select(id_col, "x", "y")
        .withColumn("home_cell", home)
        .localCheckpoint(eager=False)
    )
    ix = F.shiftrightunsigned(F.col("home_cell"), COORD_BITS).bitwiseAND(F.lit(COORD_MASK))
    iy = F.col("home_cell").bitwiseAND(F.lit(COORD_MASK))

    cand_cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx = ix + F.lit(dx)
            jy = iy + F.lit(dy)
            cell = (
                F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
                .bitwiseOR(F.shiftleft(jx, COORD_BITS))
                .bitwiseOR(jy)
            )
            in_grid = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
            cand_cells.append(F.when(in_grid, cell))
    left = pts.select(
        F.col(id_col).alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.filter(F.array(*cand_cells), lambda c: c.isNotNull())).alias("cell"),
    )
    right = pts.select(
        F.col(id_col).alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("home_cell").alias("cell"),
    )
    dx2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
    dy2 = (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    d2 = dx2 + dy2
    return (
        left.join(right, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(d2 < F.lit(d) * F.lit(d))
        .select("id_a", "id_b", F.sqrt(d2).alias("dist"))
    )


def zonal_stats(
    points: DataFrame,
    polygons: DataFrame,
    prune_res: int = 4,
    id_col: str = "node_id",
    poly_id_col: str = "cell_id",
) -> DataFrame:
    """(cell_id, n_pts, mean_x, mean_y): per-polygon point statistics — the
    GIS "zonal statistics" composite: exact PIP join (bbox-cell pruned, see
    pip_join) then one groupBy per zone with exact-decimal coordinate means.
    At scale the join output carries only matched (point, zone) pairs and
    the aggregate is map-side combined per zone — no polygon sees more than
    its own membership."""
    hits = pip_join(points, polygons, prune_res=prune_res, id_col=id_col, poly_id_col=poly_id_col)
    joined = hits.join(points.select(F.col(id_col), "x", "y"), id_col)
    dec = "decimal(28,15)"
    return (
        joined.groupBy(poly_id_col)
        .agg(
            F.count("*").alias("n_pts"),
            (F.sum(F.col("x").cast(dec)).cast("double") / F.count("*").cast("double")).alias("mean_x"),
            (F.sum(F.col("y").cast(dec)).cast("double") / F.count("*").cast("double")).alias("mean_y"),
        )
    )


def poly_metrics(polygons: DataFrame, poly_id_col: str = "cell_id") -> DataFrame:
    """(cell_id, n_vertices, signed_area, cx, cy): shoelace polygon metrics.

    Signed area and centroid from the ring vertex list (Gauss shoelace /
    standard polygon centroid), computed as pure JVM expressions: posexplode
    the ring, pair each vertex with its successor (wrapping via modulo on the
    join key), sum the cross terms in exact DECIMAL. Signed area is positive
    for counter-clockwise rings — the orientation check a geometry loader
    needs. Polygons are metadata-scale rows; the self-join is per-polygon and
    each edge appears exactly once."""
    edges = polygons.select(
        F.col(poly_id_col),
        F.size("ring").alias("m"),
        F.posexplode("ring").alias("pos", "p"),
    )
    e1 = edges.select(
        F.col(poly_id_col).alias("pid"),
        "m",
        ((F.col("pos") + F.lit(1)) % F.col("m")).alias("succ"),
        F.element_at("p", 1).alias("xi"),
        F.element_at("p", 2).alias("yi"),
    )
    e2 = edges.select(
        F.col(poly_id_col).alias("pid2"),
        F.col("pos").alias("pos2"),
        F.element_at("p", 1).alias("xj"),
        F.element_at("p", 2).alias("yj"),
    )
    paired = e1.join(
        e2, (F.col("pid") == F.col("pid2")) & (F.col("succ") == F.col("pos2"))
    ).select("pid", "m", "xi", "yi", "xj", "yj")
    cross = (F.col("xi") * F.col("yj")) - (F.col("xj") * F.col("yi"))
    dec = "decimal(28,15)"
    agg = (
        paired.withColumn("cross", cross)
        .withColumn("sx", (F.col("xi") + F.col("xj")) * F.col("cross"))
        .withColumn("sy", (F.col("yi") + F.col("yj")) * F.col("cross"))
        .groupBy("pid", "m")
        .agg(
            F.sum(F.col("cross").cast(dec)).cast("double").alias("s"),
            F.sum(F.col("sx").cast(dec)).cast("double").alias("sxs"),
            F.sum(F.col("sy").cast(dec)).cast("double").alias("sys"),
        )
    )
    return agg.select(
        F.col("pid").alias(poly_id_col),
        F.col("m").alias("n_vertices"),
        (F.col("s") * F.lit(0.5)).alias("signed_area"),
        (F.col("sxs") / (F.col("s") * F.lit(3.0))).alias("cx"),
        (F.col("sys") / (F.col("s") * F.lit(3.0))).alias("cy"),
    )


def polygon_cover(
    polygons: DataFrame, res: int, poly_id_col: str = "cell_id"
) -> DataFrame:
    """(poly_id, cover_id, ix, iy): the cells at ``res`` whose CENTER lies
    inside each polygon — the H3 ``polyfill`` analog (polygon → cell set),
    the inverse direction of pip_join (point → polygon).

    Plan: candidate cells come from the ring's bbox (pure expressions on the
    ring array, clamped to the grid), exploded as two integer sequences; the
    exact ray-cast kernel verifies each candidate's center in one Arrow
    batch. Fan-out is bbox-bounded, there is NO join at all — each polygon
    row expands and filters independently, so the operator scales linearly
    in Σ bbox areas and polygons never see each other. Center-containment
    gives an exact partition of cells among non-overlapping polygons (every
    center is tested against each covering polygon once).

    Output is integer-only (res/ix/iy bit-packed into cover_id); floats
    exist only inside the twin-pinned PIP predicate, so the DuckDB oracle
    (unrolled parity test on the same center arithmetic) is hash-exact.
    """
    n = 1 << res
    s = 1.0 / n  # exact power of two
    xs = F.transform(F.col("ring"), lambda p: F.element_at(p, 1))
    ys = F.transform(F.col("ring"), lambda p: F.element_at(p, 2))
    clamp = lambda c: F.greatest(F.least(c.cast("long"), F.lit(n - 1)), F.lit(0))  # noqa: E731
    cand = (
        polygons.select(
            F.col(poly_id_col).alias("poly_id"),
            "ring",
            clamp(F.floor(F.array_min(xs) * n)).alias("bx0"),
            clamp(F.floor(F.array_max(xs) * n)).alias("bx1"),
            clamp(F.floor(F.array_min(ys) * n)).alias("by0"),
            clamp(F.floor(F.array_max(ys) * n)).alias("by1"),
        )
        .select(
            "poly_id",
            "ring",
            "by0",
            "by1",
            F.explode(F.sequence(F.col("bx0"), F.col("bx1"))).alias("ix"),
        )
        .select(
            "poly_id",
            "ring",
            "ix",
            F.explode(F.sequence(F.col("by0"), F.col("by1"))).alias("iy"),
        )
        .withColumn("x", (F.col("ix").cast("double") + F.lit(0.5)) * F.lit(s))
        .withColumn("y", (F.col("iy").cast("double") + F.lit(0.5)) * F.lit(s))
    )

    out_schema = "poly_id LONG, ix LONG, iy LONG"

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xs_ = pdf["x"].to_numpy()
            ys_ = pdf["y"].to_numpy()
            for _, idx in pdf.groupby("poly_id").indices.items():
                ring = np.array([list(p) for p in pdf["ring"].iloc[idx[0]]])
                keep[idx] = point_in_polygon(xs_[idx], ys_[idx], ring)
            yield pdf.loc[keep, ["poly_id", "ix", "iy"]]

    cover = (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.col("ix"), COORD_BITS))
        .bitwiseOR(F.col("iy"))
    )
    return cand.mapInPandas(verify, out_schema).select(
        F.col("poly_id").alias(poly_id_col), cover.alias("cover_id"), "ix", "iy"
    )


def bbox_overlay_join(
    a: DataFrame, b: DataFrame, res: int = 4, id_col: str = "box_id"
) -> DataFrame:
    """Rectangle overlay join (id_a, id_b, inter_area, iou): every pair of
    boxes from ``a`` × ``b`` with strictly positive intersection area — the
    vector-overlay primitive behind polygon intersection layers and IoU
    matching (object dedup across detection sets). Boxes: (box_id, x0, y0,
    x1, y1) in unit space.

    Plan (the PBSM "reference point" method): each box explodes to the grid
    cells at ``res`` its bbox covers (two integer sequences, pure
    expressions); candidates equi-join on the packed cell key; a pair is
    emitted ONLY in the cell containing the intersection's min corner —
    exactly one cell per overlapping pair, so there is NO dedup shuffle and
    the join stays exact. At 100 TB the only shuffle is the cell equi-join;
    fan-out per box is its bbox cover at ``res`` (data-independent), hot
    cells are AQE-split, and no box ever meets boxes outside its cover.

    inter/union/IoU are plain IEEE min/max/multiply — the DuckDB oracle is a
    quadratic join over the same arithmetic, so a hash match proves the
    pruning misses nothing and the reference-point dedup emits exactly once.
    """
    n = 1 << res

    def cover(df: DataFrame, side: str) -> DataFrame:
        c = lambda name: F.col(f"{side}{name}")  # noqa: E731
        clamp = lambda v: F.greatest(F.lit(0), F.least(F.lit(n - 1), v))  # noqa: E731
        s = df.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col("x0").alias(f"{side}x0"),
            F.col("y0").alias(f"{side}y0"),
            F.col("x1").alias(f"{side}x1"),
            F.col("y1").alias(f"{side}y1"),
        )
        return (
            s.withColumn(
                "cix",
                F.explode(
                    F.sequence(
                        clamp(F.floor(c("x0") * n).cast("int")),
                        clamp(F.floor(c("x1") * n).cast("int")),
                    )
                ),
            )
            .withColumn(
                "ciy",
                F.explode(
                    F.sequence(
                        clamp(F.floor(c("y0") * n).cast("int")),
                        clamp(F.floor(c("y1") * n).cast("int")),
                    )
                ),
            )
            .withColumn("ckey", F.col("cix") * n + F.col("ciy"))
            .drop("cix", "ciy")
        )

    joined = cover(a, "a").join(cover(b, "b"), "ckey")
    mx = F.greatest("ax0", "bx0")
    my = F.greatest("ay0", "by0")
    iw = F.least("ax1", "bx1") - mx
    ih = F.least("ay1", "by1") - my
    clamp = lambda v: F.greatest(F.lit(0), F.least(F.lit(n - 1), v))  # noqa: E731
    ref_key = clamp(F.floor(mx * n).cast("int")) * n + clamp(F.floor(my * n).cast("int"))
    inter = iw * ih
    area_a = (F.col("ax1") - F.col("ax0")) * (F.col("ay1") - F.col("ay0"))
    area_b = (F.col("bx1") - F.col("bx0")) * (F.col("by1") - F.col("by0"))
    return (
        joined.where((iw > 0) & (ih > 0) & (F.col("ckey") == ref_key))
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_area"),
            (inter / (area_a + area_b - inter)).alias("iou"),
        )
    )


def bbox_overlay_join_sql(a_sql: str, b_sql: str, id_col: str = "box_id") -> str:
    """DuckDB twin of :func:`bbox_overlay_join`: quadratic overlap join over
    the identical IEEE arithmetic (no pruning — the oracle's whole point)."""
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       (least(a.x1, b.x1) - greatest(a.x0, b.x0))
         * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS inter_area,
       ((least(a.x1, b.x1) - greatest(a.x0, b.x0))
          * (least(a.y1, b.y1) - greatest(a.y0, b.y0)))
         / ((a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0)
            - (least(a.x1, b.x1) - greatest(a.x0, b.x0))
              * (least(a.y1, b.y1) - greatest(a.y0, b.y0))) AS iou
FROM ({a_sql}) a JOIN ({b_sql}) b
  ON least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
 AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
"""


def pip_anti_join(
    points: DataFrame,
    polygons: DataFrame,
    prune_res: int = 4,
    id_col: str = "node_id",
    poly_id_col: str = "cell_id",
) -> DataFrame:
    """Spatial anti-join: points contained by NO polygon — the coverage-gap
    query (crawl regions no curated tile claims). Same pruned+verified PIP
    dataflow as :func:`pip_join`, then one left_anti against the matched-id
    set; the anti side shuffles on the fixed-width id only."""
    matched = pip_join(points, polygons, prune_res, id_col, poly_id_col).select(
        id_col
    )
    return points.join(matched, id_col, "left_anti").select(id_col, "x", "y")


def spherical_poly_area(polygons: DataFrame, poly_id_col: str = "cell_id") -> DataFrame:
    """(cell_id, n_vertices, area_sr): SPHERICAL polygon area in steradians —
    the geodesic measure a planet-scale tile engine needs where the planar
    shoelace (:func:`poly_metrics`) distorts. Rings hold [lon, lat] radians.

    Per polygon, fan triangles from vertex 0 and sum each triangle's signed
    spherical excess via the numerically-stable triple-product form
    (Van Oosterom & Strackee 1983):

        tan(E/2) = a·(b×c) / (1 + a·b + b·c + c·a)
        area = |Σ 2·atan2(a·(b×c), 1 + a·b + b·c + c·a)|

    with a, b, c the vertices' unit vectors (twin sin/cos of lon/lat) and
    atan2 the twin series — every float op is twin-pinned, excesses sum in
    exact DECIMAL, so the DuckDB oracle hash-matches.

    Scale shape: polygons are metadata-scale; vertex fan-out is one
    posexplode + two per-polygon equi-joins (each triangle appears once);
    the unit-vector stage is localCheckpointed so atan2's many argument
    references don't re-inline the trig chains (the geo_bearing pattern)."""
    from ..functions import trig as TR

    verts = polygons.select(
        F.col(poly_id_col).alias("pid"),
        F.size("ring").alias("m"),
        F.posexplode("ring").alias("pos", "p"),
    ).select(
        "pid",
        "m",
        "pos",
        F.element_at("p", 1).alias("lon"),
        F.element_at("p", 2).alias("lat"),
    )
    # unit vectors via twin trig; narrow barrier before the heavy reuse below
    uv = verts.select(
        "pid",
        "m",
        "pos",
        (TR.cos_col(F.col("lat")) * TR.cos_col(F.col("lon"))).alias("ux"),
        (TR.cos_col(F.col("lat")) * TR.sin_col(F.col("lon"))).alias("uy"),
        TR.sin_col(F.col("lat")).alias("uz"),
    ).localCheckpoint(eager=False)
    a = uv.where(F.col("pos") == 0).select(
        F.col("pid").alias("pa"),
        F.col("m"),
        F.col("ux").alias("ax"),
        F.col("uy").alias("ay"),
        F.col("uz").alias("az"),
    )
    b = uv.where(F.col("pos") >= 1).select(
        F.col("pid").alias("pb"),
        F.col("pos").alias("i"),
        F.col("ux").alias("bx"),
        F.col("uy").alias("by"),
        F.col("uz").alias("bz"),
    )
    c = uv.select(
        F.col("pid").alias("pc"),
        F.col("pos").alias("j"),
        F.col("ux").alias("cx"),
        F.col("uy").alias("cy"),
        F.col("uz").alias("cz"),
    )
    tri = (
        a.join(b, F.col("pa") == F.col("pb"))
        .join(
            c,
            (F.col("pa") == F.col("pc"))
            & (F.col("j") == F.col("i") + 1),
        )
        .where(F.col("i") <= F.col("m") - 2)
    )
    num = (
        F.col("ax") * (F.col("by") * F.col("cz") - F.col("bz") * F.col("cy"))
        + F.col("ay") * (F.col("bz") * F.col("cx") - F.col("bx") * F.col("cz"))
        + F.col("az") * (F.col("bx") * F.col("cy") - F.col("by") * F.col("cx"))
    )
    den = (
        F.lit(1.0)
        + (F.col("ax") * F.col("bx") + F.col("ay") * F.col("by") + F.col("az") * F.col("bz"))
        + (F.col("bx") * F.col("cx") + F.col("by") * F.col("cy") + F.col("bz") * F.col("cz"))
        + (F.col("cx") * F.col("ax") + F.col("cy") * F.col("ay") + F.col("cz") * F.col("az"))
    )
    staged = tri.select(
        "pa", "m", num.alias("nu"), den.alias("de")
    ).localCheckpoint(eager=False)
    # staged twin atan2 (trig.append_atan2): the one-expression atan2 tree
    # under the agg blew the 64 KB/method bytecode limit (round-4
    # codegen-fallback family)
    at2 = TR.append_atan2(staged, "nu", "de", "__a2__", keep=["pa", "m"])
    exc = at2.select(
        "pa",
        "m",
        (F.lit(2.0) * F.col("__a2__")).alias("e"),
    )
    dec = "decimal(28,15)"
    agg = exc.groupBy("pa", "m").agg(
        F.abs(F.sum(F.col("e").cast(dec)).cast("double")).alias("area_sr")
    )
    return agg.select(
        F.col("pa").alias(poly_id_col),
        F.col("m").cast("long").alias("n_vertices"),
        "area_sr",
    )


def spherical_poly_area_sql(polys_sql: str) -> str:
    """DuckDB twin of :func:`spherical_poly_area`. ``polys_sql`` must yield
    (cell_id, ring) with ring = LIST of [lon, lat] radians."""
    from ..functions import trig as TR

    stage, result = TR.atan2_sql("nu", "de")
    return f"""
WITH polys AS (SELECT * FROM ({polys_sql})),
v0 AS (
  SELECT cell_id AS pid, len(ring) AS m,
         generate_subscripts(ring, 1) - 1 AS pos, unnest(ring) AS p
  FROM polys),
verts AS (SELECT pid, m, pos, p[1] AS lon, p[2] AS lat FROM v0),
uv AS MATERIALIZED (
  SELECT pid, m, pos,
         ({TR.cos_sql('lat')} * {TR.cos_sql('lon')}) AS ux,
         ({TR.cos_sql('lat')} * {TR.sin_sql('lon')}) AS uy,
         {TR.sin_sql('lat')} AS uz
  FROM verts),
tri AS (
  SELECT a.pid, a.m,
         a.ux AS ax, a.uy AS ay, a.uz AS az,
         b.ux AS bx, b.uy AS by, b.uz AS bz,
         c.ux AS cx, c.uy AS cy, c.uz AS cz
  FROM uv a
  JOIN uv b ON a.pid = b.pid AND b.pos >= 1
  JOIN uv c ON a.pid = c.pid AND c.pos = b.pos + 1
  WHERE a.pos = 0 AND b.pos <= a.m - 2),
staged AS MATERIALIZED (
  SELECT pid, m,
         (ax * (by * cz - bz * cy)
          + ay * (bz * cx - bx * cz)
          + az * (bx * cy - by * cx)) AS nu,
         (1.0
          + (ax * bx + ay * by + az * bz)
          + (bx * cx + by * cy + bz * cz)
          + (cx * ax + cy * ay + cz * az)) AS de
  FROM tri),
s2 AS (SELECT pid, m, nu, de, {stage} AS atr FROM staged),
exc AS (SELECT pid, m, (2.0 * {result}) AS e FROM s2)
SELECT pid AS cell_id, CAST(m AS BIGINT) AS n_vertices,
       abs(CAST(sum(CAST(e AS DECIMAL(28,15))) AS DOUBLE)) AS area_sr
FROM exc GROUP BY pid, m
"""
