"""Marching-squares contour (isoline) extraction over a raster.

Vector output from a raster layer — the standard web-map "isoline" step one
past the KDE/terrain stack: given per-cell values at resolution ``res`` and a
level ``t``, emit the line segments of the level-``t`` contour using the
textbook marching-squares scheme (corner samples at cell centers, linear
interpolation along crossed edges, the two saddle cases resolved by a fixed
convention so output is deterministic).

Scale shape: each populated cell fans out to the ≤4 corner windows it
participates in (pure column arithmetic), ONE groupBy(window) with map-side
conditional-max gathers the 4 corner values, and the 16-case lookup plus
endpoint interpolation is pure codegen CASE/when — no self-join, no Python,
no driver loop. Output is ≤ 2 segments per window, so at 100 TB the plan is
a single bounded-fan-out shuffle over the (already bounded) raster.

This mirrors the reference's cluster→summary "give each region a compact
description" move (raptor/cluster_tree_builder.py:106-114) recast to the
raster domain: the contour is the geometric summary of a density level set.

Both twins (Spark Columns, DuckDB SQL) are generated from ONE Python case
table, and every float op (subtract, divide, compare) is a scalar IEEE op on
values the upstream twin already hash-matches — so the oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marching-squares case table. Corner bits: 1=c00 (bottom-left), 2=c10
# (bottom-right), 4=c11 (top-right), 8=c01 (top-left); a bit is set when the
# corner value is >= t. Edges: B(ottom) c00-c10, R(ight) c10-c11, T(op)
# c01-c11, L(eft) c00-c01. Saddles (5, 10) use the "center below level"
# convention: the above-level corners stay disconnected.
CASES: dict[int, list[tuple[str, str]]] = {
    1: [("L", "B")],
    2: [("B", "R")],
    3: [("L", "R")],
    4: [("T", "R")],
    5: [("L", "T"), ("B", "R")],
    6: [("B", "T")],
    7: [("L", "T")],
    8: [("T", "L")],
    9: [("B", "T")],
    10: [("B", "L"), ("T", "R")],
    11: [("T", "R")],
    12: [("L", "R")],
    13: [("B", "R")],
    14: [("L", "B")],
}


def contour_segments(
    raster: DataFrame, res: int, level: float, value_col: str = "density"
) -> DataFrame:
    """(wx, wy, case_id, seg, x0, y0, x1, y1) — level-``level`` contour
    segments in [0,1]² map coords. ``raster`` carries (ix, iy, value_col)
    for POPULATED cells; absent cells sample as 0.0."""
    n = 1 << res
    s = 1.0 / float(n)
    t = float(level)
    v = F.col(value_col).cast("double")

    # Fan each cell out to the corner windows it participates in:
    # corner (dx, dy) of window (ix - dx, iy - dy), dx/dy ∈ {0, 1}.
    cand = (
        raster.select(F.col("ix"), F.col("iy"), v.alias("v"))
        .select("ix", "iy", "v", F.explode(F.array(F.lit(0), F.lit(1))).alias("dx"))
        .select("ix", "iy", "v", "dx", F.explode(F.array(F.lit(0), F.lit(1))).alias("dy"))
        .select(
            (F.col("ix") - F.col("dx")).alias("wx"),
            (F.col("iy") - F.col("dy")).alias("wy"),
            "dx",
            "dy",
            "v",
        )
        .where(
            (F.col("wx") >= 0)
            & (F.col("wx") <= n - 2)
            & (F.col("wy") >= 0)
            & (F.col("wy") <= n - 2)
        )
    )

    def corner(dx: int, dy: int) -> Column:
        return F.coalesce(
            F.max(F.when((F.col("dx") == dx) & (F.col("dy") == dy), F.col("v"))),
            F.lit(0.0),
        )

    win = cand.groupBy("wx", "wy").agg(
        corner(0, 0).alias("v00"),
        corner(1, 0).alias("v10"),
        corner(1, 1).alias("v11"),
        corner(0, 1).alias("v01"),
    )

    v00, v10, v11, v01 = (F.col(c) for c in ("v00", "v10", "v11", "v01"))
    case_id = (
        (v00 >= t).cast("int")
        + (v10 >= t).cast("int") * 2
        + (v11 >= t).cast("int") * 4
        + (v01 >= t).cast("int") * 8
    )
    win = win.withColumn("case_id", case_id).where(
        (F.col("case_id") > 0) & (F.col("case_id") < 15)
    )
    win = win.select(
        "*",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("case_id").isin(5, 10), F.lit(1)).otherwise(F.lit(0)),
            )
        ).alias("seg"),
    )

    # Edge-crossing points in window-local corner coords ([0,1]²).
    fb = (F.lit(t) - v00) / (v10 - v00)
    fr = (F.lit(t) - v10) / (v11 - v10)
    ft = (F.lit(t) - v01) / (v11 - v01)
    fl = (F.lit(t) - v00) / (v01 - v00)
    edge_px = {"B": fb, "R": F.lit(1.0), "T": ft, "L": F.lit(0.0)}
    edge_py = {"B": F.lit(0.0), "R": fr, "T": F.lit(1.0), "L": fl}

    def pick(axis: dict[str, Column], which: int) -> Column:
        expr = None
        for c, segs in CASES.items():
            for si, ends in enumerate(segs):
                cond = (F.col("case_id") == c) & (F.col("seg") == si)
                val = axis[ends[which]]
                expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        return expr

    # Corner (0,0) of the window sits at the CENTER of cell (wx, wy).
    gx = lambda p: (F.col("wx").cast("double") + p + F.lit(0.5)) * F.lit(s)  # noqa: E731
    gy = lambda p: (F.col("wy").cast("double") + p + F.lit(0.5)) * F.lit(s)  # noqa: E731
    return win.select(
        "wx",
        "wy",
        "case_id",
        "seg",
        gx(pick(edge_px, 0)).alias("x0"),
        gy(pick(edge_py, 0)).alias("y0"),
        gx(pick(edge_px, 1)).alias("x1"),
        gy(pick(edge_py, 1)).alias("y1"),
    )


def contour_segments_sql(
    raster_sql: str, res: int, level: float, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`contour_segments`. ``raster_sql`` must select
    ix, iy, ``value_col``."""
    n = 1 << res
    s = 1.0 / float(n)
    t = float(level)

    fb = f"(({t!r} - v00) / (v10 - v00))"
    fr = f"(({t!r} - v10) / (v11 - v10))"
    ft = f"(({t!r} - v01) / (v11 - v01))"
    fl = f"(({t!r} - v00) / (v01 - v00))"
    edge_px = {"B": fb, "R": "1.0", "T": ft, "L": "0.0"}
    edge_py = {"B": "0.0", "R": fr, "T": "1.0", "L": fl}

    def pick(axis: dict[str, str], which: int) -> str:
        arms = []
        for c, segs in CASES.items():
            for si, ends in enumerate(segs):
                arms.append(f"WHEN case_id = {c} AND seg = {si} THEN {axis[ends[which]]}")
        return "CASE " + " ".join(arms) + " END"

    def corner(dx: int, dy: int) -> str:
        return f"coalesce(max(CASE WHEN dx = {dx} AND dy = {dy} THEN v END), 0.0)"

    gx = lambda p: f"((CAST(wx AS DOUBLE) + {p} + 0.5) * {s!r})"  # noqa: E731
    gy = lambda p: f"((CAST(wy AS DOUBLE) + {p} + 0.5) * {s!r})"  # noqa: E731
    return f"""
WITH raster AS ({raster_sql}),
cand AS (
  SELECT ix - dx AS wx, iy - dy AS wy, dx, dy, CAST({value_col} AS DOUBLE) AS v
  FROM raster, unnest([0, 1]) u1(dx), unnest([0, 1]) u2(dy)
  WHERE ix - dx BETWEEN 0 AND {n - 2} AND iy - dy BETWEEN 0 AND {n - 2}),
win AS (
  SELECT wx, wy, {corner(0, 0)} AS v00, {corner(1, 0)} AS v10,
         {corner(1, 1)} AS v11, {corner(0, 1)} AS v01
  FROM cand GROUP BY wx, wy),
cased AS (
  SELECT *, ((v00 >= {t!r})::INT + 2 * (v10 >= {t!r})::INT
           + 4 * (v11 >= {t!r})::INT + 8 * (v01 >= {t!r})::INT) AS case_id
  FROM win),
segs AS (
  SELECT *, unnest(generate_series(0, CASE WHEN case_id IN (5, 10) THEN 1 ELSE 0 END)) AS seg
  FROM cased WHERE case_id > 0 AND case_id < 15)
SELECT wx, wy, case_id, seg,
       {gx(pick(edge_px, 0))} AS x0, {gy(pick(edge_py, 0))} AS y0,
       {gx(pick(edge_px, 1))} AS x1, {gy(pick(edge_py, 1))} AS y1
FROM segs
"""
