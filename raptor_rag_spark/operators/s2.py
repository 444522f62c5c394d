"""S2-style spherical cell index — cube-face + Hilbert-curve cells, twinned.

The north rule's index family is "H3/S2". kernels/grid.py gives the quadkey
grid, operators/hexgrid.py the H3-style hex lattice; this module adds the
genuine S2 construction, from scratch, over the sphere:

1. (lon, lat) → unit 3-vector via the TWIN sin/cos (functions/trig.py — no
   libm, bit-identical across engines);
2. cube-face selection: the dominant axis picks one of 6 faces (S2's face
   numbering: +X,+Y,+Z → 0,1,2; −X,−Y,−Z → 3,4,5);
3. face (u, v) chart: the two minor axes divided by the major one (IEEE
   division, exact-rounded in both engines), u,v ∈ [−1, 1];
4. st transform: the LINEAR chart st = (u+1)/2 (S2 ships linear / tan /
   quadratic projections; linear is the documented choice here — cells are
   area-skewed toward face corners exactly as S2's linear mode is);
5. (i, j) discrete cell coords at ``res`` bits, then the Hilbert rotate-walk
   (same unrolled construction as operators/layout.py:hilbert_layout) gives
   the position on the face curve;
6. ``s2_id = face · 4^res + hkey``. Because the Hilbert key of a child is a
   2-bit extension of its parent's, ``parent_id = face · 4^(res−1) +
   (hkey >> 2)`` — S2's defining prefix-hierarchy property, free.

Everything is column arithmetic; the DuckDB twin unrolls the identical steps,
so cell ids are bit-identical by construction. Scale: NO shuffle anywhere —
one narrow local materialization of (id, face, i, j) sits between the trig
chart and the Hilbert walk purely to stop Catalyst's CollapseProject from
substituting the chart into every walk stage (exponential expression growth
otherwise); consumers bucket/join on s2_id like any other cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import trig as TR


def s2_cells(points: DataFrame, res: int = 8, id_col: str = "vec_id") -> DataFrame:
    """(id, face, i, j, hkey, s2_id, parent_id) from (id, lon, lat) radians."""
    if res < 1:
        raise ValueError("s2_cells needs res >= 1 (parents are the 2-bit prefix)")
    n = 1 << res
    coslat = TR.cos_col(F.col("lat"))
    xyz = points.select(
        id_col,
        (coslat * TR.cos_col(F.col("lon"))).alias("vx"),
        (coslat * TR.sin_col(F.col("lon"))).alias("vy"),
        TR.sin_col(F.col("lat")).alias("vz"),
    )
    ax, ay, az = F.abs(F.col("vx")), F.abs(F.col("vy")), F.abs(F.col("vz"))
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(F.col("vx") >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(F.col("vy") >= 0, 1).otherwise(4))
        .otherwise(F.when(F.col("vz") >= 0, 2).otherwise(5))
    ).cast("long")
    u = (
        F.when(F.col("face") == 0, F.col("vy") / F.col("vx"))
        .when(F.col("face") == 1, -F.col("vx") / F.col("vy"))
        .when(F.col("face") == 2, -F.col("vx") / F.col("vz"))
        .when(F.col("face") == 3, F.col("vz") / F.col("vx"))
        .when(F.col("face") == 4, F.col("vz") / F.col("vy"))
        .otherwise(-F.col("vy") / F.col("vz"))
    )
    v = (
        F.when(F.col("face") == 0, F.col("vz") / F.col("vx"))
        .when(F.col("face") == 1, F.col("vz") / F.col("vy"))
        .when(F.col("face") == 2, -F.col("vy") / F.col("vz"))
        .when(F.col("face") == 3, F.col("vy") / F.col("vx"))
        .when(F.col("face") == 4, -F.col("vx") / F.col("vy"))
        .otherwise(-F.col("vx") / F.col("vz"))
    )
    faced = xyz.withColumn("face", face).select(
        id_col, "face", u.alias("u"), v.alias("v")
    )
    i = F.greatest(
        F.least(
            F.floor((F.col("u") * F.lit(0.5) + F.lit(0.5)) * F.lit(float(n))).cast("long"),
            F.lit(n - 1),
        ),
        F.lit(0),
    )
    j = F.greatest(
        F.least(
            F.floor((F.col("v") * F.lit(0.5) + F.lit(0.5)) * F.lit(float(n))).cast("long"),
            F.lit(n - 1),
        ),
        F.lit(0),
    )
    out = faced.select(
        id_col, "face", i.alias("i"), j.alias("j"), i.alias("hx"), j.alias("hy"),
        F.lit(0).cast("long").alias("hkey"),
    )
    # BARRIER before the Hilbert walk: Catalyst's CollapseProject substitutes
    # each stage's inputs into the next, so without this the trig face chart
    # would be copied ~2^res times into the fused projection (measured:
    # minutes of driver planning at res 8). Materializing the narrow
    # (id, face, i, j) row — four small ints — keeps the walk's expression
    # growth over plain column refs; linear local IO, still zero shuffles.
    out = out.localCheckpoint(eager=False)
    for b in range(res - 1, -1, -1):
        s = 1 << b
        rx = F.shiftrightunsigned(F.col("hx"), b).bitwiseAND(F.lit(1))
        ry = F.shiftrightunsigned(F.col("hy"), b).bitwiseAND(F.lit(1))
        quad = (rx * F.lit(3)).bitwiseXOR(ry)
        nx = (
            F.when(ry == 1, F.col("hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("hy"))
            .otherwise(F.col("hy"))
        )
        ny = (
            F.when(ry == 1, F.col("hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("hx"))
            .otherwise(F.col("hx"))
        )
        out = out.select(
            id_col, "face", "i", "j", nx.alias("hx"), ny.alias("hy"),
            (F.col("hkey") + F.lit(s * s) * quad.cast("long")).alias("hkey"),
        )
    cells = F.lit(1 << (2 * res)).cast("long")
    return out.select(
        id_col,
        "face",
        "i",
        "j",
        "hkey",
        (F.col("face") * cells + F.col("hkey")).alias("s2_id"),
        (F.col("face") * F.lit(1 << (2 * res - 2)).cast("long")
         + F.shiftrightunsigned(F.col("hkey"), 2)).alias("parent_id"),
    )


def s2_cells_sql(points_sql: str, res: int = 8, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`s2_cells`. ``points_sql`` yields (id, lon, lat)."""
    if res < 1:
        raise ValueError("s2_cells_sql needs res >= 1 (parents are the 2-bit prefix)")
    n = 1 << res
    coslat = TR.cos_sql("lat")
    coslon = TR.cos_sql("lon")
    sinlon = TR.sin_sql("lon")
    sinlat = TR.sin_sql("lat")
    face = (
        "(CASE WHEN abs(vx) >= abs(vy) AND abs(vx) >= abs(vz) THEN"
        " (CASE WHEN vx >= 0 THEN 0 ELSE 3 END)"
        " WHEN abs(vy) >= abs(vz) THEN (CASE WHEN vy >= 0 THEN 1 ELSE 4 END)"
        " ELSE (CASE WHEN vz >= 0 THEN 2 ELSE 5 END) END)::BIGINT"
    )
    u = (
        "(CASE face WHEN 0 THEN vy / vx WHEN 1 THEN -vx / vy WHEN 2 THEN -vx / vz"
        " WHEN 3 THEN vz / vx WHEN 4 THEN vz / vy ELSE -vy / vz END)"
    )
    v = (
        "(CASE face WHEN 0 THEN vz / vx WHEN 1 THEN vz / vy WHEN 2 THEN -vy / vz"
        " WHEN 3 THEN vy / vx WHEN 4 THEN -vx / vy ELSE -vx / vz END)"
    )
    iexpr = f"greatest(least(floor((u * 0.5 + 0.5) * {float(n):.17e})::BIGINT, {n - 1}), 0)"
    jexpr = f"greatest(least(floor((v * 0.5 + 0.5) * {float(n):.17e})::BIGINT, {n - 1}), 0)"
    ctes = [
        f"pts AS (SELECT {id_col}, lon, lat FROM ({points_sql}))",
        f"""xyz AS (
  SELECT {id_col}, ({coslat}) * ({coslon}) AS vx, ({coslat}) * ({sinlon}) AS vy,
         {sinlat} AS vz
  FROM pts)""",
        f"faced AS (SELECT {id_col}, vx, vy, vz, {face} AS face FROM xyz)",
        f"uv AS (SELECT {id_col}, face, {u} AS u, {v} AS v FROM faced)",
        f"s0 AS (SELECT {id_col}, face, {iexpr} AS i, {jexpr} AS j,"
        f" {iexpr} AS hx, {jexpr} AS hy, CAST(0 AS BIGINT) AS hkey FROM uv)",
    ]
    step = 0
    for b in range(res - 1, -1, -1):
        s = 1 << b
        prev, step = f"s{step}", step + 1
        rx = f"((hx >> {b}) & 1)"
        ry = f"((hy >> {b}) & 1)"
        quad = f"xor({rx} * 3, {ry})"
        nx = f"(CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
        ny = f"(CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
        ctes.append(
            f"s{step} AS (SELECT {id_col}, face, i, j, {nx} AS hx, {ny} AS hy,"
            f" (hkey + CAST({s * s} AS BIGINT) * CAST({quad} AS BIGINT)) AS hkey FROM {prev})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT {id_col}, face, i, j, hkey,
       (face * CAST({1 << (2 * res)} AS BIGINT) + hkey) AS s2_id,
       (face * CAST({1 << (2 * res - 2)} AS BIGINT) + (hkey >> 2)) AS parent_id
FROM s{step}"""
    )
