"""Web-Mercator (EPSG:3857) forward projection — the tile-server transform.

Every slippy-map stack projects (lon, lat) through y = ln tan(π/4 + φ/2)
before any tile addressing; the engine's quadkey/TMS/geohash addressing
(operators/layout.py, tile_addresses) so far worked on the raw unit square.
This operator supplies the real projection with the engine's twin kernels —
twin sin/cos for the tangent, twin ln for the Mercator stretch — so
projected coordinates, tile indices, and in-tile pixel offsets are all
bit-identical between Spark and the DuckDB oracle.

merc_x = (λ + π) / 2π ∈ [0,1),  merc_y = (1 − ψ/π) / 2,
ψ = ln tan(π/4 + φ/2), φ clamped to ±85.05113° (the square-map clamp,
atan(sinh π) — Mercator diverges at the poles). tile/pixel indices at a
fixed zoom are pure integer floors of the scaled coordinates.

Scale shape: one narrow Project per stage (sin/cos → tan ratio → ln),
zero shuffles, zero Python — the same pure-codegen contract as the
geodesy family. Stages are localCheckpoint barriers only to keep the trig
chains from fusing into one oversized janino method (the geo_destination
lesson)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqlgen as G
from ..functions import trig as TR
from ..functions.hexgen import flit

PI = 3.141592653589793
PI_4 = 0.7853981633974483
# atan(sinh(pi)) — latitude where the square Mercator map ends
LAT_MAX = 1.4844222297453324


def mercator_project(
    pts: DataFrame, zoom: int = 6, id_col: str = "vec_id"
) -> DataFrame:
    """pts: (id_col, lon, lat) in radians. Returns
    (id, merc_x, merc_y, tile_x, tile_y, px, py) at ``zoom`` —
    merc in [0,1) rounded 9dp, tile = floor(merc·2^z), pixel = the 0-255
    offset inside the 256px tile."""
    n = float(1 << zoom)
    lat_c = F.greatest(F.least(F.col("lat"), F.lit(LAT_MAX)), F.lit(-LAT_MAX))
    t = F.lit(PI_4) + lat_c * F.lit(0.5)
    s0 = pts.select(
        id_col, "lon", t.alias("t")
    ).localCheckpoint(eager=False)
    s1 = s0.select(
        id_col, "lon",
        (TR.sin_col(F.col("t")) / TR.cos_col(F.col("t"))).alias("tanv"),
    ).localCheckpoint(eager=False)
    psi = G.ln_col(F.col("tanv"))
    mx = (F.col("lon") + F.lit(PI)) / F.lit(2.0 * PI)
    my = (F.lit(1.0) - psi / F.lit(PI)) * F.lit(0.5)
    s2 = s1.select(id_col, mx.alias("mx"), my.alias("my"))
    tx = F.floor(F.col("mx") * F.lit(n)).cast("long")
    ty = F.floor(F.col("my") * F.lit(n)).cast("long")
    px = F.floor(F.col("mx") * F.lit(n * 256.0)).cast("long") - (
        F.floor(F.col("mx") * F.lit(n)).cast("long") * F.lit(256)
    )
    py = F.floor(F.col("my") * F.lit(n * 256.0)).cast("long") - (
        F.floor(F.col("my") * F.lit(n)).cast("long") * F.lit(256)
    )
    return s2.select(
        id_col,
        F.round("mx", 9).alias("merc_x"),
        F.round("my", 9).alias("merc_y"),
        F.greatest(F.least(tx, F.lit((1 << zoom) - 1)), F.lit(0)).alias("tile_x"),
        F.greatest(F.least(ty, F.lit((1 << zoom) - 1)), F.lit(0)).alias("tile_y"),
        px.alias("px"),
        py.alias("py"),
    )


def mercator_project_sql(
    pts_sql: str, zoom: int = 6, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`mercator_project`; ``pts_sql`` yields
    (id, lon, lat)."""
    n = float(1 << zoom)
    nmax = (1 << zoom) - 1
    return f"""
WITH p AS ({pts_sql}),
s0 AS (
  SELECT {id_col}, lon,
         ({flit(PI_4)} + greatest(least(lat, {flit(LAT_MAX)}), {flit(-LAT_MAX)}) * 0.5)
           AS t
  FROM p),
s1 AS (
  SELECT {id_col}, lon, ({TR.sin_sql('t')} / {TR.cos_sql('t')}) AS tanv
  FROM s0),
s2 AS (
  SELECT {id_col},
         ((lon + {flit(PI)}) / {flit(2.0 * PI)}) AS mx,
         ((1.0 - {G.ln_sql('tanv')} / {flit(PI)}) * 0.5) AS my
  FROM s1)
SELECT {id_col}, round(mx, 9) AS merc_x, round(my, 9) AS merc_y,
       greatest(least(CAST(floor(mx * {flit(n)}) AS BIGINT), {nmax}), 0) AS tile_x,
       greatest(least(CAST(floor(my * {flit(n)}) AS BIGINT), {nmax}), 0) AS tile_y,
       CAST(floor(mx * {flit(n * 256.0)}) AS BIGINT)
         - CAST(floor(mx * {flit(n)}) AS BIGINT) * 256 AS px,
       CAST(floor(my * {flit(n * 256.0)}) AS BIGINT)
         - CAST(floor(my * {flit(n)}) AS BIGINT) * 256 AS py
FROM s2
"""
