"""Geohash cells: base32-string spatial index over the unit square.

The third cell system next to the quadtree tiles (kernels/grid.py) and the
hex lattice (functions/hexgen.py): geohash — the interleaved-bit base32
string encoding every web geo-service speaks. A geohash of precision ``p``
is ``5p`` bits alternating lon,lat from the MSB; that is exactly the
engine's Morton key (operators/layout.py: zorder_key_col) over
``ceil(5p/2)``-bit quantized coordinates, re-rendered in the geohash base32
alphabet. Prefix truncation IS the parent relation (precision p-1 contains
p), so pyramid rollups and drill-downs are string prefixes — no bit math at
query time, and LIKE 'u09%' prunes a parquet scan on a geohash-sorted
layout.

Unit-square convention: x plays lon, y plays lat (the engine's embedding
plane), quantized as floor(x·2^bits) — identical to the standard
(lon+180)/360 scaling. Everything is integer shifts + substring lookups,
pinned on both engines → hash-exact twin.

Reference role: none in the reference (no spatial surface); this is the
north rule's H3/S2-style indexing family, third encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .layout import zorder_key_col, zorder_key_sql

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32 (no a,i,l,o)


def _quant(v: Column, bits: int) -> Column:
    n = 1 << bits
    return F.least(F.floor(v * F.lit(float(n))).cast("long"), F.lit(n - 1))


def _quant_sql(v: str, bits: int) -> str:
    n = 1 << bits
    return f"least(CAST(floor(({v}) * {float(n)!r}) AS BIGINT), {n - 1})"


def geohash_col(x: Column, y: Column, precision: int = 8) -> Column:
    """Geohash string of x,y ∈ [0,1) at ``precision`` base32 chars.

    Even precision only (lon and lat get equal bits, the common case —
    precisions 2/4/6/8 nest by prefix)."""
    if precision % 2:
        raise ValueError("geohash_col supports even precision only")
    bits = 5 * precision // 2  # per axis
    z = zorder_key_col(_quant(x, bits), _quant(y, bits), bits)
    chars = [
        F.substring(
            F.lit(ALPHABET),
            F.shiftrightunsigned(z, 5 * (precision - 1 - k))
            .bitwiseAND(F.lit(31))
            .cast("int")
            + F.lit(1),
            1,
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(x: str, y: str, precision: int = 8) -> str:
    """DuckDB twin of :func:`geohash_col`."""
    if precision % 2:
        raise ValueError("geohash_sql supports even precision only")
    bits = 5 * precision // 2
    z = zorder_key_sql(_quant_sql(x, bits), _quant_sql(y, bits), bits)
    chars = [
        f"substr('{ALPHABET}', CAST((({z} >> {5 * (precision - 1 - k)}) & 31) AS INT) + 1, 1)"
        for k in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def geohash_cells(points: DataFrame, precision: int = 8, parent_precision: int = 4) -> DataFrame:
    """(id columns…, gh, gh_parent): per-point geohash + its prefix parent.

    Zero-shuffle projection — the encode is pure codegen; the parent is a
    substring, demonstrating the prefix-nesting invariant downstream
    rollups rely on."""
    gh = geohash_col(F.col("x"), F.col("y"), precision)
    return points.withColumn("gh", gh).withColumn(
        "gh_parent", F.substring(F.col("gh"), 1, parent_precision)
    )


def geohash_density(
    points: DataFrame, precision: int = 4, top_k: int = 50
) -> DataFrame:
    """(gh, n, rnk): top-k geohash cells by point count — ONE map-side-
    combined groupBy on the cell string; cell cardinality is metadata-scale
    (≤ 32^precision) at any corpus size."""
    from pyspark.sql import Window

    cells = points.select(geohash_col(F.col("x"), F.col("y"), precision).alias("gh"))
    counts = cells.groupBy("gh").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = counts.orderBy(F.desc("n"), "gh").limit(top_k)
    w = Window.orderBy(F.desc("n"), "gh")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def geohash_density_sql(points_sql: str, precision: int = 4, top_k: int = 50) -> str:
    """DuckDB twin of :func:`geohash_density`; ``points_sql`` yields (x, y)."""
    gh = geohash_sql("x", "y", precision)
    return f"""
WITH cells AS (SELECT {gh} AS gh FROM ({points_sql})),
counts AS (SELECT gh, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY gh)
SELECT gh, n, rnk FROM (
  SELECT gh, n, CAST(row_number() OVER (ORDER BY n DESC, gh) AS BIGINT) AS rnk
  FROM counts) WHERE rnk <= {top_k}
"""
