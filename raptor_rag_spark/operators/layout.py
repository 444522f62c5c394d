"""Z-order (Morton) data layout — the lakehouse file-clustering operator.

``OPTIMIZE … ZORDER BY (x, y)`` in Delta/Iceberg rewrites files so rows close
in 2-D space land in the same file, which turns bounding-box predicates into
file skips. The heart of it is pure bit arithmetic: interleave the bits of
the two grid coordinates into one Morton key, then slice the keyspace into
buckets (files). Both steps are JVM shift/mask expressions with an exact
DuckDB twin.

Bucketing is by EQUAL KEYSPACE SLICES (``zkey >> shift``), not equal row
counts: that is fully distributed (no global sort — the real ZORDER job
range-partitions by sampled boundaries, and the keyspace slice is the
deterministic, sample-free version of that). Skewed occupancy shows up as
uneven bucket sizes, which ``layout_stats``-style rollups expose and AQE
absorbs at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_col(ix: Column, iy: Column, res: int) -> Column:
    """Morton key: interleave ``res`` bits of ix (odd positions) and iy
    (even positions)."""
    z = F.lit(0).cast("long")
    for b in range(res):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ix, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(iy, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return z


def zorder_key_sql(ix: str, iy: str, res: int) -> str:
    parts = []
    for b in range(res):
        parts.append(f"(((({ix}) >> {b}) & 1) << {2 * b + 1})")
        parts.append(f"(((({iy}) >> {b}) & 1) << {2 * b})")
    return "(" + " | ".join(parts) + ")"


def zorder_layout(
    points: DataFrame,
    res: int = 6,
    bucket_bits: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, ix, iy, zkey, bucket): Morton layout assignment for (x, y) points
    in [0, 1). ``bucket_bits`` = log2(number of keyspace slices); bucket is
    the top bits of the key, so each bucket is a contiguous Morton range =
    a spatially compact file."""
    n = 1 << res
    ix = F.greatest(
        F.least(F.floor(F.col("x") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    iy = F.greatest(
        F.least(F.floor(F.col("y") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    pts = points.select(id_col, ix.alias("ix"), iy.alias("iy"))
    zkey = zorder_key_col(F.col("ix"), F.col("iy"), res)
    shift = 2 * res - bucket_bits
    return pts.select(
        id_col,
        "ix",
        "iy",
        zkey.alias("zkey"),
        F.shiftrightunsigned(zkey, shift).alias("bucket"),
    )


def hilbert_layout(
    points: DataFrame,
    res: int = 6,
    bucket_bits: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, ix, iy, hkey, bucket): Hilbert-curve layout assignment — the
    strictly-better-locality alternative to :func:`zorder_layout` (a Hilbert
    bucket is one connected curve segment; Morton buckets have the classic
    Z-shaped seam jumps, so Hilbert file skipping prunes tighter for square
    bbox predicates — the layout Apache Iceberg exposes next to zorder).

    The xy→d transform is the standard rotate-and-accumulate walk over the
    ``res`` bit levels, UNROLLED at plan-build time into one narrow column
    chain per level (x_i, y_i, d_i reference x_{i-1}, y_{i-1} by name, so the
    plan grows linearly in ``res``, never exponentially). Pure JVM shift/mask
    arithmetic; the DuckDB twin unrolls the identical steps as chained CTEs —
    bit-identical keys by construction."""
    n = 1 << res
    ix = F.greatest(
        F.least(F.floor(F.col("x") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    iy = F.greatest(
        F.least(F.floor(F.col("y") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    out = points.select(
        id_col, ix.alias("ix"), iy.alias("iy"), ix.alias("hx"), iy.alias("hy"),
        F.lit(0).cast("long").alias("hkey"),
    )
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
            id_col, "ix", "iy", nx.alias("hx"), ny.alias("hy"),
            (F.col("hkey") + F.lit(s * s) * quad.cast("long")).alias("hkey"),
        )
    shift = 2 * res - bucket_bits
    return out.select(
        id_col, "ix", "iy", "hkey",
        F.shiftrightunsigned(F.col("hkey"), shift).alias("bucket"),
    )


def hilbert_layout_sql(
    points_sql: str,
    res: int = 6,
    bucket_bits: int = 4,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`hilbert_layout`. ``points_sql`` must yield
    (``id_col``, x, y)."""
    n = 1 << res
    ix = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    iy = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    ctes = [
        f"s0 AS (SELECT {id_col}, {ix} AS ix, {iy} AS iy, {ix} AS hx, {iy} AS hy,"
        f" CAST(0 AS BIGINT) AS hkey FROM ({points_sql}))"
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
            f"s{step} AS (SELECT {id_col}, ix, iy, {nx} AS hx, {ny} AS hy,"
            f" (hkey + CAST({s * s} AS BIGINT) * CAST({quad} AS BIGINT)) AS hkey FROM {prev})"
        )
    shift = 2 * res - bucket_bits
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {id_col}, ix, iy, hkey, (hkey >> {shift}) AS bucket FROM s{step}"
    )


def zorder_layout_sql(
    points_sql: str,
    res: int = 6,
    bucket_bits: int = 4,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`zorder_layout`. ``points_sql`` must yield
    (``id_col``, x, y)."""
    n = 1 << res
    ix = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    iy = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    zkey = zorder_key_sql("ix", "iy", res)
    shift = 2 * res - bucket_bits
    return f"""
WITH pts AS (SELECT {id_col}, {ix} AS ix, {iy} AS iy FROM ({points_sql})),
keyed AS (SELECT {id_col}, ix, iy, {zkey} AS zkey FROM pts)
SELECT {id_col}, ix, iy, zkey, (zkey >> {shift}) AS bucket FROM keyed
"""


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def tile_addresses(
    points: DataFrame,
    res: int = 6,
    geohash_chars: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, ix, iy, zkey, quadkey, tms, geohash): every tile-addressing
    scheme a tile server speaks, from one pass of pure JVM bit/string
    arithmetic over the unit square:

    - ``zkey``: Morton key (zorder_key_col);
    - ``quadkey``: Bing-style base-4 zoom path, digit = xbit + 2·ybit from
      the most significant bit — prefix truncation = zoom-out, the property
      quadkey CDNs key caches on;
    - ``tms``: the slippy-map ``z/x/y`` tile path at zoom ``res``;
    - ``geohash``: base-32 interleaved-bit token of ``geohash_chars`` chars
      over the unit square (x plays longitude-fraction, y latitude-
      fraction) — the join key geo systems exchange.

    All four are unrolled compile-time expression chains (no UDF); the
    DuckDB twin unrolls the identical steps, so every address is
    byte-identical across engines."""
    n = 1 << res
    ix = F.greatest(
        F.least(F.floor(F.col("x") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    iy = F.greatest(
        F.least(F.floor(F.col("y") * F.lit(float(n))).cast("long"), F.lit(n - 1)), F.lit(0)
    )
    pts = points.select(id_col, "x", "y", ix.alias("ix"), iy.alias("iy"))
    zkey = zorder_key_col(F.col("ix"), F.col("iy"), res)
    digits = []
    for b in range(res - 1, -1, -1):
        d = (
            F.shiftrightunsigned(F.col("ix"), b).bitwiseAND(F.lit(1))
            + F.shiftrightunsigned(F.col("iy"), b).bitwiseAND(F.lit(1)) * F.lit(2)
        )
        digits.append(d.cast("string"))
    quadkey = F.concat(*digits)
    tms = F.concat_ws("/", F.lit(str(res)), F.col("ix").cast("string"), F.col("iy").cast("string"))
    # geohash: 5*chars bits, x (lon) gets the even bit positions from MSB
    total_bits = 5 * geohash_chars
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    gx = F.least(
        F.floor(F.col("x") * F.lit(float(1 << lon_bits))).cast("long"), F.lit((1 << lon_bits) - 1)
    )
    gy = F.least(
        F.floor(F.col("y") * F.lit(float(1 << lat_bits))).cast("long"), F.lit((1 << lat_bits) - 1)
    )
    inter = F.lit(0).cast("long")
    for i in range(total_bits):  # i = 0 is the MSB of the geohash
        if i % 2 == 0:
            bit = F.shiftrightunsigned(gx, lon_bits - 1 - i // 2).bitwiseAND(F.lit(1))
        else:
            bit = F.shiftrightunsigned(gy, lat_bits - 1 - i // 2).bitwiseAND(F.lit(1))
        inter = F.shiftleft(inter, 1).bitwiseOR(bit)
    chars = []
    for c in range(geohash_chars):
        g = F.shiftrightunsigned(inter, 5 * (geohash_chars - 1 - c)).bitwiseAND(F.lit(31))
        chars.append(F.substring(F.lit(GEOHASH32), F.lit(1) + g.cast("int"), F.lit(1)))
    geohash = F.concat(*chars)
    return pts.select(
        id_col, "ix", "iy",
        zkey.alias("zkey"),
        quadkey.alias("quadkey"),
        tms.alias("tms"),
        geohash.alias("geohash"),
    )


def tile_addresses_sql(
    points_sql: str, res: int = 6, geohash_chars: int = 4, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`tile_addresses`."""
    n = 1 << res
    ixe = f"greatest(least(floor(x * {float(n)!r})::BIGINT, {n - 1}), 0)"
    iye = f"greatest(least(floor(y * {float(n)!r})::BIGINT, {n - 1}), 0)"
    zkey = zorder_key_sql("ix", "iy", res)
    digits = " || ".join(
        f"CAST((((ix >> {b}) & 1) + ((iy >> {b}) & 1) * 2) AS VARCHAR)"
        for b in range(res - 1, -1, -1)
    )
    total_bits = 5 * geohash_chars
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    gx = f"least(floor(x * {float(1 << lon_bits)!r})::BIGINT, {(1 << lon_bits) - 1})"
    gy = f"least(floor(y * {float(1 << lat_bits)!r})::BIGINT, {(1 << lat_bits) - 1})"
    parts = []
    for i in range(total_bits):
        if i % 2 == 0:
            parts.append(f"(((gx >> {lon_bits - 1 - i // 2}) & 1) << {total_bits - 1 - i})")
        else:
            parts.append(f"(((gy >> {lat_bits - 1 - i // 2}) & 1) << {total_bits - 1 - i})")
    inter = "(" + " | ".join(parts) + ")"
    chars = " || ".join(
        f"substr('{GEOHASH32}', 1 + CAST(((inter >> {5 * (geohash_chars - 1 - c)}) & 31) AS INT), 1)"
        for c in range(geohash_chars)
    )
    return f"""
WITH pts AS (SELECT {id_col}, x, y, {ixe} AS ix, {iye} AS iy FROM ({points_sql})),
g AS (SELECT *, {gx} AS gx, {gy} AS gy FROM pts),
h AS (SELECT *, {inter} AS inter FROM g)
SELECT {id_col}, ix, iy,
       {zkey} AS zkey,
       ({digits}) AS quadkey,
       ('{res}' || '/' || CAST(ix AS VARCHAR) || '/' || CAST(iy AS VARCHAR)) AS tms,
       ({chars}) AS geohash
FROM h
"""


# ------------------------------------------------------- STR R-tree packing


def str_layout(
    points: DataFrame,
    page_cap: int = 64,
    buckets_bits: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, slice_id, page_id): Sort-Tile-Recursive R-tree bulk-load packing
    (Leutenegger-Lopez-Edgington 1997) — the third layout option next to
    :func:`zorder_layout` / :func:`hilbert_layout`. STR produces near-square
    leaf pages with ~100% fill, the layout an R-tree bulk loader or a
    spatial parquet writer wants: P = ceil(n/B) pages, S = ceil(sqrt(P))
    x-sorted slices of S·B points, each slice y-sorted and cut into pages
    of B.

    The x-phase global rank uses the two-level value-bucket prefix-sum
    (quality_rank's trick): 2^``buckets_bits`` value buckets on x,
    within-bucket windows + broadcast cumulative offsets reproduce the
    exact global row_number over (x, id) with NO global sort. The y-phase
    rank is a slice-partitioned window — S parallel sorts of n/S points,
    which is the honest STR cost and scales with the slice count. All
    integer page math; the DuckDB twin is the PLAIN two-sort STR, proving
    the distributed reconstruction exact."""
    from pyspark.sql import Window

    nb = 1 << buckets_bits
    base = points.select(
        id_col, "x", "y",
        F.least(F.floor(F.col("x") * F.lit(float(nb))).cast("long"), F.lit(nb - 1))
        .alias("vb"),
    )
    w_in = Window.partitionBy("vb").orderBy("x", id_col)
    within = base.withColumn("rn_in", F.row_number().over(w_in).cast("long"))
    totals = base.groupBy("vb").agg(F.count("*").alias("tot"))
    w_off = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = totals.withColumn("off", F.sum("tot").over(w_off) - F.col("tot")).select(
        "vb", "off"
    )
    n_pages = F.expr(f"(n_total + {page_cap - 1}) div {page_cap}")
    n_agg = points.agg(F.count("*").cast("long").alias("n_total")).select(
        "n_total",
        F.ceil(F.sqrt(n_pages.cast("double"))).cast("long").alias("s_slices"),
    )
    ranked = (
        within.join(F.broadcast(offsets), "vb")
        .crossJoin(F.broadcast(n_agg))
        .select(
            id_col, "x", "y",
            (F.col("off") + F.col("rn_in") - F.lit(1)).alias("rx"),
            "s_slices",
        )
        .withColumn("slice_id", F.expr(f"rx div (s_slices * {page_cap})"))
    )
    w_y = Window.partitionBy("slice_id").orderBy("y", id_col)
    return (
        ranked.withColumn("ry", F.row_number().over(w_y).cast("long") - F.lit(1))
        .select(
            id_col,
            "slice_id",
            (
                F.col("slice_id") * F.col("s_slices")
                + F.expr(f"ry div {page_cap}")
            ).alias("page_id"),
        )
    )


def str_layout_sql(
    points_sql: str, page_cap: int = 64, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`str_layout` — plain two-sort STR with global
    row_numbers; ``points_sql`` yields (id, x, y)."""
    return f"""
WITH p AS ({points_sql}),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(ceil(sqrt(CAST((count(*) + {page_cap - 1}) // {page_cap} AS DOUBLE)))
              AS BIGINT) AS s_slices
  FROM p),
rx AS (
  SELECT {id_col}, y,
         CAST(row_number() OVER (ORDER BY x, {id_col}) AS BIGINT) - 1 AS rx,
         (SELECT s_slices FROM n) AS s_slices
  FROM p),
sl AS (
  SELECT {id_col}, y, s_slices, rx // (s_slices * {page_cap}) AS slice_id
  FROM rx),
ry AS (
  SELECT {id_col}, slice_id, s_slices,
         CAST(row_number() OVER (PARTITION BY slice_id ORDER BY y, {id_col})
              AS BIGINT) - 1 AS ry
  FROM sl)
SELECT {id_col}, slice_id,
       slice_id * s_slices + ry // {page_cap} AS page_id
FROM ry
"""
