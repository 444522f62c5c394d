"""Areal-weighted interpolation: transfer a raster onto a misaligned zoning.

The classic GIS "areal interpolation" step (Goodchild & Lam): re-aggregate
per-cell values from a source grid onto a TARGET grid whose cells do not
nest in the source — here a coarser grid shifted by half a source cell, so
every source cell genuinely straddles target boundaries. Each source cell's
value is split across the targets it overlaps in proportion to overlap AREA,
so total mass is conserved exactly (Σ target = Σ source — tested).

Exactness trick: all geometry is done on an integer lattice in HALF-SOURCE-
CELL units (source cell = 2×2 units; target cell = q×q units at odd offsets),
so overlap lengths are small integers and the only float math is one final
v·(wx·wy)/4 per contribution, summed through exact DECIMAL — the DuckDB twin
hash-matches bit-for-bit.

Scale shape: bounded ≤4× fan-out per source cell (pure column arithmetic,
candidates from one `sequence`/`generate_series`), then ONE groupBy(target)
with map-side partial aggregation. No join against the target grid at all —
targets are computed, not enumerated. This is the raster↔vector rollup leg
of the north rule with a non-nested zoning, the case the quadkey pyramid
(integer parent rollup) cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q(res_src: int, res_tgt: int) -> int:
    if res_tgt >= res_src:
        raise ValueError("target grid must be coarser than the source raster")
    return 1 << (res_src - res_tgt + 1)  # target width in half-source units


def areal_transfer(
    raster: DataFrame, res_src: int, res_tgt: int, value_col: str = "density"
) -> DataFrame:
    """(tx, ty, n_src, value) — source raster (ix, iy, value_col) at
    ``res_src`` re-aggregated onto the ``res_tgt`` grid shifted by half a
    source cell in both axes."""
    q = _q(res_src, res_tgt)
    v = F.col(value_col).cast("double")

    def axis(src: str, tgt: str):
        lo = F.col(src) * 2  # source interval [lo, lo+2) in half-units
        # Target tx covers [1 + q*tx, 1 + q*(tx+1)); candidates bracket lo/hi.
        tmin = F.floor((lo - 1).cast("double") / q).cast("long")
        tmax = F.floor((lo + 1).cast("double") / q).cast("long")
        return F.explode(F.sequence(tmin, tmax)).alias(tgt)

    def overlap(src: str, tgt: str):
        lo = F.col(src) * 2
        t0 = F.col(tgt) * q + 1
        return F.greatest(
            F.least(lo + 2, t0 + q) - F.greatest(lo, t0), F.lit(0).cast("long")
        )

    cand = (
        raster.select(F.col("ix"), F.col("iy"), v.alias("v"))
        .select("ix", "iy", "v", axis("ix", "tx"))
        .select("ix", "iy", "v", "tx", axis("iy", "ty"))
        .withColumn("wx", overlap("ix", "tx"))
        .withColumn("wy", overlap("iy", "ty"))
        .where((F.col("wx") > 0) & (F.col("wy") > 0))
    )
    contrib = (F.col("v") * (F.col("wx") * F.col("wy")).cast("double") / F.lit(4.0)).cast(
        "decimal(28,15)"
    )
    return (
        cand.groupBy("tx", "ty")
        .agg(
            F.count("*").alias("n_src"),
            F.sum(contrib).cast("double").alias("value"),
        )
        .select("tx", "ty", "n_src", "value")
    )


def areal_transfer_sql(
    raster_sql: str, res_src: int, res_tgt: int, value_col: str = "density"
) -> str:
    """DuckDB twin of :func:`areal_transfer`."""
    q = _q(res_src, res_tgt)

    def cand_range(src: str) -> str:
        return (
            f"unnest(generate_series(floor(CAST({src} * 2 - 1 AS DOUBLE) / {q})::BIGINT, "
            f"floor(CAST({src} * 2 + 1 AS DOUBLE) / {q})::BIGINT))"
        )

    def overlap(src: str, tgt: str) -> str:
        return (
            f"greatest(least({src} * 2 + 2, {tgt} * {q} + 1 + {q})"
            f" - greatest({src} * 2, {tgt} * {q} + 1), 0)"
        )

    return f"""
WITH raster AS ({raster_sql}),
cx AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS v, {cand_range('ix')} AS tx FROM raster),
cy AS (SELECT ix, iy, v, tx, {cand_range('iy')} AS ty FROM cx),
wt AS (
  SELECT tx, ty, v, {overlap('ix', 'tx')} AS wx, {overlap('iy', 'ty')} AS wy
  FROM cy)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_src,
       CAST(sum(CAST(v * CAST(wx * wy AS DOUBLE) / 4.0 AS DECIMAL(28,15))) AS DOUBLE) AS value
FROM wt WHERE wx > 0 AND wy > 0 GROUP BY tx, ty
"""


def dasymetric(
    zones: DataFrame,
    mask: DataFrame,
    res_zone: int,
    res_mask: int,
) -> DataFrame:
    """Dasymetric disaggregation (the census-mapping classic): redistribute
    each zone's total onto its nested fine cells IN PROPORTION TO an
    ancillary mask raster (population density, land-use weight) instead of
    uniformly by area — the refinement step after :func:`areal_transfer`.

    zones: (zx, zy, total); mask: (ix, iy, w) at ``res_mask`` ≥ res_zone,
    cells nested (zone = ix >> (res_mask−res_zone)). Returns per mask cell:
    (ix, iy, zx, zy, w, value) with value = total · w / Σ_zone w — mass is
    conserved exactly per covered zone (DECIMAL weight sums, single final
    division per cell).

    Scale shape: one groupBy(zone) over the mask raster + one broadcast
    join of the zone table; no corpus access at all — this is pure
    metadata algebra between two rasters."""
    k = res_mask - res_zone
    if k < 0:
        raise ValueError("mask must be at least as fine as the zoning")
    zx = F.shiftrightunsigned(F.col("ix"), k)
    zy = F.shiftrightunsigned(F.col("iy"), k)
    m = mask.select(
        "ix", "iy", F.col("w").cast("double").alias("w"),
        zx.alias("zx"), zy.alias("zy"),
    ).localCheckpoint(eager=False)  # raster metadata; wsum + final join consumers
    wsum = m.groupBy("zx", "zy").agg(
        F.sum(F.col("w").cast("decimal(28,15)")).cast("double").alias("w_sum")
    )
    j = m.join(wsum, ["zx", "zy"]).join(
        F.broadcast(zones.select("zx", "zy", F.col("total").cast("double").alias("total"))),
        ["zx", "zy"],
    )
    return j.select(
        "ix",
        "iy",
        "zx",
        "zy",
        F.round("w", 6).alias("w"),
        F.round(
            F.col("total") * F.col("w") / F.col("w_sum"), 6
        ).alias("value"),
    )


def dasymetric_sql(
    zones_sql: str, mask_sql: str, res_zone: int, res_mask: int
) -> str:
    """DuckDB twin of :func:`dasymetric`."""
    k = res_mask - res_zone
    return f"""
WITH zones AS ({zones_sql}),
m AS (
  SELECT ix, iy, CAST(w AS DOUBLE) AS w, (ix >> {k}) AS zx, (iy >> {k}) AS zy
  FROM ({mask_sql})),
wsum AS (
  SELECT zx, zy, CAST(sum(CAST(w AS DECIMAL(28,15))) AS DOUBLE) AS w_sum
  FROM m GROUP BY zx, zy)
SELECT m.ix, m.iy, m.zx, m.zy, round(m.w, 6) AS w,
       round(CAST(z.total AS DOUBLE) * m.w / s.w_sum, 6) AS value
FROM m JOIN wsum s ON m.zx = s.zx AND m.zy = s.zy
JOIN zones z ON m.zx = z.zx AND m.zy = z.zy
"""
