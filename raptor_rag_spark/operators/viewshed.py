"""Viewshed (line-of-sight) analysis over a raster terrain.

For an observer standing on the terrain, mark every cell visible or hidden:
a cell is hidden when some closer cell on the SAME lattice ray out of the
viewpoint subtends a greater-or-equal vertical angle. This is the discrete
lattice line-of-sight (the well-defined exact variant of the classic R3
viewshed): two cells occlude each other iff they are exactly collinear with
the viewpoint.

Ray identification WITHOUT gcd: for offset (dx, dy) let c = max(|dx|, |dy|)
(Chebyshev distance). Cells on one ray sit at k·(sdx, sdy) for the primitive
direction (sdx, sdy), so dx/c = sdx/max(|sdx|,|sdy|) — the k cancels in the
exact rational, and IEEE division is correctly rounded, so collinear cells
map to the IDENTICAL double pair (rx, ry) while non-collinear cells cannot
collide (distinct rationals p/q with p, q ≤ 2^14 differ by ≥ 1/(q·q') ≥ 2^-28
relative, far above the 2^-52 double ulp). c is k·max(|sdx|,|sdy|), strictly
increasing along the ray, so "closer" is c-ascending, and the occlusion key
slope = (elev − eye)/c differs from the true tangent by a constant positive
per-ray factor — comparisons (all intra-ray) are unchanged. Visibility is
then ONE running-max window over slope partitioned by (rx, ry).

(An unrolled-Euclid gcd was tried first and rejected: each step references
its argument twice, so 18 unrolled steps explode the expression tree — the
SQL twin alone reached 430 MB. The Chebyshev ray key is two divisions.)

The viewpoint is itself a (broadcast) one-row DataFrame — typically the
argmax cell of the raster — so the whole plan stays declarative end to end
and the DuckDB twin derives the identical viewpoint from the identical
subquery; nothing is collected to the driver.

Scale shape: pure column arithmetic per cell, then a single window shuffle
partitioned by ray. Rays out of one viewpoint are ~8·n partitions of ≤ n
cells each at resolution n — no all-pairs, no Python, no driver loop. All
float math is correctly-rounded scalar IEEE division/compare on
twin-identical inputs, so the oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def viewshed(
    raster: DataFrame,
    viewpoint: DataFrame,
    observer_height: float = 2.0,
    value_col: str = "density",
) -> DataFrame:
    """(ix, iy, cheb, slope, visible) — line-of-sight over ``raster``
    (ix, iy, value_col) from the single cell in ``viewpoint`` (vix, viy).
    The eye sits ``observer_height`` above the terrain at the viewpoint,
    which is emitted visible with cheb = 0."""
    v = F.col(value_col).cast("double")
    base = raster.select(F.col("ix"), F.col("iy"), v.alias("elev"))
    eye = (
        base.join(
            F.broadcast(viewpoint.select("vix", "viy")),
            (F.col("ix") == F.col("vix")) & (F.col("iy") == F.col("viy")),
        )
        .select("vix", "viy", (F.col("elev") + F.lit(float(observer_height))).alias("eye"))
    )
    dx = (F.col("ix") - F.col("vix")).cast("double")
    dy = (F.col("iy") - F.col("viy")).cast("double")
    c = F.greatest(F.abs(F.col("ix") - F.col("vix")), F.abs(F.col("iy") - F.col("viy"))).cast(
        "long"
    )
    cd = c.cast("double")
    pts = base.crossJoin(F.broadcast(eye)).select(
        "ix",
        "iy",
        c.alias("cheb"),
        F.when(c > 0, dx / cd).otherwise(F.lit(0.0)).alias("rx"),
        F.when(c > 0, dy / cd).otherwise(F.lit(0.0)).alias("ry"),
        F.when(c > 0, (F.col("elev") - F.col("eye")) / cd).otherwise(F.lit(0.0)).alias("slope"),
    )
    w = (
        Window.partitionBy("rx", "ry")
        .orderBy("cheb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    horizon = F.max("slope").over(w)
    return pts.select(
        "ix",
        "iy",
        "cheb",
        "slope",
        F.when(F.col("cheb") == 0, F.lit(True))
        .otherwise(F.col("slope") > F.coalesce(horizon, F.lit(float("-inf"))))
        .alias("visible"),
    )


def viewshed_sql(
    raster_sql: str,
    viewpoint_sql: str,
    observer_height: float = 2.0,
    value_col: str = "density",
) -> str:
    """DuckDB twin of :func:`viewshed`. ``raster_sql`` selects (ix, iy,
    value_col); ``viewpoint_sql`` selects one row (vix, viy)."""
    return f"""
WITH base AS (SELECT ix, iy, CAST({value_col} AS DOUBLE) AS elev FROM ({raster_sql})),
vp AS ({viewpoint_sql}),
eye AS (
  SELECT vix, viy, elev + {float(observer_height)!r} AS eye
  FROM base JOIN vp ON ix = vix AND iy = viy),
pts AS (
  SELECT ix, iy, cheb,
         CASE WHEN cheb > 0 THEN CAST(ix - vix AS DOUBLE) / CAST(cheb AS DOUBLE) ELSE 0.0 END AS rx,
         CASE WHEN cheb > 0 THEN CAST(iy - viy AS DOUBLE) / CAST(cheb AS DOUBLE) ELSE 0.0 END AS ry,
         CASE WHEN cheb > 0 THEN (elev - eye) / CAST(cheb AS DOUBLE) ELSE 0.0 END AS slope
  FROM (SELECT *, CAST(greatest(abs(ix - vix), abs(iy - viy)) AS BIGINT) AS cheb
        FROM base CROSS JOIN eye))
SELECT ix, iy, cheb, slope,
       CASE WHEN cheb = 0 THEN TRUE
            ELSE slope > coalesce(
              max(slope) OVER (PARTITION BY rx, ry ORDER BY cheb
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              CAST('-infinity' AS DOUBLE)) END AS visible
FROM pts
"""
