"""Twin sin/cos + haversine chord distance — bit-identical Spark / DuckDB / Python.

Same by-construction philosophy as sqlgen.exp_col/ln_col: never call the
engine's native sin/cos (libm versions differ in the last ulp across engines),
build them from +,-,*,/ and floor in a PINNED operation order so both engines
produce the same IEEE-754 doubles.

Domain: |x| ≤ 4 (covers [-π, π] with slack) — all the geodesic math needs,
since latitudes are in [-π/2, π/2] and half-angle deltas in [-π, π]. Range
reduction is one exact-split quarter-turn fold: k = floor(x·2/π + 0.5) ∈
[-3, 3], y = (x - k·PIO2_HI) - k·PIO2_LO with |y| ≤ π/4, then the quadrant
CASE maps sin(x) onto ±sin(y)/±cos(y). The y-polynomials are plain Taylor in
Horner form (9 terms; truncation < 1e-16 at |y| ≤ π/4, far below the 6-dp
oracle comparison and comparable to the twins' shared rounding).

Haversine: a = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2). We report the CHORD
distance 2R·√a (the through-sphere Euclidean metric, = 2R·sin(c/2)) — it is
a true metric, strictly monotone in great-circle distance, and needs no
asin/atan2 twin. SQL caveat as exp_sql: arguments are inlined many times —
pass simple column references only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hexgen import flit

TWO_OVER_PI = 0.6366197723675814
PIO2_HI = 1.5707963267341256  # high split of pi/2
PIO2_LO = 6.077100506506192e-11  # pi/2 - PIO2_HI (double-double tail)

def _fact(n: int) -> float:
    out = 1.0
    for i in range(2, n + 1):
        out *= i
    return out


_SIN_COEF = [((-1.0) ** n) / _fact(2 * n + 1) for n in range(9)]  # (-1)^n/(2n+1)!
_COS_COEF = [((-1.0) ** n) / _fact(2 * n) for n in range(9)]  # (-1)^n/(2n)!


# ---------------------------------------------------------------- Spark side

def _fold_col(x: Column) -> tuple[Column, Column]:
    """(k, y): quarter-turn fold. k is LONG, |y| <= pi/4."""
    k = F.floor(x * F.lit(TWO_OVER_PI) + F.lit(0.5)).cast("long")
    kd = k.cast("double")
    y = (x - kd * F.lit(PIO2_HI)) - kd * F.lit(PIO2_LO)
    return k, y


def _poly_col(y2: Column, coef: list[float]) -> Column:
    p = F.lit(coef[-1])
    for c in reversed(coef[:-1]):
        p = p * y2 + F.lit(c)
    return p


def sin_col(x: Column) -> Column:
    """Twin sine for |x| <= 4 as a Spark Column."""
    k, y = _fold_col(x)
    y2 = y * y
    s = y * _poly_col(y2, _SIN_COEF)
    c = _poly_col(y2, _COS_COEF)
    q = ((k % 4) + 4) % 4
    return (
        F.when(q == 0, s).when(q == 1, c).when(q == 2, -s).otherwise(-c)
    )


def cos_col(x: Column) -> Column:
    """Twin cosine for |x| <= 4 as a Spark Column."""
    k, y = _fold_col(x)
    y2 = y * y
    s = y * _poly_col(y2, _SIN_COEF)
    c = _poly_col(y2, _COS_COEF)
    q = ((k % 4) + 4) % 4
    return (
        F.when(q == 0, c).when(q == 1, -s).when(q == 2, -c).otherwise(s)
    )


def chord_dist_col(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, radius: float = 1.0
) -> Column:
    """Haversine chord distance 2R·√a as a Spark Column (pinned op order)."""
    sdlat = sin_col((lat2 - lat1) * F.lit(0.5))
    sdlon = sin_col((lon2 - lon1) * F.lit(0.5))
    a = sdlat * sdlat + cos_col(lat1) * cos_col(lat2) * (sdlon * sdlon)
    return F.lit(2.0 * radius) * F.sqrt(a)


# ---------------------------------------------------------------- DuckDB side

def _fold_sql(x: str) -> tuple[str, str]:
    k = f"CAST(floor(({x}) * {flit(TWO_OVER_PI)} + 0.5) AS BIGINT)"
    kd = f"CAST({k} AS DOUBLE)"
    y = f"((({x}) - {kd} * {flit(PIO2_HI)}) - {kd} * {flit(PIO2_LO)})"
    return k, y


def _poly_sql(y2: str, coef: list[float]) -> str:
    p = flit(coef[-1])
    for c in reversed(coef[:-1]):
        p = f"({p} * {y2} + {flit(c)})"
    return p


def sin_sql(x: str) -> str:
    """Twin sine as DuckDB SQL. ``x`` MUST be a simple column reference."""
    k, y = _fold_sql(x)
    y2 = f"({y} * {y})"
    s = f"({y} * {_poly_sql(y2, _SIN_COEF)})"
    c = _poly_sql(y2, _COS_COEF)
    q = f"((({k} % 4) + 4) % 4)"
    return (
        f"(CASE WHEN {q} = 0 THEN {s} WHEN {q} = 1 THEN {c} "
        f"WHEN {q} = 2 THEN -{s} ELSE -{c} END)"
    )


def cos_sql(x: str) -> str:
    """Twin cosine as DuckDB SQL. ``x`` MUST be a simple column reference."""
    k, y = _fold_sql(x)
    y2 = f"({y} * {y})"
    s = f"({y} * {_poly_sql(y2, _SIN_COEF)})"
    c = _poly_sql(y2, _COS_COEF)
    q = f"((({k} % 4) + 4) % 4)"
    return (
        f"(CASE WHEN {q} = 0 THEN {c} WHEN {q} = 1 THEN -{s} "
        f"WHEN {q} = 2 THEN -{c} ELSE {s} END)"
    )


# ---------------------------------------------------------------- Python side

def _fold_py(x: float) -> tuple[int, float]:
    import math

    k = int(math.floor(x * TWO_OVER_PI + 0.5))
    y = (x - k * PIO2_HI) - k * PIO2_LO
    return k, y


def _poly_py(y2: float, coef: list[float]) -> float:
    p = coef[-1]
    for c in reversed(coef[:-1]):
        p = p * y2 + c
    return p


def sin_py(x: float) -> float:
    k, y = _fold_py(x)
    y2 = y * y
    s = y * _poly_py(y2, _SIN_COEF)
    c = _poly_py(y2, _COS_COEF)
    return (s, c, -s, -c)[((k % 4) + 4) % 4]


def cos_py(x: float) -> float:
    k, y = _fold_py(x)
    y2 = y * y
    s = y * _poly_py(y2, _SIN_COEF)
    c = _poly_py(y2, _COS_COEF)
    return (c, -s, -c, s)[((k % 4) + 4) % 4]


def chord_dist_sql(lat1: str, lon1: str, lat2: str, lon2: str, radius: float = 1.0) -> str:
    """DuckDB twin of :func:`chord_dist_col`. Arguments should be simple
    column references or literals (they are inlined several times each)."""
    sdlat = sin_sql(f"((({lat2}) - ({lat1})) * 0.5)")
    sdlon = sin_sql(f"((({lon2}) - ({lon1})) * 0.5)")
    a = f"({sdlat} * {sdlat} + {cos_sql(lat1)} * {cos_sql(lat2)} * ({sdlon} * {sdlon}))"
    return f"({flit(2.0 * radius)} * sqrt({a}))"
