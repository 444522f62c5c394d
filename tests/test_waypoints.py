"""Great-circle waypoint slerp: arc proportionality and sphere membership."""

import math

import pytest

from raptor_rag_spark.functions import trig as T
from raptor_rag_spark.plans.contract import GEO_LAT0, GEO_LON0, q_geo_waypoints


def _to_vec(lat, lon):
    return (
        math.cos(lat) * math.cos(lon),
        math.cos(lat) * math.sin(lon),
        math.sin(lat),
    )


def _angle(v1, v2):
    dot = sum(a * b for a, b in zip(v1, v2))
    return math.acos(max(min(dot, 1.0), -1.0))


def test_waypoints_divide_the_arc(spark):
    rows = q_geo_waypoints(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3 * 500
    a = _to_vec(GEO_LAT0, GEO_LON0)
    # check a sample of vectors: waypoint angle from A is f times the full arc
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["f"]] = (r["lat_w"], r["lon_w"])
    for vid in list(by_vec)[:25]:
        fs = by_vec[vid]
        assert set(fs) == {0.25, 0.5, 0.75}
        p_half = _to_vec(*fs[0.5])
        p_q = _to_vec(*fs[0.25])
        full = 2 * _angle(a, p_half)  # half-point doubles back to the arc
        if full < 1e-6:
            continue
        assert _angle(a, p_q) == pytest.approx(0.25 * full, abs=1e-6)
        assert _angle(a, p_half) == pytest.approx(0.5 * full, abs=1e-9)
        # all waypoints lie on the unit sphere (lat/lon valid by construction)
        for f, (latw, lonw) in fs.items():
            assert -math.pi / 2 - 1e-9 <= latw <= math.pi / 2 + 1e-9
            assert -math.pi - 1e-9 <= lonw <= math.pi + 1e-9
