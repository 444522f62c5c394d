"""Twin sin/cos and haversine chord distance: accuracy vs libm, bit-identity
across Python/DuckDB/Spark, and metric properties."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from raptor_rag_spark.functions import trig as T


def test_accuracy_vs_libm():
    xs = np.linspace(-4.0, 4.0, 2001)
    for x in xs:
        x = float(x)
        assert abs(T.sin_py(x) - math.sin(x)) < 3e-16
        assert abs(T.cos_py(x) - math.cos(x)) < 3e-16


def test_duckdb_bit_identical_to_python():
    xs = [float(x) for x in np.linspace(-4.0, 4.0, 801)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    rows = con.execute(f"SELECT x, {T.sin_sql('x')} AS s, {T.cos_sql('x')} AS c FROM t").fetchall()
    for x, s, c in rows:
        assert s == T.sin_py(x) and c == T.cos_py(x), x


def test_spark_bit_identical_to_python(spark):
    from pyspark.sql import functions as F

    xs = [(float(x),) for x in np.linspace(-4.0, 4.0, 801)]
    df = spark.createDataFrame(xs, "x double")
    rows = df.select("x", T.sin_col(F.col("x")).alias("s"), T.cos_col(F.col("x")).alias("c")).collect()
    for r in rows:
        assert r["s"] == T.sin_py(r["x"]) and r["c"] == T.cos_py(r["x"]), r["x"]


def _chord_py(lat1, lon1, lat2, lon2):
    sdlat = T.sin_py((lat2 - lat1) * 0.5)
    sdlon = T.sin_py((lon2 - lon1) * 0.5)
    a = sdlat * sdlat + T.cos_py(lat1) * T.cos_py(lat2) * (sdlon * sdlon)
    return 2.0 * math.sqrt(a)


def test_chord_is_geodesic_chord():
    """2·sin(c/2) where c is the true central angle — checked against the
    3D unit-vector chord length."""
    rng = np.random.default_rng(17)
    for _ in range(200):
        lat1, lat2 = rng.uniform(-math.pi / 2, math.pi / 2, 2)
        lon1, lon2 = rng.uniform(-math.pi, math.pi, 2)
        v1 = np.array([math.cos(lat1) * math.cos(lon1), math.cos(lat1) * math.sin(lon1), math.sin(lat1)])
        v2 = np.array([math.cos(lat2) * math.cos(lon2), math.cos(lat2) * math.sin(lon2), math.sin(lat2)])
        want = float(np.linalg.norm(v1 - v2))
        got = _chord_py(lat1, lon1, lat2, lon2)
        assert abs(got - want) < 1e-12


def test_chord_sql_twin():
    rng = np.random.default_rng(23)
    rows = [
        (i, float(rng.uniform(-math.pi / 2, math.pi / 2)), float(rng.uniform(-math.pi, math.pi)))
        for i in range(300)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE g(id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    sql = T.chord_dist_sql("0.7", "-2.1", "lat", "lon")
    got = dict(con.execute(f"SELECT id, {sql} FROM g").fetchall())
    for i, lat, lon in rows:
        assert got[i] == _chord_py(0.7, -2.1, lat, lon), i


def test_atan_atan2_twins_and_accuracy():
    rng = np.random.default_rng(37)
    vals = [float(v) for v in np.linspace(-50, 50, 1001)] + [0.0, 1.0, -1.0, 1e-12, 1e12]
    for t in vals:
        assert abs(T.atan_py(t) - math.atan(t)) < 5e-16
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    for v, r in con.execute(f"SELECT v, {T.atan_sql('v')} FROM t").fetchall():
        assert r == T.atan_py(v), v
    for _ in range(500):
        y, x = float(rng.normal()), float(rng.normal())
        assert abs(T.atan2_py(y, x) - math.atan2(y, x)) < 1e-15
    # axis cases
    assert T.atan2_py(1.0, 0.0) == T.PI_2 and T.atan2_py(-1.0, 0.0) == -T.PI_2
    assert T.atan2_py(0.0, 0.0) == 0.0


def test_bearing_cardinal_directions():
    """From the origin: due north/east bearings come out 0/90 degrees."""
    def bearing(lat1, lon1, lat2, lon2):
        dlon = lon2 - lon1
        yc = T.sin_py(dlon) * T.cos_py(lat2)
        xc = T.cos_py(lat1) * T.sin_py(lat2) - T.sin_py(lat1) * (T.cos_py(lat2) * T.cos_py(dlon))
        d = T.atan2_py(yc, xc) * 57.29577951308232
        return d + 360.0 if d < 0 else d

    assert abs(bearing(0.0, 0.0, 0.5, 0.0) - 0.0) < 1e-9     # north
    assert abs(bearing(0.0, 0.0, 0.0, 0.5) - 90.0) < 1e-9    # east
    assert abs(bearing(0.0, 0.0, -0.5, 0.0) - 180.0) < 1e-9  # south
    assert abs(bearing(0.0, 0.0, 0.0, -0.5) - 270.0) < 1e-9  # west


def test_asin_twin_and_arc_roundtrip():
    vals = [float(v) for v in np.linspace(0.0, 1.0, 1001)]
    for z in vals:
        assert abs(T.asin_py(z) - math.asin(z)) < 5e-16
    con = duckdb.connect()
    con.execute("CREATE TABLE t(z DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    xs, rs, res = T.asin_sql("z")
    rows = con.execute(
        f"WITH a AS (SELECT z, {xs} AS asx FROM t), "
        f"b AS (SELECT z, asx, {rs} AS atr FROM a) SELECT z, {res} FROM b"
    ).fetchall()
    for z, r in rows:
        assert r == T.asin_py(z), z
    # arc round trip: chord = 2 sin(c/2)  =>  2 asin(chord/2) == c
    for c in np.linspace(0.0, math.pi - 0.01, 200):
        chord = 2.0 * math.sin(c / 2.0)
        assert abs(2.0 * T.asin_py(chord / 2.0) - c) < 1e-12


def test_geodesic_destination_round_trip():
    """Full-suite composition check: bearing + arc from A to B, then the
    destination formula from A with that (bearing, arc) lands back on B —
    every term built from the twin sin/cos/asin/atan2."""
    rng = np.random.default_rng(43)

    def bearing(lat1, lon1, lat2, lon2):
        dlon = lon2 - lon1
        yc = T.sin_py(dlon) * T.cos_py(lat2)
        xc = T.cos_py(lat1) * T.sin_py(lat2) - T.sin_py(lat1) * (T.cos_py(lat2) * T.cos_py(dlon))
        return T.atan2_py(yc, xc)

    for _ in range(300):
        lat1 = float(rng.uniform(-1.4, 1.4))
        lon1 = float(rng.uniform(-3.0, 3.0))
        lat2 = float(rng.uniform(-1.4, 1.4))
        lon2 = float(rng.uniform(-3.0, 3.0))
        arc = 2.0 * T.asin_py(_chord_py(lat1, lon1, lat2, lon2) / 2.0)
        th = bearing(lat1, lon1, lat2, lon2)
        sphi2 = T.sin_py(lat1) * T.cos_py(arc) + T.cos_py(lat1) * T.sin_py(arc) * T.cos_py(th)
        phi2 = T.asin_py(max(min(sphi2, 1.0), -1.0))
        lam2 = lon1 + T.atan2_py(
            T.sin_py(th) * T.sin_py(arc) * T.cos_py(lat1),
            T.cos_py(arc) - T.sin_py(lat1) * sphi2,
        )
        # normalize lon into (-pi, pi]
        while lam2 > math.pi:
            lam2 -= 2 * math.pi
        while lam2 <= -math.pi:
            lam2 += 2 * math.pi
        assert abs(phi2 - lat2) < 1e-9
        assert abs(lam2 - lon2) < 1e-9 or abs(abs(lam2 - lon2) - 2 * math.pi) < 1e-9


def test_inline_guard_rejects_compound_arguments():
    """The twin *_sql generators inline their argument 10-50x; a compound
    expression must fail loudly (ValueError telling the caller to stage it
    as a column), never silently explode the oracle SQL (VERDICT r2 #8)."""
    import pytest

    from raptor_rag_spark.functions import sqlgen as G

    # a 64-term projection-fold-ish compound: way over the inline budget
    compound = "(" + " + ".join(f"embedding[{i}] * 0.5" for i in range(16)) + ")"
    assert len(compound) > G.MAX_INLINE_ARG
    for fn in (T.sin_sql, T.cos_sql, T.atan_sql, G.exp_sql, G.ln_sql):
        with pytest.raises(ValueError, match="stage it as a column"):
            fn(compound)
    with pytest.raises(ValueError, match="stage it as a column"):
        T.atan2_sql("yc", compound)
    with pytest.raises(ValueError, match="stage it as a column"):
        T.chord_dist_sql("a_column_name_longer_than_the_composed_budget", "0.0", "lat", "lon")
    # embedded subqueries and newlines are rejected outright
    with pytest.raises(ValueError, match="stage it as a column"):
        T.sin_sql("(SELECT max(x) FROM t)")
    # the documented contract still works: simple refs and short literals
    assert "CASE" in T.sin_sql("lat")
    assert "power" in G.exp_sql("(-(s / CAST(n AS DOUBLE)))")


def test_rhumb_line_matches_libm_navigation(spark):
    """q_rhumb_line semantics vs the textbook loxodrome formulas computed
    with libm (approx — the twin kernels agree with libm to ~4e-16): bearing
    = atan2(Δλ, Δψ), distance = √(Δφ² + q²Δλ²) on the unit sphere."""
    from raptor_rag_spark.plans.contract import (
        GEO_LAT0,
        GEO_LON0,
        q_geo_chord,
        q_rhumb_line,
    )

    sf_dir = "/root/testdata/sf0.001"
    pts = {
        r["vec_id"]: (r["lon"], r["lat"])
        for r in q_geo_chord(spark, sf_dir).select("vec_id", "lon", "lat").collect()
    }
    got = {r["vec_id"]: r for r in q_rhumb_line(spark, sf_dir).collect()}
    assert set(got) == set(pts)
    psi1 = math.log(math.tan(math.pi / 4 + GEO_LAT0 / 2))
    for vid, (lon, lat) in list(pts.items())[:200]:
        dlon = lon - GEO_LON0
        if dlon > math.pi:
            dlon -= 2 * math.pi
        elif dlon < -math.pi:
            dlon += 2 * math.pi
        dpsi = math.log(math.tan(math.pi / 4 + lat / 2)) - psi1
        dphi = lat - GEO_LAT0
        brg = math.degrees(math.atan2(dlon, dpsi)) % 360.0
        q = dphi / dpsi if abs(dpsi) > 1e-12 else math.cos(GEO_LAT0)
        dist = math.sqrt(dphi * dphi + q * q * dlon * dlon)
        assert abs(got[vid]["bearing_deg"] - brg) < 1e-9, vid
        assert abs(got[vid]["rhumb_dist"] - dist) < 1e-12, vid
