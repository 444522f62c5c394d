"""S2-style spherical cells: geometry invariants + Spark/DuckDB twin."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from raptor_rag_spark.functions import trig as T


def _s2_py(lon: float, lat: float, res: int):
    """Reference implementation with the twin sin/cos (same op order)."""
    n = 1 << res
    cl = T.cos_py(lat)
    vx, vy, vz = cl * T.cos_py(lon), cl * T.sin_py(lon), T.sin_py(lat)
    ax, ay, az = abs(vx), abs(vy), abs(vz)
    if ax >= ay and ax >= az:
        face = 0 if vx >= 0 else 3
    elif ay >= az:
        face = 1 if vy >= 0 else 4
    else:
        face = 2 if vz >= 0 else 5
    uv = {
        0: lambda: (vy / vx, vz / vx),
        1: lambda: (-vx / vy, vz / vy),
        2: lambda: (-vx / vz, -vy / vz),
        3: lambda: (vz / vx, vy / vx),
        4: lambda: (vz / vy, -vx / vy),
        5: lambda: (-vy / vz, -vx / vz),
    }
    u, v = uv[face]()
    i = max(min(int(math.floor((u * 0.5 + 0.5) * float(n))), n - 1), 0)
    j = max(min(int(math.floor((v * 0.5 + 0.5) * float(n))), n - 1), 0)
    hx, hy, hkey = i, j, 0
    for b in range(res - 1, -1, -1):
        s = 1 << b
        rx, ry = (hx >> b) & 1, (hy >> b) & 1
        hkey += s * s * ((rx * 3) ^ ry)
        if ry == 1:
            pass
        elif rx == 1:
            hx, hy = s - 1 - hy, s - 1 - hx
        else:
            hx, hy = hy, hx
    return face, i, j, hkey


RES = 6


def _pts():
    rng = np.random.default_rng(29)
    return [
        (
            int(k),
            float(rng.uniform(-math.pi, math.pi)),
            float(rng.uniform(-math.pi / 2, math.pi / 2)),
        )
        for k in range(400)
    ]


def test_faces_cover_and_ranges():
    faces = set()
    for _, lon, lat in _pts():
        f, i, j, h = _s2_py(lon, lat, RES)
        faces.add(f)
        assert 0 <= i < (1 << RES) and 0 <= j < (1 << RES)
        assert 0 <= h < (1 << (2 * RES))
    assert faces == {0, 1, 2, 3, 4, 5}  # 400 uniform points hit every face


def test_axis_points_hit_expected_faces():
    # lon=0,lat=0 -> +X face 0; lat=pi/2 -> +Z face 2; lon=pi/2 -> +Y face 1
    assert _s2_py(0.0, 0.0, RES)[0] == 0
    assert _s2_py(0.0, math.pi / 2, RES)[0] == 2
    assert _s2_py(math.pi / 2, 0.0, RES)[0] == 1
    assert _s2_py(math.pi, 0.0, RES)[0] == 3
    assert _s2_py(-math.pi / 2, 0.0, RES)[0] == 4
    assert _s2_py(0.0, -math.pi / 2, RES)[0] == 5


def test_duckdb_twin_matches_reference():
    from raptor_rag_spark.operators.s2 import s2_cells_sql

    rows = _pts()
    con = duckdb.connect()
    con.execute("CREATE TABLE g(vec_id BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    got = {
        r[0]: tuple(r[1:5])
        for r in con.execute(
            s2_cells_sql("SELECT vec_id, lon, lat FROM g", res=RES)
        ).fetchall()
    }
    for k, lon, lat in rows:
        assert got[k] == _s2_py(lon, lat, RES), k


def test_spark_twin_and_parent_prefix(spark):
    from raptor_rag_spark.operators.s2 import s2_cells, s2_cells_sql

    rows = _pts()
    df = spark.createDataFrame(rows, "vec_id long, lon double, lat double")
    out = s2_cells(df, res=RES).collect()
    for r in out:
        assert r["s2_id"] == r["face"] * (1 << (2 * RES)) + r["hkey"]
        assert r["parent_id"] == r["face"] * (1 << (2 * RES - 2)) + (r["hkey"] >> 2)
    con = duckdb.connect()
    con.execute("CREATE TABLE g(vec_id BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    want = {
        tuple(r)
        for r in con.execute(
            s2_cells_sql("SELECT vec_id, lon, lat FROM g", res=RES)
        ).fetchall()
    }
    got = {
        (r["vec_id"], r["face"], r["i"], r["j"], r["hkey"], r["s2_id"], r["parent_id"])
        for r in out
    }
    assert got == want
