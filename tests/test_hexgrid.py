"""Hexagonal (H3-style) lattice: geometry invariants + Spark/DuckDB twin.

The hex lattice must satisfy the defining properties (nearest-center
assignment, center round-trip, parent center containment) and the hex_assign /
hex_density operators must be bit-identical to their DuckDB oracles.
"""

from __future__ import annotations

import duckdb
import numpy as np

from raptor_rag_spark.functions import hexgen as H


def _centers(res: int, qs, rs):
    s = H.hex_size(res)
    q = np.asarray(qs, dtype=np.float64)
    r = np.asarray(rs, dtype=np.float64)
    cx = q * (1.5 * s)
    cy = r * (H.SQRT3 * s) + q * (H.SQRT3 * s * 0.5)
    return cx, cy


def _assign_py(x, y, res: int):
    """Pure-python cube rounding, same literal order as the twins."""
    a, b, c = H._axial_consts(res)
    qf = x * a
    rf = x * b + y * c
    sf = -qf - rf
    qr, rr, sr = np.floor(qf + 0.5), np.floor(rf + 0.5), np.floor(sf + 0.5)
    dq, dr, ds = abs(qr - qf), abs(rr - rf), abs(sr - sf)
    if dq > dr and dq > ds:
        qr = -rr - sr
    elif dr > ds:
        rr = -qr - sr
    return int(qr), int(rr)


def test_nearest_center_assignment():
    """Every point maps to the hexagon whose center is Euclid-nearest
    (the defining property of cube rounding), checked by brute force."""
    rng = np.random.default_rng(7)
    res = 3
    pts = rng.random((200, 2))
    # covers the full axial range of the unit square at res 3
    # (q in [0, 2/(3s)] ~ [0, 43]; r in [-1/(3s), sqrt3/(3s)] ~ [-22, 37])
    grid = [(q, r) for q in range(-3, 48) for r in range(-26, 42)]
    cx, cy = _centers(res, [g[0] for g in grid], [g[1] for g in grid])
    for x, y in pts:
        got = _assign_py(x, y, res)
        d2 = (cx - x) ** 2 + (cy - y) ** 2
        best = grid[int(np.argmin(d2))]
        # ties are measure-zero under random floats
        assert got == best, (x, y, got, best)


def test_center_round_trip():
    res = 5
    qs = np.arange(0, 30)
    rs = np.arange(-15, 15)
    for q in qs:
        for r in rs:
            cx, cy = _centers(res, [q], [r])
            assert _assign_py(float(cx[0]), float(cy[0]), res) == (q, r)


def _parent_py(q: int, r: int) -> tuple[int, int]:
    """Integer aperture-4 parent (same rule as hexgen.hex_parent_cols)."""
    qr, rr, sr = (q + 1) >> 1, (r + 1) >> 1, (1 - q - r) >> 1
    tq, tr, ts = abs(qr * 2 - q), abs(rr * 2 - r), abs(sr * 2 + q + r)
    if tq > tr and tq > ts:
        return -rr - sr, rr
    if tr > ts:
        return qr, -qr - sr
    return qr, rr


def test_parent_contains_child_center():
    """Center-containment parent semantics: a child's center lies within one
    parent circumradius of its parent's center (ties land exactly on the
    boundary, distance (√3/2)·s_parent), and the integer rule agrees with
    float cube rounding wherever the float path is tie-free."""
    res = 6
    rng = np.random.default_rng(11)
    pts = rng.random((100, 2))
    s_par = H.hex_size(res - 1)
    for x, y in pts:
        q, r = _assign_py(x, y, res)
        pq, pr = _parent_py(q, r)
        cx, cy = _centers(res, [q], [r])
        pcx, pcy = _centers(res - 1, [pq], [pr])
        d = float(np.hypot(pcx[0] - cx[0], pcy[0] - cy[0]))
        assert d <= s_par + 1e-12
        # tie-free children (even q, even r => exact parent coords) must
        # match the float cube-round of the center exactly
        if q % 2 == 0 and r % 2 == 0:
            assert (pq, pr) == _assign_py(float(cx[0]), float(cy[0]), res - 1)


def test_hex_assign_twin(spark):
    from raptor_rag_spark.operators.hexgrid import hex_assign, hex_assign_sql

    rng = np.random.default_rng(3)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.random((300, 2)))]
    df = spark.createDataFrame(rows, "vec_id long, x double, y double")
    got = {
        r["vec_id"]: (r["hex_q"], r["hex_r"], r["hex_id"], r["parent_id"])
        for r in hex_assign(df, res=6).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE points_tbl(vec_id BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO points_tbl VALUES (?, ?, ?)", rows)
    want = {
        v: (q, r, h, p)
        for v, q, r, h, p in con.execute(
            hex_assign_sql("SELECT vec_id, x, y FROM points_tbl", res=6, id_col="vec_id")
        ).fetchall()
    }
    assert got == want
    # ids decode back to the axial coords
    for q, r, h, p in got.values():
        assert (h >> H.RES_SHIFT) == 6
        assert ((h >> H.COORD_BITS) & H.COORD_MASK) - H.OFF == q
        assert (h & H.COORD_MASK) - H.OFF == r
        assert (p >> H.RES_SHIFT) == 5


def test_hex_density_twin_and_mass(spark):
    from raptor_rag_spark.operators.hexgrid import hex_density, hex_density_sql

    rng = np.random.default_rng(5)
    rows = [(float(x), float(y)) for x, y in rng.random((500, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    out = hex_density(df, res=4).collect()
    assert sum(r["cnt"] for r in out) == len(rows)
    assert all(r["ring_cnt"] >= r["cnt"] for r in out)
    con = duckdb.connect()
    con.execute("CREATE TABLE points_tbl(x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO points_tbl VALUES (?, ?)", rows)
    want = {
        (q, r): (c, rc)
        for q, r, c, rc in con.execute(
            hex_density_sql("SELECT x, y FROM points_tbl", res=4)
        ).fetchall()
    }
    got = {(r["hex_q"], r["hex_r"]): (r["cnt"], r["ring_cnt"]) for r in out}
    assert got == want


def test_ring_count_matches_neighbor_sum(spark):
    """ring_cnt is exactly cnt + sum of the 6 axial neighbors' cnt."""
    from raptor_rag_spark.operators.hexgrid import hex_density

    rng = np.random.default_rng(9)
    rows = [(float(x), float(y)) for x, y in rng.random((400, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {(r["hex_q"], r["hex_r"]): (r["cnt"], r["ring_cnt"]) for r in hex_density(df, res=3).collect()}
    for (q, r), (cnt, ring) in out.items():
        want = cnt + sum(
            out.get((q + dq, r + dr), (0, 0))[0] for dq, dr in H.AXIAL_NEIGHBORS
        )
        assert ring == want


def test_hex_pyramid_twin_and_mass(spark):
    """Pyramid levels conserve mass and match the DuckDB twin exactly."""
    from raptor_rag_spark.operators.hexgrid import hex_pyramid, hex_pyramid_sql

    rng = np.random.default_rng(13)
    rows = [(float(x), float(y)) for x, y in rng.random((400, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    out = hex_pyramid(df, res=5, levels=3).collect()
    for res in (5, 4, 3):
        assert sum(r["cnt"] for r in out if r["res"] == res) == len(rows), res
    con = duckdb.connect()
    con.execute("CREATE TABLE points_tbl(x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO points_tbl VALUES (?, ?)", rows)
    want = {
        tuple(r)
        for r in con.execute(
            hex_pyramid_sql("SELECT x, y FROM points_tbl", res=5, levels=3)
        ).fetchall()
    }
    got = {(r["res"], r["hex_q"], r["hex_r"], r["cnt"]) for r in out}
    assert got == want


def test_hex_soft_assign_twin_and_semantics(spark):
    """Every point keeps its home hex (hexdist <= 1 there); neighbors appear
    only within the eps collar; Spark == DuckDB exactly."""
    import duckdb as _dd

    from raptor_rag_spark.operators.hexgrid import hex_soft_assign, hex_soft_assign_sql

    rng = np.random.default_rng(21)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.random((300, 2)))]
    df = spark.createDataFrame(rows, "vec_id long, x double, y double")
    out = hex_soft_assign(df, res=5, eps=0.2).collect()
    homes = [r for r in out if r["is_home"]]
    assert len(homes) == len(rows)  # exactly one home per point
    assert all(r["hexdist"] <= 1.0 + 1e-12 for r in homes)
    others = [r for r in out if not r["is_home"]]
    assert others and all(r["hexdist"] <= 1.2 for r in others)
    assert min(r["hexdist"] for r in others) > 0.8  # collar, not interior
    con = _dd.connect()
    con.execute("CREATE TABLE points_tbl(vec_id BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO points_tbl VALUES (?, ?, ?)", rows)
    want = {
        tuple(r)
        for r in con.execute(
            hex_soft_assign_sql("SELECT vec_id, x, y FROM points_tbl", res=5, eps=0.2)
        ).fetchall()
    }
    got = {(r["vec_id"], r["hex_q"], r["hex_r"], r["is_home"], r["hexdist"]) for r in out}
    assert got == want
