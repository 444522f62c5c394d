"""Hydrology operators (D8 flow direction / accumulation / basins) vs a
dense pure-Python reference, plus DuckDB twin equality."""

from __future__ import annotations

import numpy as np

_D8 = [
    (0, 1, 0),
    (1, 1, 1),
    (2, 0, 1),
    (3, -1, 1),
    (4, -1, 0),
    (5, -1, -1),
    (6, 0, -1),
    (7, 1, -1),
]
_W = 0.7071067811865476


def _make_raster(seed: int = 11, res: int = 4, n_cells: int = 70):
    n = 1 << res
    rng = np.random.default_rng(seed)
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (n_cells, 2))}
    return {c: float(rng.uniform(0.1, 5.0)) for c in cells}


def _ref_flow(vals):
    """(ix,iy) -> (dir, target|None): steepest distance-weighted drop,
    smallest code on ties, targets restricted to populated cells."""
    flow = {}
    for (ix, iy), z in vals.items():
        best = None
        for code, dx, dy in _D8:
            t = (ix + dx, iy + dy)
            if t in vals:
                w = _W if dx * dy != 0 else 1.0
                drop = (z - vals[t]) * w
                if drop > 0 and (best is None or drop > best[0]):
                    best = (drop, code, t)
        flow[(ix, iy)] = (best[1], best[2]) if best else (-1, None)
    return flow


def _ref_paths(vals, max_rounds=40):
    """origin -> list of cells visited after the origin (capped walk)."""
    flow = _ref_flow(vals)
    out = {}
    for o in vals:
        seq, cur = [], o
        for _ in range(max_rounds):
            d, t = flow[cur]
            if t is None:
                break
            seq.append(t)
            cur = t
        out[o] = seq
    return out


def test_flow_direction_matches_reference(spark):
    from raptor_rag_spark.operators.hydrology import flow_direction

    vals = _make_raster()
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    got = {
        (r["ix"], r["iy"]): (r["dir"], (r["nix"], r["niy"]) if r["nix"] is not None else None)
        for r in flow_direction(df, res=4).collect()
    }
    ref = _ref_flow(vals)
    assert set(got) == set(ref)
    for c, (d, t) in ref.items():
        assert got[c] == (d, t), c


def test_flow_accumulation_matches_reference(spark):
    from raptor_rag_spark.operators.hydrology import flow_accumulation

    vals = _make_raster(seed=5)
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    counts = {c: 0 for c in vals}
    for o, seq in _ref_paths(vals).items():
        for c in seq:
            counts[c] += 1
    got = {
        (r["ix"], r["iy"]): r["acc"] for r in flow_accumulation(df, res=4).collect()
    }
    assert got == counts
    # the walk is conservative: total accumulation = total path length
    assert sum(got.values()) == sum(len(s) for s in _ref_paths(vals).values())


def test_flow_basins_matches_reference(spark):
    from raptor_rag_spark.operators.hydrology import flow_basins

    vals = _make_raster(seed=9)
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    paths = _ref_paths(vals)
    flow = _ref_flow(vals)
    want = {}
    for o, seq in paths.items():
        end = seq[-1] if seq else o
        if flow[end][1] is None:  # reached a pit within the cap
            want[o] = end
    got = {
        (r["ix"], r["iy"]): (r["sink_ix"], r["sink_iy"])
        for r in flow_basins(df, res=4).collect()
    }
    assert got == want
    # pits label themselves
    for c, (d, t) in flow.items():
        if d == -1:
            assert got[c] == c


def test_hydrology_duckdb_twins(spark):
    import duckdb

    from raptor_rag_spark.operators.hydrology import (
        flow_accumulation,
        flow_accumulation_sql,
        flow_basins,
        flow_basins_sql,
        flow_direction,
        flow_direction_sql,
    )

    vals = _make_raster(seed=21, n_cells=90)
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    raster_sql = " UNION ALL ".join(
        f"SELECT {ix} AS ix, {iy} AS iy, {v!r} AS density"
        for (ix, iy), v in vals.items()
    )
    con = duckdb.connect()
    for op, twin in (
        (flow_direction, flow_direction_sql),
        (flow_accumulation, flow_accumulation_sql),
        (flow_basins, flow_basins_sql),
    ):
        got = sorted(tuple(r) for r in op(df, res=4).collect())
        want = sorted(tuple(r) for r in con.execute(twin(raster_sql, res=4)).fetchall())
        assert got == want, op.__name__
