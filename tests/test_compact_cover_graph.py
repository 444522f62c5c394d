"""compact/uncompact, polygon_cover, local_moran, pagerank vs independent
single-machine references (pure-python set algebra / numpy dense loops)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_rag_spark.kernels.grid import point_in_polygon
from raptor_rag_spark.operators.compact import compact_cells, uncompact_cells
from raptor_rag_spark.operators.graph import DAMPING, host_pagerank
from raptor_rag_spark.operators.heatmap import local_moran
from raptor_rag_spark.operators.pipjoin import polygon_cover


def _ref_compact(cells: set[tuple[int, int]], res: int, min_res: int = 0):
    """Reference compaction: bottom-up full-set closure, emit full cells
    whose parent is not full."""
    full = {res: set(cells)}
    for r in range(res, min_res, -1):
        parents: dict[tuple[int, int], int] = {}
        for ix, iy in full[r]:
            parents[(ix >> 1, iy >> 1)] = parents.get((ix >> 1, iy >> 1), 0) + 1
        full[r - 1] = {p for p, n in parents.items() if n == 4}
    out = {(min_res, ix, iy) for ix, iy in full[min_res]}
    for r in range(min_res + 1, res + 1):
        out |= {
            (r, ix, iy)
            for ix, iy in full[r]
            if (ix >> 1, iy >> 1) not in full[r - 1]
        }
    return out


def test_compact_matches_reference_and_roundtrips(spark):
    rng = np.random.default_rng(7)
    res = 4
    n = 1 << res
    pts = {(int(a), int(b)) for a, b in rng.integers(0, n, (400, 2))}
    # force one fully-covered coarse block so multi-level collapse triggers
    pts |= {(ix, iy) for ix in range(8) for iy in range(8)}
    df = spark.createDataFrame([(a, b) for a, b in pts], "ix long, iy long")
    got = {(r["res"], r["ix"], r["iy"]) for r in compact_cells(df, res).collect()}
    ref = _ref_compact(pts, res)
    assert got == ref
    # cover is strictly smaller than the input when any block is full
    assert len(got) < len(pts)
    # uncompact restores the exact base-resolution set
    cover = compact_cells(df, res)
    back = {(r["ix"], r["iy"]) for r in uncompact_cells(cover, res).collect()}
    assert back == pts


def test_compact_sql_twin(spark):
    import duckdb

    from raptor_rag_spark.operators.compact import compact_cells_sql

    rng = np.random.default_rng(11)
    res = 3
    pts = {(int(a), int(b)) for a, b in rng.integers(0, 1 << res, (50, 2))}
    pts |= {(ix, iy) for ix in range(4) for iy in range(4)}
    df = spark.createDataFrame([(a, b) for a, b in pts], "ix long, iy long")
    got = {tuple(r) for r in compact_cells(df, res).collect()}
    vals = ", ".join(f"({a}, {b})" for a, b in pts)
    sql = compact_cells_sql(f"SELECT * FROM (VALUES {vals}) t(ix, iy)", res)
    ref = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == ref


def test_polygon_cover_matches_dense_pip(spark):
    res = 5
    n = 1 << res
    rings = [
        (1, [[0.12, 0.11], [0.88, 0.15], [0.91, 0.87], [0.09, 0.83]]),
        (2, [[0.02, 0.03], [0.51, 0.07], [0.48, 0.52], [0.04, 0.49]]),
    ]
    polys = spark.createDataFrame(rings, "cell_id long, ring array<array<double>>")
    got = {
        (r["cell_id"], r["ix"], r["iy"])
        for r in polygon_cover(polys, res).collect()
    }
    ref = set()
    for pid, ring in rings:
        arr = np.array(ring)
        for ix in range(n):
            for iy in range(n):
                cx, cy = (ix + 0.5) / n, (iy + 0.5) / n
                if point_in_polygon(np.array([cx]), np.array([cy]), arr)[0]:
                    ref.add((pid, ix, iy))
    assert got == ref


def _ref_moran(vals: dict[tuple[int, int], float], n: int):
    mu = sum(vals.values()) / len(vals)
    z = {k: v - mu for k, v in vals.items()}
    m2 = sum(x * x for x in z.values()) / len(vals)
    out = {}
    for (ix, iy), zi in z.items():
        nbs = [
            z[(ix + dx, iy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
            and 0 <= ix + dx < n
            and 0 <= iy + dy < n
            and (ix + dx, iy + dy) in z
        ]
        if nbs:
            lag = sum(nbs) / len(nbs)
            out[(ix, iy)] = (len(nbs), zi * lag / m2)
    return out


def test_local_moran_matches_reference(spark):
    rng = np.random.default_rng(5)
    res = 3
    n = 1 << res
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2))}
    vals = {c: float(rng.uniform(0.1, 9.0)) for c in cells}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    got = {
        (r["ix"], r["iy"]): (r["n_nb"], r["moran_i"])
        for r in local_moran(df, res).collect()
    }
    ref = _ref_moran(vals, n)
    assert set(got) == set(ref)
    for k, (nn, mi) in ref.items():
        assert got[k][0] == nn
        assert got[k][1] == pytest.approx(mi, rel=1e-9)
    # a clustered high-value region should score positive I
    assert any(v > 0 for _, v in got.values())


def _ref_pagerank(urls: list[str], iterations: int = 5):
    """Dense numpy PageRank over the same hash-derived host graph."""
    import hashlib
    import re

    host_of = {u: re.match(r"^([a-z][a-z0-9+.-]*)://([^/?#]+)", u).group(2) for u in urls}
    hosts = sorted(set(host_of.values()))
    hid = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    out_deg = np.zeros(n)
    edges: dict[tuple[int, int], int] = {}
    for u in urls:
        src = hid[host_of[u]]
        h63 = int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
        dst = h63 % n
        out_deg[src] += 1
        edges[(src, dst)] = edges.get((src, dst), 0) + 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - DAMPING) / n)
        for (s, d), w in edges.items():
            nxt[d] += DAMPING * w * rank[s] / out_deg[s]
        rank = nxt
    return {h: rank[i] for h, i in hid.items()}, {h: int(out_deg[i]) for h, i in hid.items()}


def test_host_pagerank_matches_dense_reference(spark):
    hosts = [f"site{i}.example.com" for i in range(9)]
    urls = [f"https://{hosts[i % 9]}/p/{i}" for i in range(120)]
    pages = spark.createDataFrame([(u, "t") for u in urls], "url string, text string")
    got = {r["host"]: (r["out_deg"], r["rank"]) for r in host_pagerank(pages).collect()}
    ref_rank, ref_deg = _ref_pagerank(urls)
    assert set(got) == set(ref_rank)
    for h in ref_rank:
        assert got[h][0] == ref_deg[h]
        assert got[h][1] == pytest.approx(ref_rank[h], rel=1e-12)
    # probability mass is conserved (no dangling nodes by construction)
    assert sum(v for _, v in got.values()) == pytest.approx(1.0, abs=1e-9)


def _ref_geary(vals: dict[tuple[int, int], float], n: int):
    mu = sum(vals.values()) / len(vals)
    z = {k: v - mu for k, v in vals.items()}
    m2 = sum(x * x for x in z.values()) / len(vals)
    out = {}
    for (ix, iy), zi in z.items():
        nbs = [
            z[(ix + dx, iy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
            and 0 <= ix + dx < n
            and 0 <= iy + dy < n
            and (ix + dx, iy + dy) in z
        ]
        if nbs:
            msd = sum((zi - zj) ** 2 for zj in nbs) / len(nbs)
            out[(ix, iy)] = (len(nbs), msd / m2)
    return out


def test_local_geary_matches_reference(spark):
    from raptor_rag_spark.operators.heatmap import local_geary

    rng = np.random.default_rng(11)
    res = 3
    n = 1 << res
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2))}
    vals = {c: float(rng.uniform(0.1, 9.0)) for c in cells}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    got = {
        (r["ix"], r["iy"]): (r["n_nb"], r["geary_c"])
        for r in local_geary(df, res).collect()
    }
    ref = _ref_geary(vals, n)
    assert set(got) == set(ref)
    for k, (nn, gc) in ref.items():
        assert got[k][0] == nn
        assert got[k][1] == pytest.approx(gc, rel=1e-9)
    # Geary is non-negative by construction
    assert all(v[1] >= 0.0 for v in got.values())


def test_semivariogram_matches_reference(spark):
    from raptor_rag_spark.operators.heatmap import semivariogram

    rng = np.random.default_rng(17)
    res, max_lag = 3, 3
    n = 1 << res
    cells = {(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2))}
    vals = {c: float(rng.uniform(0.1, 9.0)) for c in cells}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in vals.items()], "ix long, iy long, density double"
    )
    got = {r["d2_cells"]: r for r in semivariogram(df, res, max_lag_cells=max_lag).collect()}

    # dense pair loop reference (ordered pairs, /2 in gamma)
    ref: dict[int, list[float]] = {}
    for (ax, ay), va in vals.items():
        for (bx, by), vb in vals.items():
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if 0 < d2 <= max_lag * max_lag:
                ref.setdefault(d2, []).append((va - vb) ** 2)
    assert set(got) == set(ref)
    for d2, sq in ref.items():
        r = got[d2]
        assert r["n_pairs"] == len(sq)
        assert r["gamma"] == pytest.approx(sum(sq) / (2 * len(sq)), rel=1e-9)
        assert r["lag_dist"] == pytest.approx((d2 ** 0.5) / n, rel=1e-12)
