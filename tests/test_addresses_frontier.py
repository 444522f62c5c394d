"""Tests for tile addressing schemes and the crawl-frontier scheduler."""

from __future__ import annotations

import numpy as np


def _ref_geohash(x: float, y: float, chars: int) -> str:
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    bits = []
    lox, hix, loy, hiy = 0.0, 1.0, 0.0, 1.0
    for i in range(5 * chars):
        if i % 2 == 0:
            mid = (lox + hix) / 2
            if x >= mid:
                bits.append(1)
                lox = mid
            else:
                bits.append(0)
                hix = mid
        else:
            mid = (loy + hiy) / 2
            if y >= mid:
                bits.append(1)
                loy = mid
            else:
                bits.append(0)
                hiy = mid
    out = []
    for c in range(chars):
        v = 0
        for b in bits[5 * c : 5 * c + 5]:
            v = (v << 1) | b
        out.append(alpha[v])
    return "".join(out)


def test_tile_addresses_match_references(spark):
    from raptor_rag_spark.operators.layout import tile_addresses

    rng = np.random.default_rng(51)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(rng.uniform(0, 0.999, (60, 2)))]
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    res, chars = 5, 4
    got = {r["vec_id"]: r for r in tile_addresses(df, res=res, geohash_chars=chars).collect()}
    n = 1 << res
    for i, x, y in pts:
        r = got[i]
        ix, iy = min(int(x * n), n - 1), min(int(y * n), n - 1)
        assert (r["ix"], r["iy"]) == (ix, iy)
        # quadkey: base-4 digits MSB-first, digit = xbit + 2*ybit
        qk = "".join(
            str(((ix >> b) & 1) + 2 * ((iy >> b) & 1)) for b in range(res - 1, -1, -1)
        )
        assert r["quadkey"] == qk
        # quadkey prefix property: parent tile = prefix
        assert r["tms"] == f"{res}/{ix}/{iy}"
        assert r["geohash"] == _ref_geohash(x, y, chars)
        # zkey consistent with the quadkey digits read back
        z = 0
        for d in qk:
            z = (z << 2) | ((int(d) & 1) << 1) | (int(d) >> 1)
        assert r["zkey"] == z


def test_crawl_frontier_politeness(spark):
    from raptor_rag_spark.operators.webops import crawl_frontier

    pages = spark.createDataFrame(
        [(f"https://h{i % 3}.example.com/p/{i}", "t") for i in range(12)],
        "url string, text string",
    )
    ranks = spark.createDataFrame(
        [("h0.example.com", 0.5), ("h1.example.com", 0.3), ("h2.example.com", 0.2)],
        "host string, rank double",
    )
    rows = sorted(crawl_frontier(pages, ranks).collect(), key=lambda r: r["priority"])
    # priorities are a permutation 1..12
    assert [r["priority"] for r in rows] == list(range(1, 13))
    # slots are non-decreasing along the schedule (politeness waves)
    slots = [r["slot"] for r in rows]
    assert slots == sorted(slots)
    # within a slot wave, higher-rank hosts come first
    for a, b in zip(rows, rows[1:]):
        if a["slot"] == b["slot"]:
            assert a["rank"] >= b["rank"]
    # each host is fetched at most once per slot wave
    seen = set()
    for r in rows:
        assert (r["slot"], r["host"]) not in seen
        seen.add((r["slot"], r["host"]))
