"""Geohash: matches the textbook bisection algorithm; prefixes nest."""

from __future__ import annotations

import duckdb

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _textbook_geohash(lon: float, lat: float, precision: int) -> str:
    """Independent reference: classic bisection geohash (no bit tricks)."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lo_lon = mid
            else:
                ch *= 2
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lo_lat = mid
            else:
                ch *= 2
                hi_lat = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(ALPHABET[ch])
            bit, ch = 0, 0
    return "".join(out)


PTS = [(0.0, 0.0), (0.5, 0.5), (0.999999, 0.999999), (0.123456, 0.654321), (0.731, 0.292)]


def test_matches_textbook_bisection():
    from raptor_rag_spark.operators.geohash import geohash_sql

    con = duckdb.connect()
    for x, y in PTS:
        got = con.execute(f"SELECT {geohash_sql(repr(x), repr(y), 8)}").fetchone()[0]
        want = _textbook_geohash(x * 360.0 - 180.0, y * 180.0 - 90.0, 8)
        assert got == want, (x, y, got, want)


def test_prefix_nesting():
    from raptor_rag_spark.operators.geohash import geohash_sql

    con = duckdb.connect()
    for x, y in PTS:
        g8 = con.execute(f"SELECT {geohash_sql(repr(x), repr(y), 8)}").fetchone()[0]
        g4 = con.execute(f"SELECT {geohash_sql(repr(x), repr(y), 4)}").fetchone()[0]
        g2 = con.execute(f"SELECT {geohash_sql(repr(x), repr(y), 2)}").fetchone()[0]
        assert g8.startswith(g4) and g4.startswith(g2)


def test_spark_twin(spark):
    from raptor_rag_spark.operators.geohash import geohash_cells, geohash_sql

    df = spark.createDataFrame(PTS, "x double, y double")
    got = sorted(r["gh"] for r in geohash_cells(df).collect())
    con = duckdb.connect()
    want = sorted(
        con.execute(f"SELECT {geohash_sql(repr(x), repr(y), 8)}").fetchone()[0] for x, y in PTS
    )
    assert got == want
