"""Emerging-hotspot (space-time cube + Mann-Kendall) semantics + twin tests."""

import duckdb
from pyspark.sql import functions as F


def _events(spark, series: dict[tuple[float, float], list[int]]):
    """series: (x, y) -> per-day event counts starting 2024-01-01."""
    rows = []
    for (x, y), counts in series.items():
        for day, n in enumerate(counts):
            for i in range(n):
                rows.append((x, y, f"2024-01-{day + 1:02d} 12:00:{i % 60:02d}"))
    return spark.createDataFrame(rows, "x double, y double, ts_s string").select(
        "x", "y", F.to_timestamp("ts_s").alias("ts")
    )


def test_emerging_hotspot_categories(spark):
    from raptor_rag_spark.operators.spacetime import emerging_hotspots

    # res=2 → cells are 0.25-wide; four well-separated locations
    series = {
        (0.10, 0.10): [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],  # monotone rise
        (0.60, 0.10): [10, 9, 8, 7, 6, 5, 4, 3, 2, 1],  # monotone fall
        (0.10, 0.60): [3, 3, 3, 3, 3, 3, 3, 3, 3, 3],   # flat
        (0.60, 0.60): [0, 0, 0, 0, 0, 0, 0, 0, 0, 7],   # burst in final day
    }
    out = {r["cell_id"]: r for r in emerging_hotspots(_events(spark, series), res=2).collect()}
    from raptor_rag_spark.kernels.grid import cell_encode

    rise = out[int(cell_encode(0.10, 0.10, 2))]
    fall = out[int(cell_encode(0.60, 0.10, 2))]
    flat = out[int(cell_encode(0.10, 0.60, 2))]
    burst = out[int(cell_encode(0.60, 0.60, 2))]

    assert rise["category"] == "intensifying" and rise["s_stat"] == 45
    assert fall["category"] == "diminishing" and fall["s_stat"] == -45
    assert flat["category"] == "persistent" and flat["s_stat"] == 0
    assert burst["category"] == "new" and burst["total"] == 7
    assert all(r["n_periods"] == 10 for r in out.values())  # global window


def test_emerging_hotspot_twin(spark):
    from raptor_rag_spark.operators.spacetime import (
        emerging_hotspots,
        emerging_hotspots_sql,
    )

    series = {
        (0.05, 0.05): [2, 0, 5, 1, 9],
        (0.80, 0.30): [0, 0, 1, 4, 4],
        (0.30, 0.80): [6, 2, 0, 0, 0],
    }
    df = _events(spark, series)
    got = sorted(tuple(r) for r in emerging_hotspots(df, res=2).collect())
    rows = df.select("x", "y", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")).collect()
    vals = " UNION ALL ".join(
        f"SELECT {r['x']} AS x, {r['y']} AS y, TIMESTAMP '{r['t']}' AS ts" for r in rows
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        emerging_hotspots_sql(vals, res=2)
    ).fetchall())
    assert got == want
