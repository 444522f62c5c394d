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


def test_ripley_k_semantics(spark):
    """A tight cluster scores l_minus_r > 0 at small radii; a regular grid
    of the same size scores below the clustered value."""
    from raptor_rag_spark.operators.stats import ripley_k

    cluster = [(i, 0.5 + 0.001 * (i % 5), 0.5 + 0.001 * (i // 5)) for i in range(25)]
    grid = [(i, 0.1 + 0.16 * (i % 5), 0.1 + 0.16 * (i // 5)) for i in range(25)]
    mk = lambda rows: spark.createDataFrame(rows, "vec_id long, x double, y double")  # noqa: E731

    kc = {r["r"]: r for r in ripley_k(mk(cluster), [0.05]).collect()}
    kg = {r["r"]: r for r in ripley_k(mk(grid), [0.05]).collect()}
    assert kc[0.05]["l_minus_r"] > 0          # clustered
    assert kg[0.05]["n_pairs"] == 0           # grid spacing 0.16 > 0.05
    assert kc[0.05]["n_pairs"] == 25 * 24 // 2  # all pairs within radius


def test_ripley_k_twin(spark):
    from raptor_rag_spark.operators.stats import ripley_k, ripley_k_sql
    import duckdb

    rows = [(i, (i * 37 % 101) / 101.0, (i * 53 % 97) / 97.0) for i in range(60)]
    pts = spark.createDataFrame(rows, "vec_id long, x double, y double")
    radii = [0.02, 0.07, 0.15]
    got = sorted(tuple(r) for r in ripley_k(pts, radii).collect())
    vals = " UNION ALL ".join(
        f"SELECT {i} AS vec_id, {x!r} AS x, {y!r} AS y" for i, x, y in rows
    )
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(ripley_k_sql(vals, radii)).fetchall()
    )
    assert got == want


def test_trajectory_stats(spark):
    from raptor_rag_spark.operators.spacetime import (
        trajectory_stats,
        trajectory_stats_sql,
    )
    import duckdb

    rows = [
        # user 1: straight line east, 3 unit steps of 0.1
        (1, 1, "2024-01-01 00:00:00", 0.1, 0.5),
        (1, 2, "2024-01-01 01:00:00", 0.2, 0.5),
        (1, 3, "2024-01-01 02:00:00", 0.3, 0.5),
        (1, 4, "2024-01-01 03:00:00", 0.4, 0.5),
        # user 2: out and back (net 0)
        (2, 5, "2024-01-01 00:00:00", 0.5, 0.5),
        (2, 6, "2024-01-01 01:00:00", 0.5, 0.9),
        (2, 7, "2024-01-01 02:00:00", 0.5, 0.5),
        # user 3: single point
        (3, 8, "2024-01-01 00:00:00", 0.7, 0.7),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, x double, y double"
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "x", "y")
    out = {r["user_id"]: r for r in trajectory_stats(df).collect()}

    assert abs(out[1]["path_len"] - 0.3) < 1e-9
    assert abs(out[1]["straightness"] - 1.0) < 1e-9
    assert abs(out[1]["mean_step"] - 0.1) < 1e-9
    assert abs(out[2]["path_len"] - 0.8) < 1e-9
    assert out[2]["net_disp"] == 0.0 and out[2]["straightness"] == 0.0
    assert out[3]["n_points"] == 1 and out[3]["path_len"] == 0.0
    assert out[3]["straightness"] == 1.0

    vals = " UNION ALL ".join(
        f"SELECT {u} AS user_id, {e} AS event_id, TIMESTAMP '{t}' AS ts, "
        f"{x!r} AS x, {y!r} AS y"
        for u, e, t, x, y in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(trajectory_stats_sql(vals)).fetchall()
    )
    got = sorted(tuple(r) for r in trajectory_stats(df).collect())
    assert got == want


def test_traj_resample_matches_dense_reference(spark):
    """Arc-length resampling vs a pure-Python polyline walk: equal-fraction
    targets, lowest covering segment, linear interpolation, single-point
    trajectories repeat their point."""
    import math

    from raptor_rag_spark.operators.spacetime import traj_resample

    trajs = {
        1: [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)],          # L-shape
        2: [(0.2, 0.3)],                                   # single point
        3: [(0.0, 0.0), (0.0, 0.0), (0.5, 0.5)],           # zero-length seg
        4: [(0.1, 0.9), (0.4, 0.5), (0.9, 0.6), (0.2, 0.2)],
    }
    rows = [
        (uid, i, float(i), x, y)
        for uid, pts in trajs.items()
        for i, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts double, x double, y double"
    )
    k = 8
    got = {
        (r["user_id"], r["sample_idx"]): (r["sx"], r["sy"])
        for r in traj_resample(df, n_samples=k).collect()
    }
    for uid, pts in trajs.items():
        cum = [0.0]
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            cum.append(cum[-1] + math.hypot(x1 - x0, y1 - y0))
        total = cum[-1]
        for j in range(k):
            d = (j / (k - 1)) * total
            if len(pts) == 1:
                ex, ey = pts[0]
            else:
                seg = next(
                    i for i in range(len(pts) - 1) if cum[i] <= d <= cum[i + 1]
                )
                ln = cum[seg + 1] - cum[seg]
                t = (d - cum[seg]) / ln if ln > 0 else 0.0
                ex = pts[seg][0] + t * (pts[seg + 1][0] - pts[seg][0])
                ey = pts[seg][1] + t * (pts[seg + 1][1] - pts[seg][1])
            sx, sy = got[(uid, j)]
            assert abs(sx - ex) < 1e-8 and abs(sy - ey) < 1e-8, (uid, j)
    assert len(got) == len(trajs) * k
