"""colocation_pairs and clark_evans vs brute-force references."""

import datetime

import numpy as np
import pytest

from raptor_rag_spark.operators.spacetime import colocation_pairs
from raptor_rag_spark.operators.stats import clark_evans
from raptor_rag_spark.kernels.grid import COORD_BITS


def test_colocation_matches_bruteforce(spark):
    rng = np.random.RandomState(6)
    n = 150
    uids = rng.randint(0, 12, size=n)
    xs, ys = rng.rand(n), rng.rand(n)
    secs = rng.randint(0, 86400, size=n)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (int(uids[i]), i, t0 + datetime.timedelta(seconds=int(secs[i])),
         float(xs[i]), float(ys[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP, x DOUBLE, y DOUBLE"
    )
    res, t_eps = 4, 3600
    got = {
        (r["user_a"], r["user_b"]): r
        for r in colocation_pairs(df, res=res, t_eps=t_eps).collect()
    }

    g = 1 << res
    def cell(x, y):
        return (max(min(int(x * g), g - 1), 0), max(min(int(y * g), g - 1), 0))

    ref = {}
    for i in range(n):
        for j in range(n):
            if uids[i] < uids[j] and cell(xs[i], ys[i]) == cell(xs[j], ys[j]) \
               and abs(int(secs[i]) - int(secs[j])) <= t_eps:
                k = (uids[i], uids[j])
                cnt, cells, first = ref.get(k, (0, set(), 1 << 60))
                cells.add(cell(xs[i], ys[i]))
                ref[k] = (cnt + 1, cells,
                          min(first, min(int(secs[i]), int(secs[j]))))
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert set(got) == set(ref)
    for k, (cnt, cells, first) in ref.items():
        assert got[k]["n_contacts"] == cnt
        assert got[k]["n_cells"] == len(cells)
        assert got[k]["first_t"] == base + first


def test_clark_evans_regular_vs_clustered(spark):
    # regular lattice → R well above 1; tight cluster → R far below 1
    lat = [
        (i * 16 + j, (i + 0.5) / 16, (j + 0.5) / 16)
        for i in range(16)
        for j in range(16)
    ]
    df = spark.createDataFrame(lat, "vec_id LONG, x DOUBLE, y DOUBLE")
    r_lat = clark_evans(df, res=5).collect()[0]
    # exact: every lattice NN dist is 1/16; expected = 0.5/sqrt(256) = 1/32
    assert r_lat["n"] == 256
    assert r_lat["mean_nn"] == pytest.approx(1 / 16, abs=1e-6)
    assert r_lat["r_index"] == pytest.approx(2.0, abs=1e-4)
    assert r_lat["z"] > 20

    rng = np.random.RandomState(8)
    blob = rng.randn(200, 2) * 0.005 + 0.5
    df2 = spark.createDataFrame(
        [(i, float(p[0]), float(p[1])) for i, p in enumerate(blob)],
        "vec_id LONG, x DOUBLE, y DOUBLE",
    )
    r_blob = clark_evans(df2, res=5).collect()[0]
    assert r_blob["r_index"] < 0.3
    assert r_blob["z"] < -10

    # brute-force mean NN check on the blob
    d2 = ((blob[:, None, :] - blob[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref_mean = np.mean(np.round(np.sqrt(d2.min(1)), 6))
    assert r_blob["mean_nn"] == pytest.approx(ref_mean, abs=1e-5)
