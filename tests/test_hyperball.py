"""HyperBall ball-size / harmonic-centrality estimates on known graphs.

m = 64 registers with n ≪ 64 distinct reachable nodes keeps the estimator
in its linear-counting regime: est = 64·ln(64/(64−occ)) where occ is the
occupied-bucket count — exact when no two reachable nodes hash to the same
bucket, a mild underestimate otherwise. Tolerances below allow one bucket
collision."""

import math

import pytest

from raptor_rag_spark.operators.hyperball import hyperball


def _links(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host STRING, dst_host STRING, n_links LONG",
    )


def _lc(n):
    """Linear-counting estimate of n with zero bucket collisions."""
    return 64.0 * math.log(64.0 / (64.0 - n))


def test_path_graph_reach_and_harmonic(spark):
    # a0 -> a1 -> ... -> a7: B(a_i, 4) = {a_i..a_min(i+4,7)}
    pairs = [(f"a{i}", f"a{i + 1}") for i in range(7)]
    rows = {r["host"]: r for r in hyperball(_links(spark, pairs), rounds=4).collect()}
    assert set(rows) == {f"a{i}" for i in range(8)}
    # one collision among <=5 hashed nodes shifts est by ~1
    assert rows["a0"]["reach_est"] == pytest.approx(_lc(5), abs=1.3)
    assert rows["a7"]["reach_est"] == pytest.approx(_lc(1), abs=0.01)
    assert rows["a7"]["harmonic"] == 0.0
    # harmonic decreases toward the path's end (smaller forward balls)
    assert rows["a0"]["harmonic"] > rows["a5"]["harmonic"] > rows["a7"]["harmonic"]
    # a0's harmonic ~ 1/1 + 1/2 + 1/3 + 1/4
    assert rows["a0"]["harmonic"] == pytest.approx(
        sum(1 / r for r in range(1, 5)), abs=0.6
    )


def test_star_center_reaches_all_in_one_hop(spark):
    pairs = [("hub", f"s{i}") for i in range(10)]
    rows = {r["host"]: r for r in hyperball(_links(spark, pairs), rounds=2).collect()}
    assert rows["hub"]["reach_est"] == pytest.approx(_lc(11), abs=1.5)
    # leaves have no out-edges: ball stays {leaf}
    assert rows["s3"]["reach_est"] == pytest.approx(_lc(1), abs=0.01)
    # all of the hub's gain arrives at r = 1, so harmonic == reach - |{hub}|
    assert rows["hub"]["harmonic"] == pytest.approx(
        rows["hub"]["reach_est"] - _lc(1), abs=1e-4
    )


def test_cycle_is_symmetric(spark):
    pairs = [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)]
    rows = hyperball(_links(spark, pairs), rounds=3).collect()
    # every node sees exactly 4 nodes (itself + 3 forward); different
    # 4-subsets may differ by one collision
    assert len(rows) == 6
    for r in rows:
        assert r["reach_est"] == pytest.approx(_lc(4), abs=1.2)
        assert r["harmonic"] > 0.0
