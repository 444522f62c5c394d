"""Drift/trend/concentration operators vs brute-force Python references."""

import math
from collections import Counter
from datetime import datetime, timedelta

import numpy as np
import pytest

from raptor_rag_spark.operators.drift import host_gini, term_drift, theil_sen_hosts
from raptor_rag_spark.operators.webops import URL_RE


def _jsd(c1: Counter, c2: Counter) -> float:
    t1, t2 = sum(c1.values()), sum(c2.values())
    s = 0.0
    for term in set(c1) | set(c2):
        p, q = c1.get(term, 0) / t1, c2.get(term, 0) / t2
        m = (p + q) / 2
        if p > 0:
            s += 0.5 * p * math.log(p / m)
        if q > 0:
            s += 0.5 * q * math.log(q / m)
    return s


def test_term_drift_matches_brute_jsd(spark):
    weeks = [datetime(2025, 1, 6), datetime(2025, 1, 13), datetime(2025, 1, 20)]
    texts = {
        0: ["alpha beta gamma", "alpha beta", "gamma delta"],
        1: ["alpha beta gamma", "alpha beta", "gamma delta"],  # identical to wk0
        2: ["omega omega psi", "chi phi omega"],  # shifted vocabulary
    }
    rows = []
    for wi, wk in enumerate(weeks):
        for t in texts[wi]:
            rows.append((wk + timedelta(days=1), t))
    df = spark.createDataFrame(rows, "warc_ts TIMESTAMP, text STRING")
    got = {(r["week1"], r["week2"]): r for r in term_drift(df).collect()}
    assert len(got) == 2

    cs = [Counter(" ".join(texts[i]).split()) for i in range(3)]
    r01 = got[("2025-01-06", "2025-01-13")]
    assert r01["jsd"] == pytest.approx(0.0, abs=1e-9)  # identical weeks
    r12 = got[("2025-01-13", "2025-01-20")]
    assert r12["jsd"] == pytest.approx(_jsd(cs[1], cs[2]), abs=1e-5)
    assert r12["n_terms"] == len(set(cs[1]) | set(cs[2]))
    assert 0.0 <= r12["jsd"] <= math.log(2) + 1e-9


def test_theil_sen_matches_brute_median(spark):
    # host a: clean +2/week trend with one outlier week; host b: flat
    weekly = {
        "a.com": [(0, 10), (1, 12), (2, 50), (3, 16), (4, 18)],
        "b.org": [(0, 5), (1, 5), (2, 5)],
    }
    rows = []
    base = datetime(2025, 1, 6)
    for host, series in weekly.items():
        for wi, c in series:
            for k in range(c):
                rows.append((f"https://{host}/p{k}", base + timedelta(weeks=wi)))
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP")
    got = {r["host"]: r for r in theil_sen_hosts(df, URL_RE).collect()}
    for host, series in weekly.items():
        slopes = sorted(
            (c2 - c1) / (w2 - w1)
            for i, (w1, c1) in enumerate(series)
            for (w2, c2) in series[i + 1:]
        )
        med = slopes[(len(slopes) + 1) // 2 - 1]
        r = got[host]
        assert r["n_weeks"] == len(series)
        assert r["n_pairs"] == len(slopes)
        assert r["slope_med"] == pytest.approx(med, abs=1e-6)
    # the outlier week doesn't drag host a's trend far from +2
    assert abs(got["a.com"]["slope_med"] - 2.0) < 1.5


def test_host_gini_matches_brute(spark):
    counts = {"a.com": 1, "b.org": 1, "c.net": 2, "d.io": 16}
    rows = [
        (f"https://{h}/x{i}", ) for h, c in counts.items() for i in range(c)
    ]
    df = spark.createDataFrame(rows, "url STRING")
    r = host_gini(df, URL_RE).collect()[0]
    xs = np.sort(np.array(list(counts.values()), dtype=float))
    n = len(xs)
    gini = (2 * np.sum((np.arange(1, n + 1)) * xs) - (n + 1) * xs.sum()) / (
        n * xs.sum()
    )
    assert r["n_hosts"] == n
    assert r["total_pages"] == int(xs.sum())
    assert r["gini"] == pytest.approx(gini, abs=1e-6)
    # sanity: perfectly equal distribution → 0
    eq = spark.createDataFrame(
        [(f"https://h{i}.com/p{j}",) for i in range(4) for j in range(3)],
        "url STRING",
    )
    assert host_gini(eq, URL_RE).collect()[0]["gini"] == pytest.approx(0.0, abs=1e-9)


def test_ses_forecast_matches_recursive_brute(spark):
    from raptor_rag_spark.operators.drift import host_ses_forecast

    base = datetime(2025, 1, 6)
    series = [5, 9, 4, 12, 8, 15, 7]
    rows = [
        (f"https://h.com/p{wi}_{k}", base + timedelta(weeks=wi))
        for wi, c in enumerate(series)
        for k in range(c)
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP")
    r = host_ses_forecast(df, URL_RE, alpha=0.4).collect()[0]
    # recursive reference: s_1 = x_1; s_t = a*x_t + (1-a)*s_{t-1}
    a = 0.4
    s = series[0]
    for x in series[1:-1]:
        s = a * x + (1 - a) * s
    assert r["actual"] == series[-1]
    assert r["forecast"] == pytest.approx(s, abs=1e-6)
    assert r["ape"] == pytest.approx(abs(s - series[-1]) / series[-1], abs=1e-6)
