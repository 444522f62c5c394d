"""STR packing invariants: full pages, exact page count, spatial coherence."""

import math

import numpy as np

from raptor_rag_spark.operators.layout import str_layout


def test_str_layout_packing_invariants(spark):
    rng = np.random.RandomState(9)
    n, b = 1000, 64
    pts = rng.rand(n, 2)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "vec_id LONG, x DOUBLE, y DOUBLE",
    )
    rows = str_layout(df, page_cap=b).collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n

    pages = {}
    for r in rows:
        pages.setdefault(r["page_id"], []).append(r["vec_id"])
    # exact bulk-load page count and capacity bound
    assert len(pages) == math.ceil(n / b)
    assert all(len(v) <= b for v in pages.values())
    # ~100% fill: at most one underfull page per slice
    slices = {}
    for r in rows:
        slices.setdefault(r["slice_id"], set()).add(r["page_id"])
    for sid, pids in slices.items():
        sizes = sorted(len(pages[p]) for p in pids)
        assert all(s == b for s in sizes[1:])  # only the smallest may be short

    # spatial coherence: mean page bbox area well under random assignment
    xy = {i: pts[i] for i in range(n)}
    areas = []
    for pid, members in pages.items():
        a = np.array([xy[m] for m in members])
        areas.append((a[:, 0].ptp()) * (a[:, 1].ptp()))
    rand_members = np.array_split(rng.permutation(n), len(pages))
    rand_areas = []
    for chunk in rand_members:
        a = np.array([xy[m] for m in chunk])
        rand_areas.append((a[:, 0].ptp()) * (a[:, 1].ptp()))
    assert np.mean(areas) < 0.3 * np.mean(rand_areas)
