"""Pure-numpy computational-geometry kernels (no Spark imports).

``hull_edges`` is Andrew's monotone chain (the textbook O(m log m) convex
hull) emitting the DIRECTED CLOCKWISE edge cycle — exactly the edge set the
all-points-to-the-right SQL test produces on point sets with no three
collinear boundary points, which is what the DuckDB oracle twin checks.
"""

from __future__ import annotations

import numpy as np


def hull_edges(
    xs: np.ndarray, ys: np.ndarray, ids: np.ndarray
) -> list[tuple[int, int]]:
    """Directed clockwise hull edges (a_id, b_id) of the point set.

    Input points must be exact-deduplicated. Collinear boundary points are
    dropped (strict turns only). Size 1 → no edges; size 2 → both directed
    edges of the segment (the degenerate cycle).
    """
    m = len(xs)
    if m <= 1:
        return []
    order = np.lexsort((ys, xs))
    px, py, pid = xs[order], ys[order], ids[order]
    if m == 2:
        return [(int(pid[0]), int(pid[1])), (int(pid[1]), int(pid[0]))]

    def chain(idx_iter):
        out: list[int] = []
        for i in idx_iter:
            while len(out) >= 2:
                ox, oy = px[out[-2]], py[out[-2]]
                ax, ay = px[out[-1]], py[out[-1]]
                # strict left turn required; <= pops collinear points
                if (ax - ox) * (py[i] - oy) - (ay - oy) * (px[i] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(m))
    upper = chain(range(m - 1, -1, -1))
    ring = lower[:-1] + upper[:-1]  # CCW cycle of point indices
    ring = ring[::-1]  # clockwise
    return [
        (int(pid[ring[i]]), int(pid[ring[(i + 1) % len(ring)]]))
        for i in range(len(ring))
    ]
