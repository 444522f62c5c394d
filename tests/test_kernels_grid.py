"""Quadkey grid + PIP kernel contracts (new operators per north rule)."""

import numpy as np
import pytest

from raptor_rag_spark.kernels.grid import (
    MAX_RES,
    cell_boundary,
    cell_bounds,
    cell_children,
    cell_decode,
    cell_encode,
    cell_neighbors,
    cell_parent,
    point_in_polygon,
    soft_cell_assign,
)


def test_encode_decode_roundtrip():
    xs = np.array([0.0, 0.25, 0.5, 0.999, 1.0])
    ys = np.array([0.1, 0.6, 0.5, 0.001, 1.0])
    cells = cell_encode(xs, ys, 4)
    res, ix, iy = cell_decode(cells)
    assert np.all(res == 4)
    assert np.all(ix == np.clip((xs * 16).astype(int), 0, 15))
    assert np.all(iy == np.clip((ys * 16).astype(int), 0, 15))


def test_res0_single_cell():
    cells = cell_encode(np.linspace(0, 1, 10), np.linspace(0, 1, 10), 0)
    assert len(set(cells.tolist())) == 1


def test_parent_is_bit_arithmetic():
    c = cell_encode(np.array([0.7]), np.array([0.3]), 8)[0]
    p = cell_parent(c)
    res, ix, iy = cell_decode(p)
    cres, cix, ciy = cell_decode(c)
    assert res == 7 and ix == cix >> 1 and iy == ciy >> 1
    # multi-step parent == repeated single-step
    assert cell_parent(c, 3) == cell_parent(cell_parent(cell_parent(c)))


def test_children_inverse_of_parent():
    c = cell_encode(np.array([0.2]), np.array([0.9]), 5)[0]
    kids = cell_children(int(c))
    assert len(kids) == 4
    for k in kids:
        assert cell_parent(k) == c


def test_parent_above_zero_raises():
    c = cell_encode(np.array([0.5]), np.array([0.5]), 0)[0]
    with pytest.raises(ValueError):
        cell_parent(c)


def test_neighbors_interior_and_corner():
    interior = cell_encode(np.array([0.5]), np.array([0.5]), 4)[0]
    assert len(cell_neighbors(int(interior))) == 8
    corner = cell_encode(np.array([0.0]), np.array([0.0]), 4)[0]
    assert len(cell_neighbors(int(corner))) == 3
    assert len(cell_neighbors(int(corner), include_self=True)) == 4


def test_bounds_and_boundary():
    c = cell_encode(np.array([0.5]), np.array([0.5]), 1)[0]
    x0, y0, x1, y1 = cell_bounds(int(c))
    assert (x0, y0, x1, y1) == (0.5, 0.5, 1.0, 1.0)
    ring = cell_boundary(int(c))
    assert ring.shape == (4, 2)
    ring_buf = cell_boundary(int(c), buffer=0.1)
    assert ring_buf[0, 0] == pytest.approx(0.4)


def test_pip_square():
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    xs = np.array([0.5, 1.5, -0.1, 0.99])
    ys = np.array([0.5, 0.5, 0.5, 0.01])
    assert point_in_polygon(xs, ys, ring).tolist() == [True, False, False, True]


def test_pip_nonconvex():
    # L-shaped polygon
    ring = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)
    xs = np.array([0.5, 1.5, 1.5, 0.5])
    ys = np.array([0.5, 0.5, 1.5, 1.5])
    assert point_in_polygon(xs, ys, ring).tolist() == [True, True, False, True]


def test_soft_assign_home_always_present():
    xs = np.array([0.51, 0.49, 0.125])
    ys = np.array([0.51, 0.49, 0.125])
    assigns = soft_cell_assign(xs, ys, 2, buffer=0.0)
    home = cell_encode(xs, ys, 2)
    for k, cells in enumerate(assigns):
        assert cells.tolist() == [home[k]]


def test_soft_assign_boundary_multi_membership():
    # point just inside a cell edge at res 2 (cell size 0.25): buffer pulls in neighbors
    xs = np.array([0.251])
    ys = np.array([0.6])
    assigns = soft_cell_assign(xs, ys, 2, buffer=0.05)
    assert len(assigns[0]) >= 2  # home + at least the left neighbor
    home = cell_encode(xs, ys, 2)[0]
    assert home in assigns[0]


def test_soft_assign_interior_single_membership():
    xs = np.array([0.125])
    ys = np.array([0.125])
    assigns = soft_cell_assign(xs, ys, 2, buffer=0.01)
    assert len(assigns[0]) == 1


def test_max_res_guard():
    with pytest.raises(ValueError):
        cell_encode(np.array([0.5]), np.array([0.5]), MAX_RES + 1)
