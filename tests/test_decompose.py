"""Grid decomposition utilities tests."""
import numpy as np
import pytest

from levelsetpy_tpu import create_grid
from levelsetpy_tpu.decompose import (cell_neighbors, cells_from_grid,
                                      flock_grids, get_ogp_bounds, sep_grid,
                                      split_grid, split_grid_same_dim)


def test_sep_grid():
    g = create_grid([0, 1, 2, 3], [1, 2, 3, 4], [5, 6, 7, 8])
    subs = sep_grid(g, [[0, 2], [1, 3]])
    assert subs[0].shape == (5, 7)
    assert subs[1].shape == (6, 8)


def test_get_ogp_bounds_snaps_to_lattice():
    g = create_grid([0.0, 0.0], [1.0, 1.0], 11)  # dx 0.1
    lo, hi, n = get_ogp_bounds(g, [0.23, 0.0], [0.68, 1.0], 0.0)
    np.testing.assert_allclose(lo, [0.2, 0.0])
    np.testing.assert_allclose(hi, [0.7, 1.0])
    assert n == (6, 11)


def test_split_same_dim_covers_and_overlaps():
    g = create_grid([-1.0, -1.0], [1.0, 1.0], 21)
    pieces = split_grid_same_dim(g, [[-1, 0, 1], [-1, 0, 1]], padding=0.1)
    assert len(pieces) == 4
    # union of pieces covers the domain
    los = np.array([p.lo for p in pieces])
    his = np.array([p.hi for p in pieces])
    assert los.min(0).tolist() == [-1.0, -1.0]
    assert his.max(0).tolist() == [1.0, 1.0]
    # overlap: a low piece extends past 0 by the padding
    assert his[0][0] > 0.0


def test_split_grid_with_projection():
    g = create_grid([0, 0, 0], [1, 1, 1], 11)
    out = split_grid(g, [[0, 1]], [[0, 0.5, 1.0], [0, 1.0], [0, 1.0]])
    assert len(out) == 1 and len(out[0]) == 2
    assert all(p.ndim == 2 for p in out[0])


def test_cells_and_neighbors():
    g = create_grid([0, 0], [1, 1], 13)
    cells, layout = cells_from_grid(g, [3, 3], padding=0.0)
    assert len(cells) == 9 and layout.shape == (3, 3)
    center = int(layout[1, 1])
    n_face = cell_neighbors(layout, center)
    n_all = cell_neighbors(layout, center, diagonal=True)
    assert len(n_face) == 4
    assert len(n_all) == 8
    corner = int(layout[0, 0])
    assert len(cell_neighbors(layout, corner)) == 2


def test_flock_grids_offsets():
    g = create_grid([-1, -1], [1, 1], 11)
    gs = flock_grids(g, [[0, 0], [2, 3]])
    np.testing.assert_allclose(gs[0].lo, [-1, -1])
    np.testing.assert_allclose(gs[1].lo, [1, 2])
    np.testing.assert_allclose(gs[1].hi, [3, 4])
