"""Grid, boundary-condition and shape tests (reference parity + properties)."""
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import (Grid, create_grid, cylinder, difference,
                            intersection, pad_extrapolate, pad_periodic,
                            proj_grid, rectangle_by_corners, sphere,
                            truncate_grid, union)
from levelsetpy_tpu.boundary import pad_axis


class TestGrid:
    def test_create_basic(self):
        g = create_grid([-1, -2], [1, 2], 101)
        assert g.shape == (101, 101)
        assert g.ndim == 2
        # reference convention: dx = (hi-lo)/(N-1)  (process_grid.py:185)
        np.testing.assert_allclose(g.dx, [2 / 100, 4 / 100])

    def test_periodic_dims(self):
        g = create_grid([-5, -5, 0], [5, 5, 2 * np.pi], [41, 41, 41],
                        periodic_dims=[2])
        assert g.periodic == (False, False, True)

    def test_coords_endpoint_inclusive(self):
        g = create_grid([0.0], [1.0], 11)
        c = np.asarray(g.coord(0, jnp.float64))
        np.testing.assert_allclose(c, np.linspace(0, 1, 11))

    def test_mesh_matches_meshgrid(self):
        g = create_grid([0, 0], [1, 2], [5, 9])
        xs = g.mesh(jnp.float64)
        ref = np.meshgrid(np.linspace(0, 1, 5), np.linspace(0, 2, 9),
                          indexing="ij")
        np.testing.assert_allclose(xs[0], ref[0])
        np.testing.assert_allclose(xs[1], ref[1])

    def test_broadcastable_mesh(self):
        g = create_grid([0, 0, 0], [1, 1, 1], [4, 5, 6])
        xs = g.mesh_broadcastable()
        assert xs[0].shape == (4, 1, 1)
        assert xs[2].shape == (1, 1, 6)
        dense = sum(jnp.broadcast_to(x, g.shape) for x in xs)
        assert dense.shape == (4, 5, 6)

    def test_hashable_static(self):
        g1 = create_grid([0], [1], 11)
        g2 = create_grid([0], [1], 11)
        assert g1 == g2 and hash(g1) == hash(g2)

    def test_truncate(self):
        g = create_grid([0, 0], [1, 1], [11, 11])
        sub, sl = truncate_grid(g, [0.25, 0.0], [0.75, 1.0])
        assert sub.shape == (5, 11)
        data = jnp.arange(121.0).reshape(11, 11)
        assert data[sl].shape == (5, 11)
        np.testing.assert_allclose(sub.lo, [0.3, 0.0], atol=1e-12)

    def test_proj_grid(self):
        g = create_grid([0, 1, 2], [1, 2, 3], [5, 6, 7],
                        periodic_dims=[2])
        sub = proj_grid(g, [0, 2])
        assert sub.shape == (5, 7)
        assert sub.periodic == (False, True)


class TestBoundary:
    def test_periodic_wrap(self):
        x = jnp.arange(10.0)
        p = pad_periodic(x, 0, 3)
        np.testing.assert_allclose(p[:3], [7, 8, 9])
        np.testing.assert_allclose(p[-3:], [0, 1, 2])
        np.testing.assert_allclose(p[3:-3], x)

    def test_extrapolate_linear_away_from_zero(self):
        # positive edge values, increasing toward edge: slope keeps sign of
        # the edge value (away from zero), ref add_ghost_extrapolate.py:95-110
        x = jnp.array([2.0, 3.0, 4.0, 5.0])
        p = pad_extrapolate(x, 0, 2)
        # low edge value 2, |slope| = |2-3| = 1, sign(+2) → ghosts 2+k*1?? no:
        # ghost k cells out = edge + k*slope with slope=+1 → 3,4?? direction:
        # ghosts extend BELOW with increasing distance: [edge+2s, edge+1s]
        np.testing.assert_allclose(p[:2], [4.0, 3.0])
        np.testing.assert_allclose(p[-2:], [6.0, 7.0])

    def test_extrapolate_negative_edge(self):
        x = jnp.array([-2.0, -1.0, 1.0, 2.0])
        p = pad_extrapolate(x, 0, 1)
        # low edge -2: slope = |(-2)-(-1)|*sign(-2) = -1 → ghost = -2 + (-1)
        np.testing.assert_allclose(p[0], -3.0)
        np.testing.assert_allclose(p[-1], 3.0)

    def test_extrapolate_toward_zero(self):
        x = jnp.array([2.0, 3.0, 4.0])
        p = pad_extrapolate(x, 0, 1, toward_zero=True)
        np.testing.assert_allclose(p[0], 1.0)

    def test_multidim_axis(self):
        g = create_grid([0, 0], [1, 1], [4, 6], periodic_dims=[1])
        data = jnp.arange(24.0).reshape(4, 6)
        p0 = pad_axis(g, data, 0, 2)
        p1 = pad_axis(g, data, 1, 2)
        assert p0.shape == (8, 6)
        assert p1.shape == (4, 10)
        np.testing.assert_allclose(p1[:, :2], data[:, -2:])


class TestShapes:
    def test_sphere_sdf(self):
        g = create_grid([-2, -2], [2, 2], 81)
        phi = sphere(g, center=[0.0, 0.0], radius=1.0)
        xs = g.mesh(jnp.float64)
        expected = np.sqrt(np.asarray(xs[0]) ** 2 + np.asarray(xs[1]) ** 2) - 1
        np.testing.assert_allclose(phi, expected, atol=1e-5)

    def test_cylinder_ignores_axis(self):
        g = create_grid([-2, -2, 0], [2, 2, 2 * np.pi], 21,
                        periodic_dims=[2])
        phi = cylinder(g, ignore_axes=[2], center=[0, 0, 0], radius=1.0)
        assert phi.shape == g.shape
        # constant along ignored axis
        np.testing.assert_allclose(phi[:, :, 0], phi[:, :, 13], atol=1e-6)

    def test_rectangle_inside_outside(self):
        g = create_grid([0, 0], [1, 1], 51)
        phi = rectangle_by_corners(g, [0.2, 0.2], [0.6, 0.6])
        v = np.asarray(phi)
        c = np.linspace(0, 1, 51)
        i_in = np.searchsorted(c, 0.4)
        i_out = np.searchsorted(c, 0.9)
        assert v[i_in, i_in] < 0
        assert v[i_out, i_out] > 0

    def test_csg_ops(self):
        g = create_grid([-2, -2], [2, 2], 41)
        a = sphere(g, center=[-0.5, 0.0], radius=1.0)
        b = sphere(g, center=[0.5, 0.0], radius=1.0)
        u = union(a, b)
        i = intersection(a, b)
        d = difference(a, b)
        assert (np.asarray(u) <= np.minimum(a, b) + 1e-6).all()
        assert (np.asarray(i) >= np.asarray(u)).all()
        # difference removes b's interior
        inside_b = np.asarray(b) < -0.1
        assert (np.asarray(d)[inside_b] > 0).all()

    def test_vmap_over_radius(self):
        import jax

        g = create_grid([-2, -2], [2, 2], 21)
        radii = jnp.array([0.5, 1.0, 1.5])
        phis = jax.vmap(lambda r: sphere(g, radius=r))(radii)
        assert phis.shape == (3, 21, 21)
