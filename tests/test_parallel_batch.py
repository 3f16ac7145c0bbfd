"""Sharded scenario sweeps (`parallel.solve_batch_sharded`) must match the
single-device `solve_batch` per element exactly — scenarios are independent,
so the mesh adds zero communication and zero numerical difference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import (DoubleIntegrator, DubinsRel, SchemeConfig,
                            create_grid, cylinder, solve_batch)
from levelsetpy_tpu.parallel import make_mesh, solve_batch_sharded
from levelsetpy_tpu.shapes import sphere


def dubins_setup(n=15):
    g = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], n, periodic_dims=[2])
    target = cylinder(g, ignore_axes=[2], radius=5.0, dtype=jnp.float64)
    return g, target


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh({"b": 8})


class TestShardedSweepMatchesSingle:
    def test_divisible_sweep(self, mesh8):
        g, target = dubins_setup()
        w = jnp.linspace(0.5, 1.9, 8)
        tau = jnp.linspace(0.0, 0.4, 3)
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2)
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=w)
        ref = solve_batch(g, sys_, target, tau, cfg=cfg)
        res = solve_batch_sharded(g, sys_, target, tau, mesh8, cfg=cfg)
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)
        np.testing.assert_allclose(res.changes, ref.changes, atol=1e-10)
        np.testing.assert_array_equal(res.stop_index, ref.stop_index)
        assert int(res.steps) == int(ref.steps)

    def test_indivisible_batch_pads_and_slices(self, mesh8):
        """B=10 over 8 devices: pad to 16 by replicating the last scenario,
        slice every per-scenario output back to 10."""
        g, target = dubins_setup(13)
        w = jnp.linspace(0.5, 1.9, 10)
        tau = jnp.linspace(0.0, 0.3, 2)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=w)
        ref = solve_batch(g, sys_, target, tau, cfg=cfg)
        res = solve_batch_sharded(g, sys_, target, tau, mesh8, cfg=cfg)
        assert res.values.shape == ref.values.shape  # true B preserved
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)
        np.testing.assert_array_equal(res.stop_index, ref.stop_index)

    def test_per_scenario_v0_and_obstacles(self, mesh8):
        g, _ = dubins_setup(13)
        radii = jnp.linspace(3.0, 7.0, 8)
        v0 = jnp.stack([cylinder(g, ignore_axes=[2], radius=float(r),
                                 dtype=jnp.float64) for r in radii],
                       axis=-1)
        obstacle = cylinder(g, ignore_axes=[2], center=[10.0, 0.0, 0.0],
                            radius=2.0, dtype=jnp.float64)
        tau = jnp.linspace(0.0, 0.3, 2)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
        ref = solve_batch(g, sys_, v0, tau, cfg=cfg, obstacles=obstacle)
        res = solve_batch_sharded(g, sys_, v0, tau, mesh8, cfg=cfg,
                                  obstacles=obstacle)
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)

    def test_features_ride_through(self, mesh8):
        """Targets + Jaime discounting + record_ttr + save_all=False on the
        sharded sweep, element-exact vs single device."""
        g = create_grid([-2, -2], [2, 2], 25)
        target = sphere(g, radius=0.5, dtype=jnp.float64)
        u = jnp.linspace(0.5, 1.2, 8)
        sys_ = DoubleIntegrator(u_max=u)
        tau = jnp.linspace(0.0, 0.6, 4)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        kw = dict(comp_method="minVWithL", targets=target,
                  discount_factor=0.9, record_ttr=True, save_all=False)
        ref = solve_batch(g, sys_, target, tau, cfg=cfg, **kw)
        res = solve_batch_sharded(g, sys_, target, tau, mesh8, cfg=cfg,
                                  **kw)
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)
        np.testing.assert_allclose(res.ttr, ref.ttr, atol=1e-10)

    def test_early_stop_is_per_shard(self, mesh8):
        """Shards run INDEPENDENT while-loops: a convergence-stopped sweep
        still matches, and steps is the max over shards."""
        g = create_grid([-2, -2], [2, 2], 25)
        target = sphere(g, radius=0.5, dtype=jnp.float64)
        u = jnp.concatenate([jnp.full((4,), 1.0), jnp.full((4,), 0.25)])
        sys_ = DoubleIntegrator(u_max=u)
        tau = jnp.linspace(0.0, 6.0, 13)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        ref = solve_batch(g, sys_, target, tau, cfg=cfg,
                          converge_threshold=1e-4)
        res = solve_batch_sharded(g, sys_, target, tau, mesh8, cfg=cfg,
                                  converge_threshold=1e-4)
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)
        np.testing.assert_array_equal(res.stop_index, ref.stop_index)

    def test_mesh_axis_required_when_ambiguous(self):
        g, target = dubins_setup(13)
        mesh2d = make_mesh({"p": 2, "q": 4})
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=jnp.ones(8))
        with pytest.raises(ValueError, match="batch_axis"):
            solve_batch_sharded(g, sys_, target, jnp.array([0.0, 0.1]),
                                mesh2d)
        # explicit axis works on a multi-axis mesh
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        w = jnp.linspace(0.5, 1.9, 4)
        sys4 = DubinsRel(v_e=5.0, v_p=5.0, w_bound=w)
        tau = jnp.linspace(0.0, 0.2, 2)
        ref = solve_batch(g, sys4, target, tau, cfg=cfg)
        res = solve_batch_sharded(g, sys4, target, tau, mesh2d,
                                  batch_axis="q", cfg=cfg)
        np.testing.assert_allclose(res.values, ref.values, atol=1e-10)
