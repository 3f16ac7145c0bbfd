"""Batch-last (structure-of-arrays) solver tests: `solve_batch` must match
per-scenario single-device solves exactly — same CFL dt per element, same
stop semantics, per-element diagnostics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DoubleIntegrator, DubinsRel, SchemeConfig,
                            create_grid, cylinder, solve, solve_batch)
from levelsetpy_tpu.shapes import sphere


def dubins_setup(n=21):
    g = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], n, periodic_dims=[2])
    target = cylinder(g, ignore_axes=[2], radius=5.0, dtype=jnp.float64)
    return g, target


class TestBatchMatchesSingle:
    def test_parameter_sweep_dubins(self):
        g, target = dubins_setup()
        w = jnp.array([0.6, 1.0, 1.5])
        tau = jnp.linspace(0.0, 0.4, 3)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        batched_sys = DubinsRel(v_e=5.0, v_p=5.0, w_bound=w)
        res = solve_batch(g, batched_sys, target, tau, cfg=cfg)
        assert res.values.shape == (3, *g.shape, 3)
        for b in range(3):
            single = solve(g, DubinsRel(v_e=5.0, v_p=5.0,
                                        w_bound=float(w[b])),
                           target, tau, cfg=cfg)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)
            np.testing.assert_allclose(res.changes[:, b], single.changes,
                                       atol=1e-10)

    def test_batched_initial_conditions(self):
        g, _ = dubins_setup(17)
        radii = [3.0, 5.0, 7.0]
        v0 = jnp.stack([cylinder(g, ignore_axes=[2], radius=r,
                                 dtype=jnp.float64) for r in radii], axis=-1)
        tau = jnp.linspace(0.0, 0.3, 2)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
        res = solve_batch(g, sys_, v0, tau, cfg=cfg, n_batch=3)
        for b in range(3):
            single = solve(g, sys_, v0[..., b], tau, cfg=cfg)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_weno5_rk3_sweep(self):
        """The headline scheme through the batched WENO/epsilon path (the
        per-element maxOverGrid epsilon must reduce grid axes only)."""
        g, target = dubins_setup(15)
        w = jnp.array([0.8, 1.2])
        tau = jnp.linspace(0.0, 0.2, 2)
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=3)
        res = solve_batch(g, DubinsRel(v_e=5.0, v_p=5.0, w_bound=w),
                          target, tau, cfg=cfg)
        for b in range(2):
            single = solve(g, DubinsRel(v_e=5.0, v_p=5.0,
                                        w_bound=float(w[b])),
                           target, tau, cfg=cfg)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)


class TestBatchFeatures:
    def setup_method(self):
        self.g = create_grid([-2, -2], [2, 2], 41)
        self.target = sphere(self.g, radius=0.5, dtype=jnp.float64)
        self.cfg = SchemeConfig(accuracy="eno2", rk_order=2)

    def test_per_element_convergence_stop(self):
        """Elements converge at different taus; each must freeze at ITS OWN
        stop index, matching the single-solve early exit."""
        tau = jnp.linspace(0.0, 8.0, 17)
        u = jnp.array([1.0, 0.25])   # strong control converges sooner
        res = solve_batch(self.g, DoubleIntegrator(u_max=u), self.target,
                          tau, cfg=self.cfg, converge_threshold=1e-1)
        assert res.stop_index.shape == (2,)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=float(u[b])),
                           self.target, tau, cfg=self.cfg,
                           converge_threshold=1e-1)
            assert int(res.stop_index[b]) == int(single.stop_index)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)
        assert int(res.stop_index[0]) < int(res.stop_index[1])

    def test_discount_and_ttr(self):
        tau = jnp.linspace(0.0, 0.8, 3)
        gams = jnp.array([0.9, 0.99])
        res = solve_batch(self.g, DoubleIntegrator(u_max=1.0), self.target,
                          tau, cfg=self.cfg, comp_method="minVWithL",
                          targets=self.target, discount_factor=gams,
                          record_ttr=True, n_batch=2)
        assert res.ttr.shape == (*self.g.shape, 2)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=1.0), self.target,
                           tau, cfg=self.cfg, comp_method="minVWithL",
                           targets=self.target,
                           discount_factor=float(gams[b]), record_ttr=True)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)
            np.testing.assert_allclose(res.ttr[..., b], single.ttr,
                                       atol=1e-10)

    def test_discount_heterogeneous_dynamics(self):
        """Elements with different dynamics take different step counts per
        tau interval; discounting is NOT idempotent, so early-finishing
        elements must be frozen (not re-discounted) while slower elements
        integrate — regression for the r2 batch over-discount bug."""
        tau = jnp.linspace(0.0, 0.8, 3)
        u = jnp.array([1.0, 0.25])   # fast CFL vs slow CFL: step counts differ
        res = solve_batch(self.g, DoubleIntegrator(u_max=u), self.target,
                          tau, cfg=self.cfg, comp_method="minVWithL",
                          targets=self.target, discount_factor=0.95)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=float(u[b])),
                           self.target, tau, cfg=self.cfg,
                           comp_method="minVWithL", targets=self.target,
                           discount_factor=0.95)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_kene_discount_heterogeneous(self):
        """Kene's shift-scale-min is applied per step — the same freeze must
        protect it for heterogeneous batches."""
        tau = jnp.linspace(0.0, 0.6, 3)
        u = jnp.array([1.2, 0.3])
        res = solve_batch(self.g, DoubleIntegrator(u_max=u), self.target,
                          tau, cfg=self.cfg, comp_method="minVWithL",
                          targets=self.target, discount_factor=0.9,
                          discount_mode="Kene")
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=float(u[b])),
                           self.target, tau, cfg=self.cfg,
                           comp_method="minVWithL", targets=self.target,
                           discount_factor=0.9, discount_mode="Kene")
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_stop_init_per_element(self):
        tau = jnp.linspace(0.0, 3.0, 7)
        u = jnp.array([1.5, 0.5])
        state = jnp.array([1.4, 0.0])
        res = solve_batch(self.g, DoubleIntegrator(u_max=u), self.target,
                          tau, cfg=self.cfg, stop_init=state)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=float(u[b])),
                           self.target, tau, cfg=self.cfg, stop_init=state)
            assert int(res.stop_index[b]) == int(single.stop_index)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_time_varying_obstacles_match_single(self):
        """Per-tau obstacle stacks (ref hji_solver.py:209-228,641-644) in
        the sweep path: shared (T, *grid) stack across a heterogeneous
        batch must match per-element solves with the same stack."""
        tau = jnp.linspace(0.0, 0.6, 4)
        # a moving obstacle: a ball drifting right over the tau checkpoints
        obs_tv = jnp.stack([
            sphere(self.g, center=[0.5 + 0.2 * i, 0.0], radius=0.3,
                   dtype=jnp.float64) for i in range(4)])
        u = jnp.array([1.0, 0.4])
        res = solve_batch(self.g, DoubleIntegrator(u_max=u), self.target,
                          tau, cfg=self.cfg, obstacles=obs_tv)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=float(u[b])),
                           self.target, tau, cfg=self.cfg, obstacles=obs_tv)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_time_varying_targets_per_scenario(self):
        """(T, *grid, B) per-scenario target stacks through minVWithL."""
        tau = jnp.linspace(0.0, 0.4, 3)
        tgts = jnp.stack([
            jnp.stack([sphere(self.g, radius=0.5 + 0.1 * i + 0.05 * b,
                              dtype=jnp.float64)
                       for b in range(2)], axis=-1)
            for i in range(3)])
        res = solve_batch(self.g, DoubleIntegrator(u_max=1.0), self.target,
                          tau, cfg=self.cfg, comp_method="minVWithL",
                          targets=tgts, n_batch=2)
        for b in range(2):
            single = solve(self.g, DoubleIntegrator(u_max=1.0), self.target,
                           tau, cfg=self.cfg, comp_method="minVWithL",
                           targets=tgts[..., b])
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)

    def test_rejects_bad_operand_shapes(self):
        tau = jnp.linspace(0.0, 0.5, 3)
        bad = jnp.zeros((5, *self.g.shape))    # wrong leading length
        try:
            solve_batch(self.g, DoubleIntegrator(u_max=1.0), self.target,
                        tau, cfg=self.cfg, n_batch=2, obstacles=bad)
        except ValueError as e:
            assert "batch" in str(e)
        else:
            raise AssertionError("expected ValueError for bad shapes")


class TestBatchNoise:
    def test_batch_noise_matches_per_element(self):
        """REGRESSION (r5 review): solve_batch with noise_stddev used to
        crash at trace time — hessian() differentiated the trailing
        scenario axis and indexed grid.dx out of range.  Batched noise
        solves must run and match per-element single solves."""
        g = create_grid([-2, -2], [2, 2], 21)
        target = sphere(g, radius=0.5, dtype=jnp.float64)
        u = jnp.array([0.6, 1.0])
        sg = jnp.array([0.15, 0.1])
        tau = jnp.linspace(0.0, 0.3, 2)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        res = solve_batch(g, DoubleIntegrator(u_max=u), target, tau,
                          cfg=cfg, noise_stddev=sg)
        for b in range(2):
            single = solve(g, DoubleIntegrator(u_max=float(u[b])), target,
                           tau, cfg=cfg, noise_stddev=sg)
            np.testing.assert_allclose(res.values[..., b], single.values,
                                       atol=1e-10)
