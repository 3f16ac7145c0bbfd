"""4-D fused substep kernel (kernels/hjstep4d.py) correctness.

The packed-lane layout (last two grid axes share the lane dimension with
in-layout ghost cells) must reproduce the XLA solve path; runs through the
Pallas interpreter on CPU like tests/test_pallas_kernel.py."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import (PlanarDoubleIntegrator, RocketSystem,
                            SchemeConfig, create_grid, cylinder, solve)
from levelsetpy_tpu.kernels import hjstep4d


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def setup4d(shape, periodic_dims=()):
    grid = create_grid([-2.0, -2.0, -1.0, -1.0], [2.0, 2.0, 1.0, 1.0],
                       shape, periodic_dims=list(periodic_dims))
    xs = grid.mesh_broadcastable(jnp.float32)
    # perturb along ALL axes so every stencil direction is exercised
    v = cylinder(grid, ignore_axes=[2, 3], radius=0.8) \
        + 0.2 * jnp.sin(2 * xs[2]) * jnp.cos(3 * xs[3]) \
        * jnp.cos(xs[0] + 0.5 * xs[1])
    system = PlanarDoubleIntegrator(u_max=1.0, d_max=0.2)
    return grid, system, v


def test_lift_lower_roundtrip():
    grid, _, v = setup4d((12, 10, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(hjstep4d.lower4(grid, hjstep4d.lift4(grid, v))),
        np.asarray(v))


def test_eligibility_gate():
    grid, system, v = setup4d((12, 10, 8, 8))
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    assert hjstep4d.fused4d_eligible(grid, cfg, v, system)
    assert not hjstep4d.fused4d_eligible(
        grid, SchemeConfig(accuracy="medium", use_pallas=True), v, system)


@pytest.mark.parametrize("eps_method", ["maxOverGrid", "constant"])
def test_fused4d_solve_matches_xla(interpret_pallas, eps_method):
    """Full 4-D solve through the fused substep kernel vs the XLA path.

    maxOverGrid epsilon is LAGGED by one substep in the fused path
    (dissipation-choice freedom, see hjstep.fused_rk_step), so the
    comparison tolerance covers the resulting O(eps-sensitivity) drift."""
    grid, system, v = setup4d((12, 10, 8, 8))
    tau = jnp.linspace(0.0, 0.15, 3)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method=eps_method)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                         epsilon_method=eps_method)
    r1 = solve(grid, system, v, tau, cfg=cfg_x, comp_method="minVOverTime")
    r2 = solve(grid, system, v, tau, cfg=cfg_p, comp_method="minVOverTime")
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_fused4d_periodic_packed_axes(interpret_pallas):
    """Periodic BCs on BOTH packed sub-axes (in-kernel roll-based ghost
    fill) and on y, plus RK3."""
    grid, system, v = setup4d((10, 8, 8, 8), periodic_dims=[1, 2, 3])
    tau = jnp.array([0.0, 0.12])
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=3)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=3, use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x)
    r2 = solve(grid, system, v, tau, cfg=cfg_p)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)


def test_fused4d_rocket(interpret_pallas):
    """RocketSystem (the BASELINE 4-D config's dynamics) through the fused
    path, with time-to-reach recording."""
    grid = create_grid([-600.0, -600.0, -60.0, -60.0],
                       [600.0, 600.0, 60.0, 60.0], (12, 8, 8, 8))
    system = RocketSystem()
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2, 3], radius=150.0) \
        + 10.0 * jnp.sin(xs[2] / 20.0) * jnp.cos(xs[3] / 20.0)
    tau = jnp.array([0.0, 0.1])
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x, record_ttr=True)
    r2 = solve(grid, system, v, tau, cfg=cfg_p, record_ttr=True)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    m = np.isfinite(np.asarray(r1.ttr))
    assert (np.isfinite(np.asarray(r2.ttr)) == m).all()


def test_fused_4d_max_over_neighbors(interpret_pallas):
    """Node-local O&F (3.38) epsilon through the packed-lane 4-D kernel."""
    from levelsetpy_tpu import solve

    grid, system, v = setup4d((10, 10, 8, 8))
    tau = jnp.array([0.0, 0.1], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors")
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors", use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x)
    r2 = solve(grid, system, v, tau, cfg=cfg_p)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_costate_kernel_4d(interpret_pallas):
    """Generic (no analytic alpha) 4-D system through the packed-lane
    substep kernel with in-kernel costate-box alphas (the 4-D leg of
    VERDICT r4 #1): LLLF with max_step-pinned dt must match the XLA path
    exactly up to f32 association."""
    from levelsetpy_tpu import SchemeConfig, create_grid, cylinder, solve
    from levelsetpy_tpu.systems.base import System, register_system

    @register_system
    class GenericRocket4(System):
        """Thrust DIRECTION as a unit vector, not an angle: atan2 has no
        Mosaic lowering, and the unit-vector form needs no trig at all —
        the Mosaic-friendly formulation for in-kernel costate alphas."""

        a_e: float = 64.0
        a_p: float = 64.0

        n_states = 4
        u_mode = "max"
        d_mode = "min"

        def dynamics(self, t, x, u, d):
            return (x[2], x[3],
                    self.a_e * u[0] - self.a_p * d[0],
                    self.a_e * u[1] - self.a_p * d[1])

        def _dir(self, p, sign):
            r = jnp.sqrt(p[2] * p[2] + p[3] * p[3]) + 1e-30
            return (sign * p[2] / r, sign * p[3] / r)

        def opt_control(self, t, x, p, mode):
            return self._dir(p, 1.0 if mode == "max" else -1.0)

        def opt_disturbance(self, t, x, p, mode):
            return self._dir(p, -1.0 if mode == "min" else 1.0)

    grid = create_grid([-600, -600, -60, -60], [600, 600, 60, 60],
                       (12, 12, 10, 10))
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2, 3], radius=100.0) \
        + 5.0 * jnp.sin(0.01 * xs[2]) * jnp.cos(0.01 * xs[3])
    system = GenericRocket4()
    assert not system.alpha_time_invariant
    tau = jnp.array([0.0, 0.2], jnp.float32)
    kw = dict(accuracy="veryHigh", rk_order=2, dissipation="locallocal",
              epsilon_method="constant", max_step=0.02)
    r_x = solve(grid, system, v, tau, cfg=SchemeConfig(**kw))
    r_p = solve(grid, system, v, tau,
                cfg=SchemeConfig(use_pallas=True, **kw))
    assert int(r_p.steps) == int(r_x.steps) == 10
    scale = float(jnp.max(jnp.abs(r_x.values)))
    diff = np.abs(np.asarray(r_p.values) - np.asarray(r_x.values))
    assert int((diff > 2e-5 * scale).sum()) <= 5, diff.max()
    assert float(diff.max()) <= 1e-3 * scale
