"""Fused per-step epilogue correctness (VERDICT r3 #1): obstacles, targets,
withV0/withL comp methods and Jaime/Kene discounting run INSIDE the fused
RK-substep kernels and must match the XLA path (interpreter mode on CPU;
real-TPU A/Bs in scripts/tpu_checks.py / bench_all.py).

Constant-epsilon configs compare at f32 re-association tolerance (no
lagged-eps transient); one maxOverGrid case covers the lagged carry under
an epilogue.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import (DubinsRel, PlanarDoubleIntegrator, SchemeConfig,
                            create_grid, cylinder, solve, sphere)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def setup3d(shape=(16, 14, 16)):
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], shape,
                       periodic_dims=[2])
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs[2]) * jnp.cos(0.3 * xs[0]) * jnp.cos(0.2 * xs[1])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    # an off-center obstacle cylinder the growing tube actually hits
    obstacle = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                        radius=3.0)
    return grid, v.astype(jnp.float32), system, obstacle.astype(jnp.float32)


CFG_X = SchemeConfig(accuracy="veryHigh", rk_order=2,
                     epsilon_method="constant")
CFG_P = SchemeConfig(accuracy="veryHigh", rk_order=2,
                     epsilon_method="constant", use_pallas=True)
TAU = jnp.array([0.0, 0.08, 0.16], jnp.float32)


def _assert_match(r1, r2, atol_scale=2e-5):
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=atol_scale * scale)
    assert int(r1.steps) == int(r2.steps)


def test_fused_obstacle_static(interpret_pallas):
    grid, v, system, obs = setup3d()
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, obstacles=obs)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, obstacles=obs)
    _assert_match(r1, r2)
    # the obstacle must actually bite: some node inside it stays positive
    inside = np.asarray(obs) < 0
    assert (np.asarray(r1.values[-1])[inside] > 0).any()


def test_fused_obstacle_time_varying(interpret_pallas):
    grid, v, system, obs = setup3d()
    obs_tv = jnp.stack([obs + 0.5 * k for k in range(len(TAU))])
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, obstacles=obs_tv)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, obstacles=obs_tv)
    _assert_match(r1, r2)


@pytest.mark.parametrize("comp", ["minVWithV0", "maxVWithV0"])
def test_fused_comp_with_v0(interpret_pallas, comp):
    grid, v, system, _ = setup3d()
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, comp_method=comp)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, comp_method=comp)
    _assert_match(r1, r2)


@pytest.mark.parametrize("comp", ["minVWithL", "maxVWithL"])
def test_fused_comp_with_target(interpret_pallas, comp):
    grid, v, system, _ = setup3d()
    tgt = cylinder(grid, ignore_axes=[2], radius=4.0).astype(jnp.float32)
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, comp_method=comp,
               targets=tgt)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, comp_method=comp,
               targets=tgt)
    _assert_match(r1, r2)


def test_fused_jaime_discount(interpret_pallas):
    grid, v, system, obs = setup3d()
    tgt = cylinder(grid, ignore_axes=[2], radius=4.0).astype(jnp.float32)
    # discount + target + obstacle together: three epilogue stages fused
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, comp_method="minVWithL",
               targets=tgt, obstacles=obs, discount_factor=0.95)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, comp_method="minVWithL",
               targets=tgt, obstacles=obs, discount_factor=0.95)
    _assert_match(r1, r2)


def test_fused_jaime_discount_v0_base(interpret_pallas):
    grid, v, system, _ = setup3d()
    r1 = solve(grid, system, v, TAU, cfg=CFG_X,
               comp_method="minVOverTime", discount_factor=0.9)
    r2 = solve(grid, system, v, TAU, cfg=CFG_P,
               comp_method="minVOverTime", discount_factor=0.9)
    _assert_match(r1, r2)


def test_fused_kene_discount(interpret_pallas):
    grid, v, system, _ = setup3d()
    tgt = cylinder(grid, ignore_axes=[2], radius=4.0).astype(jnp.float32)
    r1 = solve(grid, system, v, TAU, cfg=CFG_X, comp_method="minVWithL",
               targets=tgt, discount_factor=0.9, discount_mode="Kene")
    r2 = solve(grid, system, v, TAU, cfg=CFG_P, comp_method="minVWithL",
               targets=tgt, discount_factor=0.9, discount_mode="Kene")
    _assert_match(r1, r2)


def test_fused_obstacle_lagged_eps(interpret_pallas):
    """maxOverGrid epsilon: the lagged carry must coexist with the fused
    epilogue (budget as in test_pallas_kernel solve parity)."""
    grid, v, system, obs = setup3d()
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve(grid, system, v, TAU, cfg=cfg_x, obstacles=obs)
    r2 = solve(grid, system, v, TAU, cfg=cfg_p, obstacles=obs)
    _assert_match(r1, r2, atol_scale=5e-4)


def test_fused_route_taken_with_obstacles(interpret_pallas, monkeypatch):
    """Obstacled solves must actually route through fused_rk_step now
    (guards against the eligibility gate silently regressing)."""
    from levelsetpy_tpu.kernels import hjstep

    calls = []
    orig = hjstep.fused_rk_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(hjstep, "fused_rk_step", spy)
    grid, v, system, obs = setup3d()
    # unique cfg so the memoized solver trace is rebuilt under the spy
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                       epsilon_method="constant", use_pallas=True,
                       factor_cfl=0.7937)
    solve(grid, system, v, TAU, cfg=cfg, obstacles=obs)
    assert calls, "fused_rk_step was not traced for an obstacled solve"


def test_fused_epilogue_4d(interpret_pallas):
    """4-D packed-lane kernel with obstacle + withL target epilogue — the
    case where the fused path's 8.2x previously evaporated."""
    grid = create_grid([-2.0, -2.0, -1.0, -1.0], [2.0, 2.0, 1.0, 1.0],
                       (10, 10, 8, 8))
    xs = grid.mesh_broadcastable(jnp.float32)
    v = (sphere(grid, radius=1.0)
         + 0.1 * jnp.sin(3 * xs[2]) * jnp.cos(2 * xs[3])).astype(jnp.float32)
    tgt = sphere(grid, radius=0.8).astype(jnp.float32)
    obs = sphere(grid, center=[1.0, 1.0, 0.0, 0.0],
                 radius=0.5).astype(jnp.float32)
    system = PlanarDoubleIntegrator(u_max=1.0, d_max=0.2)
    tau = jnp.array([0.0, 0.1], jnp.float32)
    r1 = solve(grid, system, v, tau, cfg=CFG_X, comp_method="minVWithL",
               targets=tgt, obstacles=obs)
    r2 = solve(grid, system, v, tau, cfg=CFG_P, comp_method="minVWithL",
               targets=tgt, obstacles=obs)
    _assert_match(r1, r2)
