"""Sharded fused RK-substep path: x-sharded solves run the persistent-layout
kernel per shard (x-ghost rows refresh via ppermute halo exchange; the
lagged-epsilon carry pmax-reduces across shards).

Interpret-mode Pallas inside shard_map on the 8-virtual-device CPU mesh,
like tests/test_parallel.py's sharded-RHS coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve)
from levelsetpy_tpu.parallel import make_mesh, solve_sharded


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def setup(shape, periodic_x=False):
    dims = [2] + ([0] if periodic_x else [])
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], shape,
                       periodic_dims=dims)
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs[2]) * jnp.cos(0.3 * xs[0]) * jnp.cos(0.2 * xs[1])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    return grid, system, v


@pytest.mark.parametrize("eps_method", ["maxOverGrid", "constant"])
def test_sharded_fused_step_matches_single(interpret_pallas, eps_method):
    grid, system, v = setup((32, 20, 16))
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                       epsilon_method=eps_method)
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg, comp_method="minVOverTime")
    r_1 = solve(grid, system, v, tau, cfg=cfg, comp_method="minVOverTime")
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


def test_sharded_fused_step_route_is_taken(interpret_pallas):
    """The x-only sharded config must actually route through the fused
    substep kernel (guards against a silent fallback making the equality
    test vacuous)."""
    from levelsetpy_tpu.kernels import hjstep

    calls = []
    orig = hjstep.fused_rk_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    hjstep.fused_rk_step, saved = spy, orig
    try:
        grid, system, v = setup((32, 20, 16))
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
        mesh = make_mesh({"x": 4})
        solve_sharded(grid, system, v, jnp.array([0.0, 0.1]),
                      shard_axes={0: "x"}, mesh=mesh, cfg=cfg)
    finally:
        hjstep.fused_rk_step = saved
    assert calls, "sharded solve did not route through fused_rk_step"


def test_sharded_fused_step_periodic_x(interpret_pallas):
    """Periodic global x: the shard ring IS the boundary condition for the
    x-ghost refresh."""
    grid, system, v = setup((32, 16, 16), periodic_x=True)
    tau = jnp.array([0.0, 0.15])
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg)
    r_1 = solve(grid, system, v, tau, cfg=cfg)
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)


def test_sharded_fused_step_4d(interpret_pallas):
    """x-sharded 4-D grids route through the packed-lane substep kernel
    per shard (hjstep4d with origin offsets + ppermute x-ghost refresh)."""
    from levelsetpy_tpu import PlanarDoubleIntegrator

    grid = create_grid([-2.0, -2.0, -1.0, -1.0], [2.0, 2.0, 1.0, 1.0],
                       (16, 10, 8, 8))
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2, 3], radius=0.8) \
        + 0.2 * jnp.sin(2 * xs[2]) * jnp.cos(3 * xs[3]) \
        * jnp.cos(xs[0] + 0.5 * xs[1])
    system = PlanarDoubleIntegrator(u_max=1.0, d_max=0.2)
    tau = jnp.array([0.0, 0.12])
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg, comp_method="minVOverTime")
    r_1 = solve(grid, system, v, tau, cfg=cfg, comp_method="minVOverTime")
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


def test_sharded_fused_step_fallback_multi_axis(interpret_pallas):
    """y-sharded (or 2-axis) configs must FALL BACK to the per-RHS path —
    the substep kernel's in-kernel y/z ghost fill is only valid when those
    axes are whole per shard — and still match the single-device solve."""
    grid, system, v = setup((16, 32, 16))
    tau = jnp.array([0.0, 0.12])
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    mesh = make_mesh({"x": 2, "y": 2})
    r_sh = solve_sharded(grid, system, v, tau,
                         shard_axes={0: "x", 1: "y"}, mesh=mesh, cfg=cfg)
    r_1 = solve(grid, system, v, tau, cfg=cfg)
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)


def test_sharded_fused_epilogue_obstacle(interpret_pallas):
    """Fused epilogue under sharding (VERDICT r3 #1): obstacle + target
    comp run inside the per-shard substep kernel; extras are lifted per
    shard and Kene/Jaime reductions ride the sharded GridOps."""
    grid, system, v = setup((32, 20, 16))
    obs = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                   radius=3.0).astype(jnp.float32)
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                       epsilon_method="constant")
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg, obstacles=obs,
                         discount_factor=0.95)
    r_1 = solve(grid, system, v, tau, cfg=cfg, obstacles=obs,
                discount_factor=0.95)
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


def test_sharded_fused_step_max_over_neighbors(interpret_pallas):
    """Node-local epsilon under sharding: no lagged-eps carry, hence NO
    per-substep cross-shard allreduce (the only remaining per-substep
    communication is the x-halo ppermute) — VERDICT r3 #3.  Values must
    match the single-device solve tightly (no transient)."""
    grid, system, v = setup((32, 20, 16))
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                       epsilon_method="maxOverNeighbors")
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg, comp_method="minVOverTime")
    r_1 = solve(grid, system, v, tau, cfg=cfg, comp_method="minVOverTime")
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


@pytest.mark.parametrize("axes,mesh_shape", [
    ({1: "y"}, {"y": 4}),            # y-only sharding
    ({0: "x", 1: "y"}, {"x": 2, "y": 2}),   # 2-D mesh
])
def test_sharded_fused_step_xy_meshes(interpret_pallas, axes, mesh_shape):
    """x+y shardings now run the fused substep kernel per shard: sharded
    axes' ghosts ride ppermute (y before x for corners), whole axes keep
    the in-kernel fill.  Must match the single-device fused solve."""
    grid, system, v = setup((32, 20, 16))
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                       epsilon_method="constant")
    mesh = make_mesh(mesh_shape)
    r_sh = solve_sharded(grid, system, v, tau, shard_axes=axes,
                         mesh=mesh, cfg=cfg, comp_method="minVOverTime")
    r_1 = solve(grid, system, v, tau, cfg=cfg, comp_method="minVOverTime")
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


def test_sharded_fused_step_xy_route_taken(interpret_pallas):
    from levelsetpy_tpu.kernels import hjstep

    calls = []
    orig = hjstep.fused_rk_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    hjstep.fused_rk_step, saved = spy, orig
    try:
        grid, system, v = setup((32, 20, 16))
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                           factor_cfl=0.7917)
        mesh = make_mesh({"x": 2, "y": 2})
        solve_sharded(grid, system, v, jnp.array([0.0, 0.1]),
                      shard_axes={0: "x", 1: "y"}, mesh=mesh, cfg=cfg)
    finally:
        hjstep.fused_rk_step = saved
    assert calls, "xy-sharded solve did not route through fused_rk_step"


def test_sharded_fused_step_xy_lagged_eps(interpret_pallas):
    """maxOverGrid lagged-eps carry under the 2-D mesh (pmax over both
    mesh axes) — parity budget as the x-only case."""
    grid, system, v = setup((32, 24, 16))
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    mesh = make_mesh({"x": 2, "y": 2})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x", 1: "y"},
                         mesh=mesh, cfg=cfg)
    r_1 = solve(grid, system, v, tau, cfg=cfg)
    scale = float(jnp.max(jnp.abs(r_1.values)))
    np.testing.assert_allclose(np.asarray(r_sh.values),
                               np.asarray(r_1.values), atol=2e-5 * scale)
    assert int(r_sh.steps) == int(r_1.steps)


def test_sharded_costate_kernel_matches_single(interpret_pallas):
    """Generic (no-analytic-alpha) system through the sharded fused path
    (VERDICT r4 #1): the in-kernel node-local costate-box alphas plus the
    pmax/pmin-reduced interval-start global box/dt must reproduce the
    single-device fused solve."""
    from tests.test_pallas_kernel import GenericPursuit

    grid, _, v = setup((32, 20, 16))
    system = GenericPursuit(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.linspace(0.0, 0.2, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True,
                       dissipation="local", epsilon_method="constant")
    mesh = make_mesh({"x": 4})
    r_sh = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                         mesh=mesh, cfg=cfg)
    r_1 = solve(grid, system, v, tau, cfg=cfg)
    scale = float(jnp.max(jnp.abs(r_1.values)))
    diff = np.abs(np.asarray(r_sh.values) - np.asarray(r_1.values))
    # knife-edge tolerance: see test_pallas_kernel.assert_close_except_...
    assert int((diff > 2e-5 * scale).sum()) <= 5
    assert float(diff.max()) <= 1e-3 * scale
    assert int(r_sh.steps) == int(r_1.steps)
