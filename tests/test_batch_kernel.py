"""Fused batch-LAST Pallas kernel correctness (interpreter mode on CPU).

The batched kernel (kernels/wenobatch.py) must match the batch-native XLA
path bit-for-bit up to f32 re-association; real-TPU A/Bs live in
scripts/tpu_checks.py / bench_all.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve_batch)
from levelsetpy_tpu.terms import batched_ops, hj_rhs, precompute_alpha

B = 128  # one lane chunk


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def setup(shape, n_batch=B):
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], shape,
                       periodic_dims=[2])
    xs3 = grid.mesh_broadcastable(jnp.float32)
    # perturb along every axis so no stencil direction sees constant data
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs3[2]) * jnp.cos(0.3 * xs3[0]) * jnp.cos(0.2 * xs3[1])
    # batch-LAST: trailing scenario axis, slightly different field per lane
    v = v[..., None] + 0.01 * jnp.sin(jnp.arange(n_batch, dtype=jnp.float32))
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, n_batch, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, n_batch, dtype=jnp.float32))
    xs = tuple(a[..., None] for a in xs3)
    ops = batched_ops(grid)
    ab = precompute_alpha(grid, system, xs, reduce_max=ops.reduce_max)
    return grid, v, system, xs, ops, ab


@pytest.mark.parametrize("shape", [(16, 16, 16), (15, 13, 11)])
def test_batch_kernel_matches_xla(interpret_pallas, shape):
    grid, v, system, xs, ops, ab = setup(shape)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    d1, sb1 = hj_rhs(grid, cfg_x, system, 0.0, v, xs, ab, ops, n_batch=B)
    d2, sb2 = hj_rhs(grid, cfg_p, system, 0.0, v, xs, ab, ops, n_batch=B)
    assert d1.shape == d2.shape == v.shape
    scale = float(jnp.max(jnp.abs(d1)))
    np.testing.assert_allclose(d2, d1, atol=2e-5 * scale)
    np.testing.assert_allclose(sb1, sb2, rtol=1e-6)


def test_batch_kernel_constant_epsilon(interpret_pallas):
    grid, v, system, xs, ops, ab = setup((12, 12, 12))
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant")
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant", use_pallas=True)
    d1, _ = hj_rhs(grid, cfg_x, system, 0.0, v, xs, ab, ops, n_batch=B)
    d2, _ = hj_rhs(grid, cfg_p, system, 0.0, v, xs, ab, ops, n_batch=B)
    scale = float(jnp.max(jnp.abs(d1)))
    np.testing.assert_allclose(d2, d1, atol=2e-5 * scale)


def test_batch_solve_matches_xla(interpret_pallas):
    """Full solve_batch through the fused kernel: per-element CFL dt, stop
    machinery and comp masking must be untouched by the kernel routing."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    tau = jnp.array([0.0, 0.15], jnp.float32)
    r1 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=SchemeConfig(accuracy="veryHigh", rk_order=2),
                     save_all=False)
    r2 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=SchemeConfig(accuracy="veryHigh", rk_order=2,
                                      use_pallas=True),
                     save_all=False)
    scale = float(jnp.max(jnp.abs(r1.values)))
    # 5e-4: the fused path's maxOverGrid eps is LAGGED one substep (see
    # hjstep.fused_rk_step); with a theta-constant target the first steps
    # run the clamped-transient regime and drift O(1e-4) from exact-eps XLA
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=5e-4 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_batch_solve_matches_xla_constant_eps(interpret_pallas):
    """Tight-tolerance twin of the solve parity test: with
    epsilon_method='constant' there is no lagged-eps transient, so the
    fused path must track the XLA path at f32 re-association level —
    layout/stencil regressions cannot hide inside the 5e-4 lagged-eps
    budget above (ADVICE r3)."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    tau = jnp.array([0.0, 0.15], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant")
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant", use_pallas=True)
    r1 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_x, save_all=False)
    r2 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_p, save_all=False)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_batch_solve_arbitrary_size_pads_to_lane_chunk(interpret_pallas):
    """B=100 (not a lane-chunk multiple) must still route through the fused
    kernel: solve_batch pads by replicating the last scenario up to 128
    lanes and slices the results back (VERDICT r3 #5).  Per-element results
    must match the XLA batch path exactly like the full-chunk case."""
    Bn = 100
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, Bn, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, Bn, dtype=jnp.float32))
    tau = jnp.array([0.0, 0.15], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant")
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant", use_pallas=True)
    r1 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_x, save_all=False)
    r2 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_p, save_all=False)
    assert r1.values.shape[-1] == Bn and r2.values.shape[-1] == Bn
    assert r2.changes.shape[-1] == Bn and r2.stop_index.shape == (Bn,)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_batch_fused_substep_route_is_taken():
    """The minVOverTime no-operand config must satisfy the fused-substep
    eligibility (guards against silent fallback making the solve tests
    vacuous)."""
    from levelsetpy_tpu.terms import batch_pallas_eligible

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    system = DubinsRel(v_e=jnp.linspace(3.0, 7.0, B), v_p=5.0, w_bound=1.0)
    assert batch_pallas_eligible(grid, cfg_p, B, system)


@pytest.mark.parametrize("rk_order", [1, 3])
def test_batch_substep_heterogeneous_dt(interpret_pallas, rk_order):
    """Heterogeneous CFL bounds: per-scenario dt rides the packed cdt row
    and early finishers freeze via dt=0 — must match the XLA batch path
    which freezes via the active mask."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (12, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    # strongly heterogeneous speeds -> very different step counts
    system = DubinsRel(
        v_e=jnp.concatenate([jnp.full((64,), 2.0, jnp.float32),
                             jnp.full((64,), 8.0, jnp.float32)]),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    tau = jnp.array([0.0, 0.12], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=rk_order)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=rk_order,
                         use_pallas=True)
    r1 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_x, save_all=False, record_ttr=True)
    r2 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_p, save_all=False, record_ttr=True)
    scale = float(jnp.max(jnp.abs(r1.values)))
    # 5e-4 / 1e-4: lagged-eps transient on the theta-constant target (see
    # test_batch_solve_matches_xla)
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=5e-4 * scale)
    assert int(r1.steps) == int(r2.steps)
    m = np.isfinite(np.asarray(r1.ttr))
    assert (np.isfinite(np.asarray(r2.ttr)) == m).all()
    np.testing.assert_allclose(np.asarray(r2.ttr)[m], np.asarray(r1.ttr)[m],
                               atol=1e-4)


def test_batch_substep_nonperiodic_z(interpret_pallas):
    """Extrapolation ghost fill on the z (sublane) axis through the
    in-kernel _fill_ghost_z path."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (12, 12, 14))  # NO periodic dims
    xs3 = grid.mesh_broadcastable(jnp.float32)
    v0 = (cylinder(grid, ignore_axes=[2], radius=5.0)
          + 0.4 * jnp.sin(xs3[2]) * jnp.cos(0.3 * xs3[0]))
    system = DubinsRel(v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
                       v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, 0.1], jnp.float32)
    r1 = solve_batch(grid, system, v0, tau,
                     cfg=SchemeConfig(accuracy="veryHigh", rk_order=2),
                     save_all=False)
    r2 = solve_batch(grid, system, v0, tau,
                     cfg=SchemeConfig(accuracy="veryHigh", rk_order=2,
                                      use_pallas=True),
                     save_all=False)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=1e-5 * scale)


def test_batch_kernel_ineligible_fallbacks(interpret_pallas):
    """Raw-kernel eligibility still demands the lane-chunk multiple and
    consistent (B,) system leaves; at the solve_batch surface a non-multiple
    B now routes FUSED via last-scenario padding (VERDICT r3 #5) and must
    match the XLA path within the lagged-eps budget."""
    from levelsetpy_tpu.terms import batch_pallas_eligible

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (12, 12, 12), periodic_dims=[2])
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    sys_ok = DubinsRel(v_e=jnp.ones((96,)), v_p=5.0, w_bound=1.0)
    assert not batch_pallas_eligible(grid, cfg_p, 96, sys_ok)
    sys_bad = DubinsRel(v_e=jnp.ones((64,)), v_p=5.0, w_bound=1.0)
    assert not batch_pallas_eligible(grid, cfg_p, 128, sys_bad)

    target = cylinder(grid, ignore_axes=[2], radius=5.0,
                      dtype=jnp.float32)
    tau = jnp.array([0.0, 0.1], jnp.float32)
    sysb = DubinsRel(v_e=jnp.linspace(3.0, 7.0, 96, dtype=jnp.float32),
                     v_p=5.0, w_bound=1.0)
    r1 = solve_batch(grid, sysb, target, tau, save_all=False,
                     cfg=SchemeConfig(accuracy="veryHigh", rk_order=2))
    r2 = solve_batch(grid, sysb, target, tau, save_all=False, cfg=cfg_p)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=5e-4 * scale)


# ------------------------------------------------ fused epilogue (batch)
def _epilogue_setup():
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0).astype(jnp.float32)
    obs = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                   radius=3.0).astype(jnp.float32)
    tgt = cylinder(grid, ignore_axes=[2], radius=4.0).astype(jnp.float32)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    return grid, target, obs, tgt, system


CFG_XC = SchemeConfig(accuracy="veryHigh", rk_order=2,
                      epsilon_method="constant")
CFG_PC = SchemeConfig(accuracy="veryHigh", rk_order=2,
                      epsilon_method="constant", use_pallas=True)


def _match(r1, r2, atol_scale=2e-5):
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=atol_scale * scale)
    assert int(r1.steps) == int(r2.steps)


def test_batch_fused_epilogue_obstacle(interpret_pallas):
    """Obstacled sweeps route through the fused batch kernel now
    (VERDICT r3 #1): shared obstacle broadcast across the scenario lanes,
    per-element parity with the XLA batch path."""
    grid, target, obs, _, system = _epilogue_setup()
    tau = jnp.array([0.0, 0.08, 0.16], jnp.float32)
    r1 = solve_batch(grid, system, target, tau, cfg=CFG_XC, obstacles=obs,
                     save_all=False)
    r2 = solve_batch(grid, system, target, tau, cfg=CFG_PC, obstacles=obs,
                     save_all=False)
    _match(r1, r2)


def test_batch_fused_epilogue_discount_target(interpret_pallas):
    """minVWithL + per-scenario Jaime discount + obstacle: gamma rides the
    packed rows; frozen early-finishers must skip the (non-idempotent)
    discount exactly like the XLA batch freeze."""
    grid, target, obs, tgt, system = _epilogue_setup()
    tau = jnp.array([0.0, 0.08, 0.16], jnp.float32)
    gam = jnp.linspace(0.85, 0.99, B, dtype=jnp.float32)
    r1 = solve_batch(grid, system, target, tau, cfg=CFG_XC,
                     comp_method="minVWithL", targets=tgt, obstacles=obs,
                     discount_factor=gam, save_all=False)
    r2 = solve_batch(grid, system, target, tau, cfg=CFG_PC,
                     comp_method="minVWithL", targets=tgt, obstacles=obs,
                     discount_factor=gam, save_all=False)
    _match(r1, r2)


def test_batch_fused_epilogue_kene(interpret_pallas):
    grid, target, _, tgt, system = _epilogue_setup()
    tau = jnp.array([0.0, 0.08, 0.16], jnp.float32)
    r1 = solve_batch(grid, system, target, tau, cfg=CFG_XC,
                     comp_method="minVWithL", targets=tgt,
                     discount_factor=0.9, discount_mode="Kene",
                     save_all=False)
    r2 = solve_batch(grid, system, target, tau, cfg=CFG_PC,
                     comp_method="minVWithL", targets=tgt,
                     discount_factor=0.9, discount_mode="Kene",
                     save_all=False)
    _match(r1, r2)


def test_batch_fused_epilogue_route_taken(interpret_pallas, monkeypatch):
    from levelsetpy_tpu.kernels import wenobatch

    calls = []
    orig = wenobatch.fused_rk_step_batch

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(wenobatch, "fused_rk_step_batch", spy)
    grid, target, obs, _, system = _epilogue_setup()
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                       epsilon_method="constant", use_pallas=True,
                       factor_cfl=0.7911)
    solve_batch(grid, system, target, jnp.array([0.0, 0.08], jnp.float32),
                cfg=cfg, obstacles=obs, save_all=False)
    assert calls, "obstacled sweep did not route through the fused kernel"


def test_batch_solve_max_over_neighbors(interpret_pallas):
    """Node-local epsilon in the batch substep kernel (VERDICT r3 #3)."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       (14, 12, 16), periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    tau = jnp.array([0.0, 0.15], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors")
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors", use_pallas=True)
    r1 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_x, save_all=False)
    r2 = solve_batch(grid, system, target.astype(jnp.float32), tau,
                     cfg=cfg_p, save_all=False)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=2e-5 * scale)
    assert int(r1.steps) == int(r2.steps)


def test_batch_padding_with_epilogue(interpret_pallas):
    """Arbitrary B + fused epilogue together: padded clone lanes must
    carry the per-scenario gamma rows and obstacle operands correctly."""
    Bn = 96
    grid, target, obs, tgt, _ = _epilogue_setup()
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, Bn, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, Bn, dtype=jnp.float32))
    gam = jnp.linspace(0.85, 0.99, Bn, dtype=jnp.float32)
    tau = jnp.array([0.0, 0.1], jnp.float32)
    r1 = solve_batch(grid, system, target, tau, cfg=CFG_XC,
                     comp_method="minVWithL", targets=tgt, obstacles=obs,
                     discount_factor=gam, save_all=False)
    r2 = solve_batch(grid, system, target, tau, cfg=CFG_PC,
                     comp_method="minVWithL", targets=tgt, obstacles=obs,
                     discount_factor=gam, save_all=False)
    assert r2.values.shape[-1] == Bn
    _match(r1, r2)
