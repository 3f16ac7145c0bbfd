"""TPU acceptance checks: accuracy gate + kernel equivalence on hardware.

Run on the attached TPU (no env prefix): validates the BASELINE gates that
CPU tests cannot:
  1. f32-on-TPU value function vs the independent f64 numpy oracle
     (max|V - V_ref| < 1e-3 gate from BASELINE.json).
  2. fused Pallas kernel vs the XLA path on real hardware.
Prints one line per check; exits nonzero on failure.
"""
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "benchmarks"))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve)
from levelsetpy_tpu.terms import hj_rhs, local_ops, precompute_alpha
from numpy_ref import Air3DNumpy

FAILED = False


def check(name, ok, detail):
    global FAILED
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}", flush=True)
    if not ok:
        FAILED = True


def accuracy_gate(shape=(51, 51, 51), t_end=0.5):
    lo, hi = [-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi]
    ref = Air3DNumpy(lo, hi, shape, ve=5.0, vp=5.0, w=1.0,
                     dtype=np.float64)
    v0 = ref.target_cylinder(5.0)
    t0 = time.perf_counter()
    v_ref, _, n_ref = ref.solve(v0.copy(), t_end)
    cpu_s = time.perf_counter() - t0

    grid = create_grid(lo, hi, shape, periodic_dims=[2])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    res = solve(grid, system, jnp.asarray(v0, jnp.float32),
                jnp.array([0.0, t_end], jnp.float32),
                cfg=SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False),
                save_all=False)
    v_tpu = np.asarray(res.values[-1], np.float64)
    err = np.abs(v_tpu - v_ref).max()
    scale = np.abs(v_ref).max()
    check("accuracy f32-TPU vs f64-oracle",
          err < 1e-3 * max(1.0, scale) and int(res.steps) == n_ref,
          f"max|V-V_ref|={err:.2e} (scale {scale:.1f}, rel "
          f"{err / scale:.2e}), steps {int(res.steps)}=={n_ref}, "
          f"cpu oracle {cpu_s:.1f}s")


def pallas_equivalence(n=71):
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    xs = grid.mesh_broadcastable(jnp.float32)
    ops = local_ops(grid)
    ab = precompute_alpha(grid, system, xs)
    outs = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                           use_pallas=flag)
        d, _ = jax.jit(lambda vv, cfg=cfg: hj_rhs(
            grid, cfg, system, 0.0, vv, xs, ab, ops))(v)
        outs[name] = np.asarray(d)
    err = np.abs(outs["xla"] - outs["pallas"]).max()
    scale = np.abs(outs["xla"]).max()
    check("pallas kernel vs xla on TPU", err < 1e-4 * scale,
          f"max|diff|={err:.2e} (rel {err / scale:.2e})")


def fused_step_solve(n=71, t_end=0.25):
    """Full solve through the fused RK-step kernel (lagged maxOverGrid eps)
    vs the XLA path — on a theta-CONSTANT target, the regime where the
    lag's eps transient once overflowed to NaN on real Mosaic (frozen via
    TPU min(NaN, va)); see weno3d._weno_weight_tables clamp."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    outs = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                           use_pallas=flag)
        r = solve(grid, system, v, tau, cfg=cfg,
                  comp_method="minVOverTime", save_all=False)
        outs[name] = np.asarray(r.values)
    err = np.abs(outs["xla"] - outs["pallas"]).max()
    scale = np.abs(outs["xla"]).max()
    grew = (outs["pallas"] <= 0).mean() > (np.asarray(v) <= 0).mean()
    check("fused RK-step solve vs xla (theta-constant target)",
          err < 1e-3 * scale and grew,
          f"max|diff|={err:.2e} (rel {err / scale:.2e}) tube_grew={grew}")


def fused_step_4d(shape=(48, 48, 24, 24), t_end=0.3):
    """4-D packed-lane substep kernel (kernels/hjstep4d.py) vs XLA."""
    from levelsetpy_tpu import RocketSystem

    grid = create_grid([-6000, -6000, -300, -300], [6000, 6000, 300, 300],
                       shape)
    v = cylinder(grid, ignore_axes=[2, 3], radius=100.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    outs = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                           use_pallas=flag)
        r = solve(grid, RocketSystem(), v, tau, cfg=cfg, save_all=False)
        outs[name] = np.asarray(r.values)
    err = np.abs(outs["xla"] - outs["pallas"]).max()
    scale = np.abs(outs["xla"]).max()
    check("fused 4-D substep kernel vs xla", err < 1e-3 * scale,
          f"max|diff|={err:.2e} (rel {err / scale:.2e})")


def sharded_fused_step(n=71, t_end=0.25):
    """x-sharded fused RK-step at mesh size 1 must match single-device
    (mesh>1 paths are covered on the 8-virtual-device CPU mesh in
    tests/test_parallel_fusedstep.py)."""
    from levelsetpy_tpu.parallel import make_mesh, solve_sharded

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg, save_all=False)
    rs = solve_sharded(grid, system, v, tau, shard_axes={0: "x"},
                       mesh=make_mesh({"x": 1}), cfg=cfg, save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(rs.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("sharded fused RK-step (mesh=1) vs single-device",
          err < 1e-5 * scale, f"max|diff|={err:.2e}")

    # xy-sharded fused path (sharded-y ghost columns via ppermute, y fill
    # disabled in-kernel) at mesh size 1x1 — mesh>1 runs on the CPU
    # virtual mesh in tests/test_parallel_fusedstep.py
    rxy = solve_sharded(grid, system, v, tau, shard_axes={0: "x", 1: "y"},
                        mesh=make_mesh({"x": 1, "y": 1}), cfg=cfg,
                        save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(rxy.values)).max()
    check("xy-sharded fused RK-step (1x1 mesh) vs single-device",
          err < 1e-5 * scale, f"max|diff|={err:.2e}")


def fused_epilogue(n=51, t_end=0.25):
    """Obstacle + target + Jaime discount fused into the substep kernel
    (VERDICT r3 #1) must match the XLA path through real Mosaic lowering
    (interpret-mode CPU tests cannot catch lowering rejects)."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0)
    obs = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                   radius=3.0)
    tgt = cylinder(grid, ignore_axes=[2], radius=4.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    kw = dict(comp_method="minVWithL", targets=tgt, obstacles=obs,
              discount_factor=0.95, save_all=False)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x, **kw)
    r2 = solve(grid, system, v, tau, cfg=cfg_p, **kw)
    err = np.abs(np.asarray(r1.values) - np.asarray(r2.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("fused epilogue (obstacle+withL+discount) vs xla",
          err < 1e-3 * scale and np.isfinite(np.asarray(r2.values)).all()
          and int(r1.steps) == int(r2.steps),
          f"max|diff|={err:.2e} steps {int(r1.steps)}=={int(r2.steps)}")


def fused_epilogue_4d(shape=(24, 24, 16, 16), t_end=0.2):
    from levelsetpy_tpu import PlanarDoubleIntegrator, sphere

    grid = create_grid([-2.0, -2.0, -1.0, -1.0], [2.0, 2.0, 1.0, 1.0],
                       shape)
    v = sphere(grid, radius=1.0)
    obs = sphere(grid, center=[1.0, 1.0, 0.0, 0.0], radius=0.5)
    system = PlanarDoubleIntegrator(u_max=1.0, d_max=0.2)
    tau = jnp.array([0.0, t_end], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x, obstacles=obs,
               save_all=False)
    r2 = solve(grid, system, v, tau, cfg=cfg_p, obstacles=obs,
               save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(r2.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("fused 4-D epilogue (obstacle) vs xla", err < 1e-3 * scale,
          f"max|diff|={err:.2e}")


def fused_epilogue_batch(n=31, B=128, t_end=0.2):
    from levelsetpy_tpu import solve_batch

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0).astype(jnp.float32)
    obs = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                   radius=3.0).astype(jnp.float32)
    system = DubinsRel(
        v_e=jnp.linspace(3.0, 7.0, B, dtype=jnp.float32),
        v_p=5.0,
        w_bound=jnp.linspace(0.5, 2.0, B, dtype=jnp.float32))
    tau = jnp.array([0.0, t_end], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    r1 = solve_batch(grid, system, v, tau, cfg=cfg_x, obstacles=obs,
                     save_all=False)
    r2 = solve_batch(grid, system, v, tau, cfg=cfg_p, obstacles=obs,
                     save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(r2.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("fused batch epilogue (obstacle) vs xla", err < 1e-3 * scale,
          f"max|diff|={err:.2e} steps {int(r1.steps)}=={int(r2.steps)}")


def fused_neighbors_eps(n=51, t_end=0.25):
    """maxOverNeighbors epsilon built in-kernel (weno3d._resolve_epsq)
    through real Mosaic; parity is tight (node-local — no lag)."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    v = cylinder(grid, ignore_axes=[2], radius=5.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors", use_pallas=False)
    cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="maxOverNeighbors", use_pallas=True)
    r1 = solve(grid, system, v, tau, cfg=cfg_x, save_all=False)
    r2 = solve(grid, system, v, tau, cfg=cfg_p, save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(r2.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("fused maxOverNeighbors eps vs xla", err < 1e-4 * scale,
          f"max|diff|={err:.2e} steps {int(r1.steps)}=={int(r2.steps)}")


def costate_kernel(n=51, t_end=0.12):
    """Generic (no analytic alpha) system through the fused substep kernel
    with in-kernel node-local costate-box alphas (VERDICT r4 #1), LLLF
    with max_step binding the dt so the XLA comparison is exact up to f32
    association + bang-bang knife edges (a handful of sign(det)-boundary
    nodes may flip the 4-corner control between paths)."""
    sys.path.insert(0, str(ROOT / "tests"))
    from test_pallas_kernel import GenericPursuit

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs[2]) * jnp.cos(0.3 * xs[0]) * jnp.cos(0.2 * xs[1])
    system = GenericPursuit(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    kw = dict(accuracy="veryHigh", rk_order=2, dissipation="locallocal",
              epsilon_method="constant", max_step=0.004)
    r1 = solve(grid, system, v, tau, cfg=SchemeConfig(use_pallas=False,
                                                      **kw),
               save_all=False)
    r2 = solve(grid, system, v, tau, cfg=SchemeConfig(use_pallas=True,
                                                      **kw),
               save_all=False)
    diff = np.abs(np.asarray(r1.values) - np.asarray(r2.values))
    scale = np.abs(np.asarray(r1.values)).max()
    n_bad = int((diff > 2e-5 * scale).sum())
    ok = (n_bad <= 10 and diff.max() <= 1e-3 * scale
          and int(r1.steps) == int(r2.steps))
    check("costate-box (generic alpha) kernel vs xla", ok,
          f"max|diff|={diff.max():.2e} outliers={n_bad} "
          f"steps {int(r1.steps)}=={int(r2.steps)}")


def costate_kernel_4d(shape=(24, 24, 16, 16), t_end=0.2):
    """4-D leg of the generic costate-box path (unit-vector controls —
    atan2 has no Mosaic lowering) vs XLA, dt pinned by max_step."""
    from levelsetpy_tpu.systems.base import System, register_system

    @register_system
    class _GenericRocket4(System):
        a_e: float = 64.0
        a_p: float = 64.0
        n_states = 4
        u_mode = "max"
        d_mode = "min"

        def dynamics(self, t, x, u, d):
            return (x[2], x[3], self.a_e * u[0] - self.a_p * d[0],
                    self.a_e * u[1] - self.a_p * d[1])

        def _dir(self, p, sign):
            r = jnp.sqrt(p[2] * p[2] + p[3] * p[3]) + 1e-30
            return (sign * p[2] / r, sign * p[3] / r)

        def opt_control(self, t, x, p, mode):
            return self._dir(p, 1.0 if mode == "max" else -1.0)

        def opt_disturbance(self, t, x, p, mode):
            return self._dir(p, -1.0 if mode == "min" else 1.0)

    grid = create_grid([-600, -600, -60, -60], [600, 600, 60, 60], shape)
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2, 3], radius=100.0) \
        + 5.0 * jnp.sin(0.01 * xs[2]) * jnp.cos(0.01 * xs[3])
    tau = jnp.array([0.0, t_end], jnp.float32)
    kw = dict(accuracy="veryHigh", rk_order=2, dissipation="locallocal",
              epsilon_method="constant", max_step=0.02)
    r1 = solve(grid, _GenericRocket4(), v, tau,
               cfg=SchemeConfig(use_pallas=False, **kw), save_all=False)
    r2 = solve(grid, _GenericRocket4(), v, tau,
               cfg=SchemeConfig(use_pallas=True, **kw), save_all=False)
    d = np.abs(np.asarray(r1.values) - np.asarray(r2.values))
    scale = np.abs(np.asarray(r1.values)).max()
    n_bad = int((d > 2e-5 * scale).sum())
    ok = (n_bad <= 10 and d.max() <= 1e-3 * scale
          and int(r1.steps) == int(r2.steps))
    check("costate-box 4-D kernel vs xla", ok,
          f"max|diff|={d.max():.2e} outliers={n_bad} "
          f"steps {int(r1.steps)}=={int(r2.steps)}")


def sharded_batch(n=31, B=128, t_end=0.25):
    """solve_batch_sharded at mesh size 1 (fused batch kernel per shard)
    must be bit-identical to the single-device sweep (zero collectives;
    mesh>1 runs on the CPU virtual mesh in tests/test_parallel_batch.py)."""
    from levelsetpy_tpu import solve_batch
    from levelsetpy_tpu.parallel import make_mesh, solve_batch_sharded

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0)
    sys_ = DubinsRel(v_e=5.0, v_p=5.0,
                     w_bound=jnp.linspace(0.5, 1.9, B))
    tau = jnp.array([0.0, t_end], jnp.float32)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    ref = solve_batch(grid, sys_, target, tau, cfg=cfg, save_all=False)
    res = solve_batch_sharded(grid, sys_, target, tau, make_mesh({"b": 1}),
                              cfg=cfg, save_all=False)
    d = float(jnp.abs(res.values - ref.values).max())
    scale = float(jnp.abs(ref.values).max())
    check("sharded batch sweep (mesh=1) vs single-device",
          d < 1e-6 * scale, f"max|diff|={d:.2e}")


def fused_noise(n=51, t_end=0.15):
    """Diagonal Gaussian noise fused as in-kernel second differences
    (VERDICT r4 #8) vs the XLA sum_terms path through real Mosaic."""
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs[2]) * jnp.cos(0.3 * xs[0])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    tau = jnp.array([0.0, t_end], jnp.float32)
    sg = jnp.array([0.3, 0.2, 0.1], jnp.float32)
    kw = dict(accuracy="veryHigh", rk_order=2, epsilon_method="constant")
    r1 = solve(grid, system, v, tau, cfg=SchemeConfig(use_pallas=False,
                                                      **kw),
               noise_stddev=sg, save_all=False)
    r2 = solve(grid, system, v, tau, cfg=SchemeConfig(use_pallas=True,
                                                      **kw),
               noise_stddev=sg, save_all=False)
    err = np.abs(np.asarray(r1.values) - np.asarray(r2.values)).max()
    scale = np.abs(np.asarray(r1.values)).max()
    check("fused diagonal-noise kernel vs xla",
          err < 1e-4 * scale and int(r1.steps) == int(r2.steps),
          f"max|diff|={err:.2e} steps {int(r1.steps)}=={int(r2.steps)}")


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    quick = "--quick" in sys.argv
    if not quick:
        accuracy_gate()
        pallas_equivalence()
        fused_step_solve()
        fused_step_4d()
        sharded_fused_step()
    fused_epilogue()
    fused_epilogue_4d()
    fused_epilogue_batch()
    fused_neighbors_eps()
    costate_kernel()
    costate_kernel_4d()
    fused_noise()
    sharded_batch()
    sys.exit(1 if FAILED else 0)
