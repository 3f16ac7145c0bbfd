"""Round-5 A/B probes, reproducible (see CLAUDE.md round-5 summary).

Each probe prints a marginal per-step cost measured with the repo's
timing discipline (unique inputs per call — the remote result cache
serves repeated identical executions at ~0 s; marginal between two loop
lengths cleans the ~0.1 s/call link overhead).  Run on the attached TPU:

    python scripts/profile_r5.py [probe ...]

probes: liftlower vector costate3d costate4d lllf
"""
from __future__ import annotations

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve, solve_vector, enable_compilation_cache)
from levelsetpy_tpu.terms import local_ops, precompute_alpha


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _air3d(n=101):
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])
    xs = grid.mesh_broadcastable(jnp.float32)
    v = cylinder(grid, ignore_axes=[2], radius=5.0) \
        + 0.5 * jnp.sin(xs[2]) * jnp.cos(0.3 * xs[0]) * jnp.cos(0.2 * xs[1])
    return grid, xs, v


def probe_liftlower(n=101, n_short=100, n_long=300):
    """Substep kernel: persistent layout vs per-step lift/lower (the
    vector-path A/B; r5 recorded 0.261 vs 0.293 ms/step at 101^3)."""
    from levelsetpy_tpu.kernels import hjstep

    grid, xs, v0 = _air3d(n)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=True)
    ab = precompute_alpha(grid, system, xs)

    def make(mode, n_steps):
        @jax.jit
        def run(v):
            vq = hjstep.lift(grid, v)
            eps = hjstep.initial_epsilon(grid, cfg, vq)

            def body(i, c):
                t, st, eps = c
                vq = st if mode == "persistent" else hjstep.lift(grid, st)
                t, vq, eps = hjstep.fused_rk_step(
                    grid, cfg, system, t, vq, jnp.float32(1e9), ab, "min",
                    eps)
                return t, (vq if mode == "persistent"
                           else hjstep.lower(grid, vq)), eps

            _, st, _ = jax.lax.fori_loop(
                0, n_steps, body,
                (jnp.float32(0.0), vq if mode == "persistent" else v, eps))
            return jnp.sum(st)

        return run

    for mode in ("persistent", "relayout"):
        walls = {}
        for ns in (n_short, n_long):
            run = make(mode, ns)
            float(run(v0))
            walls[ns] = min(_timed(lambda e=e: float(run(v0 + e)))
                            for e in (1e-5, 2e-5, 3e-5))
        marg = (walls[n_long] - walls[n_short]) / (n_long - n_short) * 1e3
        print(f"liftlower/{mode}: marginal {marg:.4f} ms/step")


def probe_vector(n=71):
    """Coupled 2-field reach-avoid: fused substep path vs pure XLA
    (r5 recorded 0.293 vs 0.341 ms/step at 71^3)."""
    grid, xs, reach = _air3d(n)
    avoid = cylinder(grid, center=[8.0, 4.0, 0.0], ignore_axes=[2],
                     radius=3.0)
    sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    coup = (lambda t, f, fp: (jnp.maximum(f[0], -f[1]), f[1]))
    for flag in (True, False):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=flag)
        walls, steps = {}, {}
        for t_e in (0.2, 1.0):
            def run(eps=0.0, t_e=t_e):
                r = solve_vector(
                    grid, sys_, (reach + eps, avoid), jnp.array([0.0, t_e]),
                    cfg=cfg, comp_methods=("minVOverTime", "none"),
                    coupling=coup, save_all=False)
                float(jnp.sum(r.values[0]))
                return int(r.steps)

            steps[t_e] = run()
            walls[t_e] = min(_timed(lambda e=e: run(e))
                             for e in (1e-5, 2e-5, 3e-5))
        ds = steps[1.0] - steps[0.2]
        print(f"vector/pallas={flag}: marginal "
              f"{(walls[1.0] - walls[0.2]) / ds * 1e3:.4f} ms/step")


def probe_costate3d(n=101):
    """Generic (4-corner costate-box) system, LLF: fused vs XLA wall at
    the headline grid (r5 recorded ~1.2x)."""
    from test_pallas_kernel import GenericPursuit

    grid, xs, target = _air3d(n)
    system = GenericPursuit(v_e=5.0, v_p=5.0, w_bound=1.0)
    for flag in (True, False):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                           dissipation="local", use_pallas=flag)

        def run(eps=0.0):
            r = solve(grid, system, target + eps,
                      jnp.array([0.0, 0.5], jnp.float32), cfg=cfg,
                      save_all=False)
            float(jnp.sum(r.values))
            return int(r.steps)

        st = run()
        w = min(_timed(lambda e=e: run(e)) for e in (1e-5, 2e-5, 3e-5))
        print(f"costate3d/pallas={flag}: {w:.4f}s, {st} steps, "
              f"{w / st * 1e3:.3f} ms/step")


def probe_costate4d(shape=(48, 48, 24, 24)):
    """4-D generic costate marginal (r5 recorded 1.21 vs 2.45 ms/step —
    2.0x; also the lagged-CFL hazard scenario: without the sb carry the
    fused path took 9 steps to T=3.0 where XLA takes 32)."""
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

    grid = create_grid([-6000, -6000, -300, -300], [6000, 6000, 300, 300],
                       shape)
    v = cylinder(grid, ignore_axes=[2, 3], radius=100.0)
    system = _GenericRocket4()
    for flag in (True, False):
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                           dissipation="local", use_pallas=flag)
        walls, steps = {}, {}
        for t_e in (0.3, 3.0):
            def run(eps=0.0, t_e=t_e):
                r = solve(grid, system, v + eps,
                          jnp.array([0.0, t_e], jnp.float32), cfg=cfg,
                          save_all=False)
                float(jnp.sum(r.values))
                return int(r.steps)

            steps[t_e] = run()
            walls[t_e] = min(_timed(lambda e=e: run(e))
                             for e in (1e-3, 2e-3, 3e-3))
        ds = steps[3.0] - steps[0.3]
        print(f"costate4d/pallas={flag}: steps {steps[0.3]}->{steps[3.0]} "
              f"marginal {(walls[3.0] - walls[0.3]) / ds * 1e3:.3f} ms/step")


def probe_lllf(n=101):
    """LLF vs LLLF for the generic system (r5 recorded LLF 0.705 <
    LLLF 0.901 ms/step fused — LLF's off-axis scalar boxes win)."""
    from test_pallas_kernel import GenericPursuit

    grid, xs, target = _air3d(n)
    system = GenericPursuit(v_e=5.0, v_p=5.0, w_bound=1.0)
    for kind in ("local", "locallocal"):
        for flag in (True, False):
            cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                               dissipation=kind, use_pallas=flag)

            def run(eps=0.0):
                r = solve(grid, system, target + eps,
                          jnp.array([0.0, 0.5], jnp.float32), cfg=cfg,
                          save_all=False)
                float(jnp.sum(r.values))
                return int(r.steps)

            st = run()
            w = min(_timed(lambda e=e: run(e)) for e in (1e-5, 2e-5, 3e-5))
            print(f"lllf/{kind}/pallas={flag}: {w / st * 1e3:.3f} ms/step "
                  f"({st} steps)")


PROBES = {"liftlower": probe_liftlower, "vector": probe_vector,
          "costate3d": probe_costate3d, "costate4d": probe_costate4d,
          "lllf": probe_lllf}

if __name__ == "__main__":
    enable_compilation_cache()
    names = sys.argv[1:] or list(PROBES)
    print("device:", jax.devices()[0], flush=True)
    for name in names:
        PROBES[name]()
