"""4-D XLA-path cost breakdown: is the rocket config compute- or HBM-bound?

VERDICT r2 #3: the 4-D configs (rocket 48x48x24x24, flock) run pure XLA
with no recorded evidence about their distance from roofline.  This script
measures, on the real chip:

  * marginal ms/RK-step of the full solve (two horizons, difference —
    cleans the per-call link overhead out, CLAUDE.md methodology);
  * marginal ms/RHS of `hj_rhs` alone via an on-device scan;

and prints the roofline model next to them:

  flops  ~ 4 axes x ~103 flop/elem/axis (WENO5 shared-table) = ~410/elem
           -> 48*48*24*24 = 1.33M elem = 0.55 GFLOP/RHS = ~0.14 ms at
           3.9 TFLOP/s f32 (VPU);
  HBM    ~ XLA evaluates the chain as ~25-30 fused passes over the 5.3 MB
           array = ~300 MB/RHS = ~0.38 ms at 800 GB/s.

If the measured RHS sits near the HBM bound (~0.4 ms) the path is
bandwidth-bound and a fused 4-D kernel would buy up to ~2.5x; if it sits
near ~1 ms+ the win is larger; at ~0.15 ms it is already compute-bound.

Usage:  python scripts/profile_4d.py
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from levelsetpy_tpu import (RocketSystem, SchemeConfig, create_grid,
                                cylinder, enable_compilation_cache, solve)
    from levelsetpy_tpu.terms import local_ops, hj_rhs, precompute_alpha

    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)

    shape = (48, 48, 24, 24)
    grid = create_grid([-6000, -6000, -300, -300], [6000, 6000, 300, 300],
                       shape)
    system = RocketSystem()
    target = cylinder(grid, ignore_axes=[2, 3], radius=100.0)

    # ---- full-solve marginal per step (two horizons), XLA vs fused 4-D
    def run(cfg, t_end, eps=0.0):
        r = solve(grid, system, target + eps, jnp.array([0.0, t_end],
                                                        jnp.float32),
                  cfg=cfg, save_all=False)
        float(jnp.sum(r.values))  # checksum fetch, not the 5.3 MB array
        return int(r.steps)

    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False)
    for label, c in (("xla", cfg),
                     ("fused4d", SchemeConfig(accuracy="veryHigh",
                                              rk_order=2, use_pallas=True))):
        walls, steps = {}, {}
        for t_end in (0.3, 1.2):
            steps[t_end] = run(c, t_end)  # compile+warm
            walls[t_end] = min(
                _timed(lambda e=e: run(c, t_end, e))
                for e in (1e-3, 2e-3, 3e-3))
        d_steps = steps[1.2] - steps[0.3]
        per_step = (walls[1.2] - walls[0.3]) / d_steps
        print(f"[{label}] solve walls: {walls} steps: {steps}", flush=True)
        print(f"[{label}] marginal per RK2 step: {per_step * 1e3:.3f} ms "
              f"({d_steps} extra steps)", flush=True)

    # ---- RHS-only marginal via on-device scan
    xs = grid.mesh_broadcastable(jnp.float32)
    ops = local_ops(grid)
    ab = precompute_alpha(grid, system, xs)
    v0 = target + 0.1 * jnp.sin(xs[2] / 100) * jnp.cos(xs[3] / 100)

    def runner(k):
        @jax.jit
        def f(v):
            def body(v, _):
                d, _ = hj_rhs(grid, cfg, system, 0.0, v, xs, ab, ops)
                return v + 1e-6 * d, None
            # scalar checksum fetch — a full 5.3 MB array pull through the
            # tunnel would add ~2 ms/iteration of pure fetch artifact
            return jnp.sum(jax.lax.scan(body, v, None, length=k)[0])
        return f

    f64 = runner(64)
    float(f64(v0))
    wall = min(_timed(lambda i=i: float(f64(v0 + 1e-6 * i)))
               for i in (1, 2, 3))
    per_rhs = wall / 64
    print(f"marginal per RHS: {per_rhs * 1e3:.3f} ms", flush=True)

    elems = float(np.prod(shape))
    comp_ms = elems * 410 / 1e9 / 3.9        # GFLOP over TFLOP/s -> ms
    hbm_ms = 28 * 2 * (elems * 4 / 1e6) / 800e3 * 1e3
    print(f"roofline: compute {comp_ms:.3f} ms at 3.9 TF/s | HBM "
          f"~{hbm_ms:.3f} ms for ~28 r+w passes at 800 GB/s", flush=True)
    print(f"verdict: RHS at {per_rhs * 1e3:.2f} ms vs HBM bound "
          f"{hbm_ms:.2f} ms and compute bound {comp_ms:.2f} ms", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
