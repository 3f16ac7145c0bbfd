"""Microbench: WENO combine formulations on TPU (full 3-axis XLA RHS).

HISTORICAL (2026-08): this A/B chose the multiply-through form (B won).
The production code has since moved on to shared weight tables
(``derivatives._weno_weight_tables``, 2026-08-20) and no longer has a
swappable ``_weno_combine`` seam — the script exits early if run against
the current tree; kept as the record of the divide-count decision.

Variants:
  A current   a_i = w_i/(s_i+eps)^2; out = sum(a p)/sum(a)        (4 div/side)
  B multthru  w_i' = w_i * prod_{j!=i}(s_j+eps)^2; out = num/den  (1 div/side)
  C normthru  like B but b_i pre-normalized by sum(b)             (2 div/side)
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import levelsetpy_tpu.derivatives as D
from levelsetpy_tpu import DubinsRel, SchemeConfig, create_grid, cylinder
from levelsetpy_tpu.terms import AlphaBounds, hj_rhs, local_ops, \
    precompute_alpha

SHAPE = (101, 101, 101)
LO, HI = [-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi]
N_ITERS = 200


def combine_a(phis, ss, weights, eps):
    a1 = weights[0] / (ss[0] + eps) ** 2
    a2 = weights[1] / (ss[1] + eps) ** 2
    a3 = weights[2] / (ss[2] + eps) ** 2
    return (a1 * phis[0] + a2 * phis[1] + a3 * phis[2]) / (a1 + a2 + a3)


def combine_b(phis, ss, weights, eps):
    c1 = (ss[0] + eps) ** 2
    c2 = (ss[1] + eps) ** 2
    c3 = (ss[2] + eps) ** 2
    a1 = weights[0] * (c2 * c3)
    a2 = weights[1] * (c1 * c3)
    a3 = weights[2] * (c1 * c2)
    return (a1 * phis[0] + a2 * phis[1] + a3 * phis[2]) / (a1 + a2 + a3)


def combine_c(phis, ss, weights, eps):
    b1 = ss[0] + eps
    b2 = ss[1] + eps
    b3 = ss[2] + eps
    r = 1.0 / (b1 + b2 + b3)
    c1 = (b1 * r) ** 2
    c2 = (b2 * r) ** 2
    c3 = (b3 * r) ** 2
    a1 = weights[0] * (c2 * c3)
    a2 = weights[1] * (c1 * c3)
    a3 = weights[2] * (c1 * c2)
    return (a1 * phis[0] + a2 * phis[1] + a3 * phis[2]) / (a1 + a2 + a3)


def main():
    if not hasattr(D, "_weno_combine"):
        print("historical A/B: the _weno_combine seam was removed by the "
              "shared-weight-table refactor (2026-08-20); see module "
              "docstring for the recorded result")
        return
    grid = create_grid(LO, HI, SHAPE, periodic_dims=[2])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    v0 = cylinder(grid, ignore_axes=[2], center=[0, 0, 0], radius=5.0)
    xs = grid.mesh_broadcastable(v0.dtype)
    ops = local_ops(grid)
    ab = precompute_alpha(grid, system, xs)
    cfg = SchemeConfig(accuracy="veryHigh", use_pallas=False)

    def make_run(combine):
        orig = D._weno_combine
        D._weno_combine = combine

        @jax.jit
        def run(system, v0, xs, alphas, sb):
            abq = AlphaBounds(alphas=alphas, step_bound=sb)

            def body(_, v):
                vdot = hj_rhs(grid, cfg, system, 0.0, v, xs, abq, ops)[0]
                return v + 1e-6 * vdot
            return jax.lax.fori_loop(0, N_ITERS, body, v0)

        out = run(system, v0, xs, ab.alphas, ab.step_bound)  # compile
        out.block_until_ready()
        D._weno_combine = orig
        return run, out

    print(f"device={jax.devices()[0]}", file=sys.stderr)
    results = {}
    for name, combine in [("A-current", combine_a), ("B-multthru", combine_b),
                          ("C-normthru", combine_c)]:
        run, out0 = make_run(combine)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(system, v0, xs, ab.alphas, ab.step_bound)
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        results[name] = np.asarray(out0)
        print(f"{name}: {best / N_ITERS * 1e3:8.3f} ms/RHS")

    ref = results["A-current"]
    for name in ("B-multthru", "C-normthru"):
        dev = np.abs(results[name] - ref).max()
        print(f"max|{name} - A| after {N_ITERS} accum iters: {dev:.3e}")


if __name__ == "__main__":
    main()
