"""A/B the fused RK-step kernel layouts on the real TPU.

Measures the MARGINAL per-step cost of the full solve (one jit call per
solve, per-call link overhead cancels between T=1.0 and T=2.0 horizons)
for the aligned (kernels/hjstep.py) and packed (kernels/hjstep_packed.py)
layouts, plus the XLA path, on the headline 101^3 air3D config.

Inputs are perturbed per call (remote execution cache) and results fetched
(block_until_ready unreliable over the link) — see CLAUDE.md.
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from levelsetpy_tpu import DubinsRel, SchemeConfig, create_grid, cylinder, solve

SHAPE = (101, 101, 101)
LO, HI = [-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi]
_seq = [0]


def measure(cfg, label):
    grid = create_grid(LO, HI, SHAPE, periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], center=[0, 0, 0], radius=5.0)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)

    def run(t_end, v0):
        tau = jnp.array([0.0, t_end], jnp.float32)
        res = solve(grid, system, v0, tau, cfg=cfg,
                    comp_method="minVOverTime", save_all=False)
        return res

    res = run(2.0, target)  # compile + warm
    v = np.asarray(res.values[-1])
    assert np.isfinite(v).all(), f"{label}: non-finite output"
    steps = {}
    times = {}
    for t_end in (1.0, 2.0):
        best = float("inf")
        for _ in range(3):
            _seq[0] += 1
            v0 = target + 1e-6 * _seq[0]
            t0 = time.perf_counter()
            r = run(t_end, v0)
            np.asarray(r.values)
            best = min(best, time.perf_counter() - t0)
            steps[t_end] = int(r.steps)
        times[t_end] = best
    marg = (times[2.0] - times[1.0]) / (steps[2.0] - steps[1.0]) * 1e3
    print(f"{label:18s}: wall(T=2)={times[2.0]:7.4f} s "
          f"steps={steps[2.0]} marginal={marg:6.3f} ms/step")
    return times[2.0], marg


def main():
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    measure(SchemeConfig(accuracy="veryHigh", rk_order=2, factor_cfl=0.8),
            "xla")
    measure(SchemeConfig(accuracy="veryHigh", rk_order=2, factor_cfl=0.8,
                         use_pallas=True), "pallas aligned")
    measure(SchemeConfig(accuracy="veryHigh", rk_order=2, factor_cfl=0.8,
                         use_pallas=True, pallas_layout="packed"),
            "pallas packed")


if __name__ == "__main__":
    main()
