"""Reach-avoid via vector level sets: two coupled fields, one joint solve.

A double-integrator must reach a goal ball while staying clear of a
(growing) hazard region.  Both value functions integrate JOINTLY under one
shared CFL dt (`solve_vector`, the reference's list-valued odeCFL state,
``ode_cfl_3.py:104-136``) and a coupling hook applied after every RK step
masks the reach tube out of the hazard's backward reachable set:

    V_reach <- max(V_reach, -V_avoid)

Run:  python examples/reach_avoid.py [--no-plots]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, create_grid,
                            solve_vector, sphere)


def reach_avoid_coupling(t, fields, fields_prev):
    reach, avoid = fields
    return (jnp.maximum(reach, -avoid), avoid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--n", type=int, default=101)
    args = ap.parse_args()

    grid = create_grid([-2.0, -2.0], [2.0, 2.0], args.n)
    system = DoubleIntegrator(u_max=1.0)
    goal = sphere(grid, center=[0.0, 0.0], radius=0.3)
    hazard = sphere(grid, center=[0.9, 0.3], radius=0.35)
    tau = jnp.linspace(0.0, 1.2, 7)

    res = solve_vector(
        grid, system, (goal, hazard), tau,
        cfg=SchemeConfig(accuracy="veryHigh", rk_order=2),
        comp_methods=("minVOverTime", "minVOverTime"),
        coupling=reach_avoid_coupling)

    reach, avoid = res.values
    for i, t in enumerate(np.asarray(tau)):
        fr = (np.asarray(reach[i]) <= 0).mean()
        fa = (np.asarray(avoid[i]) <= 0).mean()
        overlap = ((np.asarray(reach[i]) <= 0)
                   & (np.asarray(avoid[i]) <= 0)).mean()
        print(f"t={t:.2f}  reach {fr:.4f}  avoid {fa:.4f}  "
              f"overlap {overlap:.5f}")
    assert ((np.asarray(reach[-1]) <= 0)
            & (np.asarray(avoid[-1]) < -1e-6)).sum() == 0, \
        "reach tube entered the avoid set interior"
    print(f"joint solve: {int(res.steps)} RK steps, "
          f"final max|dV| = {float(res.changes[-1].max()):.2e}")

    if not args.no_plots:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            x = np.linspace(-2, 2, args.n)
            fig, ax = plt.subplots(figsize=(6, 6))
            ax.contour(x, x, np.asarray(reach[0]).T, levels=[0],
                       colors="C0", linestyles="--")
            ax.contour(x, x, np.asarray(reach[-1]).T, levels=[0],
                       colors="C0")
            ax.contourf(x, x, np.asarray(avoid[-1]).T, levels=[-10, 0],
                        colors=["C3"], alpha=0.3)
            ax.set_title("reach tube (blue) held out of the avoid set "
                         "(red)")
            out = pathlib.Path(__file__).parent / "reach_avoid.png"
            fig.savefig(out, dpi=120, bbox_inches="tight")
            print(f"wrote {out}")
        except ImportError:
            print("matplotlib unavailable; skipped plots")


if __name__ == "__main__":
    main()
