"""5-D eikonal backward reachable tube.

Exercises the solver at the reference's dimensional ceiling (the reference
grid layer supports 1-5 dims, ``Grids/process_grid.py:131``, but nothing
upstream ever ran 5-D): a holonomic ``x' = u``, ``|u| <= 1`` system whose
BRT has the closed form ``V(x,T) = max(0, |x| - T) - r``, so the run
self-checks against the exact viscosity solution.

Run:  python examples/eikonal5d.py [--n 11] [--t-end 0.2]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import Holonomic, SchemeConfig, create_grid, solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=11)
    ap.add_argument("--t-end", type=float, default=0.2)
    args = ap.parse_args()

    n, T = args.n, args.t_end
    grid = create_grid([-1.0] * 5, [1.0] * 5, (n,) * 5)
    xs = grid.mesh_broadcastable(jnp.float32)
    dist = jnp.sqrt(sum(x * x for x in xs))
    v0 = dist - 0.4

    t0 = time.time()
    res = solve(grid, Holonomic(speed=1.0, dims=5), v0,
                jnp.array([0.0, T], jnp.float32),
                cfg=SchemeConfig(accuracy="veryHigh", rk_order=2),
                comp_method="minVOverTime")
    v = np.asarray(res.values[-1])
    wall = time.time() - t0

    exact = np.maximum(0.0, np.asarray(dist) - T) - 0.4
    mask = np.abs(np.asarray(dist) - T) > 1.5 * grid.dx[0]
    err = np.abs(v - exact)[mask].max()
    print(f"5-D grid {grid.shape} ({np.prod(grid.shape):,} nodes), "
          f"{int(res.steps)} RK steps in {wall:.2f}s")
    print(f"max |V - V_exact| away from the kink: {err:.4f} "
          f"(dx = {grid.dx[0]:.3f})")
    assert np.isfinite(v).all()


if __name__ == "__main__":
    main()
