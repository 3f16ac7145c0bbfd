"""Variational HJI approximation (minimax DDP) vs the dense grid solver.

The reference's ``DDPReach/`` spur (LCSS paper: second-order reachable sets
via a Cauchy-type variational HJI equation) approximates the value function
along *scheduled trajectories* instead of on a dense grid.  Here the whole
scheme is one vmapped XLA program (``levelsetpy_tpu.ddp``): a batch of
initial states x a schedule of horizons, each a two-player trajectory game
solved by DDP with autodiff derivatives.

The demo runs the rocket pursuit-evasion game both ways — dense 4-D HJI
solve and trajectory-game sampling at the same states — and reports the
classification agreement (capture / escape) plus throughput in games/s.

Run:  python examples/varhji_ddp.py [--batch 256] [--n 15]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DDPConfig, RocketSystem, SchemeConfig,
                            create_grid, eval_u, solve, varhji_reach)
from levelsetpy_tpu.shapes import cylinder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=15, help="dense grid pts/dim")
    ap.add_argument("--t-end", type=float, default=1.5)
    args = ap.parse_args()

    sys_ = RocketSystem(a_e=64.0, a_p=64.0, capture_rad=100.0)
    r = sys_.capture_rad

    # sample initial states away from the grid edges
    rng = np.random.default_rng(7)
    lo = np.array([-450.0, -450.0, -150.0, -150.0])
    hi = -lo
    x0s = jnp.asarray(rng.uniform(lo, hi, size=(args.batch, 4)))
    taus = jnp.linspace(0.0, args.t_end, 4)[1:]

    # ---- trajectory games (VarHJIApprox capability) ----
    def target(x):
        return x[0] ** 2 + x[1] ** 2 - r ** 2

    t0 = time.perf_counter()
    vals, per_tau = varhji_reach(sys_, x0s, taus, target, n_steps=24,
                                 nu=1, nv=1,
                                 cfg=DDPConfig(iters=25, reg=1e-2))
    vals = jax.block_until_ready(vals)
    dt_games = time.perf_counter() - t0
    n_games = args.batch * len(taus)
    print(f"minimax-DDP: {n_games} games in {dt_games:.2f}s "
          f"({n_games / dt_games:.0f} games/s incl. compile)")

    # ---- dense HJI solve, same game ----
    g = create_grid([-600, -600, -200, -200], [600, 600, 200, 200], args.n)
    tgt = cylinder(g, ignore_axes=[2, 3], center=[0, 0, 0, 0], radius=r)
    t0 = time.perf_counter()
    res = solve(g, sys_, tgt, tau=jnp.linspace(0.0, args.t_end, 4),
                cfg=SchemeConfig(accuracy="eno2", rk_order=2))
    res.values.block_until_ready()
    print(f"dense HJI {args.n}^4 solve: {time.perf_counter() - t0:.2f}s")

    dense_vals = eval_u(g, res.values[-1], x0s)
    agree = np.mean((np.asarray(vals) <= 0) == (np.asarray(dense_vals) <= 0))
    print(f"capture/escape agreement at {args.batch} sampled states: "
          f"{100 * agree:.1f}%")


if __name__ == "__main__":
    main()
