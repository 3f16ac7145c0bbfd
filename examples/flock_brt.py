"""Multi-agent flock reachability with evolving consensus headings.

The reference's flock demo (``DynamicalSystems/flock.py`` +
``Notes/rcbrt*.ipynb`` lineage): a murmuration of Dubins agents where one
"attacked" agent plays the pursuit-evasion game while its neighbours'
headings mix under the Jadbabaie consensus rule and their positions fly
forward.  The attacked agent's backward reachable tube is re-solved as the
flock evolves — the union Hamiltonian makes the BRT respond to every
neighbour's state.

Run:  python examples/flock_brt.py [--agents 5] [--rounds 4]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import SchemeConfig, create_grid, solve
from levelsetpy_tpu.systems.flock import Flock


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=31)
    args = ap.parse_args()

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       args.n, periodic_dims=[2])
    rng = np.random.default_rng(0)
    flock = Flock(
        headings=jnp.asarray(rng.uniform(0.0, 2.0, args.agents),
                             jnp.float32),
        n_agents=args.agents, neigh_rad=2, v_e=5.0, v_p=5.0, w_bound=1.0)
    target = flock.payoff(grid, radius=5.0)
    tau = jnp.linspace(0.0, 0.4, 3)
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2)

    print(f"{args.agents}-agent flock, {args.n}^3 grid; "
          f"initial headings {np.asarray(flock.headings).round(2)}")
    for k in range(args.rounds):
        res = solve(grid, flock, target, tau, cfg=cfg, save_all=False)
        vol = float((np.asarray(res.values[-1]) <= 0).mean())
        h = np.asarray(flock.headings)
        print(f"round {k}: BRT volume {vol:.4f}  heading spread "
              f"{h.std():.3f}  steps {int(res.steps)}")
        # flock evolves: consensus mixes headings, agents fly forward
        flock = flock.consensus_step().step_positions(dt=0.2)
        target = flock.payoff(grid, radius=5.0)
    print("headings converged toward agreement:",
          np.asarray(flock.headings).round(3))


if __name__ == "__main__":
    main()
