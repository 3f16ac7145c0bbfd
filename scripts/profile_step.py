"""Per-RK-STEP micro-profile of the fused kernel path on the real TPU.

Breaks the 101^3 fused step into its parts to find the next optimization
target (same marginal-cost methodology as profile_rhs.py):
  * full fused_rk_step (rk2), maxOverGrid eps   — the shipping config
  * full fused_rk_step (rk2), constant eps      — isolates the eps pass
  * fused_substep_3d alone (one substep, const eps)
  * refresh_x_ghosts alone

Usage: python scripts/profile_step.py [block_x ...]
"""
from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from levelsetpy_tpu import DubinsRel, SchemeConfig, create_grid, cylinder
from levelsetpy_tpu.kernels import hjstep
from levelsetpy_tpu.kernels.weno3d import system_closures
from levelsetpy_tpu.terms import local_ops, precompute_alpha

SHAPE = (101, 101, 101)
LO, HI = [-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi]
N_LO, N_HI = 0, 1000
_seq = [0]


def setup():
    grid = create_grid(LO, HI, SHAPE, periodic_dims=[2])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    v0 = cylinder(grid, ignore_axes=[2], center=[0, 0, 0], radius=5.0)
    xs = grid.mesh_broadcastable(v0.dtype)
    ab = precompute_alpha(grid, system, xs)
    return grid, system, v0, xs, ab


GRID, SYSTEM, V0, XS, AB = setup()


def marginal_ms(run_n):
    times = {}
    for n in (N_LO, N_HI):
        best = float("inf")
        for _ in range(4):
            _seq[0] += 1
            v = V0 + 1e-6 * _seq[0]
            t0 = time.perf_counter()
            np.asarray(run_n(n, v))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e3


def time_step(label, cfg):
    @functools.partial(jax.jit, static_argnums=0)
    def run(n, system, v, alphas, sb):
        import dataclasses

        from levelsetpy_tpu.terms import AlphaBounds

        abq = AlphaBounds(alphas=alphas, step_bound=sb)

        def body(_, c):
            vq, eps = c
            _, vq2, eps2 = hjstep.fused_rk_step(GRID, cfg, system, 0.0, vq,
                                                1e9, abq, "min", eps)
            return vq2, eps2

        vq0 = hjstep.lift(GRID, v)
        vq, _ = jax.lax.fori_loop(
            0, n, body, (vq0, hjstep.initial_epsilon(GRID, cfg, vq0)))
        return jnp.sum(hjstep.lower(GRID, vq))

    ms = marginal_ms(lambda n, v: run(n, SYSTEM, v, AB.alphas,
                                      AB.step_bound))
    print(f"{label:42s}: {ms:7.3f} ms/step")
    return ms


def time_substep(label, block_x):
    flat_params, ham_fn, alpha_fn = system_closures(GRID, SYSTEM, V0.dtype)
    eps = jnp.full((3,), 1e-6, V0.dtype)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, v, params):
        def body(_, vq):
            o = hjstep.fused_substep_3d(
                GRID, ham_fn, alpha_fn, vq, vq, eps, 0.0, None,
                1e-4, params, ca=0.0, cb=1.0, block_x=block_x)
            return o

        vq = jax.lax.fori_loop(0, n, body, hjstep.lift(GRID, v))
        return jnp.sum(hjstep.lower(GRID, vq))

    ms = marginal_ms(lambda n, v: run(n, v, flat_params))
    print(f"{label:42s}: {ms:7.3f} ms/substep")
    return ms


def time_ghosts():
    @functools.partial(jax.jit, static_argnums=0)
    def run(n, v):
        def body(_, vq):
            return hjstep.refresh_x_ghosts(GRID, vq) + 1e-9

        vq = jax.lax.fori_loop(0, n, body, hjstep.lift(GRID, v))
        return jnp.sum(hjstep.lower(GRID, vq))

    print(f"{'refresh_x_ghosts (+axpy)':42s}: "
          f"{marginal_ms(run):7.3f} ms/iter")


def main():
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    time_step("fused_rk_step rk2, maxOverGrid eps",
              SchemeConfig(accuracy="veryHigh", rk_order=2,
                           use_pallas=True))
    time_step("fused_rk_step rk2, constant eps",
              SchemeConfig(accuracy="veryHigh", rk_order=2,
                           use_pallas=True, epsilon_method="constant"))
    blocks = [int(b) for b in sys.argv[1:]] or [8]
    for bx in blocks:
        time_substep(f"fused_substep_3d alone (bx={bx})", bx)
    time_ghosts()


if __name__ == "__main__":
    main()
