"""Per-RHS micro-profile on the real TPU: XLA path vs fused Pallas kernel.

Methodology (remote 'axon' TPU link):
  * per-call overhead is ~30 ms and block_until_ready is not reliable, so
    every timing fetches the result to host (np.asarray);
  * identical repeated executions can be served from a remote cache, so
    every call perturbs its input;
  * the reported number is the MARGINAL cost between a 100-iteration and a
    400-iteration on-device fori_loop — fixed overhead cancels.

Usage:
  python scripts/profile_rhs.py         # xla vs pallas vs kernel-only
  python scripts/profile_rhs.py sweep   # fused-kernel block_x sweep
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
from levelsetpy_tpu.kernels.weno3d import fused_hj_rhs_3d, widen_alphas
from levelsetpy_tpu.terms import (AlphaBounds, hj_rhs, local_ops,
                                  precompute_alpha)

SHAPE = (101, 101, 101)
LO, HI = [-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi]
N_LO, N_HI = 0, 2000
_seq = [0]


def _setup():
    grid = create_grid(LO, HI, SHAPE, periodic_dims=[2])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    v0 = cylinder(grid, ignore_axes=[2], center=[0, 0, 0], radius=5.0)
    xs = grid.mesh_broadcastable(v0.dtype)
    ops = local_ops(grid)
    ab = precompute_alpha(grid, system, xs)
    return grid, system, v0, xs, ops, ab


def marginal_ms(run_n):
    """run_n(n, v) -> out for an n-iteration loop on input v; returns the
    marginal ms per iteration between N_LO and N_HI loops."""
    _, _, v0, _, _, _ = _SETUP
    times = {}
    for n in (N_LO, N_HI):
        best = float("inf")
        for _ in range(4):
            _seq[0] += 1
            v = v0 + 1e-6 * _seq[0]
            t0 = time.perf_counter()
            out = run_n(n, v)
            np.asarray(out)  # force real completion + fetch
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e3


def _loop(n, rhs_of_v, v0):
    def body(_, v):
        return v + 1e-6 * rhs_of_v(v)
    # scalar output: a full-grid fetch over the tunnel adds 50-100 ms noise
    return jnp.sum(jax.lax.fori_loop(0, n, body, v0))


def _ham_fn_for(grid, system, dtype):
    leaves, treedef = jax.tree.flatten(system)
    leaf_shapes = [jnp.shape(l) for l in leaves]
    leaf_sizes = [int(jnp.size(l)) for l in leaves]
    flat_params = jnp.concatenate(
        [jnp.ravel(jnp.asarray(l, dtype)) for l in leaves])

    def ham_fn(tt, starts, p, params_ref):
        rebuilt, off = [], 0
        for shp, sz in zip(leaf_shapes, leaf_sizes):
            vals = params_ref[off] if shp == () else jnp.stack(
                [params_ref[off + k] for k in range(sz)]).reshape(shp)
            rebuilt.append(vals)
            off += sz
        sys_k = jax.tree.unflatten(treedef, rebuilt)
        shape = p[0].shape
        coords = []
        for ax in range(3):
            idx = jax.lax.broadcasted_iota(jnp.int32, shape, ax) + starts[ax]
            coords.append(grid.lo[ax] + idx.astype(dtype) * grid.dx[ax])
        return sys_k.hamiltonian(tt, tuple(coords), p)

    return ham_fn, flat_params


def main():
    grid, system, v0, xs, ops, ab = _SETUP

    def runner(cfg, widened):
        @functools.partial(jax.jit, static_argnums=0)
        def run(n, system, v, xs, alphas, sb):
            w = (widen_alphas(grid, alphas, v.dtype) if widened else None)
            abq = AlphaBounds(alphas=alphas, step_bound=sb, widened=w)
            return _loop(n, lambda vv: hj_rhs(grid, cfg, system, 0.0, vv,
                                              xs, abq, ops)[0], v)
        return lambda n, v: run(n, system, v, xs, ab.alphas, ab.step_bound)

    print(f"device={jax.devices()[0]}", file=sys.stderr)
    cfg_x = SchemeConfig(accuracy="veryHigh", use_pallas=False)
    cfg_p = SchemeConfig(accuracy="veryHigh", use_pallas=True)
    print(f"xla    : {marginal_ms(runner(cfg_x, False)):8.3f} ms/RHS")
    print(f"pallas : {marginal_ms(runner(cfg_p, True)):8.3f} ms/RHS")

    ham_fn, flat_params = _ham_fn_for(grid, system, v0.dtype)

    @functools.partial(jax.jit, static_argnums=0)
    def run_kernel(n, v, alphas, params):
        aw = widen_alphas(grid, alphas, v.dtype)

        def rhs(vv):
            vp = vv
            for axis in range(3):
                vp = ops.pad(vp, axis, 3)
            return fused_hj_rhs_3d(grid, ham_fn, vp, aw,
                                   jnp.full((3,), 1e-6, v.dtype), 0.0,
                                   params=params)
        return _loop(n, rhs, v)

    ms = marginal_ms(lambda n, v: run_kernel(n, v, ab.alphas, flat_params))
    print(f"kernel (const eps): {ms:8.3f} ms/RHS")


def sweep_blocks():
    grid, system, v0, xs, ops, ab = _SETUP
    ham_fn, flat_params = _ham_fn_for(grid, system, v0.dtype)
    print(f"device={jax.devices()[0]}", file=sys.stderr)
    for bx in (8, 16, 32):
        @functools.partial(jax.jit, static_argnums=0)
        def run_kernel(n, v, alphas, params, bx=bx):
            aw = widen_alphas(grid, alphas, v.dtype)

            def rhs(vv):
                vp = vv
                for axis in range(3):
                    vp = ops.pad(vp, axis, 3)
                return fused_hj_rhs_3d(grid, ham_fn, vp, aw,
                                       jnp.full((3,), 1e-6, v.dtype), 0.0,
                                       params=params, block_x=bx)
            return _loop(n, rhs, v)

        try:
            ms = marginal_ms(
                lambda n, v: run_kernel(n, v, ab.alphas, flat_params))
            print(f"block_x={bx:3d}: {ms:8.3f} ms/RHS")
        except Exception as e:
            print(f"block_x={bx:3d}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    _SETUP = _setup()
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_blocks()
    else:
        main()
