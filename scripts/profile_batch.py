"""Marginal per-RHS cost of the batch-last kernel vs the XLA batch path.

Methodology per CLAUDE.md: measure a scan of K RHS evaluations inside ONE
jit call at two loop lengths and report the marginal difference (cleans the
~0.1 s/call link overhead); feedback the output so nothing folds away.

Usage (real TPU):  python scripts/profile_batch.py [--n 31] [--batches 128 256]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=31)
    ap.add_argument("--batches", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--blocks", type=str, nargs="*",
                    default=["4x4", "8x4", "8x8"])
    ap.add_argument("--fast", action="store_true",
                    help="one loop length only (fewer remote compiles)")
    ap.add_argument("--kernel-only", action="store_true",
                    help="time fused_hj_rhs_batch alone (pre-padded input, "
                         "constant eps) to split kernel cost from XLA glue")
    ap.add_argument("--k", type=int, nargs=2, default=[16, 64])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid,
                                cylinder, enable_compilation_cache)
    from levelsetpy_tpu.kernels import wenobatch
    from levelsetpy_tpu.terms import batched_ops, hj_rhs, precompute_alpha

    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)
    n = args.n
    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi], n,
                       periodic_dims=[2])

    def setup(nb):
        xs3 = grid.mesh_broadcastable(jnp.float32)
        v = cylinder(grid, ignore_axes=[2], radius=5.0) \
            + 0.5 * jnp.sin(xs3[2]) * jnp.cos(0.3 * xs3[0])
        v = v[..., None] + 0.01 * jnp.sin(
            jnp.arange(nb, dtype=jnp.float32))
        system = DubinsRel(
            v_e=jnp.linspace(3.0, 7.0, nb, dtype=jnp.float32), v_p=5.0,
            w_bound=jnp.linspace(0.5, 2.0, nb, dtype=jnp.float32))
        xs = tuple(a[..., None] for a in xs3)
        ops = batched_ops(grid)
        ab = precompute_alpha(grid, system, xs, reduce_max=ops.reduce_max)
        return v, system, xs, ops, ab

    def runner(cfg, nb, k, payload):
        v, system, xs, ops, ab = payload

        @jax.jit
        def f(v):
            def body(v, _):
                d, _ = hj_rhs(grid, cfg, system, 0.0, v, xs, ab, ops,
                              n_batch=nb)
                return v + 1e-6 * d, None
            v, _ = jax.lax.scan(body, v, None, length=k)
            # scalar checksum: fetching the full (n^3, B) result through the
            # remote tunnel costs ~3.5 s / 122 MB and dominated the old
            # numbers (the r3 "17 ms/RHS XLA" artifact, CLAUDE.md)
            return jnp.sum(v)
        return f

    def kernel_runner(nb, k, payload, bx, by, lc):
        """Scan of bare kernel launches: one elementwise pass of input
        perturbation per iteration (serializing data dependency), zero
        other glue."""
        from levelsetpy_tpu.boundary import pad_axis
        from levelsetpy_tpu.kernels.wenobatch import (batch_system_closures,
                                                      fused_hj_rhs_batch)

        v, system, xs, ops, ab = payload
        rows, ham, alpha = batch_system_closures(grid, system, v.dtype, nb)

        @jax.jit
        def f(v):
            vp = v
            for ax in range(3):
                vp = pad_axis(grid, vp, ax, 3)
            eps = jnp.full((3,), 1e-6, v.dtype)

            def body(s, _):
                d = fused_hj_rhs_batch(grid, ham, alpha, vp + s, eps, 0.0,
                                       rows, inv_eps=None, block_x=bx,
                                       block_y=by, lane_chunk=lc)
                return s + d[0, 0, 0, 0] * 1e-20, None

            s, _ = jax.lax.scan(body, jnp.zeros((), v.dtype), None,
                                length=k)
            return s
        return f

    def timed(f, v):
        np.asarray(f(v))  # compile+warm
        best = np.inf
        for i in range(4):
            t0 = time.perf_counter()
            np.asarray(f(v + 1e-6 * i))  # perturb: no remote result cache
            best = min(best, time.perf_counter() - t0)
        return best

    def per_rhs(cfg, nb, payload, label):
        """Amortized per-RHS wall at two loop lengths; the long loop is the
        trustworthy number (link overhead < 1%), the short one a linearity
        check against remote-noise artifacts."""
        k0, k1 = args.k
        if args.fast:
            t1 = timed(runner(cfg, nb, k1, payload), payload[0])
            print(f"B={nb} {label}: {t1 / k1 * 1e3:.3f} ms/RHS (K={k1})",
                  flush=True)
            return t1 / k1
        t0 = timed(runner(cfg, nb, k0, payload), payload[0])
        t1 = timed(runner(cfg, nb, k1, payload), payload[0])
        print(f"B={nb} {label}: {t1 / k1 * 1e3:.3f} ms/RHS "
              f"(K={k1}; K={k0} gives {t0 / k0 * 1e3:.3f})", flush=True)
        return t1 / k1

    for nb in args.batches:
        payload = setup(nb)
        if args.kernel_only:
            k1 = args.k[1]
            for blk in args.blocks:
                parts = list(map(int, blk.split("x")))
                bx, by = parts[0], parts[1]
                lc = parts[2] if len(parts) > 2 else 128
                try:
                    f = kernel_runner(nb, k1, payload, bx, by, lc)
                    t1 = timed(f, payload[0])
                    print(f"B={nb} kernel-only {bx}x{by}x{lc}: "
                          f"{t1 / k1 * 1e3:.3f} ms/launch (K={k1})",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"B={nb} kernel-only {bx}x{by}x{lc}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2, use_pallas=False)
        tx = per_rhs(cfg_x, nb, payload, "xla")
        for blk in args.blocks:
            parts = list(map(int, blk.split("x")))
            bx, by = parts[0], parts[1]
            lc = parts[2] if len(parts) > 2 else 128
            # route the kernel to this block shape regardless of the
            # fits heuristic (A/B exploration)
            orig_pick = wenobatch.pick_blocks
            wenobatch.pick_blocks = lambda g, nb_: (bx, by, lc)
            try:
                cfg_p = SchemeConfig(accuracy="veryHigh", rk_order=2,
                                     use_pallas=True)
                tp = per_rhs(cfg_p, nb, payload, f"pallas {bx}x{by}x{lc}")
                print(f"    -> {tx / tp:.2f}x xla", flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"B={nb} pallas {bx}x{by}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                wenobatch.pick_blocks = orig_pick


if __name__ == "__main__":
    main()
