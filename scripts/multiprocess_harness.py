"""Multi-process (multi-host) solver harness + CPU rehearsal.

The one-command pod entry point: run THE SAME command on every host of a
TPU pod slice — ``jax.distributed`` auto-configures, the mesh spans all
hosts (host-contiguous, halo DCN crossings only at host boundaries), the
initial condition is materialized per-host block
(``sharded_initial_condition``), and the solve prints global statistics
(replicated scalars, safe to read on every process)::

    python scripts/multiprocess_harness.py --n 256 --shards 8

Without a pod, ``--spawn K`` rehearses the identical code path on CPU:
the script re-executes itself K times (K processes x ``--local-devices``
virtual CPU devices each, Gloo collectives), and process 0 writes the
solve statistics to ``--out``.  The wrapper then runs the single-process
solve and asserts the statistics match — multi-process correctness without
hardware:

    PALLAS_AXON_POOL_IPS= python scripts/multiprocess_harness.py --spawn 2
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def solve_stats(n: int, t_end: float, shards: int, mesh=None) -> dict:
    """Run the sharded air3D solve on the current (possibly multi-process)
    runtime; return replicated global statistics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from levelsetpy_tpu import DubinsRel, SchemeConfig, create_grid
    from levelsetpy_tpu.parallel import (make_global_mesh,
                                         sharded_initial_condition,
                                         solve_sharded)

    grid = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                       [n, n, max(n // 2, 8)], periodic_dims=[2])
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    if mesh is None:
        mesh = make_global_mesh({"x": shards})
    shard_axes = {0: "x"}

    def sdf(x0, x1, x2):
        # cylinder(ignore_axes=[2], radius=5) evaluated per process block
        return np.sqrt(x0 ** 2 + x1 ** 2) - 5.0 + 0.0 * x2

    v0 = sharded_initial_condition(grid, sdf, mesh, shard_axes)
    res = solve_sharded(
        grid, system, v0, tau=jnp.array([0.0, t_end], jnp.float32),
        shard_axes=shard_axes, mesh=mesh,
        cfg=SchemeConfig(accuracy="veryHigh", rk_order=2), save_all=False)
    vals = res.values
    # global reductions over the sharded result: replicated scalars every
    # process can read (never gather the full grid to one host)
    stats = {
        "steps": int(res.steps),
        "max_abs": float(jnp.max(jnp.abs(vals))),
        "sum": float(jnp.sum(vals.astype(jnp.float64))),
        "volume": float(jnp.mean((vals <= 0).astype(jnp.float32))),
        "processes": jax.process_count(),
        "devices": len(jax.devices()),
    }
    return stats


def run_child(args) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{args.local_devices}").strip()
    from levelsetpy_tpu.parallel import init_distributed

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    import jax

    stats = solve_stats(args.n, args.t_end, args.shards)
    print(f"[proc {jax.process_index()}] {stats}", flush=True)
    if jax.process_index() == 0 and args.out:
        pathlib.Path(args.out).write_text(json.dumps(stats))


def run_spawn(args) -> None:
    """CPU rehearsal: K processes vs 1 process must agree."""
    out = ROOT / "benchmarks" / "multiprocess_stats.json"
    procs = []
    for pid in range(args.spawn):
        cmd = [sys.executable, __file__, "--child",
               "--coordinator", "127.0.0.1:12421",
               "--num-processes", str(args.spawn), "--process-id", str(pid),
               "--local-devices", str(args.local_devices),
               "--n", str(args.n), "--t-end", str(args.t_end),
               "--shards", str(args.shards)]
        if pid == 0:
            cmd += ["--out", str(out)]
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        procs.append(subprocess.Popen(cmd, env=env))
    for p in procs:
        if p.wait(timeout=600):
            raise SystemExit(f"child exited {p.returncode}")
    multi = json.loads(out.read_text())

    # single-process reference on the same number of (virtual) devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{args.shards}").strip()
    single = solve_stats(args.n, args.t_end, args.shards)
    print(f"[single]  {single}")
    print(f"[multi ]  {multi}")
    assert multi["steps"] == single["steps"], "step counts diverge"
    for k in ("max_abs", "sum", "volume"):
        rel = abs(multi[k] - single[k]) / max(abs(single[k]), 1e-12)
        assert rel < 1e-5, f"{k} diverges: {multi[k]} vs {single[k]}"
    print(f"OK: {args.spawn}-process solve matches single-process "
          f"({args.shards} shards, n={args.n})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--t-end", type=float, default=0.2)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--spawn", type=int, default=0,
                    help="CPU rehearsal: spawn K processes and verify "
                         "against single-process")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.child:
        run_child(args)
    elif args.spawn:
        run_spawn(args)
    else:
        # pod entry point: auto-configured jax.distributed
        from levelsetpy_tpu.parallel import init_distributed

        init_distributed()
        print(solve_stats(args.n, args.t_end, args.shards))


if __name__ == "__main__":
    main()
