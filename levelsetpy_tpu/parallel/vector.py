"""Sharded vector-level-set solver: joint multi-field integration on a mesh.

Same numerical core as :func:`levelsetpy_tpu.solve_vector`
(``vector._solve_vector_core``) inside one ``shard_map``-ped jit program —
the multi-field analog of :func:`parallel.solve_sharded`.  Every field is
sharded with the same grid partition; the shared CFL bound and the
convergence/NaN reductions ride the ``shard_ops`` pmax/pmin seam so all
shards agree; the coupling hook runs on local blocks (elementwise coupling
like reach-avoid masking needs no communication).
"""
from __future__ import annotations

import functools
from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..grid import Grid
from ..terms import SchemeConfig
from ..vector import VectorSolveResult, _norm_fields, _solve_vector_core
from .solver import local_coords, local_grid, shard_ops

__all__ = ["solve_vector_sharded"]


def solve_vector_sharded(
    grid: Grid,
    systems,
    v0s: Sequence[jnp.ndarray],
    tau,
    shard_axes: Mapping[int, str],
    mesh: Mesh,
    cfg: SchemeConfig = SchemeConfig(),
    comp_methods="minVOverTime",
    coupling: Callable | None = None,
    obstacles=None,
    targets=None,
    converge_threshold: float | None = None,
    save_all: bool = True,
    nan_guard: bool = True,
) -> VectorSolveResult:
    """Sharded :func:`levelsetpy_tpu.solve_vector`; see that docstring for
    the per-field/coupling semantics and ``parallel.solve_sharded`` for the
    sharding rules (axis divisibility, halo width)."""
    from ..derivatives import GHOST_WIDTH
    from ..terms import resolve_pallas

    cfg = resolve_pallas(cfg)   # use_pallas=None -> auto (TPU backend on)
    shard_axes = {int(k): v for k, v in shard_axes.items()}
    width = GHOST_WIDTH[cfg.accuracy]
    mesh_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for ax, name in shard_axes.items():
        msize = mesh_sizes[name]
        if grid.shape[ax] % msize:
            raise ValueError(
                f"grid axis {ax} ({grid.shape[ax]} nodes) must divide mesh "
                f"axis {name!r} ({msize} shards)")
        if grid.shape[ax] // msize < width:
            raise ValueError(
                f"grid axis {ax}: local block below the {width}-cell halo")

    systems, v0s, comp_methods, obstacles, targets = _norm_fields(
        grid, systems, v0s, comp_methods, obstacles, targets)
    tau = jnp.asarray(tau, dtype=v0s[0].dtype)
    use_precomputed = tuple(
        s.alpha_time_invariant for s in systems)

    run = _sharded_vector_run(
        grid, cfg, comp_methods, len(v0s),
        tuple(sorted(shard_axes.items())), mesh,
        tuple(o is not None for o in obstacles),
        tuple(t_ is not None for t_ in targets),
        coupling, converge_threshold, save_all, use_precomputed, nan_guard)
    values, changes, steps, nan_index = run(systems, v0s, tau, obstacles,
                                            targets)
    return VectorSolveResult(values=values, tau=tau, changes=changes,
                             steps=steps, nan_index=nan_index)


@functools.lru_cache(maxsize=32)
def _sharded_vector_run(grid, cfg, comp_methods, n_f, shard_items, mesh,
                        has_obs, has_tgt, coupling, converge_threshold,
                        save_all, use_precomputed, nan_guard):
    shard_axes = dict(shard_items)
    nd = grid.ndim
    mesh_axes = tuple(mesh.axis_names)
    lgrid = local_grid(grid, shard_axes, mesh)
    grid_spec = P(*(shard_axes.get(i) for i in range(nd)))
    grid_spec_t = P(None, *(shard_axes.get(i) for i in range(nd)))

    def opt_specs(flags):
        return tuple(grid_spec if f else P() for f in flags)

    def body(systems, v0s_local, tau, obstacles, targets):
        ops = shard_ops(grid, shard_axes, mesh_axes)
        xs = local_coords(grid, shard_axes, v0s_local[0].dtype)
        origin = tuple(
            jax.lax.axis_index(shard_axes[i]) * lgrid.shape[i]
            if i in shard_axes else jnp.zeros((), jnp.int32)
            for i in range(nd))
        return _solve_vector_core(
            grid=grid, cfg=cfg, comp_methods=comp_methods, systems=systems,
            v0s=v0s_local, tau=tau, xs=xs, ops=ops,
            targets=targets, obstacles=obstacles, coupling=coupling,
            converge_threshold=converge_threshold, save_all=save_all,
            use_precomputed=use_precomputed, nan_guard=nan_guard,
            pallas_grid=lgrid, pallas_origin=origin)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), (grid_spec,) * n_f, P(),
                  opt_specs(has_obs), opt_specs(has_tgt)),
        out_specs=((grid_spec_t,) * n_f, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
