"""Multi-chip sharded HJ solver: grid decomposition over a TPU device mesh.

The TPU-native answer to what the reference only sketches host-side
(``Grids/split_grid.py``'s overlapping sub-grids with ``padding`` halos, never
run in parallel): the value function is sharded over a ``jax.sharding.Mesh``,
each chip owns a contiguous block, WENO5's width-3 stencil halos travel over
ICI via ``lax.ppermute`` (``parallel/halo.py``), and the three grid-global
scalars in the step — the WENO epsilon, the Lax-Friedrichs alpha bound, and
the CFL dt — are ``lax.pmax``-allreduced so every shard agrees on the
timestep.  The entire time loop (scan over tau + while-loop of RK steps,
``solver._solve_core`` — the SAME numerical core as the single-chip path)
runs inside ONE ``shard_map``-ped jit program: per RK substep the only
communication is ``2 * ndim_sharded`` nearest-neighbour halo hops plus the
allreduces, all riding ICI.

For systems with time-invariant alpha (all shipped analytic systems) the
allreduces for alpha/dt hoist out of the loop entirely — steady state is halo
exchange + one epsilon pmax (or zero, with ``epsilon_method='constant'``) per
substep.
"""
from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..boundary import pad_axis
from ..grid import Grid
from ..solver import SolveResult, _solve_core
from ..systems.base import System
from ..terms import GridOps, SchemeConfig
from .halo import pad_axis_sharded

__all__ = ["make_mesh", "solve_sharded", "shard_ops", "local_coords"]


def make_mesh(axis_sizes: Mapping[str, int], devices=None) -> Mesh:
    """Build a named device mesh, e.g. ``make_mesh({"x": 2, "y": 4})``."""
    names = tuple(axis_sizes)
    shape = tuple(int(axis_sizes[n]) for n in names)
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, names)


def shard_ops(grid: Grid, shard_axes: Mapping[int, str],
              mesh_axes: tuple[str, ...]) -> GridOps:
    """GridOps for use INSIDE shard_map: halo-exchange padding on sharded
    axes, boundary conditions elsewhere; reductions compose a local reduce
    with a cross-shard ``pmax``/``pmin`` over every mesh axis."""

    def pad(v, axis, width):
        if axis in shard_axes:
            return pad_axis_sharded(v, axis, width, shard_axes[axis],
                                    periodic=grid.periodic[axis])
        return pad_axis(grid, v, axis, width)

    def reduce_max(x):
        return jax.lax.pmax(jnp.max(x), mesh_axes)

    def reduce_min(x):
        return jax.lax.pmin(jnp.min(x), mesh_axes)

    return GridOps(pad=pad, reduce_max=reduce_max, reduce_min=reduce_min)


def local_coords(grid: Grid, shard_axes: Mapping[int, str], dtype):
    """Broadcastable coordinate arrays for THIS shard's block (call inside
    shard_map).  Sharded axes offset their coordinates by
    ``axis_index * local_n`` — no gather, just index arithmetic, so the
    coordinate 'arrays' still fold into the fused stencil kernels."""
    out = []
    for i in range(grid.ndim):
        shp = [1] * grid.ndim
        if i in shard_axes:
            name = shard_axes[i]
            per = grid.shape[i] // jax.lax.axis_size(name)
            start = jax.lax.axis_index(name) * per
            idx = start + jnp.arange(per)
            coord = grid.lo[i] + idx.astype(dtype) * jnp.asarray(
                grid.dx[i], dtype)
            shp[i] = per
        else:
            coord = grid.coord(i, dtype)
            shp[i] = grid.shape[i]
        out.append(coord.reshape(shp))
    return tuple(out)


def solve_sharded(
    grid: Grid,
    system: System,
    v0: jnp.ndarray,
    tau,
    shard_axes: Mapping[int, str],
    mesh: Mesh,
    cfg: SchemeConfig = SchemeConfig(),
    comp_method: str = "minVOverTime",
    obstacles: jnp.ndarray | None = None,
    targets: jnp.ndarray | None = None,
    converge_threshold: float | None = None,
    save_all: bool = True,
) -> SolveResult:
    """Sharded equivalent of :func:`levelsetpy_tpu.solve`.

    ``shard_axes`` maps grid axes to mesh axis names, e.g. ``{0: "x",
    1: "y"}`` on ``make_mesh({"x": 2, "y": 4})``.  Every sharded grid axis
    must divide evenly by its mesh axis size (pad the grid otherwise).
    ``stop_init`` is intentionally absent — point queries against a sharded
    array belong to the (host-side) post-processing path.
    """
    from ..derivatives import GHOST_WIDTH

    shard_axes = {int(k): v for k, v in shard_axes.items()}
    width = GHOST_WIDTH[cfg.accuracy]
    for ax, name in shard_axes.items():
        msize = dict(zip(mesh.axis_names, mesh.devices.shape))[name]
        if grid.shape[ax] % msize:
            raise ValueError(
                f"grid axis {ax} ({grid.shape[ax]} nodes) must divide mesh "
                f"axis {name!r} ({msize} shards)")
        local = grid.shape[ax] // msize
        if local < width:
            raise ValueError(
                f"grid axis {ax}: {local} local nodes per shard is below "
                f"the {width}-cell stencil halo of {cfg.accuracy!r}; use "
                f"fewer shards or a finer grid")
    nd = grid.ndim
    obstacles_tv = obstacles is not None and obstacles.ndim == nd + 1
    targets_tv = targets is not None and targets.ndim == nd + 1
    if obstacles is not None:
        obstacles = obstacles.astype(v0.dtype)
        obs0 = obstacles[0] if obstacles_tv else obstacles
        v0 = jnp.maximum(v0, -obs0)
    if targets is not None:
        targets = targets.astype(v0.dtype)
    tau = jnp.asarray(tau, dtype=v0.dtype)
    use_precomputed = (
        system.alpha_time_invariant and cfg.dissipation == "global"
    )
    mesh_axes = tuple(mesh.axis_names)

    grid_spec = P(*(shard_axes.get(i) for i in range(nd)))
    grid_spec_t = P(None, *(shard_axes.get(i) for i in range(nd)))

    def body(system, v0_local, tau, *rest):
        rest = list(rest)
        obs_local = rest.pop(0) if obstacles is not None else None
        tgt_local = rest.pop(0) if targets is not None else None
        ops = shard_ops(grid, shard_axes, mesh_axes)
        xs = local_coords(grid, shard_axes, v0_local.dtype)
        values, changes, stop_index, steps, _ = _solve_core(
            grid=grid, cfg=cfg, comp_method=comp_method, system=system,
            v0=v0_local, tau=tau, xs=xs, ops=ops,
            obstacles=obs_local, obstacles_tv=obstacles_tv,
            targets=tgt_local, targets_tv=targets_tv,
            gamma=jnp.asarray(1.0, v0_local.dtype), discount_mode="Jaime",
            has_discount=False,
            stop_state=None, stop_set=None, stop_set_mode=None,
            stop_level=None, noise_sigma=None,
            converge_threshold=converge_threshold,
            trim=lambda v: v, save_all=save_all,
            use_precomputed=use_precomputed,
        )
        return values, changes, stop_index, steps

    extra_args, extra_specs = [], []
    if obstacles is not None:
        extra_args.append(obstacles)
        extra_specs.append(grid_spec_t if obstacles_tv else grid_spec)
    if targets is not None:
        extra_args.append(targets)
        extra_specs.append(grid_spec_t if targets_tv else grid_spec)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), grid_spec, P(), *extra_specs),
        out_specs=(grid_spec_t, P(), P(), P()),
        check_vma=False,
    )

    run = jax.jit(mapped)
    values, changes, stop_index, steps = run(system, v0, tau, *extra_args)
    return SolveResult(values=values, tau=tau, changes=changes,
                       stop_index=stop_index, steps=steps)
