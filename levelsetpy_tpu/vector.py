"""Vector level sets through the production front door.

The reference integrates *lists* of value functions jointly under ONE shared
CFL timestep inside the production integrator (``ExplicitIntegration/
Integration/ode_cfl_3.py:104-136``: the state is a cell array, every substep
maps over its entries, the step bound is the min over entries).  The
low-level :func:`levelsetpy_tpu.integrate` already accepts pytree states;
this module lifts the same semantics to the full-featured orchestration
layer: ``solve_vector`` / ``parallel.solve_vector_sharded`` drive a TUPLE of
fields through the tau-checkpoint scan + CFL while-loop with

  * one shared dt = min over fields of each field's CFL bound,
  * a per-field system and comp method (reach field masked over time, avoid
    field kept free, ...),
  * an optional ``coupling(t, fields, fields_prev) -> fields`` hook applied
    after every RK step — the vector-valued ``postTimestep`` slot
    (``ode_cfl_3.py:244-253``) where reach-avoid masking
    ``V_reach = max(V_reach, -V_avoid)`` lives,
  * per-field static obstacles/targets.

Where fields do not interact (no coupling) and share a system, results are
EXACTLY the per-field ``solve`` outputs (the shared dt is the same bound);
tests assert this and exercise a coupled reach-avoid case on the sharded
path.  Scope note: convergence/NaN guards reduce over all fields; the
single-field-only extras (stopInit/stopSet, discounting, TTR) stay on
``solve``.  Kernel note: with ``use_pallas`` each field's RHS routes
through the fused Pallas RHS kernel, but NOT the persistent-layout
substep kernel — the coupling hook consumes grid-shaped fields after
every RK step, and the per-step lift/lower relayouts that would require
cost about what the substep fusion saves.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .grid import Grid
from .solver import _COMP_METHODS
from .systems.base import System
from .terms import (GridOps, SchemeConfig, hj_rhs, local_ops,
                    precompute_alpha, pallas_eligible, widen_alphas_any)

__all__ = ["solve_vector", "VectorSolveResult"]


class VectorSolveResult(NamedTuple):
    values: tuple            # per field: (T, *grid.shape)
    tau: jnp.ndarray         # (T,)
    changes: jnp.ndarray     # (T-1, n_fields) max|dV| per interval/field
    steps: jnp.ndarray       # total RK steps taken (shared loop)
    nan_index: jnp.ndarray   # first bad interval (-1 if finite throughout)


def _solve_vector_core(
    *,
    grid: Grid,
    cfg: SchemeConfig,
    comp_methods: tuple,
    systems: tuple,
    v0s: tuple,
    tau: jnp.ndarray,
    xs,
    ops: GridOps,
    targets: tuple,              # per field: array or None
    obstacles: tuple,            # per field: array or None
    coupling: Callable | None,
    converge_threshold,
    save_all: bool,
    use_precomputed: tuple,      # per field bool
    nan_guard: bool,
    pallas_grid: Grid | None = None,
    pallas_origin=None,
):
    """The joint integration loop, written once for every execution mode
    (single device / shard_map — the ``ops`` seam, see ``solver._solve_core``
    whose structure this mirrors for a tuple-shaped state)."""
    n_f = len(v0s)
    n_tau = tau.shape[0]
    dtype = v0s[0].dtype
    small_scale = 100.0 * jnp.finfo(dtype).eps
    pgrid = pallas_grid if pallas_grid is not None else grid

    alpha_bounds = []
    for k in range(n_f):
        ab = (precompute_alpha(grid, systems[k], xs, tau[0],
                               reduce_max=ops.reduce_max)
              if use_precomputed[k] else None)
        if ab is not None and pallas_eligible(pgrid, cfg, v0s[k],
                                              systems[k]):
            ab = dataclasses.replace(
                ab, widened=widen_alphas_any(pgrid, ab.alphas, dtype))
        alpha_bounds.append(ab)

    def rhs(t, vs):
        """Joint RHS: per-field spatial operator, ONE shared step bound
        (min over fields — ref ``ode_cfl_3.py:120-136``)."""
        dots, bound = [], None
        for k in range(n_f):
            dk, bk = hj_rhs(grid, cfg, systems[k], t, vs[k], xs,
                            alpha_bounds[k], ops, pallas_grid=pallas_grid,
                            pallas_origin=pallas_origin)
            dots.append(dk)
            bound = bk if bound is None else jnp.minimum(bound, bk)
        return tuple(dots), bound

    def apply_comp(k, v, v_last):
        cm = comp_methods[k]
        if cm == "minVOverTime":
            return jnp.minimum(v, v_last)
        if cm == "maxVOverTime":
            return jnp.maximum(v, v_last)
        if cm == "minVWithV0":
            return jnp.minimum(v, v0s[k])
        if cm == "maxVWithV0":
            return jnp.maximum(v, v0s[k])
        if cm == "minVWithL":
            return jnp.minimum(v, targets[k])
        if cm == "maxVWithL":
            return jnp.maximum(v, targets[k])
        return v                       # 'none'/'set'/'zero'

    def post_step(t, vs, vs_prev):
        vs = tuple(apply_comp(k, vs[k], vs_prev[k]) for k in range(n_f))
        vs = tuple(
            vs[k] if obstacles[k] is None
            else jnp.maximum(vs[k], -obstacles[k]) for k in range(n_f))
        if coupling is not None:
            vs = tuple(coupling(t, vs, vs_prev))
        return vs

    from .integration import cfl_step

    def interval(carry, i):
        vs_in, done, steps = carry
        t0, t1 = tau[i], tau[i + 1]
        small = small_scale * jnp.abs(t1)

        def do(vs):
            def cond(c):
                t, _, _ = c
                return t < t1 - small

            def body(c):
                t, vs, n = c
                t_new, vs_new = cfl_step(rhs, t, vs, t1, cfg.factor_cfl,
                                         cfg.rk_order, cfg.max_step)
                vs_new = post_step(t_new, vs_new, vs)
                return t_new, vs_new, n + 1

            _, vs, n = jax.lax.while_loop(
                cond, body, (t0, vs, jnp.zeros((), jnp.int32)))
            return vs, n

        vs_new, n_steps = jax.lax.cond(
            done, lambda vs: (vs, jnp.zeros((), jnp.int32)), do, vs_in)
        change = jnp.stack([
            ops.reduce_max(jnp.abs(vs_new[k] - vs_in[k]))
            for k in range(n_f)])

        new_done = done
        bad = jnp.zeros((), jnp.bool_)
        if nan_guard:
            bad = ~jnp.isfinite(jnp.max(change)) & ~done
            vs_new = tuple(
                jnp.where(bad, vs_in[k], vs_new[k]) for k in range(n_f))
            new_done = new_done | bad
        if converge_threshold is not None:
            new_done = new_done | (jnp.max(change) < converge_threshold)

        out = vs_new if save_all else None
        return (vs_new, new_done, steps + n_steps), (out, change, bad)

    (vs_fin, _, steps), (vs_stack, changes, was_bad) = jax.lax.scan(
        interval, (v0s, jnp.zeros((), jnp.bool_), jnp.zeros((), jnp.int32)),
        jnp.arange(n_tau - 1))
    nan_index = jnp.where(jnp.any(was_bad), jnp.argmax(was_bad),
                          jnp.int32(-1)).astype(jnp.int32)
    if save_all:
        values = tuple(
            jnp.concatenate([v0s[k][None], vs_stack[k]], axis=0)
            for k in range(n_f))
    else:
        values = tuple(v[None] for v in vs_fin)
    return values, changes, steps, nan_index


def _norm_fields(grid, systems, v0s, comp_methods, obstacles, targets):
    """Validate + normalize the per-field inputs to tuples."""
    v0s = tuple(jnp.asarray(v) for v in v0s)
    n_f = len(v0s)
    if isinstance(systems, System):
        systems = (systems,) * n_f
    systems = tuple(systems)
    if isinstance(comp_methods, str):
        comp_methods = (comp_methods,) * n_f
    comp_methods = tuple(comp_methods)
    if len(systems) != n_f or len(comp_methods) != n_f:
        raise ValueError("systems/comp_methods must match the field count")
    for cm in comp_methods:
        if cm not in _COMP_METHODS:
            raise ValueError(f"unknown comp_method {cm!r}")
    for v in v0s:
        if v.shape != grid.shape:
            raise ValueError(f"field shape {v.shape} != grid {grid.shape}")
    for s in systems:
        if s.n_states != grid.ndim:
            raise ValueError("system/grid dimensionality mismatch")

    def norm(x, name):
        if x is None:
            return (None,) * n_f
        x = tuple(x)
        if len(x) != n_f:
            raise ValueError(f"{name} must have one entry per field")
        out = []
        for a in x:
            if a is not None:
                a = jnp.asarray(a, v0s[0].dtype)
                if a.shape != grid.shape:
                    raise ValueError(
                        f"{name} entries must be grid-shaped (static); "
                        "time-varying stacks are single-field solve only")
            out.append(a)
        return tuple(out)

    obstacles = norm(obstacles, "obstacles")
    targets = norm(targets, "targets")
    for cm, tg in zip(comp_methods, targets):
        if cm in ("minVWithL", "maxVWithL") and tg is None:
            raise ValueError(f"{cm} requires a target for that field")
    v0s = tuple(
        v if ob is None else jnp.maximum(v, -ob)
        for v, ob in zip(v0s, obstacles))
    return systems, v0s, comp_methods, obstacles, targets


@functools.lru_cache(maxsize=32)
def _cached_vector_run(grid, cfg, comp_methods, n_f, has_obs, has_tgt,
                       coupling, converge_threshold, save_all,
                       use_precomputed, nan_guard):
    @jax.jit
    def run(systems, v0s, tau, xs, obstacles, targets):
        return _solve_vector_core(
            grid=grid, cfg=cfg, comp_methods=comp_methods, systems=systems,
            v0s=v0s, tau=tau, xs=xs, ops=local_ops(grid),
            targets=targets, obstacles=obstacles, coupling=coupling,
            converge_threshold=converge_threshold, save_all=save_all,
            use_precomputed=use_precomputed, nan_guard=nan_guard)

    return run


def solve_vector(
    grid: Grid,
    systems,
    v0s: Sequence[jnp.ndarray],
    tau,
    cfg: SchemeConfig = SchemeConfig(),
    comp_methods="minVOverTime",
    coupling: Callable | None = None,
    obstacles=None,
    targets=None,
    converge_threshold: float | None = None,
    save_all: bool = True,
    nan_guard: bool = True,
) -> VectorSolveResult:
    """Jointly integrate a tuple of value functions under one shared CFL dt
    (the reference's list-valued ``odeCFLn`` state, ``ode_cfl_3.py:104-136``,
    at the orchestration layer).

    ``systems``/``comp_methods``/``obstacles``/``targets`` are per-field
    (scalars broadcast).  ``coupling(t, fields, fields_prev) -> fields`` runs
    after comp/obstacle masking every RK step — e.g. reach-avoid:
    ``lambda t, f, fp: (jnp.maximum(f[0], -f[1]), f[1])``.  The coupling
    callable is part of the compilation cache key — reuse one function
    object across calls (a fresh lambda per call retraces).
    """
    systems, v0s, comp_methods, obstacles, targets = _norm_fields(
        grid, systems, v0s, comp_methods, obstacles, targets)
    tau = jnp.asarray(tau, dtype=v0s[0].dtype)
    xs = grid.mesh_broadcastable(v0s[0].dtype)
    use_precomputed = tuple(
        s.alpha_time_invariant for s in systems)

    from .terms import _batched, resolve_pallas

    cfg = resolve_pallas(cfg)   # use_pallas=None -> auto (TPU backend on)
    if cfg.use_pallas and _batched(systems, v0s, tau):
        cfg = dataclasses.replace(cfg, use_pallas=False)

    run = _cached_vector_run(
        grid, cfg, comp_methods, len(v0s),
        tuple(o is not None for o in obstacles),
        tuple(t_ is not None for t_ in targets),
        coupling, converge_threshold, save_all, use_precomputed, nan_guard)
    values, changes, steps, nan_index = run(systems, v0s, tau, xs,
                                            obstacles, targets)
    return VectorSolveResult(values=values, tau=tau, changes=changes,
                             steps=steps, nan_index=nan_index)
