"""HJI PDE solver driver: one fused, jit-compiled reachability solve.

TPU-first redesign of the reference's ``HJIPDE_solve``
(``ValueFuncs/hji_solver.py:24``).  The reference drives a host Python loop —
one ``odeCFL3`` call per RK step (``singleStep='on'``, ``hji_solver.py:
445-446,536-542``), flatten/reshape per substep, host syncs for the CFL dt —
here the ENTIRE solve (outer tau checkpoints, inner CFL sub-loop, comp-method
masking, obstacle masking, discounting, convergence/early-stop logic) is one
XLA program: ``lax.scan`` over tau intervals around a ``lax.while_loop`` of
TVD-RK steps.  Nothing touches the host until the result is fetched.

Semantics matched to the reference (for value parity):
  * the comp method is applied after EVERY RK step, not per tau checkpoint
    (``hji_solver.py:536-599``), with ``yLast`` the pre-step value.
  * obstacle masking ``V = max(V, -obstacle)`` per step (``:640-644``), and
    once up front on the initial data (``:209-228``).
  * discounting: 'Jaime' (ICRA 2019) ``V = g*V + (1-g)*L`` after the comp
    method (``:601-609``); 'Kene' (min discounted rewards) shift-scale-min
    inside the comp (``:613-638``).
  * ``stopInit`` early exit once the set contains a query state (``:676-684``)
    and ``stopConverge`` on max|dV| (``:661-672,705-728``); under jit these
    freeze the state through remaining intervals (output stack repeats the
    final slice; ``stop_index`` reports where it stopped).
  * factorCFL default 0.8 (``:445``).

The numerical core (``_solve_core``) is execution-agnostic: the sharded
multi-chip solver (``parallel/solver.py``) runs the SAME function inside
``shard_map`` with halo-exchange padding and cross-shard reductions plugged
in via :class:`~levelsetpy_tpu.terms.GridOps`.

Everything is vmap-compatible: batching over system parameters (disturbance
sweeps) or initial conditions is ``jax.vmap(solve_fn)`` — the BASELINE
"1024 batched BRT solves" config.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .grid import Grid
from .integration import cfl_step
from .systems.base import System
from .terms import (GridOps, SchemeConfig, hj_rhs, local_ops,
                    pallas_eligible, precompute_alpha)
from .values import eval_u

__all__ = ["solve", "solve_batch", "SolveResult", "SchemeConfig"]

_COMP_METHODS = (
    "none", "set", "zero",
    "minVOverTime", "maxVOverTime",
    "minVWithV0", "maxVWithV0",
    "minVWithL", "maxVWithL",
)


class SolveResult(NamedTuple):
    values: jnp.ndarray        # (T, *grid.shape) incl. the initial slice
    tau: jnp.ndarray           # (T,)
    changes: jnp.ndarray       # (T-1,) max|dV| per interval (convergence)
    stop_index: jnp.ndarray    # first interval index where an early stop hit
                               # (T-1 if none)
    steps: jnp.ndarray         # total RK steps taken
    #: first time each node entered the set (linear zero-crossing interp,
    #: ref Helper/post_ttr.py); inf where never reached; None unless
    #: record_ttr was requested
    ttr: jnp.ndarray | None = None
    #: first interval index whose update produced a non-finite value (the
    #: NaN guard froze the state there; ref raised per step,
    #: hji_solver.py:544); -1 when the solve stayed finite
    nan_index: jnp.ndarray | None = None


def _solve_core(
    *,
    grid: Grid,
    cfg: SchemeConfig,
    comp_method: str,
    system: System,
    v0: jnp.ndarray,
    tau: jnp.ndarray,
    xs,
    ops: GridOps,
    obstacles,
    obstacles_tv: bool,
    targets,
    targets_tv: bool,
    gamma,
    discount_mode: str,
    has_discount: bool,
    stop_state,                 # None or state vector for stopInit
    stop_set,                   # None or grid-shaped implicit set
    stop_set_mode,              # "include" | "intersect"
    stop_level,                 # scalar level for stopSet membership
    noise_sigma,                # None, a (nd,) stddev VECTOR (diagonal —
                                # the 1-D rank is the static gate for the
                                # fused in-kernel form) or an (nd, m)
                                # diffusion matrix
    converge_threshold,
    trim: Callable,
    save_all: bool,
    use_precomputed: bool,
    record_ttr: bool = False,
    progress: bool = False,
    allow_fused: bool = False,  # fused RK-step kernel (single-device, or
                                # per shard when fused_shard is set)
    fused_shard=None,           # (x mesh-axis name, all mesh axis names)
                                # -> run the fused RK-step kernel PER SHARD
                                # of an x-only-sharded grid: ghost rows
                                # refresh via ppermute, eps pmax-reduces
    pallas_grid: Grid | None = None,   # LOCAL block grid inside shard_map
    pallas_origin=None,                # traced per-axis global block starts
    eval_fn: Callable | None = None,   # point query V(state) for stopInit
    nan_guard: bool = True,
    n_batch: int | None = None,        # batch-LAST mode: v0 is (*grid, B)
    on_checkpoint: Callable | None = None,  # host snapshot hook, called
                                            # once per tau checkpoint with
                                            # (t, values)
):
    """The solver loop, written once for every execution mode.

    ``v0``/``obstacles``/``targets`` may be local shards; ``xs`` must be the
    matching (broadcastable) coordinate arrays and ``ops`` the matching
    pad/reduce operations.  All early-stop predicates reduce through ``ops``
    so they agree across shards.  ``pallas_grid``/``pallas_origin`` route
    the fused Pallas kernel onto local shard blocks (see ``terms.hj_rhs``);
    ``eval_fn(v, state)`` overrides the stopInit point query (the sharded
    solver evaluates it on the all-gathered global array).

    ``n_batch`` switches on batch-LAST mode (see ``terms.batched_ops``):
    ``v0`` carries a trailing scenario axis, ``ops`` reductions return
    per-scenario ``(B,)`` scalars, every element integrates under its OWN
    CFL dt (finished elements take zero-length steps), and the early-stop /
    convergence / NaN-freeze machinery masks per element.  The loop
    structure is unchanged — scalars just become ``(B,)`` vectors.
    """
    n_tau = tau.shape[0]
    small_scale = 100.0 * jnp.finfo(v0.dtype).eps
    pgrid = pallas_grid if pallas_grid is not None else grid
    if eval_fn is None:
        def eval_fn(v, state):
            return eval_u(grid, v, state)

    # Alpha handling: STATIC precompute for time-invariant alphas, or a
    # PER-INTERVAL lagged refresh for systems whose alpha varies with time
    # but ignores the costate box (``System.alpha_costate_free``, VERDICT
    # r3 #4): dissipation bounds + the CFL dt are recomputed once at each
    # tau interval's START time — exactly the ``initial_epsilon`` pattern —
    # so time-varying systems reach the fused kernels.  Lag semantics: the
    # step bound (and the XLA path's dissipation alphas) are frozen at the
    # interval start; the kernels evaluate alphas at the CURRENT substep
    # time in any case.  Keep tau intervals short relative to the alpha's
    # time variation (the reference recomputes per substep,
    # artificial_diss_glf.py:80-91).
    lagged_alpha = ((not use_precomputed)
                    and getattr(system, "alpha_costate_free", False))
    alpha_bounds = (
        precompute_alpha(grid, system, xs, tau[0], reduce_max=ops.reduce_max)
        if use_precomputed else None
    )
    have_alpha = use_precomputed or lagged_alpha
    # Generic systems (no analytic alpha at all — the reference's
    # production default, generic_partial.py:42-51) reach the 3-D/4-D
    # fused substep kernels when the dissipation is node-local: the kernel
    # evaluates the costate-box alpha IN-KERNEL from the derivL/derivR it
    # already holds in registers, and only the CFL bound (+ the off-axis
    # global box for 'local') refreshes per tau interval via
    # terms.costate_alpha_bounds (VERDICT r4 #1).
    costate_kernel = (
        (not have_alpha) and grid.ndim in (3, 4)
        and cfg.dissipation in ("local", "locallocal")
    )
    # DIAGONAL Gaussian noise (1-D stddev — a static shape property of the
    # traced sigma) fuses into the 3-D substep kernel as three centered
    # second differences (VERDICT r4 #8); full (nd, m) diffusion matrices
    # keep the XLA path — their mixed-Hessian stencils read CORNER ghost
    # values, whose fill order differs between the kernel's in-kernel
    # y/z fill + post-hoc x refresh and XLA's sequential padding.
    noise_fusable = (
        noise_sigma is not None
        and getattr(noise_sigma, "ndim", 2) == 1 and grid.ndim == 3
    )
    # Fused full-RK-substep kernel (kernels/hjstep.py): value function stays
    # in the aligned ghost-padded layout across the entire interval, with
    # the solver's ENTIRE per-step epilogue — comp method (incl. withV0/
    # withL), Jaime/Kene discounting, obstacle masking — fused into the
    # final substep (VERDICT r3 #1).  Fixed operand arrays (v0, the
    # interval's target, the negated obstacle) ride as extra DMA streams.
    fused_ok = (
        allow_fused and (have_alpha or costate_kernel)
        and grid.ndim in (3, 4)
        and (noise_sigma is None or noise_fusable)
    )
    if grid.ndim == 4:
        from .kernels.hjstep4d import fused4d_eligible

        # eligibility on the LOCAL block grid (== grid single-device)
        step_eligible = fused4d_eligible(pgrid, cfg, v0, system)
    else:
        step_eligible = pallas_eligible(pgrid, cfg, v0, system)
    use_fused_step = fused_ok and n_batch is None and step_eligible

    # static epilogue spec + the tags of its operand arrays (assembled per
    # interval inside ``do``; deduped — e.g. minVWithL + Jaime share the
    # target operand)
    from .kernels.hjstep import Epilogue

    comp_flag = {"minVOverTime": "min", "maxVOverTime": "max"}.get(
        comp_method)
    fused_epi = None
    slots: list = []

    def _slot(tag):
        if tag not in slots:
            slots.append(tag)
        return slots.index(tag)

    kw = {}
    if has_discount and discount_mode == "Kene":
        # Kene replaces the comp entirely (solver apply_comp early
        # return; ref hji_solver.py:613-638) — comp_method is
        # validated to min/maxVWithL upstream
        kw.update(comp="max" if comp_method == "maxVWithL" else "min",
                  comp_src="ex", comp_ex=_slot("tgt"), kene=True)
    else:
        if comp_method in ("minVOverTime", "maxVOverTime"):
            kw.update(comp=comp_flag, comp_src="va")
        elif comp_method in ("minVWithV0", "maxVWithV0"):
            kw.update(comp="min" if comp_method == "minVWithV0"
                      else "max", comp_src="ex", comp_ex=_slot("v0"))
        elif comp_method in ("minVWithL", "maxVWithL"):
            kw.update(comp="min" if comp_method == "minVWithL"
                      else "max", comp_src="ex", comp_ex=_slot("tgt"))
        if has_discount:     # Jaime blend (ref :601-609)
            kw.update(jaime_ex=_slot(
                "tgt" if targets is not None else "v0"))
    if obstacles is not None:
        kw.update(obs_ex=_slot("nobs"))
    if kw:
        fused_epi = Epilogue(**kw)
    epi_slots = tuple(slots)

    # batch-LAST persistent-layout substep kernel (kernels/wenobatch.py):
    # the same fused epilogue, with gamma / Kene-shift riding the packed
    # per-scenario rows and operands DMA'd as (x+6, y+6, zs, B) streams
    from .terms import batch_pallas_eligible

    use_fused_batch = (
        fused_ok and have_alpha and noise_sigma is None
        and n_batch is not None and grid.ndim == 3
        and batch_pallas_eligible(grid, cfg, n_batch, system, v0,
                                  n_extras=len(epi_slots)))

    needs_widened = (n_batch is None
                     and pallas_eligible(pgrid, cfg, v0, system)
                     and not use_fused_step)
    if alpha_bounds is not None and needs_widened:
        # widen once per solve, not once per RK substep (ndim full-grid pads)
        from .terms import widen_alphas_any

        alpha_bounds = dataclasses.replace(
            alpha_bounds,
            widened=widen_alphas_any(pgrid, alpha_bounds.alphas, v0.dtype))

    noise_c = None
    if noise_fusable:
        # premultiplied in-kernel coefficients: delta = sum_i c_i *
        # (v[i+1] - 2 v[i] + v[i-1]) with c_i = sigma_i^2 / (2 dx_i^2)
        # (the Ito-correct 1/2 — see make_trace_hessian_term), and the
        # parabolic CFL contribution combined into the step bound exactly
        # as sum_terms would
        sg2 = (noise_sigma * noise_sigma).astype(v0.dtype)
        dx2 = jnp.asarray([d * d for d in grid.dx], v0.dtype)
        noise_c = 0.5 * sg2 / dx2
        noise_sb_inv = jnp.sum(sg2 / dx2)

    noise_term = None
    if noise_sigma is not None:
        # Gaussian process noise adds an Ito trace-Hessian diffusion term to
        # the deterministic LF scheme (ref hji_solver.py:450-471: schemeFunc
        # = termSum{termLaxFriedrichs, termTraceHessian}).  Deliberate
        # deviation: the term carries the Ito-correct 1/2 factor the
        # reference omits — see make_trace_hessian_term.
        from .extra_terms import make_trace_hessian_term

        noise_term = make_trace_hessian_term(grid, noise_sigma, ops)

    def make_rhs(ab):
        def rhs(t, v):
            return hj_rhs(grid, cfg, system, t, v, xs, ab, ops,
                          pallas_grid=pallas_grid,
                          pallas_origin=pallas_origin, n_batch=n_batch)

        if noise_term is not None:
            from .extra_terms import sum_terms

            rhs = sum_terms(rhs, noise_term)
        return rhs

    def apply_comp(v, v_last, v0c, target_i):
        if has_discount and discount_mode == "Kene":
            # shift below zero, scale, combine with target, restore
            # (ref hji_solver.py:613-636)
            max_val = ops.reduce_max(jnp.abs(target_i))
            vt = (v - max_val) * gamma
            tt = target_i - max_val
            if comp_method == "maxVWithL":
                vt = jnp.maximum(vt, tt)
            else:  # minVWithL (reference errors on anything else)
                vt = jnp.minimum(vt, tt)
            return vt + max_val
        if comp_method == "minVOverTime":
            v = jnp.minimum(v, v_last)
        elif comp_method == "maxVOverTime":
            v = jnp.maximum(v, v_last)
        elif comp_method == "minVWithV0":
            v = jnp.minimum(v, v0c)
        elif comp_method == "maxVWithV0":
            v = jnp.maximum(v, v0c)
        elif comp_method == "minVWithL":
            v = jnp.minimum(v, target_i)
        elif comp_method == "maxVWithL":
            v = jnp.maximum(v, target_i)
        # 'none'/'set'/'zero': nothing here (ref :566-570)
        if has_discount and discount_mode != "Kene":
            base = target_i if targets is not None else v0c
            v = gamma * v + (1.0 - gamma) * base
        return v

    inf = jnp.asarray(jnp.inf, v0.dtype)
    ttr0 = (jnp.where(v0 <= 0, jnp.zeros_like(v0), inf)
            if record_ttr else jnp.zeros((), v0.dtype))

    def interval(carry, i):
        v_in, done, steps, ttr_in = carry
        t0 = tau[i]
        if n_batch is not None:
            # per-element time carry: elements finish the interval at their
            # own CFL pace (dt = min(..., t1 - t_i) -> 0 once done)
            t0 = jnp.broadcast_to(t0, (n_batch,))
        t1 = tau[i + 1]
        small = small_scale * jnp.abs(t1)
        obs_i = None
        if obstacles is not None:
            obs_i = obstacles[i + 1] if obstacles_tv else obstacles
        if targets is not None:
            tgt_i = targets[i + 1] if targets_tv else targets
        else:
            tgt_i = jnp.zeros((), v0.dtype)  # unused placeholder

        gbox_i = None
        if use_precomputed:
            ab_i = alpha_bounds
        elif lagged_alpha:
            # lagged refresh at the interval's start time (see the alpha
            # handling note above)
            ab_i = precompute_alpha(grid, system, xs, tau[i],
                                    reduce_max=ops.reduce_max)
            if needs_widened:
                from .terms import widen_alphas_any

                ab_i = dataclasses.replace(
                    ab_i, widened=widen_alphas_any(pgrid, ab_i.alphas,
                                                   v0.dtype))
        elif use_fused_step and costate_kernel:
            # interval-start refresh of the CFL bound + global costate
            # box for the in-kernel generic-alpha path (VERDICT r4 #1);
            # the kernel's per-substep alphas track the CURRENT node-local
            # derivative boxes — only dt and the off-axis global extremes
            # are frozen across the interval
            from .terms import costate_alpha_bounds

            ab_i, gbox_i = costate_alpha_bounds(grid, cfg, system, tau[i],
                                                v_in, xs, ops)
        else:
            ab_i = None
        rhs_i = make_rhs(ab_i)
        if use_fused_step and noise_fusable and ab_i is not None:
            # combined hyperbolic + parabolic CFL bound for the fused dt
            # (make_rhs above closes over the UNADJUSTED ab_i — its
            # sum_terms does this combine itself on the XLA path)
            ab_i = dataclasses.replace(
                ab_i,
                step_bound=1.0 / (1.0 / ab_i.step_bound + noise_sb_inv))

        def do(v, ttr):
            def cond(c):
                t = c[0]
                return jnp.any(t < t1 - small)

            if use_fused_step or use_fused_batch:
                if use_fused_batch:
                    from .kernels import wenobatch as fmod

                    lift = fmod.lift_batch
                    lower = fmod.lower_batch
                elif grid.ndim == 4:
                    from .kernels import hjstep4d

                    lift = hjstep4d.lift4
                    lower = hjstep4d.lower4
                else:
                    from .kernels import hjstep

                    lift = hjstep.lift
                    lower = hjstep.lower

                fgrid = pgrid

                # per-interval epilogue operands, lifted once into the
                # kernel layout (constant across the interval's RK steps;
                # per-interval slices for time-varying stacks).  In batch
                # mode shared operands broadcast across the scenario lanes
                # before lifting.
                def _operand(tag):
                    a = {"v0": lambda: v0,
                         "tgt": lambda: tgt_i,
                         "nobs": lambda: -obs_i}[tag]()
                    if n_batch is not None:
                        a = jnp.broadcast_to(a, (*grid.shape, n_batch))
                    return a

                epi_extras = tuple(lift(fgrid, _operand(tag))
                                   for tag in epi_slots)
                kene_mv = (ops.reduce_max(jnp.abs(tgt_i))
                           if fused_epi is not None and fused_epi.kene
                           else 0.0)

                if use_fused_batch:
                    rk_step = lambda t, vq, eps: fmod.fused_rk_step_batch(  # noqa: E731
                        grid, cfg, system, t, vq, t1, ab_i,
                        fused_epi, n_batch, eps, extras=epi_extras,
                        gamma=gamma, kene_mv=kene_mv)
                else:
                    step_fn = (hjstep4d.fused_rk_step_4d if grid.ndim == 4
                               else hjstep.fused_rk_step)
                    step_kw = {}
                    if costate_kernel:
                        # in-kernel generic costate-box alphas (3-D + 4-D)
                        step_kw["costate_mode"] = cfg.dissipation
                        step_kw["gbox"] = gbox_i
                    if noise_fusable:
                        # diagonal trace-Hessian term in-kernel (3-D only)
                        step_kw["noise_c"] = noise_c
                        if costate_kernel:
                            # the lagged CFL carry must keep the parabolic
                            # contribution (r5 review finding #1)
                            step_kw["noise_sb_inv"] = noise_sb_inv
                    if (grid.ndim == 3 and have_alpha
                            and getattr(system, "alpha_via_operands",
                                        False)):
                        # systems with expensive alphas (flock member
                        # maxima) trade 3 DMA streams for the in-kernel
                        # re-evaluation (VERDICT r3 #2).  have_alpha gate:
                        # in costate mode the kernel derives its alphas
                        # from the node-local boxes — operand streams
                        # would conflict (fused_substep_3d rejects both)
                        step_kw["alpha_ops"] = tuple(
                            lift(fgrid, jnp.broadcast_to(
                                a, fgrid.shape).astype(v0.dtype))
                            for a in ab_i.alphas)

                    rk_step = lambda t, vq, eps, **kw: step_fn(  # noqa: E731
                        pgrid, cfg, system, t, vq, t1, ab_i,
                        fused_epi, eps, origin=pallas_origin,
                        shard=fused_shard, extras=epi_extras,
                        gamma=gamma, kene_mv=kene_mv, **step_kw, **kw)

                def body(c):
                    t, vq, n, ttr, eps, sb = c
                    if costate_kernel and not use_fused_batch:
                        # LAGGED CFL bound: the kernel's own per-substep
                        # alpha maxima bound the NEXT step's dt (one step
                        # stale; the frozen interval-start bound alone
                        # cannot track an evolving costate over a long
                        # interval)
                        t_new, vq_new, eps, sb = rk_step(
                            t, vq, eps,
                            sb=sb)  # type: ignore[call-arg]
                    else:
                        t_new, vq_new, eps = rk_step(t, vq, eps)
                    if record_ttr:
                        v_last = lower(fgrid, vq)
                        v_cur = lower(fgrid, vq_new)
                        crossed = ((v_last > 0) & (v_cur <= 0)
                                   & jnp.isinf(ttr))
                        frac = v_last / jnp.where(
                            v_last != v_cur, v_last - v_cur, 1.0)
                        # per-scenario times broadcast along the trailing
                        # lane axis in batch mode
                        ttr = jnp.where(crossed, t + (t_new - t) * frac,
                                        ttr)
                    return t_new, vq_new, n + 1, ttr, eps, sb

                vq0 = lift(fgrid, v)
                if fused_shard is not None and not use_fused_batch:
                    # lift BC-padded the sharded axes; pull the real
                    # ghost layers from the ring neighbours first
                    from .kernels.hjstep import (refresh_sharded_axes,
                                                 shard_spec)

                    vq0 = refresh_sharded_axes(pgrid, vq0,
                                               shard_spec(fused_shard)[0])
                if use_fused_batch:
                    eps0 = fmod.initial_epsilon_batch(grid, cfg, vq0)
                elif grid.ndim == 4:
                    eps0 = hjstep4d.initial_epsilon_4d(
                        pgrid, cfg, v,
                        ops=ops if fused_shard is not None else None)
                else:
                    eps0 = hjstep.initial_epsilon(pgrid, cfg, vq0,
                                                  ops=ops)
                # CFL-bound carry: the exact interval-start bound seeds
                # the costate lagged refresh; a dummy zero elsewhere
                sb0 = (ab_i.step_bound
                       if costate_kernel and not use_fused_batch
                       else jnp.zeros((), v0.dtype))
                _, vq, n, ttr, _, _ = jax.lax.while_loop(
                    cond, body,
                    (t0, vq0, jnp.zeros((), jnp.int32), ttr, eps0, sb0))
                return lower(fgrid, vq), n, ttr

            def body(c):
                t, v, n, ttr = c
                v_last = v
                t_new, v = cfl_step(rhs_i, t, v, t1, cfg.factor_cfl,
                                    cfg.rk_order, cfg.max_step,
                                    check_cfl=cfg.check_cfl)
                v = apply_comp(v, v_last, v0, tgt_i)
                if obs_i is not None:
                    v = jnp.maximum(v, -obs_i)
                if n_batch is not None:
                    # Elements that already reached t1 take zero-length RK
                    # steps while slower elements integrate, but apply_comp's
                    # discounting (Jaime blend, Kene shift-scale) is NOT
                    # idempotent — freeze finished elements exactly as the
                    # per-element solve's loop exit would leave them.  The
                    # (B,) mask broadcasts against the trailing scenario axis.
                    active = t < t1 - small
                    v = jnp.where(active, v, v_last)
                if record_ttr:
                    # first-crossing time by linear interpolation of the
                    # sign change (ref Helper/post_ttr.py:8)
                    crossed = (v_last > 0) & (v <= 0) & jnp.isinf(ttr)
                    frac = v_last / jnp.where(v_last != v, v_last - v, 1.0)
                    t_cross = t + (t_new - t) * frac
                    ttr = jnp.where(crossed, t_cross, ttr)
                return t_new, v, n + 1, ttr

            _, v, n, ttr = jax.lax.while_loop(
                cond, body, (t0, v, jnp.zeros((), jnp.int32), ttr))
            return v, n, ttr

        v_new, n_steps, ttr_new = jax.lax.cond(
            jnp.all(done), lambda v, ttr: (v, jnp.zeros((), jnp.int32), ttr),
            do, v_in, ttr_in)
        if n_batch is not None:
            # partially-done batches run the interval for everyone (one
            # program) but frozen elements keep their pre-interval state
            v_new = jnp.where(done, v_in, v_new)
            if record_ttr:
                ttr_new = jnp.where(done, ttr_in, ttr_new)
        change = ops.reduce_max(jnp.abs(trim(v_new) - trim(v_in)))

        new_done = done
        bad = jnp.zeros((), jnp.bool_)
        if nan_guard:
            # A non-finite node makes the max|dV| reduction non-finite
            # (NaN/inf propagate through max of abs), so the guard folds
            # into the change reduction at zero extra passes.  Freeze the
            # pre-interval state and stop (the reference raised per step,
            # hji_solver.py:544); ``nan_index`` reports where.
            bad = ~jnp.isfinite(change) & ~done
            v_new = jnp.where(bad, v_in, v_new)
            if record_ttr:
                ttr_new = jnp.where(bad, ttr_in, ttr_new)
            new_done = new_done | bad
        if converge_threshold is not None:
            new_done = new_done | (change < converge_threshold)
        if stop_state is not None:
            init_val = eval_fn(v_new, stop_state)
            new_done = new_done | (init_val <= 0)
        if stop_set is not None:
            # stopSetInclude: stop once the reachable set CONTAINS the whole
            # {stop_set < 0} region; stopSetIntersect: once it touches it
            # (ref hji_solver.py:250-266,687-703 — the reference's index-set
            # comparison reimplemented as on-device masked reductions).
            region = stop_set < 0
            if stop_set_mode == "include":
                worst = ops.reduce_max(
                    jnp.where(region, v_new, -jnp.inf))
            else:
                worst = ops.reduce_min(
                    jnp.where(region, v_new, jnp.inf))
            new_done = new_done | (worst <= stop_level)

        if progress:
            # low-frequency structured metrics (once per tau checkpoint,
            # not per RK step — the reference printed per step,
            # hji_solver.py:511,541,667)
            jax.debug.callback(
                lambda tt, ch, ns: print(
                    f"[levelsetpy] t={float(tt):.4f} steps+={int(ns)} "
                    f"max|dV|={float(jnp.max(ch)):.3e}"),
                t1, change, n_steps, ordered=True)

        if on_checkpoint is not None:
            # in-solve snapshot hook (the reference redrew the surface per
            # step, hji_solver.py:731-836; here the TPU-sane equivalent is
            # one host callback per tau checkpoint with the full slice —
            # for live monitoring of long solves; costs a device->host
            # fetch per interval, so it is opt-in)
            jax.debug.callback(on_checkpoint, t1, v_new, ordered=True)

        out = v_new if save_all else None
        return (v_new, new_done, steps + n_steps, ttr_new), \
            (out, change, done, bad)

    done_shape = () if n_batch is None else (n_batch,)
    (v_fin, _, steps, ttr_fin), (vs, changes, was_done, was_bad) = \
        jax.lax.scan(
            interval,
            (v0, jnp.zeros(done_shape, jnp.bool_),
             jnp.zeros((), jnp.int32), ttr0),
            jnp.arange(n_tau - 1),
        )
    # axis 0 = time: scalar solves give scalars, batched give per-element
    stop_index = jnp.where(jnp.any(was_done, axis=0),
                           jnp.argmax(was_done, axis=0), n_tau - 1)
    nan_index = jnp.where(jnp.any(was_bad, axis=0),
                          jnp.argmax(was_bad, axis=0),
                          jnp.int32(-1)).astype(jnp.int32)
    if save_all:
        values = jnp.concatenate([v0[None], vs], axis=0)
    else:
        values = v_fin[None]
    return values, changes, stop_index, steps, \
        (ttr_fin if record_ttr else None), nan_index


@functools.lru_cache(maxsize=64)
def _cached_run(grid, cfg, comp_method, obstacles_tv, targets_tv,
                discount_mode, has_discount, converge_threshold,
                ignore_boundary, save_all, use_precomputed, record_ttr,
                progress=False, allow_fused=True, stop_set_mode=None,
                has_noise=False, nan_guard=True, on_checkpoint=None):
    """Jitted solver entry, memoized on every static knob so repeated
    ``solve`` calls (replanning loops, parameter sweeps) reuse the trace and
    executable.  Everything concrete is a jit ARGUMENT, not a closure:
    closed-over concrete arrays trigger eager op dispatch during tracing
    (each a device round trip — minutes over a remote-TPU link) and bake
    constants into the executable; as arguments they trace abstractly and
    XLA's loop-invariant code motion hoists the derived coefficient
    arrays out of the time loop."""

    def trim(v):
        # Interior view for convergence checks (ref ignoreBoundary trims
        # 4*dx per side, hji_solver.py:507,663).
        if not ignore_boundary:
            return v
        sl = tuple(
            slice(4, s - 4) if s > 8 else slice(None) for s in grid.shape
        )
        return v[sl]

    @jax.jit
    def run(system, v0, tau, xs, obstacles, targets, gamma, stop_state,
            stop_set, stop_level, noise_sigma):
        return _solve_core(
            grid=grid, cfg=cfg, comp_method=comp_method, system=system,
            v0=v0, tau=tau, xs=xs, ops=local_ops(grid),
            obstacles=obstacles, obstacles_tv=obstacles_tv,
            targets=targets, targets_tv=targets_tv,
            gamma=gamma, discount_mode=discount_mode,
            has_discount=has_discount,
            stop_state=stop_state, stop_set=stop_set,
            stop_set_mode=stop_set_mode, stop_level=stop_level,
            noise_sigma=noise_sigma if has_noise else None,
            converge_threshold=converge_threshold,
            trim=trim, save_all=save_all, use_precomputed=use_precomputed,
            record_ttr=record_ttr, progress=progress,
            allow_fused=allow_fused, nan_guard=nan_guard,
            on_checkpoint=on_checkpoint,
        )

    return run


class _Operands(NamedTuple):
    """Validated/normalized solve inputs, shared by the single-device and
    the sharded (``parallel.solve_sharded``) entry points."""

    cfg: SchemeConfig
    tau: jnp.ndarray
    v0: jnp.ndarray
    obstacles: jnp.ndarray | None
    targets: jnp.ndarray | None
    obstacles_tv: bool
    targets_tv: bool
    gamma: jnp.ndarray
    stop_state: jnp.ndarray | None
    stop_set: jnp.ndarray | None
    stop_set_mode: str | None
    stop_level: jnp.ndarray
    noise_sigma: jnp.ndarray | None
    use_precomputed: bool


def _prep_operands(grid, system, v0, tau, cfg, comp_method, obstacles,
                   targets, discount_factor, discount_mode, stop_init,
                   stop_set_include, stop_set_intersect, stop_level,
                   noise_stddev) -> _Operands:
    """Validation + operand normalization for every solve entry point
    (mirrors the reference's extraArgs parsing, ``hji_solver.py:189-266,
    450-471,601-644``)."""
    if comp_method not in _COMP_METHODS:
        raise ValueError(f"unknown comp_method {comp_method!r}")
    if system.n_states != grid.ndim:
        raise ValueError(
            f"system has {system.n_states} states but grid has "
            f"{grid.ndim} dims")
    if v0.shape != grid.shape:
        raise ValueError(f"v0 shape {v0.shape} != grid shape {grid.shape}")
    tau = jnp.asarray(tau, dtype=v0.dtype)
    nd = grid.ndim
    if comp_method == "zero" and cfg.restrict_update is None:
        cfg = dataclasses.replace(cfg, restrict_update="min")
    if comp_method in ("minVWithL", "maxVWithL") and targets is None:
        raise ValueError(f"{comp_method} requires targets (l(x))")
    if discount_factor is not None and discount_mode == "Kene":
        # the reference errors on unsupported combinations
        # (hji_solver.py:613-638) — silently rerouting the comp method
        # would return wrong answers without warning
        if targets is None:
            raise ValueError("Kene discounting requires targets")
        if comp_method not in ("minVWithL", "maxVWithL"):
            raise ValueError(
                "Kene discounting supports only minVWithL/maxVWithL "
                f"comp methods (got {comp_method!r})")

    obstacles_tv = obstacles is not None and obstacles.ndim == nd + 1
    targets_tv = targets is not None and targets.ndim == nd + 1

    # Initial obstacle mask (ref hji_solver.py:209-228).  Cast to v0's dtype
    # so mixed-precision inputs can't promote the solve mid-pipeline.
    if obstacles is not None:
        obstacles = obstacles.astype(v0.dtype)
        obs0 = obstacles[0] if obstacles_tv else obstacles
        v0 = jnp.maximum(v0, -obs0)
    if targets is not None:
        targets = targets.astype(v0.dtype)

    # alpha_time_invariant means alpha ignores t AND the costate box,
    # so global/local/locallocal dissipation coincide - precompute for
    # all three (VERDICT r3 #3; LLF then needs no per-substep reductions)
    use_precomputed = system.alpha_time_invariant
    gamma = (jnp.asarray(discount_factor, v0.dtype)
             if discount_factor is not None else jnp.asarray(1.0, v0.dtype))
    stop_state = (jnp.asarray(stop_init, v0.dtype)
                  if stop_init is not None else None)

    # stopSet early exit (ref hji_solver.py:250-266): include and intersect
    # are mutually exclusive; the set must be grid-shaped.
    if stop_set_include is not None and stop_set_intersect is not None:
        raise ValueError(
            "stop_set_include and stop_set_intersect are mutually exclusive")
    stop_set = (stop_set_include if stop_set_include is not None
                else stop_set_intersect)
    stop_set_mode = None
    if stop_set is not None:
        stop_set = jnp.asarray(stop_set, v0.dtype)
        if stop_set.shape != grid.shape:
            raise ValueError("Inconsistent stopSet dimensions!")
        stop_set_mode = ("include" if stop_set_include is not None
                         else "intersect")

    # Gaussian process noise: a stddev VECTOR stays 1-D (diagonal
    # diffusion — its rank is a static shape property that gates the
    # in-kernel fused form, VERDICT r4 #8; make_trace_hessian_term
    # diag-ifies internally); an (nd, m) matrix is used as-is (ref
    # extraArgs.addGaussianNoiseStandardDeviation, hji_solver.py:450-471).
    noise_sigma = None
    if noise_stddev is not None:
        noise_sigma = jnp.asarray(noise_stddev, v0.dtype)
        if noise_sigma.shape[0] != nd:
            raise ValueError(
                f"noise_stddev must have leading dim {nd}, got "
                f"{noise_sigma.shape}")

    return _Operands(
        cfg=cfg, tau=tau, v0=v0, obstacles=obstacles, targets=targets,
        obstacles_tv=obstacles_tv, targets_tv=targets_tv, gamma=gamma,
        stop_state=stop_state, stop_set=stop_set,
        stop_set_mode=stop_set_mode,
        stop_level=jnp.asarray(stop_level, v0.dtype),
        noise_sigma=noise_sigma, use_precomputed=use_precomputed)


def solve(
    grid: Grid,
    system: System,
    v0: jnp.ndarray,
    tau,
    cfg: SchemeConfig = SchemeConfig(),
    comp_method: str = "minVOverTime",
    obstacles: jnp.ndarray | None = None,
    targets: jnp.ndarray | None = None,
    discount_factor: float | None = None,
    discount_mode: str = "Jaime",
    stop_init: jnp.ndarray | None = None,
    stop_set_include: jnp.ndarray | None = None,
    stop_set_intersect: jnp.ndarray | None = None,
    stop_level: float = 0.0,
    noise_stddev: jnp.ndarray | None = None,
    converge_threshold: float | None = None,
    ignore_boundary: bool = False,
    save_all: bool = True,
    record_ttr: bool = False,
    progress: bool = False,
    nan_guard: bool = True,
    on_checkpoint=None,
) -> SolveResult:
    """Solve the HJI PDE over checkpoint times ``tau`` on a single device.

    Args mirror ``HJIPDE_solve(data0, tau, schemeData, compMethod,
    extraArgs)``: ``obstacles``/``targets`` may be a single grid-shaped array
    (static) or a ``(len(tau), *grid.shape)`` stack (time-varying).  The
    'zero' comp method routes through ``cfg.restrict_update`` like the
    reference's ``termRestrictUpdate`` wrapper (``hji_solver.py:438-442``).
    ``nan_guard`` freezes the state and records ``nan_index`` if an interval
    produces non-finite values (the reference raised, hji_solver.py:544).
    ``on_checkpoint(t, values)`` is an opt-in host snapshot hook fired once
    per tau checkpoint (the TPU-sane analog of the reference's per-step
    redraw, ``hji_solver.py:731-836``) — for live monitoring of long
    solves; it costs one device->host fetch per interval and is part of
    the jit cache key, so reuse ONE function object across calls.  Host
    callbacks require a locally-attached backend (CPU/GPU/local TPU) —
    remote-execution links (this repo's axon tunnel) do not transport
    them (the same applies to ``progress=True``).
    """
    from .terms import resolve_pallas

    cfg = resolve_pallas(cfg)   # use_pallas=None -> auto (TPU backend on)
    op = _prep_operands(grid, system, v0, tau, cfg, comp_method, obstacles,
                        targets, discount_factor, discount_mode, stop_init,
                        stop_set_include, stop_set_intersect, stop_level,
                        noise_stddev)
    cfg = op.cfg
    xs = grid.mesh_broadcastable(op.v0.dtype)

    # Batched (vmapped) solves must not route through the Pallas kernels:
    # pjit batches the traced jaxpr directly, so kernel branches can't
    # detect vmap from inside the jit — and Mosaic rejects the batched
    # small SMEM operands a vmapped pallas_call produces.  Check the
    # operands HERE, outside the jit boundary, and fall back to the XLA
    # path (which vmaps natively) by stripping use_pallas from the
    # (cache-keyed) config.
    from .terms import _batched

    if cfg.use_pallas and _batched(system, op.v0, op.tau, op.obstacles,
                                   op.targets, op.stop_state):
        cfg = dataclasses.replace(cfg, use_pallas=False)

    run = _cached_run(
        grid, cfg, comp_method, op.obstacles_tv, op.targets_tv,
        discount_mode, discount_factor is not None, converge_threshold,
        ignore_boundary, save_all, op.use_precomputed, record_ttr, progress,
        stop_set_mode=op.stop_set_mode,
        has_noise=op.noise_sigma is not None, nan_guard=nan_guard,
        on_checkpoint=on_checkpoint,
    )
    values, changes, stop_index, steps, ttr, nan_index = run(
        system, op.v0, op.tau, xs, op.obstacles, op.targets, op.gamma,
        op.stop_state, op.stop_set, op.stop_level, op.noise_sigma)
    return SolveResult(values=values, tau=op.tau, changes=changes,
                       stop_index=stop_index, steps=steps, ttr=ttr,
                       nan_index=nan_index)


@functools.lru_cache(maxsize=32)
def _cached_batch_run(grid, cfg, comp_method, n_batch, discount_mode,
                      has_discount, converge_threshold, ignore_boundary,
                      save_all, use_precomputed, record_ttr, progress,
                      stop_set_mode, has_noise, nan_guard,
                      obstacles_tv=False, targets_tv=False):
    """Jitted batch-LAST solver entry (see :func:`solve_batch`)."""
    from .terms import batched_ops

    def trim(v):
        if not ignore_boundary:
            return v
        sl = tuple(
            slice(4, s - 4) if s > 8 else slice(None) for s in grid.shape
        )
        return v[sl]

    def eval_fn(v, state):
        # per-scenario point query: vmap over the trailing batch axis
        return jax.vmap(lambda vb: eval_u(grid, vb, state),
                        in_axes=-1)(v)

    @jax.jit
    def run(system, v0, tau, xs, obstacles, targets, gamma, stop_state,
            stop_set, stop_level, noise_sigma):
        return _solve_core(
            grid=grid, cfg=cfg, comp_method=comp_method, system=system,
            v0=v0, tau=tau, xs=xs, ops=batched_ops(grid),
            obstacles=obstacles, obstacles_tv=obstacles_tv,
            targets=targets, targets_tv=targets_tv,
            gamma=gamma, discount_mode=discount_mode,
            has_discount=has_discount,
            stop_state=stop_state, stop_set=stop_set,
            stop_set_mode=stop_set_mode, stop_level=stop_level,
            noise_sigma=noise_sigma if has_noise else None,
            converge_threshold=converge_threshold,
            trim=trim, save_all=save_all, use_precomputed=use_precomputed,
            record_ttr=record_ttr, progress=progress,
            allow_fused=True, eval_fn=eval_fn, nan_guard=nan_guard,
            n_batch=n_batch,
        )

    return run


def _replicate_last_leading(arr, n_pad):
    """Replicate the final leading-axis element ``n_pad`` times (scenario
    clone padding; shared by solve_batch and parallel.solve_batch_sharded)."""
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[-1:], (n_pad, *arr.shape[1:]))])


def _replicate_last_trailing(arr, n_pad):
    """Replicate the final trailing-axis element ``n_pad`` times."""
    return jnp.concatenate(
        [arr, jnp.broadcast_to(arr[..., -1:], (*arr.shape[:-1], n_pad))],
        axis=-1)


def solve_batch(
    grid: Grid,
    system: System,
    v0: jnp.ndarray,
    tau,
    cfg: SchemeConfig = SchemeConfig(),
    comp_method: str = "minVOverTime",
    n_batch: int | None = None,
    obstacles: jnp.ndarray | None = None,
    targets: jnp.ndarray | None = None,
    discount_factor=None,
    discount_mode: str = "Jaime",
    stop_init: jnp.ndarray | None = None,
    stop_set_include: jnp.ndarray | None = None,
    stop_set_intersect: jnp.ndarray | None = None,
    stop_level: float = 0.0,
    noise_stddev: jnp.ndarray | None = None,
    converge_threshold: float | None = None,
    ignore_boundary: bool = False,
    save_all: bool = True,
    record_ttr: bool = False,
    progress: bool = False,
    nan_guard: bool = True,
) -> SolveResult:
    """Solve a BATCH of HJI problems in one program, batch-LAST layout.

    The TPU-native way to run parameter sweeps (BASELINE config #3, the
    reference's per-scenario rerun loop): value arrays carry one trailing
    scenario axis — ``(*grid.shape, B)`` — which lands in the 128-wide
    vector-lane axis, so a sweep of small grids runs at full lane
    utilization where ``jax.vmap(solve)``'s batch-first layout leaves the
    (short) innermost grid axis in the lanes.  Each scenario integrates
    under its own CFL dt and stops (convergence, stopInit, stopSet, NaN
    freeze) independently; ``changes``/``stop_index``/``nan_index`` come
    back per scenario, shape ``(B,)``/``(T-1, B)``.

    Batched inputs: system parameters as ``(B,)`` leaves (they broadcast
    against the trailing lane axis natively), ``v0`` either shared
    (``grid.shape``) or per-scenario (``(*grid.shape, B)``), obstacles /
    targets / stop sets shared or per-scenario, ``discount_factor`` scalar
    or ``(B,)``.  Obstacles/targets additionally accept per-tau stacks —
    ``(len(tau), *grid.shape)`` shared or ``(len(tau), *grid.shape, B)``
    per-scenario (the reference's time-varying obstacle semantics,
    ``hji_solver.py:209-228,641-644``, in the sweep path).

    Batch-size inference: when ``n_batch`` is not given and ``v0`` has no
    trailing batch axis, EVERY system array leaf with ``ndim >= 1`` is
    interpreted as a ``(B,)`` scenario batch — a system carrying a genuine
    non-batched vector parameter (e.g. a ``(2,)`` goal point) must pass
    ``n_batch=`` explicitly (inconsistent leaf sizes raise; a lone vector
    leaf would otherwise be misread as the batch).
    """
    if comp_method not in _COMP_METHODS:
        raise ValueError(f"unknown comp_method {comp_method!r}")
    if system.n_states != grid.ndim:
        raise ValueError(
            f"system has {system.n_states} states but grid has "
            f"{grid.ndim} dims")
    from .terms import resolve_pallas

    cfg = resolve_pallas(cfg)   # use_pallas=None -> auto (TPU backend on)
    nd = grid.ndim
    v0 = jnp.asarray(v0)
    if v0.shape[:nd] != grid.shape or v0.ndim not in (nd, nd + 1):
        raise ValueError(
            f"v0 shape {v0.shape} must be {grid.shape} or "
            f"(*{grid.shape}, B)")
    if n_batch is None:
        if v0.ndim == nd + 1:
            n_batch = v0.shape[-1]
        else:
            sizes = {l.shape[0] for l in jax.tree.leaves(system)
                     if hasattr(l, "shape") and getattr(l, "ndim", 0) >= 1}
            if len(sizes) != 1:
                raise ValueError(
                    "cannot infer the batch size: pass n_batch=, batch the "
                    "system parameters as (B,) leaves, or give v0 a "
                    "trailing batch axis")
            n_batch = sizes.pop()
    if v0.ndim == nd:
        v0 = jnp.broadcast_to(v0[..., None], (*grid.shape, n_batch))
    tau = jnp.asarray(tau, dtype=v0.dtype)
    if comp_method == "zero" and cfg.restrict_update is None:
        cfg = dataclasses.replace(cfg, restrict_update="min")
    if comp_method in ("minVWithL", "maxVWithL") and targets is None:
        raise ValueError(f"{comp_method} requires targets (l(x))")
    if discount_factor is not None and discount_mode == "Kene":
        if targets is None:
            raise ValueError("Kene discounting requires targets")
        if comp_method not in ("minVWithL", "maxVWithL"):
            raise ValueError(
                "Kene discounting supports only minVWithL/maxVWithL "
                f"comp methods (got {comp_method!r})")

    n_tau = tau.shape[0]

    def _check_operand(name, arr, allow_tv=False):
        """Normalize to trailing-batched form; returns (arr, is_tv).

        Accepted: grid-shaped / trailing-batched (static), and — for
        obstacles/targets — per-tau stacks ``(T, *grid)`` shared across
        scenarios or ``(T, *grid, B)`` per-scenario (ref hji_solver.py:
        209-228,641-644 per-tau obstacle semantics, now in the sweep path
        too).  A trailing singleton broadcasts shared operands across the
        scenario lane axis (numpy aligns trailing dims)."""
        if arr is None:
            return None, False
        arr = jnp.asarray(arr, v0.dtype)
        if arr.shape in (grid.shape, (*grid.shape, n_batch)):
            return (arr[..., None] if arr.shape == grid.shape else arr,
                    False)
        tv_shapes = ((n_tau, *grid.shape), (n_tau, *grid.shape, n_batch))
        if allow_tv and arr.shape in tv_shapes:
            return (arr[..., None] if arr.ndim == nd + 1 else arr, True)
        raise ValueError(
            f"{name} shape {arr.shape} not supported in batch mode "
            f"(want {grid.shape}, (*grid, B){', or a (T, ...) stack of '
            'either' if allow_tv else ''})")

    def _check_static(name, arr):
        return _check_operand(name, arr)[0]

    obstacles, obstacles_tv = _check_operand("obstacles", obstacles,
                                             allow_tv=True)
    targets, targets_tv = _check_operand("targets", targets, allow_tv=True)
    if obstacles is not None:
        obs0 = obstacles[0] if obstacles_tv else obstacles
        v0 = jnp.maximum(v0, -obs0)

    if stop_set_include is not None and stop_set_intersect is not None:
        raise ValueError(
            "stop_set_include and stop_set_intersect are mutually exclusive")
    stop_set = (stop_set_include if stop_set_include is not None
                else stop_set_intersect)
    stop_set_mode = None
    if stop_set is not None:
        stop_set = _check_static("stop_set", stop_set)
        stop_set_mode = ("include" if stop_set_include is not None
                         else "intersect")

    noise_sigma = None
    if noise_stddev is not None:
        noise_sigma = jnp.asarray(noise_stddev, v0.dtype)
        if noise_sigma.ndim == 1:
            noise_sigma = jnp.diag(noise_sigma)
        if noise_sigma.shape[0] != nd:
            raise ValueError(
                f"noise_stddev must have leading dim {nd}, got "
                f"{noise_sigma.shape}")

    gamma = (jnp.asarray(discount_factor, v0.dtype)
             if discount_factor is not None else jnp.asarray(1.0, v0.dtype))
    stop_state = (jnp.asarray(stop_init, v0.dtype)
                  if stop_init is not None else None)
    # alpha_time_invariant means alpha ignores t AND the costate box,
    # so global/local/locallocal dissipation coincide - precompute for
    # all three (VERDICT r3 #3; LLF then needs no per-substep reductions)
    use_precomputed = system.alpha_time_invariant
    # use_pallas routes the RHS through the fused batch-LAST kernel
    # (kernels/wenobatch.py) when eligible — 3-D WENO5, scalar/(B,) system
    # leaves; anything else silently runs the (batch-native) XLA path via
    # terms.batch_pallas_eligible.  The kernel needs B ≡ 0 (mod 128 lanes);
    # an arbitrary B is padded HERE by replicating the last scenario up to
    # the lane-chunk multiple and slicing the results back (VERDICT r3 #5)
    # — clones integrate identically to their source under the per-element
    # CFL/stop machinery, so semantics per real element are exact and the
    # kernels never see a partial chunk.
    n_true = n_batch
    from .terms import batch_pallas_eligible

    pad_n = (-n_batch) % 128
    if cfg.use_pallas and pad_n and grid.ndim == 3:
        def _pad_leaf(leaf):
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n_true:
                return _replicate_last_leading(leaf, pad_n)
            return leaf

        def _pad_last(arr):
            # trailing-batch operand: replicate the final scenario lane
            if arr is not None and arr.shape[-1] == n_true:
                return _replicate_last_trailing(arr, pad_n)
            return arr

        # count the fused-epilogue operand streams the solve will carry so
        # the eligibility check sizes the VMEM working set correctly
        tags = set()
        if discount_factor is not None and discount_mode == "Kene":
            tags.add("tgt")
        else:
            if comp_method in ("minVWithV0", "maxVWithV0"):
                tags.add("v0")
            elif comp_method in ("minVWithL", "maxVWithL"):
                tags.add("tgt")
            if discount_factor is not None:
                tags.add("tgt" if targets is not None else "v0")
        if obstacles is not None:
            tags.add("nobs")

        system_p = jax.tree.map(_pad_leaf, system)
        if batch_pallas_eligible(grid, cfg, n_batch + pad_n, system_p, v0,
                                 n_extras=len(tags)):
            system = system_p
            n_batch = n_batch + pad_n
            v0 = _pad_last(v0)
            obstacles = _pad_last(obstacles)
            targets = _pad_last(targets)
            stop_set = _pad_last(stop_set)
            if gamma.ndim >= 1:
                gamma = _pad_leaf(gamma)
        else:
            pad_n = 0
    else:
        pad_n = 0

    # grid coordinates gain a trailing singleton so they broadcast across
    # the scenario lane axis: (nx,1,..,1) -> (nx,1,..,1,1)
    xs = tuple(x[..., None] for x in grid.mesh_broadcastable(v0.dtype))

    run = _cached_batch_run(
        grid, cfg, comp_method, n_batch, discount_mode,
        discount_factor is not None, converge_threshold, ignore_boundary,
        save_all, use_precomputed, record_ttr, progress,
        stop_set_mode, noise_sigma is not None, nan_guard,
        obstacles_tv, targets_tv,
    )
    values, changes, stop_index, steps, ttr, nan_index = run(
        system, v0, tau, xs, obstacles, targets, gamma,
        stop_state, stop_set, jnp.asarray(stop_level, v0.dtype),
        noise_sigma)
    if pad_n:
        # drop the replicated padding lanes from every per-scenario output
        values = values[..., :n_true]
        changes = changes[..., :n_true]
        stop_index = stop_index[..., :n_true]
        nan_index = nan_index[..., :n_true]
        if ttr is not None:
            ttr = ttr[..., :n_true]
    return SolveResult(values=values, tau=tau, changes=changes,
                       stop_index=stop_index, steps=steps, ttr=ttr,
                       nan_index=nan_index)
