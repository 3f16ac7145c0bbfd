"""Fused Pallas TPU kernel: one full RK substep of the HJ solve per launch.

The RHS-only fused kernel (``weno3d.fused_hj_rhs_3d``) still pays, per
substep, 3 XLA ghost-fill passes on its input, an alignment pad, an output
slice, the RK axpy update, and 3 full-grid dissipation-bound reads — in
total more HBM traffic than the kernel itself.  This module removes all of
it by keeping the value function PERSISTENTLY in the lane-aligned
ghost-padded layout ``(x+6, yp, zp)`` (``weno3d.aligned_dims``) and fusing
one entire TVD-RK substep into a single kernel:

    out = ca * va + cb * vb + cd * f(vb),      f = -(H - diss)

with
  * WENO5 derivL/derivR on all three axes (shared-table formulation,
    identical math to ``derivatives.weno5_from_padded``),
  * the Hamiltonian AND the dissipation bounds evaluated in-kernel from
    iota-reconstructed coordinates (``weno3d.system_closures``) — alphas
    never touch HBM (valid for ``alpha_time_invariant`` systems, which is
    exactly when the solver's precomputed-CFL fast path runs),
  * the solver's per-step comp-method masking (min/max with the
    step-start value, ref ``hji_solver.py:566-599``) fused into the final
    substep,
  * the boundary-condition ghost fill of the OUTPUT (y and z axes) done
    in-kernel from the freshly updated interior, so the next substep needs
    no XLA padding at all.  Only the 6 x-ghost ROWS are refreshed by a
    cheap XLA ``dynamic_update_slice`` post-pass
    (:func:`refresh_x_ghosts`) — they live on the leading (untiled) axis
    and may span blocks (periodic wrap).

Steady-state HBM traffic per substep drops to ``read(vb) [+ read(va)] +
write(out)`` ≈ 21 MB at 101³ — ~5x less than the XLA path's per-substep
traffic — and the layout round trips (lift/lower) happen once per solve
interval, not once per substep.

Corner ghost cells (ghost in ≥2 axes simultaneously) are filled in a
slightly different order than sequential XLA padding, but upwind stencils
are axis-aligned and never read corners for interior outputs, so values
are identical where they matter (asserted against the XLA path in tests).

Junk lanes/columns beyond the ghost region integrate garbage (their
"coordinates" lie outside the domain); they are never read by interior
stencils, reductions, or the final :func:`lower` slice.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..boundary import pad_axis
from ..grid import Grid
from .weno3d import (_smoothness, _weno_axis01, _weno_eval,
                     _weno_weight_tables, aligned_dims)

__all__ = ["lift", "lower", "refresh_x_ghosts", "refresh_x_ghosts_sharded",
           "fused_substep_3d", "fused_rk_step", "initial_epsilon",
           "Epilogue"]


@dataclasses.dataclass(frozen=True)
class Epilogue:
    """Static description of the solver's per-RK-step epilogue, fused into
    the FINAL substep of the kernelised RK step (VERDICT r3 #1).  Mirrors
    ``solver._solve_core``'s XLA-path order exactly (ref ``hji_solver.py:
    536-644``): comp method (or Kene shift-scale-comp), then the Jaime
    discount blend, then obstacle masking.

    Operand arrays travel as ``extras`` — a tuple of aligned-layout arrays
    DMA'd blockwise alongside the state — indexed by the ``*_ex`` fields:

      comp:      'min'/'max'/None — the comp-method combine.
      comp_src:  'va' (RK-step start), 'vb' (substep input; rk1), or 'ex'
                 (a fixed array: v0 for withV0, the interval target for
                 withL) with ``comp_ex`` the extras index.
      kene:      Kene discounting (ref ``hji_solver.py:613-638``) —
                 REPLACES the plain comp: ``out = comb((out-mv)*gamma,
                 tgt-mv) + mv`` with ``comb`` = ``comp``, ``tgt`` =
                 ``extras[comp_ex]`` and ``mv``/``gamma`` SMEM scalars.
      jaime_ex:  Jaime blend base (target if given else v0):
                 ``out = gamma*out + (1-gamma)*extras[jaime_ex]``.
      obs_ex:    obstacle masking ``out = max(out, extras[obs_ex])`` — the
                 operand is the PRE-NEGATED obstacle (ref ``:640-644``).
    """

    comp: str | None = None
    comp_src: str = "va"
    comp_ex: int = 0
    kene: bool = False
    jaime_ex: int | None = None
    obs_ex: int | None = None

    @property
    def needs_va(self) -> bool:
        return self.comp is not None and not self.kene \
            and self.comp_src == "va"


# --------------------------------------------------------------- layout moves
def lift(grid: Grid, v: jnp.ndarray) -> jnp.ndarray:
    """Grid-shaped value function -> aligned ghost-padded ``(x+6, yp, zp)``.

    Ghost values match ``boundary.pad_axis`` per axis; trailing junk is
    zero-initialised.  Called once per solve interval.
    """
    for axis in range(3):
        v = pad_axis(grid, v, axis, 3)
    zp, _, yp = aligned_dims(grid)
    return jnp.pad(v, ((0, 0), (0, yp - v.shape[1]), (0, zp - v.shape[2])))


def lower(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Aligned ghost-padded array -> interior grid-shaped view."""
    x, y, z = grid.shape
    return jax.lax.slice(vq, (3, 3, 3), (3 + x, 3 + y, 3 + z))


def refresh_x_ghosts(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Recompute the 6 ghost ROWS (leading axis) from the interior.

    Runs as XLA ``dynamic_update_slice`` on 3-row slabs — O(surface) work.
    Periodic wrap needs rows from the far end of the grid (not visible to
    a single kernel block); extrapolation matches
    ``boundary.pad_extrapolate`` (slope sign away from the zero level set).

    Only axis 0 is touched, so the trailing dims are opaque.
    """
    x = grid.shape[0]
    if grid.periodic[0]:
        glo = jax.lax.slice_in_dim(vq, x, x + 3, axis=0)
        ghi = jax.lax.slice_in_dim(vq, 3, 6, axis=0)
    else:
        edge_lo = jax.lax.slice_in_dim(vq, 3, 4, axis=0)
        inner_lo = jax.lax.slice_in_dim(vq, 4, 5, axis=0)
        slope_lo = jnp.abs(edge_lo - inner_lo) * jnp.sign(edge_lo)
        glo = jnp.concatenate(
            [edge_lo + k * slope_lo for k in (3.0, 2.0, 1.0)], axis=0)
        edge_hi = jax.lax.slice_in_dim(vq, x + 2, x + 3, axis=0)
        inner_hi = jax.lax.slice_in_dim(vq, x + 1, x + 2, axis=0)
        slope_hi = jnp.abs(edge_hi - inner_hi) * jnp.sign(edge_hi)
        ghi = jnp.concatenate(
            [edge_hi + k * slope_hi for k in (1.0, 2.0, 3.0)], axis=0)
    vq = jax.lax.dynamic_update_slice_in_dim(vq, glo, 0, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(vq, ghi, x + 3, axis=0)


def refresh_ghosts_sharded(lgrid: Grid, vq: jnp.ndarray, axis: int,
                           mesh_axis: str):
    """Refresh the 6 ghost layers of a SHARDED axis of the aligned layout
    from the ring neighbours via ``ppermute`` (one ICI hop each way);
    global-domain edge shards apply the boundary condition instead,
    selected branchlessly by ``axis_index`` (SPMD — same program on every
    shard).  Call inside ``shard_map``.

    For a periodic global axis the ring IS the boundary condition, so the
    permute alone is exact (``parallel/halo.py`` semantics).  Works on any
    leading/sublane axis of the aligned array (axis 0 rows under
    x-sharding; axis 1 columns under y-sharding — the in-kernel y ghost
    fill is then disabled, see ``fused_substep_3d(fill_axes=...)``).
    """
    from ..parallel.halo import _extrapolation_ghosts, _shift

    n = lgrid.shape[axis]
    interior = jax.lax.slice_in_dim(vq, 3, n + 3, axis=axis)
    top = jax.lax.slice_in_dim(interior, n - 3, n, axis=axis)
    bottom = jax.lax.slice_in_dim(interior, 0, 3, axis=axis)
    from_left = _shift(top, mesh_axis, +1)
    from_right = _shift(bottom, mesh_axis, -1)
    if not lgrid.periodic[axis]:
        idx = jax.lax.axis_index(mesh_axis)
        size = jax.lax.axis_size(mesh_axis)
        lo_ghost, hi_ghost = _extrapolation_ghosts(interior, axis, 3)
        from_left = jnp.where(idx == 0, lo_ghost, from_left)
        from_right = jnp.where(idx == size - 1, hi_ghost, from_right)
    vq = jax.lax.dynamic_update_slice_in_dim(vq, from_left, 0, axis=axis)
    return jax.lax.dynamic_update_slice_in_dim(vq, from_right, n + 3,
                                               axis=axis)


def refresh_x_ghosts_sharded(lgrid: Grid, vq: jnp.ndarray, mesh_axis: str):
    """Back-compat wrapper: axis-0 case of :func:`refresh_ghosts_sharded`."""
    return refresh_ghosts_sharded(lgrid, vq, 0, mesh_axis)


def shard_spec(shard):
    """Normalize the ``shard`` argument of the fused RK steps to
    ``({grid axis: mesh name}, mesh axis names)``.  Accepts None, the
    legacy x-only ``(name, mesh_names)`` form, and the general
    ``({axis: name}, mesh_names)`` form."""
    if shard is None:
        return {}, ()
    head, names = shard
    if isinstance(head, str):
        return {0: head}, names
    return dict(head), names


def refresh_sharded_axes(lgrid: Grid, vq: jnp.ndarray, smap) -> jnp.ndarray:
    """Ghost refresh for every sharded axis of the aligned state.  Higher
    axes run FIRST so the axis-0 exchange ships rows whose y ghosts are
    already valid (corner coverage, same order argument as
    ``wenobatch.refresh_xy_ghosts_batch``)."""
    for axis in sorted(smap, reverse=True):
        vq = refresh_ghosts_sharded(lgrid, vq, axis, smap[axis])
    return vq


# ------------------------------------------------------------- kernel helpers
def _roll(a, s, axis):
    # pltpu.roll demands non-negative shifts; rotate modulo axis width
    return pltpu.roll(a, s % a.shape[axis], axis)


def _weno_roll_axis(g, axis, inv_dx, epsq, want_d1=False, stride=1):
    """derivL/derivR along a tiled axis (1 or 2) via rotations, full width.

    ``D1[m] = (g[m+1] - g[m]) / dx`` lives at index m; the node at padded
    index m has left window ``D1[m-3 .. m+1]`` and right window
    ``D1[m-2 .. m+2]`` (reversed).  Same shared-table sharing as
    ``weno3d._weno_axis01``; indices outside the ghost-padded interior
    hold wrap-around garbage the caller overwrites or ignores.

    With ``want_d1`` the raw D1 table is also returned (read by the
    lagged-epsilon epilogue; costs nothing — it is computed anyway).

    ``stride`` > 1 differentiates a PACKED sub-axis riding the lane axis
    (hjstep4d: lane = z*(w+6) + w): every rotation is scaled by the
    sub-axis stride, so the same shared-table code serves the outer packed
    dimension.  Ghost layers inside the packing absorb the stencil reach,
    so no group-boundary fixups are needed (see hjstep4d module docstring).
    """
    d1 = (_roll(g, -stride, axis) - g) * inv_dx
    w = tuple(_roll(d1, (3 - k) * stride, axis)
              for k in range(5))                         # w[k][m]=D1[m-3+k]
    u5 = _roll(d1, -2 * stride, axis)                    # D1[m+2]
    p1l = w[0] * (1 / 3) - w[1] * (7 / 6) + w[2] * (11 / 6)
    p2l = -w[1] * (1 / 6) + w[2] * (5 / 6) + w[3] * (1 / 3)
    p3l = w[2] * (1 / 3) + w[3] * (5 / 6) - w[4] * (1 / 6)
    p1r = w[3] * (11 / 6) - w[4] * (7 / 6) + u5 * (1 / 3)
    from .weno3d import _resolve_epsq

    a1, a2, a3 = _weno_weight_tables(_smoothness(*w), _resolve_epsq(epsq, w))
    dl = _weno_eval((p1l, p2l, p3l), a1, a2, a3)
    dr = _weno_eval(
        (p1r, p3l, p2l),
        _roll(a3, -stride, axis), _roll(a2, -stride, axis),
        _roll(a1, -stride, axis))
    if want_d1:
        return dl, dr, d1
    return dl, dr


def _value_at(a, axis, idx):
    """``a``'s slice at a single static index along ``axis``, keepdims.

    Lane (axis 2) slices must be 128-aligned on TPU, so the lane case uses
    a masked cross-lane reduction instead of a slice.
    """
    if axis != 2:
        return jax.lax.slice_in_dim(a, idx, idx + 1, axis=axis)
    m = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2) == idx
    return jnp.sum(jnp.where(m, a, jnp.zeros_like(a)), axis=2, keepdims=True)


def _fill_ghost(a, axis, n, periodic):
    """Overwrite the 3 ghost layers on each side of ``axis`` (interior
    width ``n``, padded offsets [0,3) and [n+3,n+6)) from the interior,
    matching ``boundary.pad_periodic`` / ``pad_extrapolate``."""
    i = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    if periodic:
        lo_vals = _roll(a, -n, axis)        # a[idx + n]
        a = jnp.where(i < 3, lo_vals, a)
        hi_vals = _roll(a, n, axis)         # a[idx - n]
        return jnp.where((i >= n + 3) & (i < n + 6), hi_vals, a)
    dtype = a.dtype
    edge_lo = _value_at(a, axis, 3)
    inner_lo = _value_at(a, axis, 4)
    slope_lo = jnp.abs(edge_lo - inner_lo) * jnp.sign(edge_lo)
    k_lo = (3 - i).astype(dtype)
    a = jnp.where(i < 3, edge_lo + k_lo * slope_lo, a)
    edge_hi = _value_at(a, axis, n + 2)
    inner_hi = _value_at(a, axis, n + 1)
    slope_hi = jnp.abs(edge_hi - inner_hi) * jnp.sign(edge_hi)
    k_hi = (i - (n + 2)).astype(dtype)
    return jnp.where((i >= n + 3) & (i < n + 6),
                     edge_hi + k_hi * slope_hi, a)


# ------------------------------------------------------------------ the kernel
def fused_substep_3d(
    grid: Grid,
    ham_fn: Callable,
    alpha_fn: Callable,
    vb: jnp.ndarray,             # (x+6, yp, zp) ghost-padded, stencil input
    va: jnp.ndarray,             # same layout; affine/comp operand
    eps,                         # WENO epsilon per axis, shape (3,)
    t,                           # substep time (traced scalar)
    inv_eps,                     # per-axis 1/eps (3,) or None
    cd,                          # coefficient of f: rk_coef * dt (traced)
    params: jnp.ndarray,         # flat system parameters (SMEM)
    *,
    ca: float,                   # static affine coefficient of va
    cb: float,                   # static affine coefficient of vb
    epilogue: Epilogue | None = None,  # fused per-step epilogue (comp /
                                       # discount / obstacle; final substep)
    extras: tuple = (),          # aligned-layout operand arrays indexed by
                                 # the epilogue's *_ex fields (DMA'd center
                                 # blocks; ghost/junk columns never read)
    gamma=0.0,                   # discount factor (traced; SMEM)
    kene_mv=0.0,                 # Kene shift max|target| (traced; SMEM)
    restrict: str | None = None,  # clamp f sign ('min'/'max'/None)
    block_x: int = 8,
    want_eps: bool = False,
    want_alpha: bool = False,    # costate mode only: additionally return
                                 # per-axis masked maxima of the in-kernel
                                 # alphas, accumulated into a (3, yp, zp)
                                 # plane stack — feeds the LAGGED CFL
                                 # bound (one step stale) so long tau
                                 # intervals cannot outrun the frozen
                                 # interval-start bound
    eps_neighbors: bool = False,  # per-window O&F (3.38) epsilon built
                                  # in-kernel from the D1 tables (no SMEM
                                  # eps, no reductions — see
                                  # weno3d._resolve_epsq)
    alpha_ops: tuple = (),       # OPTIONAL 3 precomputed dissipation-bound
                                 # arrays in the aligned layout, DMA'd per
                                 # block INSTEAD of evaluating alpha_fn
                                 # in-kernel (VERDICT r3 #2: systems with
                                 # expensive alphas — flock member maxima —
                                 # trade 3 HBM reads for the VPU cost)
    noise_c=None,                # OPTIONAL (3,) diagonal-noise coefficients
                                 # sigma_i^2/(2 dx_i^2) (traced; SMEM):
                                 # adds the Ito trace-Hessian term as three
                                 # centered second differences IN-KERNEL
                                 # (VERDICT r4 #8; diagonal sigma only —
                                 # mixed terms would read corner ghosts)
    costate_alpha: str | None = None,  # 'local'/'locallocal': evaluate the
                                 # generic costate-box alpha IN-KERNEL from
                                 # the node-local derivL/derivR boxes (ref
                                 # diss_local_laxfried.py:106-121 /
                                 # diss_localsq; VERDICT r4 #1).  'local'
                                 # reads the off-axis GLOBAL box from gbox.
    gbox=None,                   # (gmin tuple, gmax tuple) global costate
                                 # extremes per dim (traced scalars; SMEM)
                                 # — required for costate_alpha='local'
    fill_axes: tuple = (1, 2),   # which output axes get their ghost layers
                                 # filled IN-KERNEL from the updated
                                 # interior; a SHARDED y axis is excluded
                                 # (its ghosts come from the neighbour
                                 # shard via refresh_ghosts_sharded)
    origin=None,                 # per-axis global index offset (3 traced
                                 # int32) — the shard's block start when
                                 # the kernel runs inside shard_map (same
                                 # convention as weno3d.fused_hj_rhs_3d)
) -> jnp.ndarray:
    """One fused RK substep; returns ``out`` in the same aligned layout with
    y/z ghost layers filled (call :func:`refresh_x_ghosts` after).

    With ``want_eps`` the kernel additionally returns ``d1max``: per-axis
    masked maxima of ``D1^2`` over the INPUT ``vb``'s stencil tables,
    accumulated across blocks into a ``(3, yp, zp)`` plane stack (final
    cross-plane max is one tiny XLA reduction).  This feeds the
    lagged-epsilon scheme (VERDICT r2 #5): the next substep's maxOverGrid
    epsilon is taken from THIS substep's input — one substep stale, within
    the dissipation-choice freedom of ref ``hji_solver.py:433-434`` — which
    deletes the standalone full-grid eps pass (2 x ~0.015 ms/step at 101^3)
    at the cost of ~4 VPU ops/elem on tables the kernel already computes.

    Masking: each table is restricted to the index range the standalone
    ``terms.pallas_epsilon`` reduces over (one ghost layer along its own
    axis, interior elsewhere).  Along x the per-block slab tables also
    cover outer-ghost pairs; for both extrapolate ghosts (|D1| there equals
    the edge pair's by construction of the slope fill) and periodic wrap
    (duplicates of interior pairs) these are exact duplicates of in-range
    entries, so the max is unchanged.
    """
    xp, yp, zp = vb.shape
    x, y, z = grid.shape
    zp_e, _, yp_e = aligned_dims(grid)   # aligned_dims returns (zp, ny, yp)
    if (xp, yp, zp) != (x + 6, yp_e, zp_e):
        raise ValueError(f"state shape {vb.shape} != aligned layout "
                         f"{(x + 6, yp_e, zp_e)}")
    if x < block_x:
        block_x = x
    n_blocks = pl.cdiv(x, block_x)
    dtype = vb.dtype
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)
    epi = epilogue
    need_va = (ca != 0.0) or (epi is not None and epi.needs_va)
    n_ex = len(extras)
    n_al = len(alpha_ops)
    if n_al not in (0, 3):
        raise ValueError("alpha_ops must be () or all 3 axes")
    if costate_alpha not in (None, "local", "locallocal"):
        raise ValueError(f"costate_alpha must be 'local'/'locallocal'/None;"
                         f" got {costate_alpha!r}")
    if costate_alpha == "local" and gbox is None:
        raise ValueError("costate_alpha='local' needs the global box gbox")
    if costate_alpha is not None and n_al:
        raise ValueError("costate_alpha excludes alpha_ops")
    if want_alpha and costate_alpha is None:
        raise ValueError("want_alpha is only meaningful in costate mode")

    scaled = inv_eps is not None

    def kernel(eps_ref, inv_ref, sc_ref, params_ref, org_ref, gbox_ref,
               vb_hbm, va_hbm, *rest_io):
        ex_hbm = rest_io[:n_ex]
        al_hbm = rest_io[n_ex:n_ex + n_al]
        out_hbm = rest_io[n_ex + n_al]
        rest = rest_io[n_ex + n_al + 1:]
        if want_eps:
            epsacc, rest = rest[0], rest[1:]
        if want_alpha:
            alphaacc, rest = rest[0], rest[1:]
        (slabs, vas, stages, sems_in, sems_out) = rest[:5]
        exs = rest[5:5 + n_ex]               # one (2, BX, yp, zp) per extra
        als = rest[5 + n_ex:]                # one per precomputed alpha
        tt = sc_ref[0]
        cdt = sc_ref[1]
        gm = sc_ref[2]
        mv = sc_ref[3]
        # noise coefficients ride sc_ref[4:7] (zeros when disabled)

        if want_eps or want_alpha:
            iy = jax.lax.broadcasted_iota(jnp.int32, (yp, zp), 0)
            iz = jax.lax.broadcasted_iota(jnp.int32, (yp, zp), 1)
            y_int = (iy >= 3) & (iy < y + 3)
            z_int = (iz >= 3) & (iz < z + 3)
        if want_eps:
            masks = (y_int & z_int,                          # axis-0 table
                     (iy >= 2) & (iy < y + 4) & z_int,       # axis-1 table
                     y_int & (iz >= 2) & (iz < z + 4))       # axis-2 table
        if want_alpha:
            amask = y_int & z_int    # interior nodes only (ghost/junk
                                     # coords would inflate the bound)

        def acc_eps(bi, ax, d1):
            m = jnp.max(d1 * d1, axis=0)
            m = jnp.where(masks[ax], m, jnp.zeros_like(m))
            if bi > 0:
                m = jnp.maximum(epsacc[ax], m)
            epsacc[ax] = m

        def acc_alpha(bi, ax, a):
            m = jnp.max(jnp.broadcast_to(a, (block_x, yp, zp)), axis=0)
            m = jnp.where(amask, m, jnp.zeros_like(m))
            if bi > 0:
                m = jnp.maximum(alphaacc[ax], m)
            alphaacc[ax] = m

        if eps_neighbors:
            import math as _math

            nb_floor = _math.sqrt(float(jnp.finfo(dtype).tiny))

        def epsq(ax):
            if eps_neighbors:
                return ("neighbors", nb_floor)
            return (eps_ref[ax], inv_ref[ax] if scaled else None)

        def start_x(bi):
            return jnp.minimum(bi * block_x, x - block_x)  # clamped tail

        def in_dmas(slot, bi):
            sx = start_x(bi)
            dmas = [pltpu.make_async_copy(
                vb_hbm.at[pl.ds(sx, block_x + 6)], slabs.at[slot],
                sems_in.at[slot, 0])]
            if need_va:
                dmas.append(pltpu.make_async_copy(
                    va_hbm.at[pl.ds(sx + 3, block_x)], vas.at[slot],
                    sems_in.at[slot, 1]))
            for i in range(n_ex):
                dmas.append(pltpu.make_async_copy(
                    ex_hbm[i].at[pl.ds(sx + 3, block_x)], exs[i].at[slot],
                    sems_in.at[slot, 2 + i]))
            for i in range(n_al):
                dmas.append(pltpu.make_async_copy(
                    al_hbm[i].at[pl.ds(sx + 3, block_x)], als[i].at[slot],
                    sems_in.at[slot, 2 + n_ex + i]))
            return dmas

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                stages.at[slot],
                out_hbm.at[pl.ds(start_x(bi) + 3, block_x)],
                sems_out.at[slot])

        for d in in_dmas(0, 0):
            d.start()
        for bi in range(n_blocks):
            slot = bi % 2
            if bi + 1 < n_blocks:
                for d in in_dmas(1 - slot, bi + 1):
                    d.start()
            for d in in_dmas(slot, bi):
                d.wait()

            g = slabs[slot]                      # (BX+6, yp, zp)
            center = g[3:3 + block_x]            # (BX, yp, zp)
            # ---- axis 0 (untiled): slices
            d1 = (g[1:] - g[:-1]) * inv_dx[0]
            dl0, dr0 = _weno_axis01(d1, 0, block_x, epsq(0))
            # ---- axes 1, 2 (tiled): rotations, full width
            dl1, dr1, d1_1 = _weno_roll_axis(center, 1, inv_dx[1], epsq(1),
                                             want_d1=True)
            dl2, dr2, d1_2 = _weno_roll_axis(center, 2, inv_dx[2], epsq(2),
                                             want_d1=True)
            if want_eps:
                acc_eps(bi, 0, d1)
                acc_eps(bi, 1, d1_1)
                acc_eps(bi, 2, d1_2)

            starts = (org_ref[0] + start_x(bi), org_ref[1] - 3,
                      org_ref[2] - 3)
            p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1), 0.5 * (dl2 + dr2))
            ham = ham_fn(tt, starts, p, params_ref)
            shape = center.shape
            if n_al:
                diss = (0.5 * (dr0 - dl0) * als[0][slot]
                        + 0.5 * (dr1 - dl1) * als[1][slot]
                        + 0.5 * (dr2 - dl2) * als[2][slot])
            elif costate_alpha is not None:
                # generic costate-box alpha IN-KERNEL (VERDICT r4 #1):
                # dim `ax` uses the node-local [min(dl,dr), max(dl,dr)]
                # box the kernel already holds in registers; other dims
                # use the node-local box too (locallocal, ref
                # diss_localsq_laxfried.py:96-105) or the interval-start
                # GLOBAL extremes from SMEM (local, ref
                # diss_local_laxfried.py:106-121)
                pairs = ((dl0, dr0), (dl1, dr1), (dl2, dr2))
                bl = tuple(jnp.minimum(l, r) for l, r in pairs)
                bh = tuple(jnp.maximum(l, r) for l, r in pairs)
                if costate_alpha == "locallocal":
                    # ONE shared box for every axis: all bounds from a
                    # single 4-corner evaluation (System.alpha_all)
                    alphas = alpha_fn(tt, starts, shape, params_ref,
                                      None, bl, bh)
                    diss = sum(0.5 * (dr - dl) * alphas[ax]
                               for ax, (dl, dr) in enumerate(pairs))
                    if want_alpha:
                        for ax in range(3):
                            acc_alpha(bi, ax, alphas[ax])
                else:
                    diss = jnp.zeros(shape, dtype)
                    for ax, (dl, dr) in enumerate(pairs):
                        p_min = tuple(
                            bl[j] if j == ax else gbox_ref[j]
                            for j in range(3))
                        p_max = tuple(
                            bh[j] if j == ax else gbox_ref[3 + j]
                            for j in range(3))
                        a = alpha_fn(tt, starts, shape, params_ref, ax,
                                     p_min, p_max)
                        if want_alpha:
                            acc_alpha(bi, ax, a)
                        diss = diss + 0.5 * (dr - dl) * a
            else:
                diss = (0.5 * (dr0 - dl0)
                        * alpha_fn(tt, starts, shape, params_ref, 0)
                        + 0.5 * (dr1 - dl1)
                        * alpha_fn(tt, starts, shape, params_ref, 1)
                        + 0.5 * (dr2 - dl2)
                        * alpha_fn(tt, starts, shape, params_ref, 2))
            f = -(ham - diss)
            if restrict == "min":
                f = jnp.minimum(f, 0.0)
            elif restrict == "max":
                f = jnp.maximum(f, 0.0)
            if noise_c is not None:
                # diagonal Ito trace-Hessian term, AFTER the restrict
                # clamp (the XLA path's sum_terms adds the noise delta to
                # hj_rhs's already-clamped output — same order here)
                h0 = g[4:4 + block_x] + g[2:2 + block_x] - 2.0 * center
                h1 = _roll(center, -1, 1) + _roll(center, 1, 1) \
                    - 2.0 * center
                h2 = _roll(center, -1, 2) + _roll(center, 1, 2) \
                    - 2.0 * center
                f = f + sc_ref[4] * h0 + sc_ref[5] * h1 + sc_ref[6] * h2

            out = cb * center + cdt * f
            if ca != 0.0:
                out = out + ca * vas[slot]
            if epi is not None:
                # exact order of solver._solve_core's XLA body: comp (or
                # Kene shift-scale-comp) -> Jaime blend -> obstacle mask
                if epi.kene:
                    tgt = exs[epi.comp_ex][slot]
                    vt = (out - mv) * gm
                    ts = tgt - mv
                    out = (jnp.minimum(vt, ts) if epi.comp == "min"
                           else jnp.maximum(vt, ts)) + mv
                elif epi.comp is not None:
                    if epi.comp_src == "va":
                        src = vas[slot]
                    elif epi.comp_src == "vb":
                        src = center
                    else:
                        src = exs[epi.comp_ex][slot]
                    out = (jnp.minimum(out, src) if epi.comp == "min"
                           else jnp.maximum(out, src))
                if epi.jaime_ex is not None:
                    out = gm * out + (1.0 - gm) * exs[epi.jaime_ex][slot]
                if epi.obs_ex is not None:
                    out = jnp.maximum(out, exs[epi.obs_ex][slot])

            # ghost fill of the OUTPUT (y then z) from the updated interior
            if 1 in fill_axes:
                out = _fill_ghost(out, 1, y, grid.periodic[1])
            if 2 in fill_axes:
                out = _fill_ghost(out, 2, z, grid.periodic[2])

            if bi >= 2:
                out_dma(slot, bi - 2).wait()
            stages[slot] = out
            out_dma(slot, bi).start()
        for bi in (n_blocks - 2, n_blocks - 1):
            if bi >= 0:
                out_dma(bi % 2, bi).wait()

    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    out_shape = jax.ShapeDtypeStruct((xp, yp, zp), dtype)
    if want_eps or want_alpha:
        out_specs = [out_specs]
        out_shape = [out_shape]
        if want_eps:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((3, yp, zp), dtype))
        if want_alpha:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((3, yp, zp), dtype))
    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv_eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [t, cd, gamma, mv]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # origin
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gbox (3 mins, 3 maxs)
            pl.BlockSpec(memory_space=pltpu.HBM),    # vb
            pl.BlockSpec(memory_space=pltpu.HBM),    # va
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * (n_ex + n_al),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, block_x + 6, yp, zp), dtype),   # vb slabs
            pltpu.VMEM((2, block_x, yp, zp), dtype),       # va centers
            pltpu.VMEM((2, block_x, yp, zp), dtype),       # out stages
            pltpu.SemaphoreType.DMA((2, 2 + n_ex + n_al)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + [pltpu.VMEM((2, block_x, yp, zp), dtype)       # extras + alphas
             for _ in range(n_ex + n_al)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.broadcast_to(jnp.asarray(eps, dtype), (3,)),
        jnp.broadcast_to(jnp.asarray(
            eps if inv_eps is None else inv_eps, dtype), (3,)),
        jnp.concatenate([
            jnp.stack([jnp.asarray(t, dtype), jnp.asarray(cd, dtype),
                       jnp.broadcast_to(jnp.asarray(gamma, dtype), ()),
                       jnp.broadcast_to(jnp.asarray(kene_mv, dtype), ())]),
            (jnp.zeros((3,), dtype) if noise_c is None
             else jnp.asarray(noise_c, dtype).reshape(3))]),
        jnp.asarray(params, dtype).reshape(-1),
        (jnp.zeros((3,), jnp.int32) if origin is None
         else jnp.stack([jnp.asarray(o, jnp.int32) for o in origin])),
        (jnp.zeros((6,), dtype) if gbox is None
         else jnp.stack([jnp.asarray(s, dtype)
                         for s in (*gbox[0], *gbox[1])])),
        vb,
        va,
        *extras,
        *alpha_ops,
    )
    return out


# --------------------------------------------------------------- full RK step
def initial_epsilon(grid: Grid, cfg, vq, ops=None):
    """Starting WENO epsilon for :func:`fused_rk_step`'s lagged carry,
    computed with the standalone full-grid pass (exact maxOverGrid of the
    interval's initial state).  Pass the sharded ``GridOps`` inside
    shard_map so the reduction pmax-es across shards."""
    from ..terms import local_ops, pallas_epsilon

    return pallas_epsilon(grid, cfg, vq, ops or local_ops(grid))


def fused_rk_step(grid: Grid, cfg, system, t, vq, t_target, alpha_bounds,
                  comp, eps, origin=None, shard=None, extras=(),
                  gamma=0.0, kene_mv=0.0, alpha_ops=(),
                  costate_mode=None, gbox=None, noise_c=None, sb=None,
                  noise_sb_inv=None):
    """One CFL-limited TVD-RK step on the aligned state ``vq`` with the
    solver's per-step epilogue fused into the final substep; returns
    ``(t_new, v_new, eps_new)``.

    Exactly mirrors ``integration.cfl_step`` + the solver's per-step
    ``apply_comp`` + obstacle masking (ref ``hji_solver.py:536-644``).
    ``comp`` is either the legacy 'min'/'max'/None shorthand (minVOverTime/
    maxVOverTime against the step-start value) or a full :class:`Epilogue`
    with operand arrays in ``extras`` (aligned layout; see the solver's
    fused-path assembly) and the discount scalars ``gamma``/``kene_mv``.
    ``alpha_bounds`` supplies the CFL step bound — precomputed
    (time-invariant alphas) or the interval-start refresh
    (``terms.costate_alpha_bounds``); either way ``dt`` is a pure function
    of remaining time inside the interval.

    ``costate_mode`` ('local'/'locallocal') switches the dissipation to
    IN-KERNEL generic costate-box alphas (VERDICT r4 #1): each substep
    evaluates ``system.alpha`` at the CURRENT node-local derivL/derivR
    box; 'local' additionally reads the interval-start global extremes
    from ``gbox`` (see ``terms.costate_alpha_bounds`` for lag semantics).
    In costate mode pass ``sb`` — the CFL step bound CARRY: this step's
    dt uses it, and the kernel's own per-substep alpha maxima produce
    ``sb_next`` for the next step (returned as a 4th element).  The bound
    is thus one step stale (covered by factor_cfl < 1) instead of frozen
    for a whole tau interval — a long interval's evolving costate cannot
    outrun it (the r5 hazard: a zero initial velocity-costate froze a
    3.5x-too-large dt across a single [0, 3 s] interval).  Seed with the
    exact interval-start bound (``terms.costate_alpha_bounds``).
    The system's ``opt_control``/``opt_disturbance``/``dynamics`` then run
    INSIDE the kernel, so they must use Mosaic-lowerable ops — sign, abs,
    min/max, sqrt, sin/cos and arithmetic are fine; ``atan2`` is NOT
    (probed 2026-08-21): formulate direction controls as unit vectors
    ``(p_i/|p|, p_j/|p|)`` instead of angles (faster on the VPU anyway).

    ``eps`` is the per-axis WENO epsilon carried across substeps.  For
    ``maxOverGrid`` it is LAGGED: each substep consumes the epsilon
    computed by the previous substep's kernel epilogue from its own input
    (seed the loop with :func:`initial_epsilon`).  The epsilon is a free
    regularization parameter of the dissipation scheme (ref
    ``hji_solver.py:433-434``); one-substep staleness shifts the WENO
    weights by O(dt) and is covered by the accuracy gate vs the f64 oracle
    (bench_all ``accuracy_101`` row).  For ``constant`` the carry passes
    through untouched.

    Sharded execution (inside shard_map; grids sharded over x and/or y):
    pass the LOCAL block grid, ``origin`` = per-axis global block starts,
    and ``shard = ({grid axis: mesh-axis name}, all mesh axis names)``
    (the legacy ``(x mesh-axis name, names)`` form still means x-only) —
    sharded axes' ghost layers refresh via ppermute halo exchanges
    (in-kernel y fill is disabled for a sharded y) and the lagged epsilon
    pmax-reduces so every shard agrees.
    """
    import math as _math

    from .weno3d import system_closures

    dtype = vq.dtype
    flat_params, ham_fn, alpha_fn = system_closures(grid, system, dtype)
    want_a = costate_mode is not None and sb is not None
    bound = sb if want_a else alpha_bounds.step_bound
    dt = jnp.minimum(cfg.factor_cfl * bound, t_target - t)
    if cfg.max_step != float("inf"):
        dt = jnp.minimum(dt, cfg.max_step)

    scaled = cfg.epsilon_method == "maxOverGrid"
    neighbors = cfg.epsilon_method == "maxOverNeighbors"
    floor = _math.sqrt(float(jnp.finfo(dtype).tiny))
    if isinstance(comp, str):
        comp = Epilogue(comp=comp)           # legacy 'min'/'max' shorthand
    epi = comp
    smap, mesh_names = shard_spec(shard)
    fill_axes = tuple(a for a in (1, 2) if a not in smap)

    alpha_planes = []   # per-substep (3, yp, zp) maxima (costate carry)

    def sub(vb, va, eps, tt, cd, ca, cb, fuse_epi):
        r = fused_substep_3d(
            grid, ham_fn, alpha_fn, vb, va, eps, tt,
            (1.0 / eps) if scaled else None, cd, flat_params,
            ca=ca, cb=cb, epilogue=fuse_epi,
            extras=extras if fuse_epi is not None else (),
            gamma=gamma, kene_mv=kene_mv,
            restrict=cfg.restrict_update, want_eps=scaled,
            want_alpha=want_a,
            eps_neighbors=neighbors, alpha_ops=alpha_ops,
            costate_alpha=costate_mode, gbox=gbox, noise_c=noise_c,
            fill_axes=fill_axes, origin=origin)
        parts = list(r) if isinstance(r, (tuple, list)) else [r]
        o = parts.pop(0)
        if scaled:
            d1max = parts.pop(0)
            eps_next = 1e-6 * jnp.max(d1max, axis=(1, 2)) + floor
            if shard is not None:
                eps_next = jax.lax.pmax(eps_next, mesh_names)
        else:
            eps_next = eps
        if want_a:
            alpha_planes.append(parts.pop(0))
        if shard is not None:
            o = refresh_sharded_axes(grid, o, smap)
            if 0 not in smap:
                # unsharded x still needs the local BC ghost-row refresh
                # (the kernel writes center rows only)
                o = refresh_x_ghosts(grid, o)
            return o, eps_next
        return refresh_x_ghosts(grid, o), eps_next

    if cfg.rk_order == 1:
        # the substep input IS the step-start value: source the comp there
        epi1 = (dataclasses.replace(epi, comp_src="vb")
                if epi is not None and epi.needs_va else epi)
        v_new, eps = sub(vq, vq, eps, t, dt, 0.0, 1.0, epi1)
    elif cfg.rk_order == 2:
        v1, eps = sub(vq, vq, eps, t, dt, 0.0, 1.0, None)
        v_new, eps = sub(v1, vq, eps, t + dt, 0.5 * dt, 0.5, 0.5, epi)
    elif cfg.rk_order == 3:
        v1, eps = sub(vq, vq, eps, t, dt, 0.0, 1.0, None)
        v2, eps = sub(v1, vq, eps, t + dt, 0.25 * dt, 0.75, 0.25, None)
        v_new, eps = sub(v2, vq, eps, t + 0.5 * dt, (2.0 / 3.0) * dt,
                         1.0 / 3.0, 2.0 / 3.0, epi)
    else:
        raise ValueError(f"rk_order must be 1, 2 or 3; got {cfg.rk_order}")
    if want_a:
        # next step's CFL bound from THIS step's in-kernel alpha maxima
        # (max over every substep; one step stale)
        am = alpha_planes[0]
        for p_ in alpha_planes[1:]:
            am = jnp.maximum(am, p_)
        a_ax = jnp.max(am, axis=(1, 2))
        if shard is not None:
            a_ax = jax.lax.pmax(a_ax, mesh_names)
        sb_inv = sum(a_ax[i] / grid.dx[i] for i in range(3))
        if noise_sb_inv is not None:
            # keep the parabolic (diffusion) CFL contribution the seed
            # carried — dropping it would let a diffusion-dominated noise
            # term outrun its explicit stability limit from step 2 on
            sb_inv = sb_inv + noise_sb_inv
        sb_next = 1.0 / sb_inv
        return t + dt, v_new, eps, sb_next
    return t + dt, v_new, eps
