"""Packed-plane variant of the fused RK-substep kernel.

The aligned layout of ``kernels/hjstep.py`` keeps the value function as
``(x+6, yp, zp)`` with ``zp`` a 128 multiple and ``yp`` an 8 multiple — at
101³ that processes 104·128 = 13312 lanes per transverse plane for
107·107 = 11449 real (ghost-padded) nodes, ~14% pure junk compute on a
VPU-roofline-bound kernel (see CLAUDE.md perf notes).

This module instead PACKS the whole ghost-padded (y, z) plane into ONE lane
axis: state layout ``(xp, L)`` with packed lane ``i = yi*(z+6) + zi`` and
``L = pad128((y+6)*(z+6))`` — only the tail of the last vreg row is junk
(71/11520 lanes at 101³).  Stencil shifts become lane rotations with a
STRIDE: ±k for the z axis, ±k·(z+6) for the y axis (``pltpu.roll`` handles
arbitrary amounts), and the x axis stays on leading-dim slices.

In a 2-D buffer the row axis IS the sublane dim, so Mosaic requires every
DMA row slice to be 8-aligned/8-sized.  Rows are therefore laid out as::

    [0, 5)        junk   (never read by interior stencils)
    [5, 8)        x lo ghosts
    [8, 8+x)      interior
    [8+x, 8+x+3)  x hi ghosts
    ...xp         junk   (xp = ceil(x/8)*8 + 16)

so block ``bi`` reads rows ``[8·bi, 8·bi + 24)`` and writes
``[8 + 8·bi, 8 + 8·bi + 8)`` — both 8-aligned, no tail clamp (the last
block writes junk rows past the interior).  Junk rows/lanes integrate
garbage; they are never read by interior stencils, the x-ghost refresh, the
epsilon reduction, or :func:`lower`.

Everything else matches ``hjstep.fused_substep_3d``: one full TVD-RK
substep per launch (WENO5 L/R on all axes, in-kernel Hamiltonian +
dissipation from iota-reconstructed coordinates, comp-method fusion,
in-kernel y/z output ghost fill), with the 6 x-ghost rows refreshed by an
XLA post-pass between substeps.

Cross-block windows are exactly the packing working for us: a y-stencil
read ``i ± k·(z+6)`` lands in the neighbouring y-row of the SAME transverse
plane, and z windows of interior outputs never leave their (z+6)-lane row.
Wrap-around garbage only reaches ghost/junk output lanes, which the in-
kernel fill overwrites or the final :func:`lower` slice discards.

Numerics are identical to the aligned kernel (same shared-table WENO5,
same fill order y-then-z); equality to the XLA path is asserted in
``tests/test_pallas_kernel.py`` for both layouts.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..boundary import pad_axis
from ..grid import Grid
from .weno3d import _smoothness, _weno_axis01, _weno_combine, flatten_system

__all__ = ["packed_dims", "lift", "lower", "refresh_x_ghosts",
           "packed_epsilon", "fused_substep_packed", "fused_rk_step"]

BLOCK_X = 8          # fixed: row DMA offsets/sizes must be 8-aligned
ROW0 = 8             # first interior row (rows [5, 8) are the x lo ghosts)


def packed_dims(grid: Grid) -> tuple[int, int, int, int]:
    """``(L, ys, zs, xp)``: padded lane count, ghost-padded y/z widths and
    the 8-aligned row count."""
    x, y, z = grid.shape
    ys, zs = y + 6, z + 6
    L = -(-(ys * zs) // 128) * 128
    xp = -(-x // BLOCK_X) * BLOCK_X + 2 * ROW0
    return L, ys, zs, xp


# --------------------------------------------------------------- layout moves
def lift(grid: Grid, v: jnp.ndarray) -> jnp.ndarray:
    """Grid-shaped value function -> packed ghost-padded ``(xp, L)``."""
    for axis in range(3):
        v = pad_axis(grid, v, axis, 3)
    L, ys, zs, xp = packed_dims(grid)
    v = v.reshape(v.shape[0], ys * zs)
    return jnp.pad(v, ((ROW0 - 3, xp - v.shape[0] - (ROW0 - 3)),
                       (0, L - ys * zs)))


def lower(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Packed ghost-padded array -> interior grid-shaped view."""
    x, y, z = grid.shape
    _, ys, zs, _ = packed_dims(grid)
    v = jax.lax.slice(vq, (ROW0, 0), (ROW0 + x, ys * zs)).reshape(x, ys, zs)
    return jax.lax.slice(v, (0, 3, 3), (x, 3 + y, 3 + z))


def refresh_x_ghosts(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Recompute the 6 x-ghost ROWS (``[5, 8)`` and ``[8+x, 8+x+3)``) from
    the interior — XLA ``dynamic_update_slice`` post-pass, O(surface).
    Matches ``boundary.pad_periodic`` / ``pad_extrapolate``."""
    x = grid.shape[0]
    if grid.periodic[0]:
        glo = jax.lax.slice_in_dim(vq, ROW0 + x - 3, ROW0 + x, axis=0)
        ghi = jax.lax.slice_in_dim(vq, ROW0, ROW0 + 3, axis=0)
    else:
        edge_lo = jax.lax.slice_in_dim(vq, ROW0, ROW0 + 1, axis=0)
        inner_lo = jax.lax.slice_in_dim(vq, ROW0 + 1, ROW0 + 2, axis=0)
        slope_lo = jnp.abs(edge_lo - inner_lo) * jnp.sign(edge_lo)
        glo = jnp.concatenate(
            [edge_lo + k * slope_lo for k in (3.0, 2.0, 1.0)], axis=0)
        edge_hi = jax.lax.slice_in_dim(vq, ROW0 + x - 1, ROW0 + x, axis=0)
        inner_hi = jax.lax.slice_in_dim(vq, ROW0 + x - 2, ROW0 + x - 1,
                                        axis=0)
        slope_hi = jnp.abs(edge_hi - inner_hi) * jnp.sign(edge_hi)
        ghi = jnp.concatenate(
            [edge_hi + k * slope_hi for k in (1.0, 2.0, 3.0)], axis=0)
    vq = jax.lax.dynamic_update_slice_in_dim(vq, glo, ROW0 - 3, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(vq, ghi, ROW0 + x, axis=0)


def packed_epsilon(grid: Grid, cfg, vq: jnp.ndarray) -> jnp.ndarray:
    """Per-axis WENO epsilon on the packed layout, shape ``(3,)``.

    Identical values to ``terms.pallas_epsilon`` (reference semantics
    ``upwind_first_weno5a.py:153-155``: 1e-6 · max(D1²) over the
    one-ghost-layer window per axis, interior on the other axes) — the D1
    entries are selected by iota masks instead of slices."""
    dtype = vq.dtype
    if cfg.epsilon_method == "constant":
        return jnp.full((3,), 1e-6, dtype)
    import math as _math

    floor = _math.sqrt(float(jnp.finfo(dtype).tiny))
    x, y, z = grid.shape
    L, ys, zs, _ = packed_dims(grid)
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    yi = lane // zs
    zi = lane % zs
    y_int = (yi >= 3) & (yi < 3 + y)
    z_int = (zi >= 3) & (zi < 3 + z)

    def mx(d, mask):
        return 1e-6 * jnp.max(jnp.where(mask, d * d, 0.0)) + floor

    r = jax.lax.slice_in_dim(vq, ROW0, ROW0 + x, axis=0)
    d0 = (jax.lax.slice_in_dim(vq, ROW0, ROW0 + x + 1, axis=0)
          - jax.lax.slice_in_dim(vq, ROW0 - 1, ROW0 + x, axis=0)) \
        / grid.dx[0]
    e0 = mx(d0, y_int & z_int)
    d1 = (jnp.roll(r, -zs, axis=1) - r) / grid.dx[1]
    e1 = mx(d1, (yi >= 2) & (yi < 3 + y) & z_int)
    d2 = (jnp.roll(r, -1, axis=1) - r) / grid.dx[2]
    e2 = mx(d2, y_int & (zi >= 2) & (zi < 3 + z))
    return jnp.stack([e0, e1, e2])


def system_closures_packed(grid: Grid, system, dtype, zs: int):
    """Packed-layout analog of ``weno3d.system_closures``: coordinates are
    reconstructed from the packed lane index (``yi = lane // zs``,
    ``zi = lane % zs``), so y/z coords are full-(1, L) vectors while x stays
    a (BX, 1) column.  Junk lanes get out-of-domain coordinates that only
    feed junk outputs."""
    flat_params, rebuild = flatten_system(system, dtype)

    def coords_at(sx, shape):
        bx, L = shape
        xi = jax.lax.broadcasted_iota(jnp.int32, (bx, 1), 0) + sx
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        yi = lane // zs - 3
        zi = lane % zs - 3
        return (
            grid.lo[0] + xi.astype(dtype) * grid.dx[0],
            grid.lo[1] + yi.astype(dtype) * grid.dx[1],
            grid.lo[2] + zi.astype(dtype) * grid.dx[2],
        )

    def ham_fn(tt, sx, p, params_ref):
        sys_k = rebuild(params_ref)
        return sys_k.hamiltonian(tt, coords_at(sx, p[0].shape), p)

    def alpha_fn(tt, sx, shape, params_ref, axis):
        sys_k = rebuild(params_ref)
        return sys_k.alpha(tt, coords_at(sx, shape), None, None, axis)

    return flat_params, ham_fn, alpha_fn


# ------------------------------------------------------------- kernel helpers
def _roll(a, s):
    # pltpu.roll demands non-negative shifts; rotate modulo lane width
    return pltpu.roll(a, s % a.shape[1], 1)


def _weno_strided(g, stride, inv_dx, epsq):
    """derivL/derivR along a packed axis via strided lane rotations.

    Same shared-table formulation as ``hjstep._weno_roll_axis`` with every
    shift scaled by ``stride`` (1 for z, z+6 for y).  Lanes whose windows
    cross a packed row boundary are ghost/junk outputs the caller
    overwrites or discards."""
    d1 = (_roll(g, -stride) - g) * inv_dx
    w = tuple(_roll(d1, (3 - k) * stride) for k in range(5))
    u5 = _roll(d1, -2 * stride)
    p1l = w[0] * (1 / 3) - w[1] * (7 / 6) + w[2] * (11 / 6)
    p2l = -w[1] * (1 / 6) + w[2] * (5 / 6) + w[3] * (1 / 3)
    p3l = w[2] * (1 / 3) + w[3] * (5 / 6) - w[4] * (1 / 6)
    p1r = w[3] * (11 / 6) - w[4] * (7 / 6) + u5 * (1 / 3)
    s1, s2, s3 = _smoothness(*w)
    dl = _weno_combine((p1l, p2l, p3l), (s1, s2, s3), epsq)
    dr = _weno_combine(
        (p1r, p3l, p2l),
        (_roll(s3, -stride), _roll(s2, -stride), _roll(s1, -stride)), epsq)
    return dl, dr


def _fill_ghost_packed(a, pos, stride, n, periodic):
    """Overwrite the 3 ghost layers of one packed axis from the interior.

    ``pos`` is the per-lane padded index along the axis (``lane % zs`` for
    z, ``lane // zs`` for y); ghosts sit at ``pos`` in [0,3) and [n+3,n+6).
    Roll-based: the ghost at distance k from the edge reads the edge/inner
    values through rotations of ±k·stride — matching
    ``boundary.pad_periodic`` / ``pad_extrapolate`` exactly."""
    if periodic:
        a = jnp.where(pos < 3, _roll(a, -n * stride), a)
        return jnp.where((pos >= n + 3) & (pos < n + 6),
                         _roll(a, n * stride), a)
    r = [_roll(a, -k * stride) for k in range(1, 5)]
    for k in (1, 2, 3):
        edge, inner = r[k - 1], r[k]
        val = edge + k * jnp.abs(edge - inner) * jnp.sign(edge)
        a = jnp.where(pos == 3 - k, val, a)
    rh = [_roll(a, k * stride) for k in range(1, 5)]
    for k in (1, 2, 3):
        edge, inner = rh[k - 1], rh[k]
        val = edge + k * jnp.abs(edge - inner) * jnp.sign(edge)
        a = jnp.where(pos == n + 2 + k, val, a)
    return a


# ------------------------------------------------------------------ the kernel
def fused_substep_packed(
    grid: Grid,
    ham_fn: Callable,
    alpha_fn: Callable,
    vb: jnp.ndarray,             # (xp, L) packed ghost-padded, stencil input
    va: jnp.ndarray,             # same layout; affine/comp operand
    eps,                         # WENO epsilon per axis, shape (3,)
    t,                           # substep time (traced scalar)
    inv_eps,                     # per-axis 1/eps (3,) or None
    cd,                          # coefficient of f: rk_coef * dt (traced)
    params: jnp.ndarray,         # flat system parameters (SMEM)
    *,
    ca: float,                   # static affine coefficient of va
    cb: float,                   # static affine coefficient of vb
    comp: str | None = None,     # fuse comp-method: 'min'/'max'/None
    comp_src: str = "va",        # comp operand: 'va' or 'vb'
    restrict: str | None = None,  # clamp f sign ('min'/'max'/None)
) -> jnp.ndarray:
    """One fused RK substep on the packed layout; returns ``out`` with y/z
    ghost lanes filled (call :func:`refresh_x_ghosts` after)."""
    xq, Lq = vb.shape
    x, y, z = grid.shape
    L, ys, zs, xp = packed_dims(grid)
    if (xq, Lq) != (xp, L):
        raise ValueError(f"state shape {vb.shape} != packed layout "
                         f"{(xp, L)}")
    bx = BLOCK_X
    n_blocks = pl.cdiv(x, bx)
    dtype = vb.dtype
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)
    need_va = (ca != 0.0) or (comp is not None and comp_src == "va")

    scaled = inv_eps is not None
    slab_rows = bx + 2 * ROW0    # 8-aligned input span per block

    def kernel(eps_ref, inv_ref, sc_ref, params_ref, vb_hbm, va_hbm, out_hbm,
               slabs, vas, stages, sems_in, sems_out):
        tt = sc_ref[0]
        cdt = sc_ref[1]

        def epsq(ax):
            return (eps_ref[ax], inv_ref[ax] if scaled else None)

        def in_dmas(slot, bi):
            dmas = [pltpu.make_async_copy(
                vb_hbm.at[pl.ds(bi * bx, slab_rows)], slabs.at[slot],
                sems_in.at[slot, 0])]
            if need_va:
                dmas.append(pltpu.make_async_copy(
                    va_hbm.at[pl.ds(ROW0 + bi * bx, bx)], vas.at[slot],
                    sems_in.at[slot, 1]))
            return dmas

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                stages.at[slot],
                out_hbm.at[pl.ds(ROW0 + bi * bx, bx)],
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

            # rows [5, bx+11) of the slab = stencil span (interior ± 3)
            g = slabs[slot][ROW0 - 3:ROW0 + bx + 3]   # (bx+6, L)
            center = g[3:3 + bx]                      # (bx, L)
            # ---- axis 0 (untiled in VMEM): slices
            d1 = (g[1:] - g[:-1]) * inv_dx[0]
            dl0, dr0 = _weno_axis01(d1, 0, bx, epsq(0))
            # ---- axes 1, 2: strided lane rotations, full width
            dl1, dr1 = _weno_strided(center, zs, inv_dx[1], epsq(1))
            dl2, dr2 = _weno_strided(center, 1, inv_dx[2], epsq(2))

            sx = bi * bx    # interior x index of the block's first row
            p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1), 0.5 * (dl2 + dr2))
            ham = ham_fn(tt, sx, p, params_ref)
            shape = center.shape
            diss = (0.5 * (dr0 - dl0) * alpha_fn(tt, sx, shape, params_ref, 0)
                    + 0.5 * (dr1 - dl1)
                    * alpha_fn(tt, sx, shape, params_ref, 1)
                    + 0.5 * (dr2 - dl2)
                    * alpha_fn(tt, sx, shape, params_ref, 2))
            f = -(ham - diss)
            if restrict == "min":
                f = jnp.minimum(f, 0.0)
            elif restrict == "max":
                f = jnp.maximum(f, 0.0)

            out = cb * center + cdt * f
            if ca != 0.0:
                out = out + ca * vas[slot]
            if comp is not None:
                src = vas[slot] if comp_src == "va" else center
                out = (jnp.minimum(out, src) if comp == "min"
                       else jnp.maximum(out, src))

            # ghost fill of the OUTPUT (y then z, matching the aligned
            # kernel and sequential XLA pad order where it matters)
            lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
            out = _fill_ghost_packed(out, lane // zs, zs, y,
                                     grid.periodic[1])
            out = _fill_ghost_packed(out, lane % zs, 1, z, grid.periodic[2])

            if bi >= 2:
                out_dma(slot, bi - 2).wait()
            stages[slot] = out
            out_dma(slot, bi).start()
        for bi in (n_blocks - 2, n_blocks - 1):
            if bi >= 0:
                out_dma(bi % 2, bi).wait()

    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv_eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [t, cd]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.HBM),    # vb
            pl.BlockSpec(memory_space=pltpu.HBM),    # va
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((xp, L), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, L), dtype),     # vb slabs
            pltpu.VMEM((2, bx, L), dtype),            # va centers
            pltpu.VMEM((2, bx, L), dtype),            # out stages
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.broadcast_to(jnp.asarray(eps, dtype), (3,)),
        jnp.broadcast_to(jnp.asarray(
            eps if inv_eps is None else inv_eps, dtype), (3,)),
        jnp.stack([jnp.asarray(t, dtype), jnp.asarray(cd, dtype)]),
        jnp.asarray(params, dtype).reshape(-1),
        vb,
        va,
    )
    return out


# --------------------------------------------------------------- full RK step
def fused_rk_step(grid: Grid, cfg, system, t, vq, t_target, alpha_bounds,
                  comp: str | None):
    """One CFL-limited TVD-RK step on the packed state ``vq`` — drop-in for
    ``hjstep.fused_rk_step`` (same contract, packed layout)."""
    dtype = vq.dtype
    _, _, zs, _ = packed_dims(grid)
    flat_params, ham_fn, alpha_fn = system_closures_packed(
        grid, system, dtype, zs)
    dt = jnp.minimum(cfg.factor_cfl * alpha_bounds.step_bound, t_target - t)
    if cfg.max_step != float("inf"):
        dt = jnp.minimum(dt, cfg.max_step)

    scaled = cfg.epsilon_method == "maxOverGrid"

    def sub(vb, va, tt, cd, ca, cb, fuse_comp, comp_src="va"):
        eps = packed_epsilon(grid, cfg, vb)
        o = fused_substep_packed(
            grid, ham_fn, alpha_fn, vb, va, eps, tt,
            (1.0 / eps) if scaled else None, cd, flat_params,
            ca=ca, cb=cb, comp=fuse_comp, comp_src=comp_src,
            restrict=cfg.restrict_update)
        return refresh_x_ghosts(grid, o)

    if cfg.rk_order == 1:
        v_new = sub(vq, vq, t, dt, 0.0, 1.0, comp, comp_src="vb")
    elif cfg.rk_order == 2:
        v1 = sub(vq, vq, t, dt, 0.0, 1.0, None)
        v_new = sub(v1, vq, t + dt, 0.5 * dt, 0.5, 0.5, comp)
    elif cfg.rk_order == 3:
        v1 = sub(vq, vq, t, dt, 0.0, 1.0, None)
        v2 = sub(v1, vq, t + dt, 0.25 * dt, 0.75, 0.25, None)
        v_new = sub(v2, vq, t + 0.5 * dt, (2.0 / 3.0) * dt,
                    1.0 / 3.0, 2.0 / 3.0, comp)
    else:
        raise ValueError(f"rk_order must be 1, 2 or 3; got {cfg.rk_order}")
    return t + dt, v_new
