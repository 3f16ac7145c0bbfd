"""Fused Pallas TPU kernel: 3-D HJ right-hand side for a batch-LAST sweep.

The batch-last solver (``solve_batch``) lays a scenario sweep out as
``(x, y, z, B)`` — the B axis rides the 128-wide vector lanes, so a sweep of
small grids runs at full lane utilization (zero junk lanes when ``B`` is a
multiple of 128).  Its XLA path, however, still evaluates the WENO chain as
~25 separate full-array passes per RHS; at sweep sizes (31^3 x 1024 = 122 MB
working set) that is exactly the "HBM-working-set bound" regime the r2 notes
measured at 225 solves/s.

This kernel computes the ENTIRE right-hand side for a ``(bx, by, z, 128)``
block inside VMEM — derivL/derivR for all three grid axes, the Hamiltonian,
the per-axis dissipation bounds, and the LF dissipation sum — with steady
state HBM traffic of ``read(V_pad block) + write(V_dot block)``.  The layout
is the mirror image of the single-grid slab kernel (``weno3d.py``):

  * NO grid axis is the lane axis, so axes 0 and 1 use plain (free) slices
    on untiled leading dims and axis 2 (the sublane axis) uses the rotation
    trick from ``hjstep._weno_roll_axis``; the lane axis (scenarios) is
    never sliced or rotated at all.
  * Per-scenario quantities — the WENO epsilon (maxOverGrid is a
    per-scenario reduction in batch mode) and every system parameter leaf —
    are ``(B,)`` vectors that broadcast along the lanes.  They travel to the
    kernel as rows of ONE packed ``(R, B)`` f32 array (eps / 1-over-eps /
    flattened system leaves) and each block DMAs its 128-lane column chunk.
  * Dissipation bounds are evaluated IN KERNEL from iota-reconstructed
    coordinates + the packed parameters (valid for ``alpha_time_invariant``
    systems, the precondition for the solver's precomputed-CFL fast path),
    so alphas never touch HBM — unlike the single-grid kernel, which DMAs
    three pre-widened alpha arrays.
  * Blocks are driven by a ``fori_loop`` unrolled in PAIRS so the
    double-buffer slot is static (Mosaic-friendly scratch indexing) while
    block offsets stay dynamic — at sweep sizes there are dozens of blocks
    and a fully unrolled program would blow up remote compile time.

Reference anchor: this replaces the per-scenario rerun loop around
``HJIPDE_solve`` (``ValueFuncs/hji_solver.py:509``; ``Notes/rcbrt_cp.ipynb``
cell 6) that LevelSetPy users run for disturbance sweeps.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from .hjstep import _weno_roll_axis
from .weno3d import _weno_axis01

__all__ = ["fused_hj_rhs_batch", "fused_substep_batch",
           "fused_rk_step_batch", "initial_epsilon_batch",
           "lift_batch", "lower_batch",
           "refresh_xy_ghosts_batch", "fits_vmem_batch", "pick_blocks",
           "batch_system_closures", "batch_leaves_ok", "LANE_CHUNK"]

#: lane-axis chunk each block processes (one full vreg width)
LANE_CHUNK = 128

#: packed-row layout: rows 0-2 = per-axis eps, 3-5 = per-axis 1/eps,
#: 6 = per-scenario time (batch elements integrate at their own CFL pace,
#: so t is a (B,) vector), 7 = per-scenario RK substep coefficient
#: cdt = rk_coef * dt (only the substep kernel reads it), 8 = per-scenario
#: discount factor gamma, 9 = per-scenario Kene shift max|target| (both
#: read only by the fused epilogue), 10.. = flattened system parameter
#: leaves
_T_ROW = 6
_CDT_ROW = 7
_GAMMA_ROW = 8
_MV_ROW = 9
_PARAM_ROW0 = 10


def _aligned_z(grid: Grid) -> int:
    """Ghost-padded z width rounded up to a sublane (8) multiple — the
    kernel's DMA slices keep the trailing two dims (z, B) whole, so only
    tile alignment of this dim is needed."""
    return -(-(grid.shape[2] + 6) // 8) * 8


def batch_leaves_ok(system, n_batch: int) -> bool:
    """True when every system leaf is a scalar or a ``(B,)`` scenario batch
    — the shapes the packed parameter rows can carry."""
    for leaf in jax.tree.leaves(system):
        shp = jnp.shape(leaf)
        if shp not in ((), (n_batch,)):
            return False
    return True


def fits_vmem_batch(grid: Grid, n_batch: int, block_x: int, block_y: int,
                    lane_chunk: int = LANE_CHUNK, dtype_bytes: int = 4,
                    budget_bytes: int = 12 * 1024 * 1024,
                    n_extras: int = 0) -> bool:
    """Feasibility of the double-buffered working set for given block dims
    (``n_extras`` = fused-epilogue operand streams, 2 buffers each)."""
    if grid.ndim != 3 or n_batch % lane_chunk or lane_chunk % LANE_CHUNK:
        return False
    x, y, _ = grid.shape
    bx, by = min(block_x, x), min(block_y, y)
    zs = _aligned_z(grid)
    slab = (bx + 6) * (by + 6) * zs * lane_chunk * dtype_bytes
    interior = bx * by * zs * lane_chunk * dtype_bytes
    # 2 slabs + 2 out stages + ~10 live interior-sized WENO temporaries
    # + 2 double-buffered blocks per epilogue operand
    return 2 * slab + 2 * interior + 10 * interior \
        + 2 * n_extras * interior < budget_bytes


def pick_blocks(grid: Grid, n_batch: int,
                n_extras: int = 0) -> tuple[int, int, int] | None:
    """Largest (block_x, block_y, lane_chunk) preference that fits VMEM.

    A lane chunk covering the WHOLE batch keeps every DMA run contiguous
    (slicing k of B lanes strides the copy into 4*k-byte runs); bigger
    (bx, by) blocks amortize the ghost-overlap re-reads.  The v5e budget
    caps both well below the single-grid kernel's because every temp
    carries the scenario lanes.
    """
    best = None
    for lc in (min(n_batch, 512), min(n_batch, 256), LANE_CHUNK):
        if lc % LANE_CHUNK:
            continue
        for bx, by in ((8, 8), (8, 4), (4, 4), (4, 2), (2, 2), (1, 1)):
            if fits_vmem_batch(grid, n_batch, bx, by, lc,
                               n_extras=n_extras):
                # rank by block volume (amortizes ghosts + per-block
                # overhead), then by lane-chunk width (DMA contiguity)
                vol = min(bx, grid.shape[0]) * min(by, grid.shape[1]) * lc
                key = (vol, lc)
                if best is None or key > best[0]:
                    best = (key, (bx, by, lc))
                break  # smaller blocks at this lc are strictly worse
    return best[1] if best else None


def batch_system_closures(grid: Grid, system, dtype, n_batch: int):
    """Packed parameter rows + kernel-side Hamiltonian/alpha closures.

    Returns ``(param_rows, ham_fn, alpha_fn)``:
      * ``param_rows``: ``(L, B)`` — every system leaf broadcast to ``(B,)``;
      * ``ham_fn(t, starts, p, pk) -> H`` — ``pk`` is the block's packed
        ``(R, 128)`` VMEM chunk; leaves are rebuilt as ``(1, 1, 1, 128)``
        lane vectors that broadcast against the ``(bx, by, zs, 128)`` block;
      * ``alpha_fn(t, starts, shape, pk, axis) -> alpha`` (broadcastable) —
        valid for ``alpha_time_invariant`` systems (costate box ignored).

    Coordinates are rebuilt per axis from ``starts + iota`` as broadcastable
    singletons (``grid.lo``/``dx`` are static literals), exactly like
    ``weno3d.system_closures`` but with the trailing scenario axis.
    """
    leaves, treedef = jax.tree.flatten(system)
    rows = [jnp.broadcast_to(jnp.ravel(jnp.asarray(l, dtype)), (n_batch,))
            for l in leaves]
    param_rows = (jnp.stack(rows) if rows
                  else jnp.zeros((0, n_batch), dtype))

    def rebuild(pk):
        outs = [pk[_PARAM_ROW0 + k:_PARAM_ROW0 + k + 1, :]
                .reshape(1, 1, 1, -1) for k in range(len(rows))]
        return jax.tree.unflatten(treedef, outs)

    def coords_at(starts, shape):
        out = []
        for ax in range(3):
            shp = [1, 1, 1, 1]
            shp[ax] = shape[ax]
            idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shp), ax) \
                + starts[ax]
            out.append(grid.lo[ax] + idx.astype(dtype) * grid.dx[ax])
        return tuple(out)

    def _t(pk):
        return pk[_T_ROW:_T_ROW + 1, :].reshape(1, 1, 1, -1)

    def ham_fn(starts, p, pk):
        return rebuild(pk).hamiltonian(_t(pk), coords_at(starts, p[0].shape),
                                       p)

    def alpha_fn(starts, shape, pk, axis):
        return rebuild(pk).alpha(_t(pk), coords_at(starts, shape), None,
                                 None, axis)

    return param_rows, ham_fn, alpha_fn


def _build_pack(eps, inv_eps, t, cdt, param_rows, B, dtype,
                gamma=1.0, kene_mv=0.0):
    """Per-scenario packed rows (layout at the top of this module); rows
    padded to a sublane multiple so column-chunk DMA slices stay
    tile-aligned."""
    def _rows(a, n):
        return jnp.broadcast_to(
            jnp.asarray(a, dtype).reshape(n, -1), (n, B))

    pack = jnp.concatenate(
        [_rows(eps, 3), _rows(eps if inv_eps is None else inv_eps, 3),
         _rows(t, 1), _rows(cdt, 1), _rows(gamma, 1), _rows(kene_mv, 1),
         param_rows.astype(dtype)], axis=0)
    rp = -(-pack.shape[0] // 8) * 8
    return jnp.pad(pack, ((0, rp - pack.shape[0]), (0, 0))), rp


def fused_hj_rhs_batch(
    grid: Grid,
    ham_fn: Callable,
    alpha_fn: Callable,
    v_pad: jnp.ndarray,          # (x+6, y+6, z+6, B) ghost-padded values
    eps,                         # WENO epsilon, (3,) shared or (3, B)
    t,                           # time (scalar, forwarded to ham_fn)
    param_rows: jnp.ndarray,     # (L, B) packed system leaves
    inv_eps=None,                # (3,)/(3, B) 1/eps -> 1-divide combine
    block_x: int = 4,
    block_y: int = 4,
    lane_chunk: int = LANE_CHUNK,
    eps_neighbors: bool = False,  # per-window O&F (3.38) epsilon in-kernel
) -> jnp.ndarray:
    """One fused batched RHS evaluation: ``V_dot = -(H - diss)``, (x,y,z,B).

    ``ham_fn``/``alpha_fn`` as produced by :func:`batch_system_closures`;
    ``starts`` passed to them are the block's global starting indices
    (axis-2 coordinates follow ``padded index - 3``).
    """
    xp, yp, zp0, B = v_pad.shape
    x, y, z = xp - 6, yp - 6, zp0 - 6
    if (x, y, z) != grid.shape:
        raise ValueError(f"padded shape {v_pad.shape} != grid {grid.shape}")
    lc = lane_chunk
    if B % lc or lc % LANE_CHUNK:
        raise ValueError(f"batch {B} must be a multiple of the lane chunk "
                         f"{lc} (itself a multiple of {LANE_CHUNK})")
    bx, by = min(block_x, x), min(block_y, y)
    zs = _aligned_z(grid)
    dtype = v_pad.dtype
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)
    scaled = inv_eps is not None

    pack, rp = _build_pack(eps, inv_eps, t, 0.0, param_rows, B, dtype)

    # tile-align the trailing-2 dims (z, B): junk z rows at the far end
    v_pad = jnp.pad(v_pad, ((0, 0), (0, 0), (0, zs - zp0), (0, 0)))

    n_bx = pl.cdiv(x, bx)
    n_by = pl.cdiv(y, by)
    n_c = B // lc
    n_blocks = n_c * n_bx * n_by

    def kernel(vpad_hbm, pack_hbm, out_hbm, slabs, packs, stages,
               sems_in, sems_out):
        def decode(k):
            """block id -> (lane-chunk offset, clamped x/y starts)."""
            c = k // (n_bx * n_by)
            r = k - c * (n_bx * n_by)
            bi = r // n_by
            bj = r - bi * n_by
            sx = jnp.minimum(bi * bx, x - bx)       # clamped tail: overlap
            sy = jnp.minimum(bj * by, y - by)       # recomputes same values
            return pl.multiple_of(c * lc, LANE_CHUNK), sx, sy

        def in_dmas(slot, k):
            co, sx, sy = decode(k)
            return (
                pltpu.make_async_copy(
                    vpad_hbm.at[pl.ds(sx, bx + 6), pl.ds(sy, by + 6), :,
                                pl.ds(co, lc)],
                    slabs.at[slot], sems_in.at[slot, 0]),
                pltpu.make_async_copy(
                    pack_hbm.at[:, pl.ds(co, lc)],
                    packs.at[slot], sems_in.at[slot, 1]),
            )

        def out_dma(slot, k):
            co, sx, sy = decode(k)
            return pltpu.make_async_copy(
                stages.at[slot],
                out_hbm.at[pl.ds(sx, bx), pl.ds(sy, by), :,
                           pl.ds(co, lc)],
                sems_out.at[slot])

        def compute(slot, k):
            pk = packs.at[slot]

            def epsq(ax):
                if eps_neighbors:
                    import math as _math

                    return ("neighbors",
                            _math.sqrt(float(jnp.finfo(dtype).tiny)))
                e = pk[ax:ax + 1, :].reshape(1, 1, 1, -1)
                iv = (pk[3 + ax:4 + ax, :].reshape(1, 1, 1, -1)
                      if scaled else None)
                return (e, iv)

            _, sx, sy = decode(k)
            g = slabs[slot]                          # (bx+6, by+6, zs, 128)
            # ---- axis 0 (untiled): slices
            g0 = g[:, 3:3 + by]
            d1 = (g0[1:] - g0[:-1]) * inv_dx[0]
            dl0, dr0 = _weno_axis01(d1, 0, bx, epsq(0))
            # ---- axis 1 (untiled): slices
            g1 = g[3:3 + bx]
            d1 = (g1[:, 1:] - g1[:, :-1]) * inv_dx[1]
            dl1, dr1 = _weno_axis01(d1, 1, by, epsq(1))
            # ---- axis 2 (sublane): rotations, full zs width (wrap junk
            # lands in rows the caller's final slice discards)
            g2 = g[3:3 + bx, 3:3 + by]
            dl2, dr2 = _weno_roll_axis(g2, 2, inv_dx[2], epsq(2))

            starts = (sx, sy, -3)
            p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1), 0.5 * (dl2 + dr2))
            ham = ham_fn(starts, p, pk)
            shape = g2.shape
            diss = (0.5 * (dr0 - dl0) * alpha_fn(starts, shape, pk, 0)
                    + 0.5 * (dr1 - dl1) * alpha_fn(starts, shape, pk, 1)
                    + 0.5 * (dr2 - dl2) * alpha_fn(starts, shape, pk, 2))

            @pl.when(k >= 2)
            def _():
                # stage buffer reused two blocks later: its DMA must be done
                out_dma(slot, k - 2).wait()

            stages[slot] = -(ham - diss)
            out_dma(slot, k).start()

        # Double-buffered pipeline over dynamically-indexed blocks, unrolled
        # in PAIRS so the buffer slot is static: block k+1's input DMAs fly
        # while block k computes.
        for d in in_dmas(0, jnp.int32(0)):
            d.start()

        def pair_body(pi, carry):
            for slot in (0, 1):
                k = 2 * pi + slot

                @pl.when(k < n_blocks)
                def _():
                    @pl.when(k + 1 < n_blocks)
                    def _():
                        for d in in_dmas(1 - slot, k + 1):
                            d.start()
                    for d in in_dmas(slot, k):
                        d.wait()
                    compute(slot, k)
            return carry

        jax.lax.fori_loop(0, pl.cdiv(n_blocks, 2), pair_body, jnp.int32(0))
        for kk in (n_blocks - 2, n_blocks - 1):
            if kk >= 0:
                out_dma(kk % 2, jnp.int32(kk)).wait()

    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            # DMA engines handle arbitrary leading-dim offsets in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),    # v_pad
            pl.BlockSpec(memory_space=pltpu.HBM),    # packed rows
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((x, y, zs, B), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bx + 6, by + 6, zs, lc), dtype),  # slabs
            pltpu.VMEM((2, rp, lc), dtype),                  # packs
            pltpu.VMEM((2, bx, by, zs, lc), dtype),          # stages
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        v_pad,
        pack,
    )
    # drop the ghost/junk z rows (one cheap XLA slice)
    return out[:, :, 3:3 + z, :]


# ----------------------------------------------- persistent-layout substep
# Kernel-only profiling (2026-08-20, scripts/profile_batch.py --kernel-only)
# put the batched RHS kernel at ~2.3 ms/launch at 31^3 x 256 but the
# kernel-ROUTED hj_rhs at ~14.6 ms (XLA ~17): the per-substep XLA glue
# (3 ghost pads, the zs alignment pad, the epsilon pass, the output slice)
# costs ~12 ms — XLA runs these batch-last passes at a fraction of HBM
# bandwidth.  The fix mirrors the single-grid hjstep kernel: keep the value
# function PERSISTENTLY in the aligned ghost-padded layout (x+6, y+6, zs, B)
# across a whole tau interval and fuse one entire TVD-RK substep
#
#     out = ca * va + cb * vb + cdt(B) * f(vb),   f = -(H - diss)
#
# per launch, with the comp-method masking fused into the final substep, the
# z-axis ghost fill done in-kernel from the updated interior, and only the
# x/y ghost SHELLS refreshed by O(surface) XLA updates
# (:func:`refresh_xy_ghosts_batch`).  cdt is PER-SCENARIO — each batch
# element advances under its own CFL dt (zero once it finishes the
# interval, which freezes it exactly like the XLA loop's exit).


def lift_batch(grid: Grid, v: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z, B) batch-last values -> aligned ghost-padded
    ``(x+6, y+6, zs, B)``; called once per tau interval."""
    from ..boundary import pad_axis

    for axis in range(3):
        v = pad_axis(grid, v, axis, 3)
    zs = _aligned_z(grid)
    return jnp.pad(v, ((0, 0), (0, 0), (0, zs - v.shape[2]), (0, 0)))


def lower_batch(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Aligned batch layout -> interior (x, y, z, B) view."""
    x, y, z = grid.shape
    return jax.lax.slice(vq, (3, 3, 3, 0),
                         (3 + x, 3 + y, 3 + z, vq.shape[3]))


def _fill_ghost_z(a, n, periodic):
    """Overwrite the 3 ghost layers of the (sublane) z axis from the
    interior — the 4-D batch-last counterpart of ``hjstep._fill_ghost``
    (z is NOT the lane axis here, so plain sublane slices serve as the
    edge reads)."""
    def _roll(arr, s):
        return pltpu.roll(arr, s % arr.shape[2], 2)

    i = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
    if periodic:
        lo_vals = _roll(a, -n)
        a = jnp.where(i < 3, lo_vals, a)
        hi_vals = _roll(a, n)
        return jnp.where((i >= n + 3) & (i < n + 6), hi_vals, a)
    dtype = a.dtype

    def at(idx):
        return jax.lax.slice_in_dim(a, idx, idx + 1, axis=2)

    edge_lo, inner_lo = at(3), at(4)
    slope_lo = jnp.abs(edge_lo - inner_lo) * jnp.sign(edge_lo)
    a = jnp.where(i < 3, edge_lo + (3 - i).astype(dtype) * slope_lo, a)
    edge_hi, inner_hi = at(n + 2), at(n + 1)
    slope_hi = jnp.abs(edge_hi - inner_hi) * jnp.sign(edge_hi)
    return jnp.where((i >= n + 3) & (i < n + 6),
                     edge_hi + (i - (n + 2)).astype(dtype) * slope_hi, a)


def refresh_xy_ghosts_batch(grid: Grid, vq: jnp.ndarray) -> jnp.ndarray:
    """Recompute the 3-deep ghost shells of axes 0 and 1 from the interior
    (O(surface) ``dynamic_update_slice`` passes; the kernel fills z).

    y runs first so the x refresh reads rows whose y ghosts are valid;
    the x ghost rows span the full y extent, covering the corners."""
    def one_axis(a, axis, n, periodic):
        if periodic:
            glo = jax.lax.slice_in_dim(a, n, n + 3, axis=axis)
            ghi = jax.lax.slice_in_dim(a, 3, 6, axis=axis)
        else:
            edge_lo = jax.lax.slice_in_dim(a, 3, 4, axis=axis)
            inner_lo = jax.lax.slice_in_dim(a, 4, 5, axis=axis)
            slope_lo = jnp.abs(edge_lo - inner_lo) * jnp.sign(edge_lo)
            glo = jnp.concatenate(
                [edge_lo + k * slope_lo for k in (3.0, 2.0, 1.0)],
                axis=axis)
            edge_hi = jax.lax.slice_in_dim(a, n + 2, n + 3, axis=axis)
            inner_hi = jax.lax.slice_in_dim(a, n + 1, n + 2, axis=axis)
            slope_hi = jnp.abs(edge_hi - inner_hi) * jnp.sign(edge_hi)
            ghi = jnp.concatenate(
                [edge_hi + k * slope_hi for k in (1.0, 2.0, 3.0)],
                axis=axis)
        a = jax.lax.dynamic_update_slice_in_dim(a, glo, 0, axis=axis)
        return jax.lax.dynamic_update_slice_in_dim(a, ghi, n + 3,
                                                   axis=axis)

    vq = one_axis(vq, 1, grid.shape[1], grid.periodic[1])
    return one_axis(vq, 0, grid.shape[0], grid.periodic[0])


def fused_substep_batch(
    grid: Grid,
    ham_fn: Callable,
    alpha_fn: Callable,
    vb: jnp.ndarray,             # (x+6, y+6, zs, B) aligned, stencil input
    va: jnp.ndarray,             # same layout; affine/comp operand
    eps,                         # (3,) or (3, B)
    t,                           # (B,) per-scenario substep time
    inv_eps,                     # (3,)/(3, B) or None
    cd,                          # (B,) per-scenario rk_coef * dt
    param_rows: jnp.ndarray,     # (L, B)
    *,
    ca: float,
    cb: float,
    epilogue=None,               # hjstep.Epilogue: fused per-step comp /
                                 # discount / obstacle (final substep)
    extras: tuple = (),          # aligned (x+6, y+6, zs, B) operand arrays
    gamma=1.0,                   # per-scenario discount factor ((B,)/scalar)
    kene_mv=0.0,                 # per-scenario Kene shift ((B,)/scalar)
    restrict: str | None = None,
    block_x: int = 4,
    block_y: int = 4,
    lane_chunk: int = LANE_CHUNK,
    want_eps: bool = False,
    eps_neighbors: bool = False,  # per-window O&F (3.38) epsilon in-kernel
):
    """One fused batched RK substep in the persistent aligned layout; the
    output's z ghosts are filled in-kernel — call
    :func:`refresh_xy_ghosts_batch` after.

    With ``want_eps`` the kernel also returns ``d1max``: PER-SCENARIO
    masked maxima of ``D1^2`` over the input's stencil tables, shape
    ``(8, B)`` (rows 0-2 = axes, rest sublane padding).  This is the
    batch-last analog of ``hjstep``'s lagged-epsilon epilogue: blocks of a
    lane chunk run consecutively, so the first block of each chunk
    initializes its 128-lane column and later blocks max-accumulate into
    it.  Every lane is a real scenario (B is a multiple of 128), so only
    the z junk/ghost range needs masking; x/y table coverage follows the
    same slab-halo argument as the 3-D kernel (adjacent pairs only,
    ghost-pair duplicates are exact)."""
    xp, yp, zs, B = vb.shape
    x, y, z = grid.shape
    if (xp, yp, zs) != (x + 6, y + 6, _aligned_z(grid)):
        raise ValueError(f"state shape {vb.shape} != aligned batch layout "
                         f"{(x + 6, y + 6, _aligned_z(grid))}")
    lc = lane_chunk
    if B % lc or lc % LANE_CHUNK:
        raise ValueError(f"batch {B} not a multiple of lane chunk {lc}")
    bx, by = min(block_x, x), min(block_y, y)
    dtype = vb.dtype
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)
    scaled = inv_eps is not None
    epi = epilogue
    need_va = (ca != 0.0) or (epi is not None and epi.needs_va)
    n_ex = len(extras)

    pack, rp = _build_pack(eps, inv_eps, t, cd, param_rows, B, dtype,
                           gamma=gamma, kene_mv=kene_mv)

    n_bx = pl.cdiv(x, bx)
    n_by = pl.cdiv(y, by)
    n_blocks = (B // lc) * n_bx * n_by

    def kernel(vb_hbm, va_hbm, pack_hbm, *rest_io):
        ex_hbm = rest_io[:n_ex]
        out_hbm = rest_io[n_ex]
        rest = rest_io[n_ex + 1:]
        if want_eps:
            epsacc, rest = rest[0], rest[1:]
        (slabs, vas, packs, stages, sems_in, sems_out) = rest[:6]
        exs = rest[6:]                # one (2, bx, by, zs, lc) per extra

        def decode(k):
            c = k // (n_bx * n_by)
            r = k - c * (n_bx * n_by)
            bi = r // n_by
            bj = r - bi * n_by
            sx = jnp.minimum(bi * bx, x - bx)
            sy = jnp.minimum(bj * by, y - by)
            return pl.multiple_of(c * lc, LANE_CHUNK), sx, sy

        def in_dmas(slot, k):
            co, sx, sy = decode(k)
            dmas = [
                pltpu.make_async_copy(
                    vb_hbm.at[pl.ds(sx, bx + 6), pl.ds(sy, by + 6), :,
                              pl.ds(co, lc)],
                    slabs.at[slot], sems_in.at[slot, 0]),
                pltpu.make_async_copy(
                    pack_hbm.at[:, pl.ds(co, lc)],
                    packs.at[slot], sems_in.at[slot, 1]),
            ]
            if need_va:
                dmas.append(pltpu.make_async_copy(
                    va_hbm.at[pl.ds(sx + 3, bx), pl.ds(sy + 3, by), :,
                              pl.ds(co, lc)],
                    vas.at[slot], sems_in.at[slot, 2]))
            for i in range(n_ex):
                dmas.append(pltpu.make_async_copy(
                    ex_hbm[i].at[pl.ds(sx + 3, bx), pl.ds(sy + 3, by), :,
                                 pl.ds(co, lc)],
                    exs[i].at[slot], sems_in.at[slot, 3 + i]))
            return dmas

        def out_dma(slot, k):
            co, sx, sy = decode(k)
            return pltpu.make_async_copy(
                stages.at[slot],
                out_hbm.at[pl.ds(sx + 3, bx), pl.ds(sy + 3, by), :,
                           pl.ds(co, lc)],
                sems_out.at[slot])

        if want_eps:
            # fully define the returned buffer up front (rows 3-7 are
            # sublane padding no in-repo consumer reads, but returned VMEM
            # must not carry nondeterministic garbage); D1^2 >= 0 so the
            # accumulator can then always max against the zero init
            epsacc[...] = jnp.zeros((8, B), dtype)

        def acc_eps(k, ax, d1, z_lo, z_hi):
            # mask the valid z-pad range, reduce grid dims to per-lane
            # maxima, and max-accumulate into this chunk's 128-lane column
            iz = jax.lax.broadcasted_iota(jnp.int32, d1.shape, 2)
            m = jnp.where((iz >= z_lo) & (iz < z_hi), d1 * d1,
                          jnp.zeros_like(d1))
            col = jnp.max(m, axis=(0, 1, 2)).reshape(1, lc)
            co, _, _ = decode(k)
            epsacc[ax:ax + 1, pl.ds(co, lc)] = jnp.maximum(
                epsacc[ax:ax + 1, pl.ds(co, lc)], col)

        def compute(slot, k):
            pk = packs.at[slot]

            def epsq(ax):
                if eps_neighbors:
                    import math as _math

                    return ("neighbors",
                            _math.sqrt(float(jnp.finfo(dtype).tiny)))
                e = pk[ax:ax + 1, :].reshape(1, 1, 1, -1)
                iv = (pk[3 + ax:4 + ax, :].reshape(1, 1, 1, -1)
                      if scaled else None)
                return (e, iv)

            _, sx, sy = decode(k)
            g = slabs[slot]
            g0 = g[:, 3:3 + by]
            d1 = (g0[1:] - g0[:-1]) * inv_dx[0]
            dl0, dr0 = _weno_axis01(d1, 0, bx, epsq(0))
            if want_eps:
                acc_eps(k, 0, d1, 3, z + 3)
            g1 = g[3:3 + bx]
            d1 = (g1[:, 1:] - g1[:, :-1]) * inv_dx[1]
            dl1, dr1 = _weno_axis01(d1, 1, by, epsq(1))
            if want_eps:
                acc_eps(k, 1, d1, 3, z + 3)
            g2 = g[3:3 + bx, 3:3 + by]
            if want_eps:
                dl2, dr2, d1_2 = _weno_roll_axis(g2, 2, inv_dx[2], epsq(2),
                                                 want_d1=True)
                acc_eps(k, 2, d1_2, 2, z + 4)
            else:
                dl2, dr2 = _weno_roll_axis(g2, 2, inv_dx[2], epsq(2))

            starts = (sx, sy, -3)
            p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1), 0.5 * (dl2 + dr2))
            ham = ham_fn(starts, p, pk)
            shape = g2.shape
            diss = (0.5 * (dr0 - dl0) * alpha_fn(starts, shape, pk, 0)
                    + 0.5 * (dr1 - dl1) * alpha_fn(starts, shape, pk, 1)
                    + 0.5 * (dr2 - dl2) * alpha_fn(starts, shape, pk, 2))
            f = -(ham - diss)
            if restrict == "min":
                f = jnp.minimum(f, 0.0)
            elif restrict == "max":
                f = jnp.maximum(f, 0.0)

            cdt4 = pk[_CDT_ROW:_CDT_ROW + 1, :].reshape(1, 1, 1, -1)
            out = cb * g2 + cdt4 * f
            if ca != 0.0:
                out = out + ca * vas[slot]
            if epi is not None:
                # solver XLA-body order: comp (or Kene) -> Jaime -> obstacle
                # gamma/mv ride the packed rows (per-scenario lanes).
                # Elements that finished the interval step with cdt == 0
                # (out == va bitwise) and must SKIP the epilogue: the XLA
                # batch body freezes inactive elements at v_last because
                # discounting is not idempotent (solver.py batch freeze).
                pre_epi = out
                gm4 = pk[_GAMMA_ROW:_GAMMA_ROW + 1, :].reshape(1, 1, 1, -1)
                mv4 = pk[_MV_ROW:_MV_ROW + 1, :].reshape(1, 1, 1, -1)
                if epi.kene:
                    tgt = exs[epi.comp_ex][slot]
                    vt = (out - mv4) * gm4
                    ts = tgt - mv4
                    out = (jnp.minimum(vt, ts) if epi.comp == "min"
                           else jnp.maximum(vt, ts)) + mv4
                elif epi.comp is not None:
                    if epi.comp_src == "va":
                        src = vas[slot]
                    elif epi.comp_src == "vb":
                        src = g2
                    else:
                        src = exs[epi.comp_ex][slot]
                    out = (jnp.minimum(out, src) if epi.comp == "min"
                           else jnp.maximum(out, src))
                if epi.jaime_ex is not None:
                    out = gm4 * out + (1.0 - gm4) * exs[epi.jaime_ex][slot]
                if epi.obs_ex is not None:
                    out = jnp.maximum(out, exs[epi.obs_ex][slot])
                out = jnp.where(cdt4 != 0.0, out, pre_epi)

            # z ghost fill from the freshly updated interior (full z per
            # block); x/y shells are the caller's O(surface) refresh
            out = _fill_ghost_z(out, z, grid.periodic[2])

            @pl.when(k >= 2)
            def _():
                out_dma(slot, k - 2).wait()

            stages[slot] = out
            out_dma(slot, k).start()

        for d in in_dmas(0, jnp.int32(0)):
            d.start()

        def pair_body(pi, carry):
            for slot in (0, 1):
                k = 2 * pi + slot

                @pl.when(k < n_blocks)
                def _():
                    @pl.when(k + 1 < n_blocks)
                    def _():
                        for d in in_dmas(1 - slot, k + 1):
                            d.start()
                    for d in in_dmas(slot, k):
                        d.wait()
                    compute(slot, k)
            return carry

        jax.lax.fori_loop(0, pl.cdiv(n_blocks, 2), pair_body, jnp.int32(0))
        for kk in (n_blocks - 2, n_blocks - 1):
            if kk >= 0:
                out_dma(kk % 2, jnp.int32(kk)).wait()

    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    out_shape = jax.ShapeDtypeStruct((xp, yp, zs, B), dtype)
    if want_eps:
        out_specs = [out_specs, pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((8, B), dtype)]
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # vb
            pl.BlockSpec(memory_space=pltpu.HBM),    # va
            pl.BlockSpec(memory_space=pltpu.HBM),    # packed rows
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_ex,   # extras
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, bx + 6, by + 6, zs, lc), dtype),  # vb slabs
            pltpu.VMEM((2, bx, by, zs, lc), dtype),          # va centers
            pltpu.VMEM((2, rp, lc), dtype),                  # packs
            pltpu.VMEM((2, bx, by, zs, lc), dtype),          # out stages
            pltpu.SemaphoreType.DMA((2, 3 + n_ex)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + [pltpu.VMEM((2, bx, by, zs, lc), dtype)          # extras
             for _ in range(n_ex)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(vb, va, pack, *extras)


def initial_epsilon_batch(grid: Grid, cfg, vq):
    """Starting per-scenario epsilon ``(3, B)`` for the lagged carry,
    computed with the standalone full-grid pass on the aligned batch
    state."""
    from ..terms import batched_ops, pallas_epsilon

    return pallas_epsilon(grid, cfg, vq, batched_ops(grid))


def fused_rk_step_batch(grid: Grid, cfg, system, t, vq, t_target,
                        alpha_bounds, comp, n_batch: int, eps,
                        extras=(), gamma=1.0, kene_mv=0.0):
    """One CFL-limited TVD-RK step on the aligned batch state ``vq`` with
    per-scenario dt and the comp-method fused into the final substep —
    the batch-last analog of ``hjstep.fused_rk_step``; returns
    ``(t_new, v_new, eps_new)``.

    ``eps`` is the per-scenario ``(3, B)`` epsilon carry: for
    ``maxOverGrid`` each substep consumes the previous substep's kernel
    epilogue (one substep stale — same lagged scheme, overflow clamp, and
    accuracy reasoning as ``hjstep.fused_rk_step``); seed with
    :func:`initial_epsilon_batch`."""
    import math as _math

    dtype = vq.dtype
    param_rows, ham_fn, alpha_fn = batch_system_closures(
        grid, system, dtype, n_batch)
    dt = jnp.minimum(cfg.factor_cfl * alpha_bounds.step_bound, t_target - t)
    if cfg.max_step != float("inf"):
        dt = jnp.minimum(dt, cfg.max_step)
    dt = jnp.broadcast_to(dt, (n_batch,))
    scaled = cfg.epsilon_method == "maxOverGrid"
    neighbors = cfg.epsilon_method == "maxOverNeighbors"
    floor = _math.sqrt(float(jnp.finfo(dtype).tiny))
    bx, by, lc = pick_blocks(grid, n_batch, n_extras=len(extras))
    if isinstance(comp, str):
        from .hjstep import Epilogue

        comp = Epilogue(comp=comp)
    epi = comp

    def sub(vb, va, eps, tt, cd, ca, cb, fuse_epi):
        r = fused_substep_batch(
            grid, ham_fn, alpha_fn, vb, va, eps, tt,
            (1.0 / eps) if scaled else None, cd, param_rows,
            ca=ca, cb=cb, epilogue=fuse_epi,
            extras=extras if fuse_epi is not None else (),
            gamma=gamma, kene_mv=kene_mv,
            restrict=cfg.restrict_update, block_x=bx, block_y=by,
            lane_chunk=lc, want_eps=scaled, eps_neighbors=neighbors)
        if scaled:
            o, d1max = r
            eps_next = 1e-6 * d1max[:3] + floor
        else:
            o, eps_next = r, eps
        return refresh_xy_ghosts_batch(grid, o), eps_next

    if cfg.rk_order == 1:
        import dataclasses as _dc

        epi1 = (_dc.replace(epi, comp_src="vb")
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
    return t + dt, v_new, eps
