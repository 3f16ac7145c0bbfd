"""Fused Pallas TPU kernel: full 3-D HJ right-hand side in one pass.

The XLA path (``terms.hj_rhs``) evaluates per-axis WENO5 stencils, the
Hamiltonian and the LF dissipation as separate fused loops — each
materializes grid-sized intermediates, so one RHS moves ~25 array passes of
HBM traffic.  This kernel computes EVERYTHING for a slab of the grid inside
VMEM: one DMA of the (ghost-padded) slab in, derivL/derivR for all three
axes, the (traced-in, system-specific) Hamiltonian callback, the dissipation
sum, one DMA of the result out.  Steady-state traffic drops to
``read(V_pad) + read(3 alphas) + write(V_dot)`` and the kernel becomes
VPU-bound (~350 flops/element) instead of HBM-bound.

TPU lowering constraints shape the implementation:
  * Mosaic requires lane-dimension (last-axis) slices to be 128-aligned, so
    the kernel NEVER slices the last axis: all arrays keep the padded lane
    width ``zp = z + 6`` end to end, axis-2 stencil shifts use
    ``pltpu.roll`` (lane rotation), the wrap-around lanes carry garbage
    that the caller discards with one XLA slice of the output, and the
    alpha inputs arrive pre-widened to ``zp`` lanes.
  * Blocking tiles the leading axis in ``block_x`` rows; the final partial
    block CLAMPS its start (recomputing a few overlapping rows, rewriting
    identical values) so arbitrary X — including prime sizes like 101 —
    needs no padding.
  * System parameters arrive as a flat SMEM vector (kernels cannot capture
    traced closure constants); the Hamiltonian callback rebuilds the system
    pytree from it.

The WENO5 candidate/smoothness math is the SAME formulation as
``derivatives.weno5_from_padded`` (O&F (3.25)-(3.41)); equality to the XLA
path at f32 tolerance is asserted in tests.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid

__all__ = ["fused_hj_rhs_3d", "fits_vmem", "aligned_dims", "widen_alphas",
           "system_closures", "flatten_system"]


def flatten_system(system, dtype):
    """Flatten a system pytree into an SMEM-safe parameter vector plus a
    kernel-side ``rebuild(params_ref)`` closure.

    Pallas kernels cannot capture traced closure constants, so system
    parameters (which may be tracers under vmap sweeps) travel as a flat
    SMEM vector and the pytree is rebuilt inside the kernel."""
    leaves, treedef = jax.tree.flatten(system)
    leaf_shapes = [jnp.shape(l) for l in leaves]
    leaf_sizes = [int(jnp.size(l)) for l in leaves]
    flat_params = (
        jnp.concatenate([jnp.ravel(jnp.asarray(l, dtype)) for l in leaves])
        if leaves else jnp.zeros((1,), dtype))

    def rebuild(params_ref):
        def build(shp, offset):
            # nested stacks instead of a flat stack + reshape: Mosaic has
            # no shape-cast for vector<N> -> vector<AxB> (hit by (N, 3)
            # flock position leaves inside the fused substep kernels)
            if len(shp) == 1:
                return jnp.stack(
                    [params_ref[offset + k] for k in range(shp[0])])
            stride = 1
            for s in shp[1:]:
                stride *= s
            return jnp.stack([build(shp[1:], offset + i * stride)
                              for i in range(shp[0])])

        rebuilt, off = [], 0
        for shp, sz in zip(leaf_shapes, leaf_sizes):
            if shp == ():
                vals = params_ref[off]  # plain SMEM scalar read
            else:  # static offsets: off/sz are python ints
                vals = build(shp, off)
            rebuilt.append(vals)
            off += sz
        return jax.tree.unflatten(treedef, rebuilt)

    return flat_params, rebuild


def system_closures(grid: Grid, system, dtype):
    """Kernel-side Hamiltonian/alpha closures over a flattened system.

    The closures rebuild the system pytree from the SMEM params vector and
    evaluate on coordinates reconstructed from the block start + iota
    (``grid.lo``/``dx`` stay python literals).

    Returns ``(flat_params, ham_fn, alpha_fn)`` with
      * ``ham_fn(t, starts, p, params_ref) -> H`` — ``p`` are the central
        derivatives; coordinates follow ``start + iota`` per axis;
      * ``alpha_fn(t, starts, shape, params_ref, axis[, p_min, p_max])
        -> alpha`` (broadcastable against ``shape``).  Without a box it is
        valid for ``alpha_time_invariant`` systems (costate box ignored);
        WITH ``p_min``/``p_max`` tuples (node-local arrays and/or global
        scalars) it evaluates the generic 4-corner costate-box bound
        (``System.alpha`` default, ref ``generic_partial.py:42-51``)
        in-kernel — the LLF/LLLF path for systems without an analytic
        alpha (VERDICT r4 #1).
    """
    flat_params, rebuild = flatten_system(system, dtype)
    nd = grid.ndim

    def coords_at(starts, shape):
        # Broadcastable singleton-shaped coords (like grid.mesh_broadcastable)
        # so transcendental system math (cos/sin of one axis) runs over N
        # values instead of the full block — the VPU cost of the Hamiltonian
        # and the dissipation bounds collapses to the broadcasting multiplies.
        out = []
        for ax in range(nd):
            shp = [1] * nd
            shp[ax] = shape[ax]
            idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shp), ax) \
                + starts[ax]
            out.append(grid.lo[ax] + idx.astype(dtype) * grid.dx[ax])
        return tuple(out)

    def ham_fn(tt, starts, p, params_ref):
        sys_k = rebuild(params_ref)
        return sys_k.hamiltonian(tt, coords_at(starts, p[0].shape), p)

    def alpha_fn(tt, starts, shape, params_ref, axis, p_min=None,
                 p_max=None):
        sys_k = rebuild(params_ref)
        if axis is None:
            # one SHARED box (LLLF): all axes' bounds from one 4-corner
            # evaluation (System.alpha_all)
            return sys_k.alpha_all(tt, coords_at(starts, shape), p_min,
                                   p_max)
        return sys_k.alpha(tt, coords_at(starts, shape), p_min, p_max,
                           axis)

    return flat_params, ham_fn, alpha_fn


def _win(a, axis, off, n):
    return jax.lax.slice_in_dim(a, off, off + n, axis=axis)


def _resolve_epsq(epsq, w):
    """Resolve the ``("neighbors", floor)`` marker into a per-window
    epsilon table (O&F (3.38), ref ``upwind_first_weno5a.py:157-165``):
    ``eps = 1e-6 * max_k D1_k^2 + floor`` over the SAME base-window entries
    ``w`` the smoothness tables read, so the left node-j window and the
    right node-j window (reversed window j+1) share one table — exactly
    ``derivatives.weno5_from_padded``'s maxOverNeighbors sharing.  A
    node-local epsilon needs NO reduction: sharded solves run with zero
    per-substep collectives in this mode."""
    if isinstance(epsq, tuple) and epsq[0] == "neighbors":
        m = w[0] * w[0]
        for k in range(1, 5):
            m = jnp.maximum(m, w[k] * w[k])
        return (1e-6 * m + epsq[1], None)
    return epsq


def _weno_weight_tables(ss, epsq):
    """Unnormalized x10-scaled WENO weight tables ``(c2*c3, 6*c1*c3,
    c1*c2)`` over the full base-window table — identical math and
    divide-count reasoning as ``derivatives._weno_weight_tables`` (computed
    ONCE and read by both one-sided derivatives: left at its own window as
    ``(A1, A2, 3*A3)``, right one window ahead as ``(A3, A2, 3*A1)``).
    ``epsq = (eps, inv_eps_or_None)`` — ``eps`` may be a scalar or a
    per-window table (maxOverNeighbors, via :func:`_resolve_epsq`)."""
    eps, inv_eps = epsq
    if inv_eps is not None:
        # Clamp the scaled indicators: exact maxOverGrid eps bounds
        # ss/eps <= ~17e6, but the LAGGED eps carry (hjstep want_eps) can
        # transiently undershoot by orders of magnitude when an axis goes
        # from constant to varying (eps at the denormal floor while ss is
        # already finite) — then b^4 overflows f32 -> inf/NaN weights, and
        # on TPU min(NaN, va) silently freezes the comp'd solve.  1e8 is
        # never reached in the lag-free regime (bitwise-identical there)
        # and degrades gracefully to ENO stencil selection beyond it.
        b1 = jnp.minimum(ss[0] * inv_eps, 1e8) + 1.0
        b2 = jnp.minimum(ss[1] * inv_eps, 1e8) + 1.0
        b3 = jnp.minimum(ss[2] * inv_eps, 1e8) + 1.0
    else:
        b1 = ss[0] + eps
        b2 = ss[1] + eps
        b3 = ss[2] + eps
        r = 1.0 / (b1 + b2 + b3)
        b1 = b1 * r
        b2 = b2 * r
        b3 = b3 * r
    c1 = b1 * b1
    c2 = b2 * b2
    c3 = b3 * b3
    return c2 * c3, 6.0 * (c1 * c3), c1 * c2


def _weno_eval(phis, a1, a2, a3_third):
    """Final WENO convex combination from shared weight tables (the third
    carries a pending x3; one divide)."""
    a3 = 3.0 * a3_third
    return (a1 * phis[0] + a2 * phis[1] + a3 * phis[2]) / (a1 + a2 + a3)


def _smoothness(w0, w1, w2, w3, w4):
    """O&F (3.32)-(3.34) indicators of one base window (entries D1[b..b+4])."""
    s1 = (13 / 12) * (w0 - 2 * w1 + w2) ** 2 \
        + 0.25 * (w0 - 4 * w1 + 3 * w2) ** 2
    s2 = (13 / 12) * (w1 - 2 * w2 + w3) ** 2 + 0.25 * (w1 - w3) ** 2
    s3 = (13 / 12) * (w2 - 2 * w3 + w4) ** 2 \
        + 0.25 * (3 * w2 - 4 * w3 + w4) ** 2
    return s1, s2, s3


def _weno_axis01(d1, axis, n, epsq):
    """derivL/derivR from a D1 table along axis 0 or 1 (sliceable dims).

    Shared-table formulation (same as ``derivatives._weno_tables``): the
    right-derivative windows are the left windows reversed and shifted by
    one, so one smoothness table over the ``n+1`` base windows serves both
    sides (``s^R_m(j) = s^L_{4-m}(j+1)``) and candidates ``p2^R = p3^L``,
    ``p3^R = p2^L`` are reused.
    """
    w = tuple(_win(d1, axis, k, n + 1) for k in range(5))
    u = tuple(_win(d1, axis, k, n) for k in range(6))
    p1l = u[0] * (1 / 3) - u[1] * (7 / 6) + u[2] * (11 / 6)
    p2l = -u[1] * (1 / 6) + u[2] * (5 / 6) + u[3] * (1 / 3)
    p3l = u[2] * (1 / 3) + u[3] * (5 / 6) - u[4] * (1 / 6)
    p1r = u[3] * (11 / 6) - u[4] * (7 / 6) + u[5] * (1 / 3)
    a1, a2, a3 = _weno_weight_tables(_smoothness(*w), _resolve_epsq(epsq, w))

    def head(a):
        return _win(a, axis, 0, n)

    def tail(a):
        return _win(a, axis, 1, n)

    dl = _weno_eval((p1l, p2l, p3l), head(a1), head(a2), head(a3))
    dr = _weno_eval((p1r, p3l, p2l), tail(a3), tail(a2), tail(a1))
    return dl, dr


def _weno_lane_axis(g2, inv_dx, epsq):
    """derivL/derivR along the LANE axis via rolls, full width.

    ``g2``: (BX, y, zp) padded values.  ``D1[m] = (g[m+1] - g[m]) / dx``
    lives at lane m; the node at padded lane m has left window
    ``D1[m-3 .. m+1]`` and right window ``D1[m-2 .. m+2]`` (reversed).  The
    base-window tables are stored at the lane of their left node
    (``w_k[m] = D1[m-3+k]``, roll by 3-k) so the right derivative reads
    them one lane ahead (roll by -1) — the same sharing as
    ``_weno_axis01``.  Lanes outside [3, zp-3) hold wrap-around garbage
    the caller slices off.
    """
    def _roll(a, s):
        # pltpu.roll demands non-negative shifts; rotate modulo lane width
        return pltpu.roll(a, s % a.shape[2], 2)

    d1 = (_roll(g2, -1) - g2) * inv_dx
    w = tuple(_roll(d1, 3 - k) for k in range(5))   # w[k][m] = D1[m-3+k]
    u5 = _roll(d1, -2)                              # D1[m+2]
    p1l = w[0] * (1 / 3) - w[1] * (7 / 6) + w[2] * (11 / 6)
    p2l = -w[1] * (1 / 6) + w[2] * (5 / 6) + w[3] * (1 / 3)
    p3l = w[2] * (1 / 3) + w[3] * (5 / 6) - w[4] * (1 / 6)
    p1r = w[3] * (11 / 6) - w[4] * (7 / 6) + u5 * (1 / 3)
    a1, a2, a3 = _weno_weight_tables(_smoothness(*w), _resolve_epsq(epsq, w))
    dl = _weno_eval((p1l, p2l, p3l), a1, a2, a3)
    dr = _weno_eval((p1r, p3l, p2l),
                    _roll(a3, -1), _roll(a2, -1), _roll(a1, -1))
    return dl, dr


def fits_vmem(grid: Grid, block_x: int = 8, dtype_bytes: int = 4,
              budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Rough feasibility check for the slab kernel's VMEM working set."""
    _, y, z = grid.shape
    lanes = -(-(z + 6) // 128) * 128
    slab = (block_x + 6) * (y + 6) * lanes * dtype_bytes
    # ~10 live slab-sized temporaries during the per-axis WENO evaluation
    return slab * 10 < budget_bytes


def aligned_dims(grid: Grid) -> tuple[int, int, int]:
    """Mosaic-aligned buffer dims for this grid: ``(zp, ny, yp)``.

    DMA-sliced refs need tile-aligned trailing dims, so lanes are widened to
    a 128 multiple (``zp``) and the interior-y width to an 8 multiple
    (``ny``); ``yp`` is the padded-y slab width (also 8-aligned, covering
    the 6 ghost columns)."""
    _, y, z = grid.shape
    zp0 = z + 6
    zp = -(-zp0 // 128) * 128
    ny = -(-y // 8) * 8
    yp = max(-(-(y + 6) // 8) * 8, ny + 6)
    return zp, ny, yp


def widen_alphas(grid: Grid, alphas: tuple, dtype) -> tuple:
    """Pre-widen dissipation bounds to the kernel's aligned layout.

    The fused kernel never slices the lane axis, so alphas must arrive with
    ``zp`` junk-padded lanes (3 junk + z + rest) and ``ny`` 8-aligned y
    columns.  For time-invariant alphas (every shipped analytic system)
    call this ONCE per solve and stash the result on ``AlphaBounds`` —
    doing it inside the RK step costs 3 full-grid HBM round trips per RHS.
    """
    x, y, z = grid.shape
    zp, ny, _ = aligned_dims(grid)
    out = []
    for a in alphas:
        a = jnp.broadcast_to(a, (x, y, z)).astype(dtype)
        out.append(jnp.pad(a, ((0, 0), (0, ny - y), (3, 3 + zp - (z + 6)))))
    return tuple(out)


def fused_hj_rhs_3d(
    grid: Grid,
    ham_fn: Callable,
    v_pad: jnp.ndarray,          # (X+6, Y+6, Z+6) ghost-padded value fn
    alphas_w: tuple,             # 3 dissipation bounds, PRE-WIDENED
                                 # (x, ny, zp) — see widen_alphas
    eps,                         # WENO epsilon, scalar or per-axis (3,)
    t,                           # time (scalar, forwarded to ham_fn)
    params: jnp.ndarray | None = None,   # flat system parameters (SMEM)
    block_x: int = 8,
    inv_eps=None,                # per-axis 1/eps (3,) -> 1-divide combine
    eps_neighbors: bool = False,  # per-window O&F (3.38) epsilon in-kernel
    origin=None,                 # per-axis global index offset (3 traced
                                 # int32) — the shard's block start when the
                                 # kernel runs on a local shard_map block
) -> jnp.ndarray:
    """One fused RHS evaluation: returns ``V_dot = -(H - diss)``.

    ``ham_fn(t, (i0, i1, i2), (p1, p2, p3), params_ref) -> H`` receives the
    slab's starting grid index per axis (the lane axis index is the PADDED
    offset minus 3 — i.e. coordinates follow ``idx - 3`` lanes), the central
    derivatives (lane width ``zp``), and the SMEM params ref.

    Sharded execution: call with the LOCAL grid (``grid.shape`` = the
    shard's block, same ``lo``/``dx`` as the global grid), the
    halo-exchanged padded block as ``v_pad``, and ``origin`` = the block's
    starting global index per axis (``axis_index * local_n``, traced) —
    coordinates are reconstructed in-kernel as ``lo + (local_idx + origin)
    * dx``, so every shard runs the identical program (SPMD).
    """
    xp, yp0, zp0 = v_pad.shape
    x, y, z = xp - 6, yp0 - 6, zp0 - 6
    if (x, y, z) != grid.shape:
        raise ValueError(f"padded shape {v_pad.shape} does not match grid "
                         f"{grid.shape}")
    if x < block_x:
        block_x = x
    n_blocks = pl.cdiv(x, block_x)
    dtype = v_pad.dtype
    # python floats (static literals): traced scalars would be captured
    # closure constants, which pallas kernels reject
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)

    # Mosaic requires DMA-sliced refs to have tile-aligned trailing dims:
    # widen lanes to a 128 multiple and sublanes to an 8 multiple with junk
    # that the final XLA slice discards.
    zp, ny, yp = aligned_dims(grid)
    v_pad = jnp.pad(v_pad, ((0, 0), (0, yp - yp0), (0, zp - zp0)))
    if alphas_w[0].shape != (x, ny, zp):
        raise ValueError(
            f"alphas must be pre-widened to {(x, ny, zp)} (widen_alphas); "
            f"got {alphas_w[0].shape}")

    scaled = inv_eps is not None

    def kernel(eps_ref, inv_ref, t_ref, params_ref, org_ref, vpad_hbm,
               a0_hbm, a1_hbm, a2_hbm, out_hbm, slabs, a0s, a1s, a2s, stages,
               sems_in, sems_out):
        tt = t_ref[0]
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
            return (
                pltpu.make_async_copy(
                    vpad_hbm.at[pl.ds(sx, block_x + 6)], slabs.at[slot],
                    sems_in.at[slot, 0]),
                pltpu.make_async_copy(
                    a0_hbm.at[pl.ds(sx, block_x)], a0s.at[slot],
                    sems_in.at[slot, 1]),
                pltpu.make_async_copy(
                    a1_hbm.at[pl.ds(sx, block_x)], a1s.at[slot],
                    sems_in.at[slot, 2]),
                pltpu.make_async_copy(
                    a2_hbm.at[pl.ds(sx, block_x)], a2s.at[slot],
                    sems_in.at[slot, 3]),
            )

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                stages.at[slot], out_hbm.at[pl.ds(start_x(bi), block_x)],
                sems_out.at[slot])

        # Statically unrolled double-buffered pipeline: block i+1's input
        # DMAs fly while block i computes; block i's output DMA flies while
        # block i+1 computes.
        for d in in_dmas(0, 0):
            d.start()
        for bi in range(n_blocks):
            slot = bi % 2
            if bi + 1 < n_blocks:
                for d in in_dmas(1 - slot, bi + 1):
                    d.start()
            for d in in_dmas(slot, bi):
                d.wait()

            g = slabs[slot]                       # (BX+6, yp, zp)
            # ---- axis 0: slice dims 0/1 only
            g0 = g[:, 3:3 + ny, :]
            d1 = (g0[1:] - g0[:-1]) * inv_dx[0]   # (BX+5, ny, zp)
            dl0, dr0 = _weno_axis01(d1, 0, block_x, epsq(0))
            # ---- axis 1
            g1 = g[3:3 + block_x, :, :]
            d1 = (g1[:, 1:] - g1[:, :-1]) * inv_dx[1]
            dl1, dr1 = _weno_axis01(d1, 1, ny, epsq(1))
            # ---- axis 2 (lane axis): rolls, full width
            g2 = g[3:3 + block_x, 3:3 + ny, :]
            dl2, dr2 = _weno_lane_axis(g2, inv_dx[2], epsq(2))

            p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1), 0.5 * (dl2 + dr2))
            ham = ham_fn(tt, (org_ref[0] + start_x(bi), org_ref[1],
                              org_ref[2] - 3), p, params_ref)
            diss = (0.5 * (dr0 - dl0) * a0s[slot]
                    + 0.5 * (dr1 - dl1) * a1s[slot]
                    + 0.5 * (dr2 - dl2) * a2s[slot])
            if bi >= 2:
                # stage buffer reused two blocks later: its DMA must be done
                out_dma(slot, bi - 2).wait()
            stages[slot] = -(ham - diss)
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
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # origin
            # keep the big arrays in HBM: DMA engines handle arbitrary
            # slice offsets there, while ANY may place them in VMEM where
            # memref slices must be 128-lane aligned
            pl.BlockSpec(memory_space=pltpu.HBM),    # v_pad
            pl.BlockSpec(memory_space=pltpu.HBM),    # alpha0
            pl.BlockSpec(memory_space=pltpu.HBM),    # alpha1
            pl.BlockSpec(memory_space=pltpu.HBM),    # alpha2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((x, ny, zp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_x + 6, yp, zp), dtype),   # slabs
            pltpu.VMEM((2, block_x, ny, zp), dtype),       # alpha0
            pltpu.VMEM((2, block_x, ny, zp), dtype),       # alpha1
            pltpu.VMEM((2, block_x, ny, zp), dtype),       # alpha2
            pltpu.VMEM((2, block_x, ny, zp), dtype),       # stages
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.broadcast_to(jnp.asarray(eps, dtype), (3,)),
        jnp.broadcast_to(jnp.asarray(
            eps if inv_eps is None else inv_eps, dtype), (3,)),
        jnp.asarray(t, dtype).reshape(1),
        (jnp.zeros((1,), dtype) if params is None
         else jnp.asarray(params, dtype).reshape(-1)),
        (jnp.zeros((3,), jnp.int32) if origin is None
         else jnp.stack([jnp.asarray(o, jnp.int32) for o in origin])),
        v_pad,
        *alphas_w,
    )
    # drop the junk columns and wrap-around lanes (one cheap XLA slice)
    return out[:, :y, 3:3 + z]
