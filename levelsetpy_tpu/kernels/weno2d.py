"""Fused Pallas TPU kernel: full 2-D HJ right-hand side in one pass.

The 2-D analog of ``weno3d.fused_hj_rhs_3d`` for BASELINE config #1-class
workloads (2-D double-integrator BRTs): WENO5 derivL/derivR on both axes,
the system Hamiltonian and the LF dissipation evaluated in one VMEM-resident
pass.  2-D grids are small (a 1024^2 padded f32 plane is ~4 MB), so unlike
the 3-D slab kernel there is no x-blocking or DMA pipeline: the whole padded
plane is one VMEM block, lanes are the trailing axis.

Layout rules (same Mosaic constraints as weno3d):
  * lanes (axis 1) are never sliced — padded to a 128 multiple, axis-1
    stencil shifts are ``pltpu.roll`` lane rotations, wrap-around lanes
    carry garbage the caller slices off;
  * axis 0 uses static value slices (sublane offsets are unconstrained on
    loaded values);
  * system parameters arrive as a flat SMEM vector; coordinates are
    rebuilt from ``origin + iota`` (sharded blocks pass their global block
    start as ``origin``).

Math is shared with the 3-D kernel (``_weno_axis01`` windows for axis 0,
the lane-roll shared-table formulation for axis 1) — identical to
``derivatives.weno5_from_padded`` (O&F (3.25)-(3.41)).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from .weno3d import (_resolve_epsq, _smoothness, _weno_axis01, _weno_eval,
                     _weno_weight_tables)

__all__ = ["fused_hj_rhs_2d", "fits_vmem_2d", "widen_alphas_2d",
           "aligned_dims_2d"]


def _roll(a, s):
    return pltpu.roll(a, s % a.shape[1], 1)


def _weno_lane_axis_2d(g, inv_dx, epsq):
    """derivL/derivR along the lane axis of a 2-D block via rotations
    (same shared-table sharing as ``weno3d._weno_lane_axis``)."""
    d1 = (_roll(g, -1) - g) * inv_dx
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


def aligned_dims_2d(grid: Grid) -> int:
    """Lane-padded width ``yp`` (128 multiple covering y + 6 ghosts)."""
    _, y = grid.shape
    return -(-(y + 6) // 128) * 128


def fits_vmem_2d(grid: Grid, dtype_bytes: int = 4,
                 budget_bytes: int = 12 * 1024 * 1024) -> bool:
    x, _ = grid.shape
    plane = (x + 6) * aligned_dims_2d(grid) * dtype_bytes
    return plane * 12 < budget_bytes


def widen_alphas_2d(grid: Grid, alphas: tuple, dtype) -> tuple:
    """Pre-widen dissipation bounds to the kernel layout ``(x, yp)``
    (3 junk lanes + y + tail junk); call once per solve."""
    x, y = grid.shape
    yp = aligned_dims_2d(grid)
    out = []
    for a in alphas:
        a = jnp.broadcast_to(a, (x, y)).astype(dtype)
        out.append(jnp.pad(a, ((0, 0), (3, yp - y - 3))))
    return tuple(out)


def fused_hj_rhs_2d(
    grid: Grid,
    ham_fn: Callable,
    v_pad: jnp.ndarray,          # (X+6, Y+6) ghost-padded value fn
    alphas_w: tuple,             # 2 bounds pre-widened to (x, yp)
    eps,                         # WENO epsilon per axis, shape (2,)
    t,
    params: jnp.ndarray | None = None,
    inv_eps=None,
    eps_neighbors: bool = False,  # per-window O&F (3.38) epsilon in-kernel
    origin=None,                 # per-axis global block start (traced)
) -> jnp.ndarray:
    """One fused 2-D RHS evaluation: returns ``V_dot = -(H - diss)``."""
    xp, yp0 = v_pad.shape
    x, y = xp - 6, yp0 - 6
    if (x, y) != grid.shape:
        raise ValueError(f"padded shape {v_pad.shape} does not match grid "
                         f"{grid.shape}")
    dtype = v_pad.dtype
    inv_dx = tuple(float(1.0 / d) for d in grid.dx)
    yp = aligned_dims_2d(grid)
    v_pad = jnp.pad(v_pad, ((0, 0), (0, yp - yp0)))
    if alphas_w[0].shape != (x, yp):
        raise ValueError(
            f"alphas must be pre-widened to {(x, yp)} (widen_alphas_2d); "
            f"got {alphas_w[0].shape}")
    scaled = inv_eps is not None

    def kernel(eps_ref, inv_ref, t_ref, params_ref, org_ref, v_ref, a0_ref,
               a1_ref, out_ref):
        tt = t_ref[0]
        if eps_neighbors:
            import math as _math

            nb_floor = _math.sqrt(float(jnp.finfo(dtype).tiny))

        def epsq(ax):
            if eps_neighbors:
                return ("neighbors", nb_floor)
            return (eps_ref[ax], inv_ref[ax] if scaled else None)

        g = v_ref[...]                       # (x+6, yp)
        # ---- axis 0: slice windows over rows
        g0 = g
        d1 = (g0[1:] - g0[:-1]) * inv_dx[0]  # (x+5, yp)
        dl0, dr0 = _weno_axis01(d1, 0, x, epsq(0))
        # ---- axis 1 (lanes): rolls, full width
        g1 = g[3:3 + x, :]
        dl1, dr1 = _weno_lane_axis_2d(g1, inv_dx[1], epsq(1))

        p = (0.5 * (dl0 + dr0), 0.5 * (dl1 + dr1))
        ham = ham_fn(tt, (org_ref[0], org_ref[1] - 3), p, params_ref)
        diss = (0.5 * (dr0 - dl0) * a0_ref[...]
                + 0.5 * (dr1 - dl1) * a1_ref[...])
        out_ref[...] = -(ham - diss)

    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv_eps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params
            pl.BlockSpec(memory_space=pltpu.SMEM),   # origin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_pad (whole plane)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # alpha0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # alpha1
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x, yp), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.broadcast_to(jnp.asarray(eps, dtype), (2,)),
        jnp.broadcast_to(jnp.asarray(
            eps if inv_eps is None else inv_eps, dtype), (2,)),
        jnp.asarray(t, dtype).reshape(1),
        (jnp.zeros((1,), dtype) if params is None
         else jnp.asarray(params, dtype).reshape(-1)),
        (jnp.zeros((2,), jnp.int32) if origin is None
         else jnp.stack([jnp.asarray(o, jnp.int32) for o in origin])),
        v_pad,
        *alphas_w,
    )
    return out[:, 3:3 + y]
