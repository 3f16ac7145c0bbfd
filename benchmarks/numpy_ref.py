"""Independent pure-numpy reference implementation of the air3D BRT solve.

Written directly from the Osher & Fedkiw formulas (WENO5 (3.25)-(3.41),
global Lax-Friedrichs 5.3.1, TVD-RK2) as a from-scratch CPU oracle:

  * it is the "CPU reference throughput" the BASELINE targets are measured
    against (the upstream repo publishes no numbers — see BASELINE.md — so
    the baseline is self-generated from the same algorithm class the
    reference implements in numpy/cupy);
  * it cross-checks the JAX implementation with a fully separate code path
    (different array library, different indexing style, no shared helpers).

Algorithm parity with the reference (robotsorcerer/LevelSetPy):
  WENO5 weights [.1,.6,.3], epsilon = 1e-6*max(D1^2) ('maxOverGrid',
  upwind_first_weno5a.py:70), GLF dissipation with grid-global costate
  bounds (artificial_diss_glf.py:80-109), CFL factor 0.8, TVD-RK2 (Heun,
  ode_cfl_2.py), min-with-previous per RK step (hji_solver.py:536-573),
  linear extrapolation ghosts with away-from-zero slope
  (add_ghost_extrapolate.py:95-110), periodic wrap ghosts.
"""
from __future__ import annotations

import numpy as np


def pad_axis(u, axis, width, periodic):
    """Ghost-fill one axis: periodic wrap or away-from-zero linear
    extrapolation."""
    u = np.moveaxis(u, axis, 0)
    if periodic:
        g = np.concatenate([u[-width:], u, u[:width]], axis=0)
    else:
        slope_lo = np.abs(u[0] - u[1]) * np.sign(u[0])
        slope_hi = np.abs(u[-1] - u[-2]) * np.sign(u[-1])
        lows = [u[0] + k * slope_lo for k in range(width, 0, -1)]
        highs = [u[-1] + k * slope_hi for k in range(1, width + 1)]
        g = np.concatenate([np.stack(lows), u, np.stack(highs)], axis=0)
    return np.moveaxis(g, 0, axis)


def weno5_axis(u, dx, axis, periodic):
    """Left/right WENO5 derivatives along one axis."""
    n = u.shape[axis]
    g = np.moveaxis(pad_axis(u, axis, 3, periodic), axis, 0)
    d1 = (g[1:] - g[:-1]) / dx  # length n+5

    def combine(v1, v2, v3, v4, v5):
        p1 = v1 / 3 - 7 * v2 / 6 + 11 * v3 / 6
        p2 = -v2 / 6 + 5 * v3 / 6 + v4 / 3
        p3 = v3 / 3 + 5 * v4 / 6 - v5 / 6
        s1 = 13 / 12 * (v1 - 2 * v2 + v3) ** 2 + 0.25 * (v1 - 4 * v2 + 3 * v3) ** 2
        s2 = 13 / 12 * (v2 - 2 * v3 + v4) ** 2 + 0.25 * (v2 - v4) ** 2
        s3 = 13 / 12 * (v3 - 2 * v4 + v5) ** 2 + 0.25 * (3 * v3 - 4 * v4 + v5) ** 2
        eps = 1e-6 * np.max(d1[2:n + 3] ** 2) + 1e-99
        a1 = 0.1 / (s1 + eps) ** 2
        a2 = 0.6 / (s2 + eps) ** 2
        a3 = 0.3 / (s3 + eps) ** 2
        return (a1 * p1 + a2 * p2 + a3 * p3) / (a1 + a2 + a3)

    dl = combine(d1[0:n], d1[1:n + 1], d1[2:n + 2], d1[3:n + 3], d1[4:n + 4])
    dr = combine(d1[5:n + 5], d1[4:n + 4], d1[3:n + 3], d1[2:n + 2],
                 d1[1:n + 1])
    return np.moveaxis(dl, 0, axis), np.moveaxis(dr, 0, axis)


class Air3DNumpy:
    """air3D (relative Dubins) BRT solver in plain numpy."""

    def __init__(self, lo, hi, shape, ve=5.0, vp=5.0, w=1.0,
                 dtype=np.float64):
        self.lo = np.asarray(lo, dtype)
        self.hi = np.asarray(hi, dtype)
        self.shape = tuple(shape)
        self.dx = (self.hi - self.lo) / (np.asarray(shape) - 1)
        self.periodic = [False, False, True]
        axes = [np.linspace(self.lo[i], self.hi[i], shape[i], dtype=dtype)
                for i in range(3)]
        self.x = np.meshgrid(*axes, indexing="ij")
        self.ve, self.vp, self.w = ve, vp, w
        # alpha (dissipation bounds) are state-only for this system
        self.alpha = [
            np.abs(ve - vp * np.cos(self.x[2])) + np.abs(w * self.x[1]),
            np.abs(vp * np.sin(self.x[2])) + np.abs(w * self.x[0]),
            (w + w) * np.ones_like(self.x[2]),
        ]
        self.step_bound = 1.0 / sum(
            a.max() / self.dx[i] for i, a in enumerate(self.alpha))

    def target_cylinder(self, radius=5.0):
        return np.sqrt(self.x[0] ** 2 + self.x[1] ** 2) - radius

    def hamiltonian(self, p1, p2, p3):
        return (p1 * (self.ve - self.vp * np.cos(self.x[2]))
                - p2 * (self.vp * np.sin(self.x[2]))
                - self.w * np.abs(p1 * self.x[1] - p2 * self.x[0] - p3)
                + self.w * np.abs(p3))

    def rhs(self, v):
        derivs = [weno5_axis(v, self.dx[i], i, self.periodic[i])
                  for i in range(3)]
        pc = [0.5 * (dl + dr) for dl, dr in derivs]
        ham = self.hamiltonian(*pc)
        diss = sum(0.5 * (dr - dl) * a
                   for (dl, dr), a in zip(derivs, self.alpha))
        return -(ham - diss)

    def step(self, v, t, t_target, cfl=0.8):
        """One TVD-RK2 step with per-step min (BRT comp method)."""
        dt = min(cfl * self.step_bound, t_target - t)
        v_prev = v
        k1 = self.rhs(v)
        y1 = v + dt * k1
        k2 = self.rhs(y1)
        v = 0.5 * (v + y1 + dt * k2)
        return np.minimum(v, v_prev), t + dt

    def solve(self, v0, t_end, cfl=0.8, max_steps=10 ** 9):
        v, t = v0, 0.0
        n = 0
        small = 100 * np.finfo(v0.dtype).eps * abs(t_end)
        while t < t_end - small and n < max_steps:
            v, t = self.step(v, t, t_end, cfl)
            n += 1
        return v, t, n
