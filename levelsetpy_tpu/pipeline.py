"""Closed-loop replanning pipeline: solve → gradients → interpolate → act.

The BASELINE "closed-loop gradient/trajectory extraction at 10 Hz
replanning" configuration as a first-class API.  The reference's equivalent
is a host-side loop gluing ``HJIPDE_solve``, ``computeGradients``, scipy
interpolation and ``get_opt_u`` (``ValueFuncs/compute_opt_traj.py``); here
BOTH phases are single jitted programs:

  * :meth:`ReplanningController.plan` — a full BRT solve plus gradient
    tables for every stored slice (one XLA program; obstacles may change
    per call).
  * :meth:`ReplanningController.act` — value + gradient interpolation at
    the current state and the optimal control/disturbance, vmapped over any
    batch of states (one fused gather program, microseconds).

Typical use at 10 Hz: call ``plan`` when the environment changes (hundreds
of milliseconds budget), call ``act`` every control tick (sub-millisecond).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid import Grid
from .solver import SchemeConfig, solve
from .systems.base import System
from .values import compute_gradients, eval_u

__all__ = ["Plan", "ReplanningController"]


class Plan(NamedTuple):
    """A solved reachability plan: value stack + gradient tables."""

    values: jnp.ndarray        # (T, *grid.shape)
    gradients: jnp.ndarray     # (T, *grid.shape, ndim)
    tau: jnp.ndarray           # (T,)


class ReplanningController:
    """Receding-horizon reachability controller.

    Args:
      grid, system, target: as for :func:`levelsetpy_tpu.solve`.
      tau: horizon checkpoints for each plan.
      cfg: numerical scheme.
      comp_method: BRT by default.
      use_earliest: query the EARLIEST slice containing the state (the
        reference's stubbed ``tEarliest`` binary search,
        ``compute_opt_traj.py:83-86``, implemented as a vectorized scan over
        the stack) instead of always the final slice.
    """

    def __init__(self, grid: Grid, system: System, target, tau,
                 cfg: SchemeConfig = SchemeConfig(),
                 comp_method: str = "minVOverTime",
                 accuracy_grad: str = "weno5",
                 use_earliest: bool = True):
        self.grid = grid
        self.system = system
        self.target = target
        self.tau = jnp.asarray(tau)
        self.cfg = cfg
        self.comp_method = comp_method
        self.accuracy_grad = accuracy_grad
        self.use_earliest = use_earliest

        grad_fn = functools.partial(compute_gradients, grid,
                                    accuracy=accuracy_grad)
        self._grad_fn = jax.jit(
            lambda values: jnp.stack(grad_fn(values), axis=-1))

        nd = grid.ndim
        n_states = system.n_states

        def act_impl(plan_values, plan_grads, tau, state, t):
            if self.use_earliest:
                # earliest slice whose set contains the state: values are
                # (T, ...); evaluate V_k(state) for all k, take first <= 0
                vals = jax.vmap(lambda v: eval_u(grid, v, state))(
                    plan_values)
                inside = vals <= 0
                t_idx = jnp.where(jnp.any(inside), jnp.argmax(inside),
                                  plan_values.shape[0] - 1)
            else:
                t_idx = plan_values.shape[0] - 1
            g_tab = plan_grads[t_idx]
            p = tuple(eval_u(grid, g_tab[..., k], state)
                      for k in range(nd))
            x = tuple(state[..., k] for k in range(n_states))
            u = self.system.opt_control(t, x, p, self.system.u_mode)
            d = self.system.opt_disturbance(t, x, p, self.system.d_mode)
            v = eval_u(grid, plan_values[t_idx], state)
            return (jnp.stack(u, -1) if u else jnp.zeros(0),
                    jnp.stack(d, -1) if d else jnp.zeros(0),
                    v)

        self._act = jax.jit(act_impl)

    # ------------------------------------------------------------------ api
    def plan(self, obstacles=None) -> Plan:
        """Solve the BRT for the current environment and precompute gradient
        tables.  One jitted solve + one jitted gradient pass."""
        res = solve(self.grid, self.system, self.target, self.tau,
                    cfg=self.cfg, comp_method=self.comp_method,
                    obstacles=obstacles)
        grads = self._grad_fn(res.values)
        return Plan(values=res.values, gradients=grads, tau=res.tau)

    def act(self, plan: Plan, state, t=0.0):
        """Optimal (control, disturbance, value) at ``state`` — batched over
        leading dims of ``state``."""
        return self._act(plan.values, plan.gradients, plan.tau,
                         jnp.asarray(state, plan.values.dtype),
                         jnp.asarray(t, plan.values.dtype))

    def rollout(self, plan: Plan, x0, dt: float, n_steps: int):
        """Closed-loop rollout under the plan (scan, on-device); batched
        over leading dims of ``x0``."""

        def step(state, _):
            u, d, v = self._act(plan.values, plan.gradients, plan.tau,
                                state, 0.0)
            u_t = tuple(u[..., k] for k in range(u.shape[-1])) \
                if u.size else ()
            d_t = tuple(d[..., k] for k in range(d.shape[-1])) \
                if d.size else ()
            nxt = self.system.step_state(0.0, state, u_t, d_t, dt)
            return nxt, (state, v)

        x0 = jnp.asarray(x0)
        _, (states, vals) = jax.lax.scan(step, x0, None, length=n_steps)
        return states, vals
