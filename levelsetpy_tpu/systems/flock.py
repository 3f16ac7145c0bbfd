"""Multi-agent flock reachability: vectorized birds + topological consensus.

TPU-first redesign of the reference's ``DynamicalSystems/bird.py`` /
``flock.py`` / ``Graph``: starling-inspired flocks where each agent interacts
with its topological (label-distance) neighbours — Ballerini et al. PNAS 2008
— and headings follow the Jadbabaie nearest-neighbour consensus rule.

The reference stores agents as Python objects, loops over them per
Hamiltonian evaluation, and round-trips every per-agent result through host
memory (``flock.py:225-234`` ``.get()`` per agent — survey Q3).  Here the
flock is ONE pytree: headings are an ``(N,)`` array, the neighbour graph an
``(N, N)`` adjacency matrix, the consensus update a single matmul
(``theta' = (theta + A theta) / (1 + valence)`` — Jadbabaie's
``(I + Dp)^-1 (I + Ap)`` row-normalised transition, ``flock.py:191-236``
intent), and the flock Hamiltonian/dissipation ``vmap`` over the agent axis
followed by a min/max reduce — everything stays on device and batches onto
the VPU.

Semantics (ref ``flock.py:191-258``):
  * one "attacked" agent plays the relative-coordinates pursuit-evasion game
    (the DubinsRel Merz Hamiltonian);
  * every other agent contributes its absolute-coordinates Hamiltonian
    evaluated at its own heading (``bird.py:235-276``);
  * flock Hamiltonian = union (pointwise min) of member Hamiltonians;
  * flock dissipation = elementwise max of member alphas.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import System, register_system, static_field
from .dubins import DubinsRel

__all__ = ["Flock", "topological_adjacency", "consensus_matrix"]


def topological_adjacency(n: int, neigh_rad: int) -> jnp.ndarray:
    """(N, N) 0/1 adjacency by topological label distance
    (``flock._compare_neighbor``, ``flock.py:166-169``): agents i and j are
    neighbours iff ``0 < |i - j| < neigh_rad``."""
    idx = jnp.arange(n)
    d = jnp.abs(idx[:, None] - idx[None, :])
    return ((d > 0) & (d < neigh_rad)).astype(jnp.float32)


def consensus_matrix(adj: jnp.ndarray) -> jnp.ndarray:
    """Row-stochastic Jadbabaie transition ``(I + D)^-1 (I + A)``."""
    valence = adj.sum(axis=1)
    return (jnp.eye(adj.shape[0]) + adj) / (1.0 + valence)[:, None]


@register_system
class Flock(System):
    """N Dubins agents with consensus headings on a shared 3-D relative
    grid.  Pytree: ``headings`` (and speeds) are leaves — sweeps over flock
    configurations vmap; ``n_agents``/``neigh_rad``/``attacked`` are static.
    """

    headings: jnp.ndarray = None          # (N,) w_e per agent
    v_e: float = 5.0
    v_p: float = 5.0
    w_bound: float = 5.0
    n_agents: int = static_field(default=3)
    neigh_rad: int = static_field(default=2)
    attacked: int = static_field(default=0)

    n_states = 3
    alpha_time_invariant = True

    def __post_init__(self):
        if self.headings is None:
            object.__setattr__(
                self, "headings",
                jnp.linspace(0.0, 1.0, self.n_agents))

    # ------------------------------------------------------------- consensus
    def consensus_step(self) -> "Flock":
        """One Jadbabaie heading-consensus update over the topological
        neighbour graph (``flock._update_headings``, ``flock.py:171-189``)."""
        adj = topological_adjacency(self.n_agents, self.neigh_rad)
        f = consensus_matrix(adj).astype(self.headings.dtype)
        return dataclasses.replace(self, headings=f @ self.headings)

    # ---------------------------------------------------------- member parts
    def _attacked_system(self) -> DubinsRel:
        return DubinsRel(v_e=self.v_e, v_p=self.v_p, w_bound=self.w_bound)

    def _abs_hamiltonian(self, heading, p):
        """Absolute-coordinates member Hamiltonian at the agent's heading
        (``bird.py:235-276``): ``-p1 cos(th) - p2 sin(th) - p3 w``."""
        return (-p[0] * jnp.cos(heading) - p[1] * jnp.sin(heading)
                - p[2] * heading)

    def hamiltonian(self, t, x, p):
        """Union (pointwise min) of member Hamiltonians
        (``flock.hamiltonian``, ``flock.py:191-236``)."""
        rel_ham = self._attacked_system().hamiltonian(t, x, p)
        if self.n_agents == 1:
            return rel_ham
        heads = jnp.delete(self.headings, self.attacked,
                           assume_unique_indices=True)
        abs_hams = jax.vmap(lambda h: self._abs_hamiltonian(h, p))(heads)
        return jnp.minimum(rel_ham, jnp.min(abs_hams, axis=0))

    def alpha(self, t, x, p_min, p_max, axis):
        """Elementwise max of member dissipation bounds
        (``flock.dissipation``, ``flock.py:238-258``)."""
        a = self._attacked_system().alpha(t, x, p_min, p_max, axis)
        if self.n_agents == 1:
            return a
        heads = jnp.delete(self.headings, self.attacked,
                           assume_unique_indices=True)
        if axis == 0:
            member = jnp.max(jnp.abs(jnp.cos(heads)))
        elif axis == 1:
            member = jnp.max(jnp.abs(jnp.sin(heads)))
        else:
            member = jnp.max(jnp.abs(heads))
        return jnp.maximum(a, member * jnp.ones_like(a))

    # ------------------------------------------------------------- dynamics
    def dynamics(self, t, x, u, d):
        return self._attacked_system().dynamics(t, x, u, d)

    def opt_control(self, t, x, p, mode):
        return self._attacked_system().opt_control(t, x, p, mode)

    def opt_disturbance(self, t, x, p, mode):
        return self._attacked_system().opt_disturbance(t, x, p, mode)
