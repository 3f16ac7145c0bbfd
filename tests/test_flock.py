"""Multi-agent flock system tests."""
import jax
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import SchemeConfig, create_grid, cylinder, solve
from levelsetpy_tpu.systems.flock import (Flock, consensus_matrix,
                                          topological_adjacency)


class TestGraph:
    def test_adjacency_topological(self):
        a = np.asarray(topological_adjacency(5, 2))
        # neighbors are labels at distance 1 only
        assert a[0, 1] == 1 and a[1, 0] == 1
        assert a[0, 2] == 0 and a[0, 0] == 0
        assert (a == a.T).all()

    def test_consensus_matrix_row_stochastic(self):
        adj = topological_adjacency(6, 3)
        f = np.asarray(consensus_matrix(adj))
        np.testing.assert_allclose(f.sum(axis=1), 1.0, atol=1e-6)
        assert (f >= 0).all()

    def test_consensus_converges_to_agreement(self):
        """Repeated Jadbabaie updates on a connected graph reach heading
        consensus."""
        flock = Flock(headings=jnp.array([0.1, 0.9, 0.4, 0.7]),
                      n_agents=4, neigh_rad=2)
        for _ in range(200):
            flock = flock.consensus_step()
        h = np.asarray(flock.headings)
        assert h.std() < 1e-5
        # consensus preserves the achievable range
        assert 0.1 - 1e-6 <= h.mean() <= 0.9 + 1e-6


class TestFlockSystem:
    def grid(self, n=15):
        return create_grid([-6, -10, 0], [20, 10, 2 * np.pi], n,
                           periodic_dims=[2])

    def test_flock_ham_is_union_of_members(self):
        g = self.grid()
        flock = Flock(headings=jnp.array([0.5, 1.0, 1.5]), n_agents=3,
                      v_e=5.0, v_p=5.0, w_bound=1.0)
        xs = g.mesh_broadcastable(jnp.float64)
        p = tuple(jnp.ones(g.shape) for _ in range(3))
        ham = flock.hamiltonian(0.0, xs, p)
        solo = flock._attacked_system().hamiltonian(0.0, xs, p)
        assert ham.shape == g.shape
        # union: flock ham <= attacked agent's ham pointwise
        assert (np.asarray(ham) <= np.asarray(solo) + 1e-12).all()

    def test_flock_alpha_dominates_member(self):
        g = self.grid()
        flock = Flock(headings=jnp.array([0.5, 1.0]), n_agents=2,
                      v_e=5.0, v_p=5.0, w_bound=1.0)
        xs = g.mesh_broadcastable(jnp.float64)
        for axis in range(3):
            a_f = flock.alpha(0.0, xs, None, None, axis)
            a_m = flock._attacked_system().alpha(0.0, xs, None, None, axis)
            assert (np.asarray(a_f) >= np.asarray(a_m) - 1e-12).all()

    def test_flock_brt_solves(self):
        g = self.grid()
        target = cylinder(g, ignore_axes=[2], radius=5.0,
                          dtype=jnp.float64)
        flock = Flock(headings=jnp.array([0.5, 1.0, 1.5]), n_agents=3,
                      v_e=5.0, v_p=5.0, w_bound=1.0)
        res = solve(g, flock, target, tau=jnp.linspace(0.0, 0.2, 3),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        v = np.asarray(res.values)
        assert np.isfinite(v).all()
        assert (v[-1] <= v[0] + 1e-12).all()

    def test_vmap_over_flock_headings(self):
        g = self.grid(9)
        target = cylinder(g, ignore_axes=[2], radius=5.0,
                          dtype=jnp.float64)

        def solve_one(headings):
            flock = Flock(headings=headings, n_agents=3, v_e=5.0, v_p=5.0,
                          w_bound=1.0)
            return solve(g, flock, target, tau=jnp.array([0.0, 0.1]),
                         cfg=SchemeConfig(accuracy="first", rk_order=1),
                         save_all=False).values

        batch = jnp.array([[0.5, 1.0, 1.5], [0.2, 0.4, 0.6]])
        out = jax.vmap(solve_one)(batch)
        assert out.shape == (2, 1) + g.shape
        assert np.isfinite(np.asarray(out)).all()
