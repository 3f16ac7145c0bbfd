"""Tests for eval_u interpolation, projection, gradients, trajectories."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, compute_gradients,
                            create_grid, eval_u, optimal_trajectory, proj,
                            solve, sphere)


class TestEvalU:
    def test_exact_at_nodes(self):
        g = create_grid([0, 0], [1, 2], [11, 21])
        vals = jnp.arange(11 * 21, dtype=jnp.float64).reshape(11, 21)
        pts = jnp.array([[0.0, 0.0], [0.5, 1.0], [1.0, 2.0]])
        out = eval_u(g, vals, pts)
        np.testing.assert_allclose(out, [vals[0, 0], vals[5, 10],
                                         vals[10, 20]])

    def test_multilinear_between_nodes(self):
        g = create_grid([0, 0], [1, 1], [2, 2])
        vals = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        out = eval_u(g, vals, jnp.array([0.5, 0.5]))
        np.testing.assert_allclose(out, 1.5)

    def test_linear_function_reproduced(self):
        g = create_grid([-1, -1], [1, 1], 21)
        xs = g.mesh(jnp.float64)
        vals = 2 * xs[0] - 3 * xs[1] + 0.5
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(50, 2)))
        out = eval_u(g, vals, pts)
        expect = 2 * pts[:, 0] - 3 * pts[:, 1] + 0.5
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_periodic_wrap_exclusive(self):
        g = create_grid([0.0], [2 * np.pi], 16, periodic_dims=[0],
                        periodic_endpoint="exclusive")
        x = g.coord(0, jnp.float64)
        vals = jnp.sin(x)
        # query beyond hi: wraps around
        out = eval_u(g, vals, jnp.array([[2 * np.pi + 0.1], [-0.1]]))
        expect = eval_u(g, vals, jnp.array([[0.1],
                                            [2 * np.pi - 0.1]]))
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_clamps_outside_domain(self):
        g = create_grid([0.0], [1.0], 11)
        vals = jnp.linspace(0, 10, 11)
        out = eval_u(g, vals, jnp.array([[-0.5], [1.5]]))
        np.testing.assert_allclose(out, [0.0, 10.0])

    def test_vmap_batched_queries(self):
        g = create_grid([0, 0], [1, 1], 11)
        vals = sphere(g, radius=0.5, dtype=jnp.float64)
        pts = jnp.zeros((4, 7, 2)) + 0.3
        out = eval_u(g, vals, pts)
        assert out.shape == (4, 7)


class TestProj:
    def test_min_projection(self):
        g = create_grid([0, 0, 0], [1, 1, 1], [5, 6, 7])
        data = jnp.arange(5 * 6 * 7, dtype=jnp.float64).reshape(5, 6, 7)
        sub, out = proj(g, data, keep_axes=[0, 1], mode="min")
        assert sub.shape == (5, 6)
        np.testing.assert_allclose(out, np.asarray(data).min(axis=2))

    def test_max_projection(self):
        g = create_grid([0, 0], [1, 1], [4, 5])
        data = jnp.arange(20.0).reshape(4, 5)
        sub, out = proj(g, data, keep_axes=[1], mode="max")
        np.testing.assert_allclose(out, np.asarray(data).max(axis=0))

    def test_slice_projection(self):
        g = create_grid([0, 0], [1, 1], [11, 11])
        xs = g.mesh(jnp.float64)
        data = xs[0] + 10 * xs[1]
        sub, out = proj(g, data, keep_axes=[0], mode="slice",
                        slice_states=[0.35])
        expect = np.linspace(0, 1, 11) + 3.5
        np.testing.assert_allclose(out, expect, atol=1e-10)


class TestGradients:
    def test_gradient_of_linear(self):
        g = create_grid([0, 0], [1, 1], 21)
        xs = g.mesh(jnp.float64)
        v = 3.0 * xs[0] - 2.0 * xs[1]
        gx, gy = compute_gradients(g, v, accuracy="eno2")
        interior = (slice(3, -3), slice(3, -3))
        np.testing.assert_allclose(gx[interior], 3.0, atol=1e-9)
        np.testing.assert_allclose(gy[interior], -2.0, atol=1e-9)

    def test_time_stacked(self):
        g = create_grid([0, 0], [1, 1], 11)
        v = jnp.zeros((3, 11, 11))
        grads = compute_gradients(g, v, accuracy="first")
        assert grads[0].shape == (3, 11, 11)


class TestOptimalTrajectory:
    def test_double_integrator_reaches_target(self):
        """Closed-loop rollout from a reachable state must drive the value
        at the visited states down toward/below zero (entering the BRT's
        interior as time-to-go shrinks)."""
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 81)
        sys_ = DoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, center=[0.0, 0.0], radius=0.15, dtype=jnp.float64)
        tau = jnp.linspace(0.0, 0.8, 9)
        res = solve(g, sys_, phi0, tau,
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        x0 = jnp.array([0.25, -0.1])
        # state must be inside the final BRT for a feasible rollout
        assert float(eval_u(g, res.values[-1], x0)) <= 0
        traj = optimal_trajectory(g, sys_, res.values, tau, x0,
                                  accuracy="eno2")
        assert traj.states.shape == (9, 2)
        d0 = float(jnp.linalg.norm(traj.states[0]))
        dend = float(jnp.linalg.norm(traj.states[-1]))
        assert dend < d0, (d0, dend)
        # final state near the target ball
        assert dend < 0.25, dend

    def test_time_varying_system_queries_time_to_go(self):
        """Rollout step i reads value slice n_t-1-i (time-to-go
        tau[n_t-1-i]); a time-varying system must be queried at THAT time,
        not tau[i] — regression for the r2 time-convention bug."""
        from levelsetpy_tpu import System, register_system

        @register_system
        class TVIntegrator(System):
            u0: float = 0.5
            k: float = 1.0

            n_states = 2
            alpha_time_invariant = False

            def dynamics(self, t, x, u, d):
                return (x[1], u[0])

            def opt_control(self, t, x, p, mode):
                s = jnp.sign(p[1])
                mag = self.u0 + self.k * t     # time-varying bound
                return ((-s if mode == "min" else s) * mag,)

            def opt_disturbance(self, t, x, p, mode):
                return ()

            def alpha(self, t, x, p_min, p_max, axis):
                if axis == 0:
                    return jnp.abs(x[1])
                return (self.u0 + self.k * t) * jnp.ones_like(x[0])

        g = create_grid([-1.0, -1.0], [1.0, 1.0], 11)
        sys_ = TVIntegrator()
        tau = jnp.linspace(0.0, 1.0, 5)
        # synthetic stack: V = x2 everywhere -> gradient p = (0, 1), so the
        # extracted control magnitude is exactly u0 + k * t_query
        x2 = jnp.broadcast_to(g.mesh_broadcastable(jnp.float64)[1],
                              g.shape)
        values = jnp.broadcast_to(x2, (5, *g.shape))
        traj = optimal_trajectory(g, sys_, values, tau,
                                  jnp.array([0.0, 0.0]), accuracy="first")
        n_t = 5
        expected = -(0.5 + 1.0 * np.asarray(tau)[::-1])  # tau[n_t-1-i]
        np.testing.assert_allclose(np.asarray(traj.controls[:, 0]),
                                   expected, atol=1e-12)
        wrong = -(0.5 + 1.0 * np.asarray(tau))           # old tau[i] reading
        assert not np.allclose(np.asarray(traj.controls[:, 0]), wrong)

    def test_batched_rollouts(self):
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 41)
        sys_ = DoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, center=[0.0, 0.0], radius=0.15, dtype=jnp.float64)
        tau = jnp.linspace(0.0, 0.4, 5)
        res = solve(g, sys_, phi0, tau,
                    cfg=SchemeConfig(accuracy="first", rk_order=1))
        x0 = jnp.array([[0.1, 0.0], [0.0, 0.1], [-0.1, 0.0]])
        traj = jax.vmap(lambda x: optimal_trajectory(
            g, sys_, res.values, tau, x, accuracy="first"))(x0)
        assert traj.states.shape == (3, 5, 2)
