"""Minimax-DDP (VarHJIApprox capability) tests.

Validation strategy: (1) an LQ game where DDP is *exact* — the converged
value must match an independent numpy game-Riccati recursion; (2) the
double-integrator analytic min-time-to-reach as a golden oracle for the
reach approximation; (3) the rocket game's mirror-strategy physics."""
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import DoubleIntegrator, RocketSystem
from levelsetpy_tpu.ddp import DDPConfig, ddp_minimax, varhji_reach


class TestLQGameExact:
    def test_matches_game_riccati(self):
        rng = np.random.default_rng(0)
        n, nu, nv, T = 3, 2, 1, 12
        dt = 0.1
        Ad = np.eye(n) + dt * rng.normal(size=(n, n)) * 0.3
        Bd = dt * rng.normal(size=(n, nu))
        Cd = dt * rng.normal(size=(n, nv)) * 0.5
        Ru = 1.0 * np.eye(nu)
        Rv = 6.0 * np.eye(nv)
        Qf = np.eye(n)

        # independent backward game-Riccati recursion (numpy)
        P = Qf.copy()
        for _ in range(T):
            M = np.block([
                [dt * Ru + Bd.T @ P @ Bd, Bd.T @ P @ Cd],
                [Cd.T @ P @ Bd, -dt * Rv + Cd.T @ P @ Cd],
            ])
            # maximizer block must stay concave for a well-posed saddle
            assert np.all(np.linalg.eigvalsh(M[nu:, nu:]) < 0)
            N = np.vstack([Bd.T @ P @ Ad, Cd.T @ P @ Ad])
            K = -np.linalg.solve(M, N)
            P = Ad.T @ P @ Ad + K.T @ M @ K + K.T @ N + N.T @ K
            P = 0.5 * (P + P.T)

        x0 = np.array([1.0, -0.5, 0.25])
        v_riccati = 0.5 * x0 @ P @ x0

        def step_fn(t, x, u, v, _dt):
            return Ad @ x + Bd @ u + Cd @ v

        def run_cost(t, x, u, v):
            return 0.5 * (u @ Ru @ u - v @ Rv @ v)

        def term_cost(x):
            return 0.5 * x @ Qf @ x

        res = ddp_minimax(step_fn, term_cost, jnp.asarray(x0),
                          horizon=T * dt, n_steps=T, nu=nu, nv=nv,
                          run_cost=run_cost,
                          cfg=DDPConfig(iters=3, reg=1e-10))
        np.testing.assert_allclose(float(res.value), v_riccati, rtol=1e-8)
        # LQ: exact after one backward/forward sweep; later sweeps are no-ops
        assert float(jnp.abs(res.improvements[-1])) < 1e-10

    def test_single_player_reduces_to_lqr(self):
        n, nu, T, dt = 2, 1, 10, 0.1
        Ad = np.array([[1.0, dt], [0.0, 1.0]])
        Bd = np.array([[0.0], [dt]])
        Ru = np.eye(nu)
        Qf = np.diag([4.0, 1.0])
        P = Qf.copy()
        for _ in range(T):
            M = dt * Ru + Bd.T @ P @ Bd
            N = Bd.T @ P @ Ad
            K = -np.linalg.solve(M, N)
            P = Ad.T @ P @ Ad + K.T @ M @ K + K.T @ N + N.T @ K

        x0 = np.array([1.0, 0.0])

        def step_fn(t, x, u, v, _dt):
            return Ad @ x + Bd @ u

        res = ddp_minimax(step_fn, lambda x: 0.5 * x @ Qf @ x,
                          jnp.asarray(x0), horizon=T * dt, n_steps=T,
                          nu=nu, nv=0,
                          run_cost=lambda t, x, u, v: 0.5 * (u @ Ru @ u),
                          cfg=DDPConfig(iters=3, reg=1e-10))
        np.testing.assert_allclose(float(res.value), 0.5 * x0 @ P @ x0,
                                   rtol=1e-8)


class TestVarHJIReach:
    def test_double_integrator_mttr_golden(self):
        """Reach approximation against the analytic min-time oracle
        (ref ``double_integrator.py:91-119``): states with mttr well inside
        the horizon must classify reachable; far outside, unreachable."""
        sys_ = DoubleIntegrator(u_max=1.0)
        r = 0.2
        x0s = jnp.array([
            [0.25, 0.0],    # mttr = 1.0  << 2.0  -> reachable
            [-0.25, 0.0],   # symmetric                 reachable
            [3.0, 0.0],     # mttr = 3.46 >> 2.0  -> unreachable
        ])
        taus = jnp.array([0.7, 1.4, 2.0])

        def target(x):
            return x @ x - r ** 2

        # tanh-saturated bang-bang: full steps overshoot and oscillate;
        # half-steps converge to the exact park-at-origin solution
        vals, per_tau = varhji_reach(
            sys_, x0s, taus, target, n_steps=40, nu=1, nv=0, squash=1.0,
            cfg=DDPConfig(iters=150, reg=1e-4, step=0.5))
        vals = np.asarray(vals)
        assert vals[0] < 0 and vals[1] < 0
        assert vals[2] > 0.5
        # unreachable-state best distance: from (3,0) the max travel toward
        # the origin in 2.0 s from rest is 2.0 -> residual >= 1 - r^2-ish
        assert per_tau.shape == (3, 3)

    def test_rocket_mirror_strategy(self):
        """Identical rockets: the evader mirrors the pursuer, so capture is
        decided by drift alone (ref ``rocket_system.py`` physics; equal
        thrusts cancel in relative coordinates)."""
        sys_ = RocketSystem(a_e=64.0, a_p=64.0, capture_rad=100.0)
        r = 100.0
        x0s = jnp.array([
            [400.0, 0.0, -200.0, 0.0],   # closing at 200 ft/s -> capture
            [400.0, 0.0, 200.0, 0.0],    # receding -> escape
        ])

        def target(x):
            return x[0] ** 2 + x[1] ** 2 - r ** 2

        vals, _ = varhji_reach(sys_, x0s, jnp.array([1.0, 2.0]), target,
                               n_steps=24, nu=1, nv=1,
                               cfg=DDPConfig(iters=25, reg=1e-2))
        vals = np.asarray(vals)
        assert vals[0] < 0          # drift closes to 0 by t=2
        assert vals[1] > 0          # drift only opens the gap
