"""Closed-loop replanning pipeline tests."""
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, create_grid,
                            sphere)
from levelsetpy_tpu.pipeline import ReplanningController


def make_controller(n=61, T=0.8):
    g = create_grid([-1.0, -1.0], [1.0, 1.0], n)
    sys_ = DoubleIntegrator(u_max=1.0)
    target = sphere(g, center=[0.0, 0.0], radius=0.15, dtype=jnp.float64)
    return ReplanningController(
        g, sys_, target, tau=jnp.linspace(0.0, T, 9),
        cfg=SchemeConfig(accuracy="eno2", rk_order=2),
        accuracy_grad="eno2")


class TestReplanning:
    def test_plan_shapes(self):
        c = make_controller()
        plan = c.plan()
        assert plan.values.shape == (9, 61, 61)
        assert plan.gradients.shape == (9, 61, 61, 2)

    def test_act_returns_bang_bang_control(self):
        c = make_controller()
        plan = c.plan()
        u, d, v = c.act(plan, jnp.array([0.3, 0.0]))
        assert u.shape == (1,)
        assert abs(abs(float(u[0])) - 1.0) < 1e-6  # |u| = u_max
        assert d.shape == (0,)

    def test_act_batched(self):
        c = make_controller()
        plan = c.plan()
        states = jnp.array([[0.3, 0.0], [-0.3, 0.0], [0.0, 0.4]])
        u, d, v = c.act(plan, states)
        assert u.shape == (3, 1) and v.shape == (3,)

    def test_rollout_reaches_target(self):
        c = make_controller()
        plan = c.plan()
        x0 = jnp.array([0.25, -0.1])
        states, vals = c.rollout(plan, x0, dt=0.02, n_steps=50)
        d_end = float(jnp.linalg.norm(states[-1]))
        d_start = float(jnp.linalg.norm(states[0]))
        assert d_end < d_start
        assert d_end < 0.2, d_end

    def test_replan_with_obstacle_changes_plan(self):
        c = make_controller()
        g = c.grid
        plan0 = c.plan()
        obstacle = sphere(g, center=[0.4, 0.0], radius=0.2,
                          dtype=jnp.float64)
        plan1 = c.plan(obstacles=obstacle)
        v0 = np.asarray(plan0.values[-1])
        v1 = np.asarray(plan1.values[-1])
        inside_obs = np.asarray(obstacle) < -0.05
        assert (v1[inside_obs] > 0).all()
        # the obstacle can only shrink the BRT — up to the O(dx^2)
        # non-monotonicity of the ENO weights near the obstacle's kink
        assert (v1 >= v0 - 5e-3).all()
        assert (v1 <= 0).sum() < (v0 <= 0).sum()
