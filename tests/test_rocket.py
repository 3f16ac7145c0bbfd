"""Rocket pursuit-evasion game tests (DDPReach-intent capability)."""
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import RocketSystem, SchemeConfig, create_grid, solve
from levelsetpy_tpu.shapes import cylinder


def setup(n=13):
    # relative position in +-600 ft, relative velocity in +-200 ft/s
    g = create_grid([-600, -600, -200, -200], [600, 600, 200, 200], n)
    sys_ = RocketSystem(a_e=64.0, a_p=64.0, capture_rad=100.0)
    target = cylinder(g, ignore_axes=[2, 3], center=[0, 0, 0, 0],
                      radius=100.0, dtype=jnp.float64)
    return g, sys_, target


class TestRocketGame:
    def test_capture_tube_grows(self):
        g, sys_, target = setup()
        res = solve(g, sys_, target, tau=jnp.linspace(0.0, 1.0, 3),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        v = np.asarray(res.values)
        assert np.isfinite(v).all()
        assert (v[-1] <= 0).sum() > (v[0] <= 0).sum()

    def test_identical_rockets_hamiltonian_symmetry(self):
        """Equal thrusts: the thrust terms cancel in the Isaacs Hamiltonian,
        leaving pure drift transport."""
        g, sys_, _ = setup(7)
        xs = g.mesh_broadcastable(jnp.float64)
        p = tuple(jnp.full(g.shape, 0.5) for _ in range(4))
        h = sys_.hamiltonian(0.0, xs, p)
        drift = -(p[0] * jnp.broadcast_to(xs[2], g.shape)
                  + p[1] * jnp.broadcast_to(xs[3], g.shape))
        np.testing.assert_allclose(h, drift, atol=1e-10)

    def test_stronger_evader_escapes_more(self):
        g, _, target = setup(11)
        tau = jnp.linspace(0.0, 0.8, 3)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        weak = solve(g, RocketSystem(a_e=50.0, a_p=64.0), target, tau,
                     cfg=cfg).values[-1]
        strong = solve(g, RocketSystem(a_e=80.0, a_p=64.0), target, tau,
                       cfg=cfg).values[-1]
        # stronger evader -> smaller capture tube
        assert (np.asarray(strong) <= 0).sum() \
            < (np.asarray(weak) <= 0).sum()
