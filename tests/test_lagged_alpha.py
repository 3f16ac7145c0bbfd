"""Per-interval lagged alpha refresh (VERDICT r3 #4): systems whose alpha
varies with TIME but ignores the costate box (``alpha_costate_free``) get
dissipation bounds + CFL dt recomputed once per tau interval (frozen at the
interval's start) — routing them through the fused RK-substep kernel AND
hoisting the per-substep alpha work out of the XLA loop.  Parity vs the
exact per-substep path holds up to the documented O(dt) lag.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import SchemeConfig, create_grid, solve, sphere
from levelsetpy_tpu.systems import System, register_system


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


class _Pulsing(System):
    """3-D front propagation with a time-varying speed
    ``s(t) = base * (1 + amp * sin(w t))`` — alpha depends on t only."""

    n_states = 3

    def speed(self, t):
        return self.base * (1.0 + self.amp * jnp.sin(self.w * t))

    def hamiltonian(self, t, x, p):
        return self.speed(t) * jnp.sqrt(sum(pi * pi for pi in p) + 1e-12)

    def alpha(self, t, x, p_min, p_max, axis):
        return jnp.abs(self.speed(t)) * jnp.ones_like(x[0])


@register_system
class PulsingLagged(_Pulsing):
    base: float = 1.0
    amp: float = 0.3
    w: float = 4.0
    alpha_costate_free = True     # opt IN to the lagged refresh


@register_system
class PulsingExact(_Pulsing):
    base: float = 1.0
    amp: float = 0.3
    w: float = 4.0                # default: exact per-substep alpha


def _setup():
    grid = create_grid([-1.0] * 3, [1.0] * 3, (16, 16, 16))
    xs = grid.mesh_broadcastable(jnp.float32)
    v = (sphere(grid, radius=0.5)
         + 0.05 * jnp.sin(4 * xs[0]) * jnp.cos(3 * xs[1])
         * jnp.cos(2 * xs[2])).astype(jnp.float32)
    return grid, v


def test_lagged_alpha_routes_fused(interpret_pallas, monkeypatch):
    from levelsetpy_tpu.kernels import hjstep

    calls = []
    orig = hjstep.fused_rk_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(hjstep, "fused_rk_step", spy)
    grid, v = _setup()
    cfg = SchemeConfig(accuracy="veryHigh", rk_order=2,
                       epsilon_method="constant", use_pallas=True,
                       factor_cfl=0.7873)
    solve(grid, PulsingLagged(), v, jnp.array([0.0, 0.1], jnp.float32),
          cfg=cfg)
    assert calls, "time-varying-alpha system did not reach fused_rk_step"


@pytest.mark.parametrize("use_pallas", [True, False])
def test_lagged_alpha_parity_small_intervals(interpret_pallas, use_pallas):
    """With tau intervals short relative to the speed's variation, both
    lagged executions (fused kernel and lagged-XLA) must track the exact
    per-substep path to the documented O(dt) budget."""
    grid, v = _setup()
    # 8 short intervals over 0.2s: speed varies ~2% within an interval
    tau = jnp.linspace(0.0, 0.2, 9).astype(jnp.float32)
    cfg_x = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant")
    cfg_l = SchemeConfig(accuracy="veryHigh", rk_order=2,
                         epsilon_method="constant", use_pallas=use_pallas)
    r1 = solve(grid, PulsingExact(), v, tau, cfg=cfg_x)
    r2 = solve(grid, PulsingLagged(), v, tau, cfg=cfg_l)
    v1, v2 = np.asarray(r1.values), np.asarray(r2.values)
    assert np.isfinite(v2).all()
    scale = np.abs(v1).max()
    # lag budget: dt * max relative speed change per interval ~ 1e-3
    np.testing.assert_allclose(v2, v1, atol=2e-3 * scale)
