"""Fused-vs-XLA configuration matrix: one compact sweep over feature
combinations (comp method x epsilon method x RK order x operands) asserting
the kernel routing never changes results.  Complements the targeted
per-feature tests with breadth — a routing/eligibility regression anywhere
in the gate logic shows up here.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from levelsetpy_tpu import DubinsRel, SchemeConfig, create_grid, cylinder, \
    solve


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


GRID = create_grid([-6.0, -10.0, 0.0], [20.0, 10.0, 2 * np.pi],
                   (14, 12, 16), periodic_dims=[2])
XS = GRID.mesh_broadcastable(jnp.float32)
V0 = (cylinder(GRID, ignore_axes=[2], radius=5.0)
      + 0.5 * jnp.sin(XS[2]) * jnp.cos(0.3 * XS[0])
      * jnp.cos(0.2 * XS[1])).astype(jnp.float32)
OBS = cylinder(GRID, center=[8.0, 4.0, 0.0], ignore_axes=[2],
               radius=3.0).astype(jnp.float32)
TGT = cylinder(GRID, ignore_axes=[2], radius=4.0).astype(jnp.float32)
SYSTEM = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)

CASES = [
    # (comp, eps_method, rk, obstacles?, targets?, discount)
    ("minVOverTime", "constant", 1, False, False, None),
    ("maxVOverTime", "constant", 3, True, False, None),
    ("none", "maxOverNeighbors", 2, True, False, None),
    ("minVWithV0", "constant", 2, True, False, 0.9),
    ("maxVWithL", "constant", 2, False, True, None),
    ("minVWithL", "maxOverNeighbors", 2, True, True, 0.95),
    ("set", "constant", 2, True, False, None),
    ("zero", "constant", 2, False, False, None),
]


@pytest.mark.parametrize("comp,eps,rk,use_obs,use_tgt,gamma", CASES)
def test_fused_matrix(interpret_pallas, comp, eps, rk, use_obs, use_tgt,
                      gamma):
    tau = jnp.array([0.0, 0.06, 0.12], jnp.float32)
    kw = dict(comp_method=comp, save_all=False)
    if use_obs:
        kw["obstacles"] = OBS
    if use_tgt:
        kw["targets"] = TGT
    if gamma is not None:
        kw["discount_factor"] = gamma
    r1 = solve(GRID, SYSTEM, V0, tau,
               cfg=SchemeConfig(accuracy="veryHigh", rk_order=rk,
                                epsilon_method=eps, use_pallas=False), **kw)
    r2 = solve(GRID, SYSTEM, V0, tau,
               cfg=SchemeConfig(accuracy="veryHigh", rk_order=rk,
                                epsilon_method=eps, use_pallas=True), **kw)
    scale = float(jnp.max(jnp.abs(r1.values)))
    np.testing.assert_allclose(np.asarray(r2.values), np.asarray(r1.values),
                               atol=3e-5 * scale)
    assert int(r1.steps) == int(r2.steps)
    assert np.isfinite(np.asarray(r2.values)).all()
