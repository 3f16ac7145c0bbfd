"""Cross-validation of the JAX solver against the independent numpy oracle
(benchmarks/numpy_ref.py): same O&F algorithm, fully separate code path."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

from numpy_ref import Air3DNumpy, weno5_axis  # noqa: E402

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve, upwind_weno5)


def test_weno5_matches_numpy_oracle():
    g = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], [17, 15, 13],
                    periodic_dims=[2])
    rng = np.random.default_rng(0)
    u = np.asarray(cylinder(g, ignore_axes=[2], radius=5.0,
                            dtype=jnp.float64))
    u = u + 0.1 * rng.standard_normal(u.shape)  # break symmetry
    for axis in range(3):
        dl_j, dr_j = upwind_weno5(g, jnp.asarray(u), axis)
        dl_n, dr_n = weno5_axis(u, g.dx[axis], axis, g.periodic[axis])
        np.testing.assert_allclose(dl_j, dl_n, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(dr_j, dr_n, rtol=1e-10, atol=1e-12)


def test_air3d_brt_matches_numpy_oracle():
    """Full BRT solve, both stacks, same grid/horizon: the value functions
    must agree to solver tolerance (this is the max|V - V_ref| gate of
    BASELINE.json, on a CPU-sized grid)."""
    shape = (21, 21, 21)
    lo, hi = [-6, -10, 0], [20, 10, 2 * np.pi]
    ref = Air3DNumpy(lo, hi, shape, ve=5.0, vp=5.0, w=1.0)
    v0 = ref.target_cylinder(5.0)
    v_ref, t_ref, n_ref = ref.solve(v0.copy(), 0.5)

    g = create_grid(lo, hi, shape, periodic_dims=[2])
    sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    res = solve(g, sys_, jnp.asarray(v0), tau=jnp.array([0.0, 0.5]),
                cfg=SchemeConfig(accuracy="veryHigh", rk_order=2,
                                 factor_cfl=0.8),
                comp_method="minVOverTime")
    v_jax = np.asarray(res.values[-1])
    assert int(res.steps) == n_ref, (int(res.steps), n_ref)
    err = np.abs(v_jax - v_ref).max()
    assert err < 1e-3, f"max|V - V_ref| = {err:.2e}"
    # in f64 with identical algorithms the agreement should be far tighter
    assert err < 1e-8, f"max|V - V_ref| = {err:.2e} (expected roundoff-level)"
