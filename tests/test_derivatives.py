"""Spatial-derivative correctness: exactness, convergence order, WENO/ENO
equivalence properties (the reference's own checkEquivalentApprox self-checks,
``SpatialDerivative/check_eq_approx.py``, as real tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import create_grid
from levelsetpy_tpu.derivatives import (centered_first, curvature, hessian,
                                        laplacian, second_derivative,
                                        upwind_eno2, upwind_eno3,
                                        upwind_first, upwind_weno5)

SCHEMES = {
    "first": (upwind_first, 1),
    "eno2": (upwind_eno2, 2),
    "eno3": (upwind_eno3, 3),
    "weno5": (upwind_weno5, 5),
}


def periodic_grid_1d(n):
    # exact periodic convention: n cells over [0, 2*pi), wrap ghost cells
    # are mathematically exact (needed for clean convergence orders)
    return create_grid([0.0], [2 * np.pi], n, periodic_dims=[0],
                       periodic_endpoint="exclusive")


def smooth_error(scheme_fn, n):
    g = periodic_grid_1d(n)
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x)
    du = jnp.cos(x)
    dl, dr = scheme_fn(g, u, 0)
    # central average cancels the one-sided O(dx^k) leading terms' asymmetry
    err_l = jnp.max(jnp.abs(dl - du))
    err_r = jnp.max(jnp.abs(dr - du))
    return float(jnp.maximum(err_l, err_r))


@pytest.mark.parametrize("name", list(SCHEMES))
def test_exact_on_linear(name):
    """All upwind schemes reproduce a linear function's slope exactly
    (in the interior; extrapolating BCs preserve linears only approximately
    at the boundary because the slope sign is forced away from zero)."""
    fn, _ = SCHEMES[name]
    g = create_grid([0.0], [1.0], 41)
    x = g.coord(0, jnp.float64)
    u = 3.0 * x + 0.5
    dl, dr = fn(g, u, 0)
    interior = slice(4, -4)
    np.testing.assert_allclose(dl[interior], 3.0, atol=1e-10)
    np.testing.assert_allclose(dr[interior], 3.0, atol=1e-10)


@pytest.mark.parametrize("name", list(SCHEMES))
def test_convergence_order(name):
    """Empirical order on sin(x) with periodic BCs matches the formal order
    (ENO selection can shave a fraction near resolution switches; allow
    0.4 slack)."""
    fn, order = SCHEMES[name]
    e1 = smooth_error(fn, 81)
    e2 = smooth_error(fn, 161)
    p = np.log2(e1 / e2)
    assert p > order - 0.4, f"{name}: observed order {p:.2f} < {order}"


def test_weno5_interior_is_fifth_order_accurate():
    g = periodic_grid_1d(161)
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x)
    dl, dr = upwind_weno5(g, u, 0)
    assert float(jnp.max(jnp.abs(dl - jnp.cos(x)))) < 2e-8


@pytest.mark.parametrize("method", ["constant", "maxOverGrid",
                                    "maxOverNeighbors"])
def test_weno5_float32_constant_axis_no_nan(method):
    """Regression: in float32 the reference's 1e-99 epsilon guard underflows
    to zero, so a constant field along an axis (all D1 = 0, e.g. a cylinder
    target along its free axis) produced inf/NaN weights.  The dtype-aware
    floor must keep everything finite and the derivative exactly zero."""
    g = create_grid([0.0, 0.0], [1.0, 2 * np.pi], [16, 17],
                    periodic_dims=[1])
    u = jnp.broadcast_to(jnp.linspace(0, 1, 16)[:, None],
                         (16, 17)).astype(jnp.float32)
    dl, dr = upwind_weno5(g, u, 1, epsilon_method=method)
    assert bool(jnp.isfinite(dl).all()) and bool(jnp.isfinite(dr).all())
    np.testing.assert_allclose(dl, 0.0, atol=1e-6)


def test_weno5_epsilon_methods_agree_on_smooth_data():
    g = periodic_grid_1d(101)
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x)
    outs = [
        upwind_weno5(g, u, 0, epsilon_method=m)[0]
        for m in ("constant", "maxOverGrid", "maxOverNeighbors")
    ]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-7)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-7)


def test_weno_eno_candidates_relationship():
    """On smooth monotone data WENO5 ~ the central ENO3 weighting; all stay
    within the candidate hull — WENO is a convex combination of the three
    ENO3 candidates by construction."""
    g = periodic_grid_1d(101)
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x)
    wl, _ = upwind_weno5(g, u, 0)
    el, _ = upwind_eno3(g, u, 0)
    np.testing.assert_allclose(wl, el, atol=5e-5)


def test_eno2_picks_smooth_side_at_kink():
    """ENO2 must not difference across a kink: derivative left/right of a
    |x|-corner stays ±1 exactly (away from the corner cell)."""
    g = create_grid([-1.0], [1.0], 81)
    x = g.coord(0, jnp.float64)
    u = jnp.abs(x)
    dl, dr = upwind_eno2(g, u, 0)
    i = 10  # x = -0.75, far from both kink and boundary
    np.testing.assert_allclose(dl[i], -1.0, atol=1e-12)
    np.testing.assert_allclose(dr[i], -1.0, atol=1e-12)


def test_multiaxis_independence():
    """d/dx of f(x)+g(y) has no y dependence (axis-generic indexing)."""
    g = create_grid([0, 0], [1, 1], [33, 17])
    xs = g.mesh(jnp.float64)
    u = xs[0] ** 2 + jnp.sin(3 * xs[1])
    dl, dr = upwind_eno2(g, u, 0)
    # columns identical up to the y-independent d/dx
    np.testing.assert_allclose(dl[:, 3], dl[:, 12], atol=1e-10)


def test_left_right_mirror_symmetry():
    """Mirror symmetry: derivL of u(x) == -reverse(derivR of u(-x))."""
    g = periodic_grid_1d(64)
    x = g.coord(0, jnp.float64)
    u = jnp.sin(2 * x) + 0.3 * jnp.cos(5 * x)
    dl, _ = upwind_weno5(g, u, 0)
    uf = u[::-1]
    _, dr_f = upwind_weno5(g, uf, 0)
    np.testing.assert_allclose(dl, -dr_f[::-1], atol=1e-12)


class TestSecondOrderOps:
    def test_second_derivative(self):
        g = periodic_grid_1d(201)
        x = g.coord(0, jnp.float64)
        u = jnp.sin(x)
        d2 = second_derivative(g, u, 0)
        np.testing.assert_allclose(d2, -jnp.sin(x), atol=1e-3)

    def test_laplacian_2d(self):
        g = create_grid([0, 0], [2 * np.pi, 2 * np.pi], 101,
                        periodic_dims=[0, 1], periodic_endpoint="exclusive")
        xs = g.mesh(jnp.float64)
        u = jnp.sin(xs[0]) * jnp.sin(xs[1])
        lap = laplacian(g, u)
        np.testing.assert_allclose(lap, -2 * u, atol=2e-2)

    def test_hessian_symmetric(self):
        g = create_grid([0, 0], [1, 1], 51)
        xs = g.mesh(jnp.float64)
        u = xs[0] ** 2 * xs[1] + xs[1] ** 3
        h, grad = hessian(g, u)
        np.testing.assert_allclose(h[0][1], h[1][0])
        interior = (slice(5, -5), slice(5, -5))
        np.testing.assert_allclose(h[0][1][interior],
                                   (2 * xs[0])[interior], atol=1e-6)

    def test_curvature_of_circle(self):
        """kappa of an SDF circle = 1/r."""
        g = create_grid([-2, -2], [2, 2], 201)
        xs = g.mesh(jnp.float64)
        r = jnp.sqrt(xs[0] ** 2 + xs[1] ** 2)
        kappa, _ = curvature(g, r)
        # kappa of the SDF r is 1/r pointwise; check near the unit ring
        mask = (np.abs(np.asarray(r) - 1.0) < 0.05)
        np.testing.assert_allclose(np.asarray(kappa)[mask],
                                   (1.0 / np.asarray(r))[mask], atol=0.01)


def test_centered_first_matches_analytic():
    g = periodic_grid_1d(201)
    x = g.coord(0, jnp.float64)
    d = centered_first(g, jnp.sin(x), 0)
    np.testing.assert_allclose(d, jnp.cos(x), atol=1e-3)


# ------------------------------------------- independent 'b' formulations
def test_weno5b_matches_weno5a_constant_eps():
    """The independent direct-formula WENO5 (b) must agree with the
    production shared-table path (a) at machine precision when both use
    the constant epsilon — the reference's own correctness machinery
    (upwind_first_eno3b.py:83-85), now armed in-repo."""
    from levelsetpy_tpu.derivatives import (upwind_weno5, upwind_weno5b,
                                            check_equivalent_approx)
    g = create_grid([0.0, -1.0], [2 * np.pi, 1.0], (48, 33),
                    periodic_dims=[0], periodic_endpoint="exclusive")
    x0 = g.coord(0, jnp.float64)[:, None]
    x1 = g.coord(1, jnp.float64)[None, :]
    u = jnp.sin(x0) * (1.0 + 0.3 * x1) + 0.1 * x1 ** 3
    for axis in range(2):
        da = upwind_weno5(g, u, axis, epsilon_method="constant")
        db = upwind_weno5b(g, u, axis)
        check_equivalent_approx(da[0], db[0], 1e-11, "derivL a-vs-b")
        check_equivalent_approx(da[1], db[1], 1e-11, "derivR a-vs-b")


def test_eno3b_third_order_and_kink_safe():
    """eno3b's smallest-smoothness selection is a different rule than
    eno3a's DD tree, but it must still be 3rd-order on smooth data and
    non-oscillatory at a kink."""
    from levelsetpy_tpu.derivatives import upwind_eno3b

    errs = [smooth_error(upwind_eno3b, n) for n in (40, 80)]
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (errs, order)

    g = create_grid([-1.0], [1.0], 81)
    x = g.coord(0, jnp.float64)
    u = jnp.abs(x)  # kink at 0: derivatives must stay in [-1, 1] + O(dx)
    dl, dr = upwind_eno3b(g, u, 0)
    assert float(jnp.max(jnp.abs(dl))) < 1.0 + 1e-6
    assert float(jnp.max(jnp.abs(dr))) < 1.0 + 1e-6


def test_generate_all_candidate_equivalences():
    """generateAll debug mode: the reference's L/R candidate equivalences
    phi2^L == phi3^R and phi3^L == phi2^R (upwind_first_eno3b.py:78-85)
    hold on the independent path, and candidates agree across the two
    formulations."""
    from levelsetpy_tpu.derivatives import (self_check_derivatives,
                                            upwind_eno3b, upwind_weno5b,
                                            check_equivalent_approx)
    g = create_grid([0.0], [2 * np.pi], 64, periodic_dims=[0],
                    periodic_endpoint="exclusive")
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x) + 0.2 * jnp.cos(3 * x)

    for fn in (upwind_eno3b, upwind_weno5b):
        cl, cr = fn(g, u, 0, generate_all=True)
        assert len(cl) == 3 and len(cr) == 3
        check_equivalent_approx(cl[1], cr[2], 1e-11, "phi2L vs phi3R")
        check_equivalent_approx(cl[2], cr[1], 1e-11, "phi3L vs phi2R")

    # the full cross-formulation self-check machinery runs clean
    max_err = self_check_derivatives(g, u, 0)
    assert max_err < 1e-11


def test_self_check_derivatives_catches_disagreement(monkeypatch):
    """The self-check must actually FAIL when a formulation is broken
    (guards against the oracle machinery going vacuous)."""
    import levelsetpy_tpu.derivatives as D

    g = create_grid([0.0], [2 * np.pi], 32, periodic_dims=[0],
                    periodic_endpoint="exclusive")
    x = g.coord(0, jnp.float64)
    u = jnp.sin(x)

    orig = D.weno5b_from_padded

    def broken(dx, gdata, axis, n, generate_all=False):
        r = orig(dx, gdata, axis, n, generate_all)
        if generate_all:
            return r
        return r[0] + 1e-3, r[1]

    monkeypatch.setattr(D, "weno5b_from_padded", broken)
    with pytest.raises(AssertionError):
        D.self_check_derivatives(g, u, 0)


def test_accuracy_names_resolve_b_formulations():
    """'eno3b'/'weno5b' are real scheme names on the solver config surface
    (distinct code path from eno3/weno5)."""
    from levelsetpy_tpu.derivatives import upwind_fn, padded_fn

    fn_b, w = upwind_fn("weno5b")
    assert w == 3
    kern_b, wb = padded_fn("eno3b")
    assert wb == 3
    fn_a, _ = upwind_fn("weno5")
    assert fn_b is not fn_a


def test_b_formulations_solve_end_to_end():
    """'weno5b'/'eno3b' are usable accuracy names on the solver surface
    (independent stencil path through the full solve)."""
    import jax.numpy as jnp
    from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, create_grid,
                                solve, sphere)

    g = create_grid([-1.0, -1.0], [1.0, 1.0], 31)
    sys_ = DoubleIntegrator(u_max=1.0)
    phi0 = sphere(g, center=[0.0, 0.0], radius=0.3)
    tau = jnp.array([0.0, 0.1])
    ra = solve(g, sys_, phi0, tau,
               cfg=SchemeConfig(accuracy="veryHigh", rk_order=2,
                                epsilon_method="constant"))
    rb = solve(g, sys_, phi0, tau,
               cfg=SchemeConfig(accuracy="weno5b", rk_order=2))
    re = solve(g, sys_, phi0, tau,
               cfg=SchemeConfig(accuracy="eno3b", rk_order=2))
    va, vb, ve = (np.asarray(r.values[-1]) for r in (ra, rb, re))
    assert np.isfinite(vb).all() and np.isfinite(ve).all()
    scale = np.abs(va).max()
    # weno5b == weno5a at constant eps (identical scheme, different code
    # path -> f32 re-association only)
    np.testing.assert_allclose(vb, va, atol=1e-6 * scale)
    # eno3b is a different (3rd-order) selection rule: close, not equal
    assert np.abs(ve - va).max() < 0.05 * scale


def test_weno5z_order_and_critical_point():
    """WENO-Z (Borges et al. 2008): 5th order on smooth data AND full
    order at smooth critical points (where classic Jiang-Shu weights
    degrade to 3rd order), kink-safe, and a working solver accuracy
    name."""
    from levelsetpy_tpu.derivatives import upwind_weno5z, upwind_weno5

    errs = [smooth_error(upwind_weno5z, n) for n in (40, 80)]
    order = np.log2(errs[0] / errs[1])
    assert order > 4.5, (errs, order)

    # critical point: u = sin^2(x) has du=0 at x=0,pi/2,...; measure the
    # max error NEAR the critical points where classic WENO5 loses order
    def crit_err(fn, n):
        g = periodic_grid_1d(n)
        x = g.coord(0, jnp.float64)
        u = jnp.sin(x) ** 3          # u' = 3 sin^2 cos: double zero at 0
        du = 3 * jnp.sin(x) ** 2 * jnp.cos(x)
        dl, dr = fn(g, u, 0)
        d = 0.5 * (dl + dr)
        near = np.abs(np.sin(np.asarray(x))) < 0.2
        return float(np.abs(np.asarray(d - du))[near].max())

    ez = [crit_err(upwind_weno5z, n) for n in (40, 80)]
    order_z = np.log2(ez[0] / ez[1])
    ea = [crit_err(upwind_weno5, n) for n in (40, 80)]
    order_a = np.log2(ea[0] / ea[1])
    # Z restores near-design order at the critical point; classic drops
    assert order_z > 3.8, (ez, order_z)
    assert ez[1] < ea[1], (ez, ea)  # and is more accurate there

    # kink-safe (non-oscillatory)
    g = create_grid([-1.0], [1.0], 81)
    x = g.coord(0, jnp.float64)
    dl, dr = upwind_weno5z(g, jnp.abs(x), 0)
    assert float(jnp.max(jnp.abs(dl))) < 1.0 + 1e-6
    assert float(jnp.max(jnp.abs(dr))) < 1.0 + 1e-6

    # solver surface
    import jax.numpy as jnp2
    from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, create_grid
                                as cg, solve, sphere)

    gg = cg([-1.0, -1.0], [1.0, 1.0], 31)
    r = solve(gg, DoubleIntegrator(u_max=1.0),
              sphere(gg, center=[0.0, 0.0], radius=0.3),
              jnp2.array([0.0, 0.1]),
              cfg=SchemeConfig(accuracy="weno5z", rk_order=2))
    assert np.isfinite(np.asarray(r.values)).all()
