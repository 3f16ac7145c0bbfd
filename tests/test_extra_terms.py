"""Tests for the secondary level-set PDE terms."""
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import create_grid, sphere
from levelsetpy_tpu.extra_terms import (make_convection_term,
                                        make_curvature_term,
                                        make_discount_term,
                                        make_forcing_term, make_normal_term,
                                        make_reinit_term,
                                        make_trace_hessian_term,
                                        reinitialize, restrict_update,
                                        sum_terms)
from levelsetpy_tpu.integration import integrate


class TestReinit:
    def test_recovers_signed_distance(self):
        """A distorted implicit circle reinitializes to |grad phi| ~ 1 with
        the zero set preserved."""
        g = create_grid([-2.0, -2.0], [2.0, 2.0], 101)
        xs = g.mesh(jnp.float64)
        r = jnp.sqrt(xs[0] ** 2 + xs[1] ** 2)
        phi = (r - 1.0) * (2.0 + jnp.sin(3 * xs[0]))  # distorted, same zero
        out = reinitialize(g, phi, t_max=0.6)
        from levelsetpy_tpu.derivatives import centered_first

        gx = centered_first(g, out, 0)
        gy = centered_first(g, out, 1)
        mag = np.asarray(jnp.sqrt(gx ** 2 + gy ** 2))
        band = (np.abs(np.asarray(r) - 1.0) < 0.4)
        assert np.abs(mag[band] - 1.0).max() < 0.15
        # zero set preserved: sign agrees with r - 1 away from the interface
        far = np.abs(np.asarray(r) - 1.0) > 0.1
        assert (np.sign(out)[far] == np.sign(np.asarray(r) - 1.0)[far]).all()

    def test_sdf_is_fixed_point(self):
        """An exact SDF barely changes under reinitialization."""
        g = create_grid([-2.0, -2.0], [2.0, 2.0], 81)
        phi = sphere(g, radius=1.0, dtype=jnp.float64)
        out = reinitialize(g, phi, t_max=0.2)
        band = np.abs(np.asarray(phi)) < 0.8
        assert np.abs(np.asarray(out - phi))[band].max() < 0.02


class TestConvection:
    def test_translates_profile(self):
        """phi_t + V.grad phi = 0 with constant V translates the profile."""
        g = create_grid([0.0], [2 * np.pi], 201, periodic_dims=[0],
                        periodic_endpoint="exclusive")
        x = g.coord(0, jnp.float64)
        phi = jnp.sin(x)
        rhs = make_convection_term(g, (jnp.ones_like(x) * 1.0,),
                                   accuracy="weno5")
        out = integrate(rhs, 0.0, phi, 1.0, factor_cfl=0.5, rk_order=3)
        expect = jnp.sin(x - out.t)
        np.testing.assert_allclose(out.v, expect, atol=5e-4)


class TestCurvature:
    def test_circle_shrinks(self):
        """Motion by curvature shrinks a circle: radius obeys
        r' = -b/r -> r(t) = sqrt(r0^2 - 2 b t)."""
        g = create_grid([-2.0, -2.0], [2.0, 2.0], 101)
        phi = sphere(g, radius=1.0, dtype=jnp.float64)
        b = 0.1
        # phi_t = b*kappa*|grad phi| with b > 0 is curvature flow (circles
        # shrink at rate b/r)
        rhs = make_curvature_term(g, b)
        out = integrate(rhs, 0.0, phi, 1.0, factor_cfl=0.4, rk_order=2)
        # radius estimate: phi ~ r - r_eff near center line
        v = np.asarray(out.v)
        line = v[50, 50:]  # along +y from center
        r_eff = np.interp(0.0, line, np.linspace(0, 2, 51))
        expect = np.sqrt(1.0 - 2 * b * float(out.t))
        assert abs(r_eff - expect) < 0.03, (r_eff, expect)


class TestNormal:
    def test_expands_at_unit_speed(self):
        g = create_grid([-2.0, -2.0], [2.0, 2.0], 101)
        phi = sphere(g, radius=0.5, dtype=jnp.float64)
        rhs = make_normal_term(g, 1.0, accuracy="eno2")
        out = integrate(rhs, 0.0, phi, 0.5, factor_cfl=0.5, rk_order=2)
        v = np.asarray(out.v)
        line = v[50, 50:]
        r_eff = np.interp(0.0, line, np.linspace(0, 2, 51))
        assert abs(r_eff - 1.0) < 0.03, r_eff  # 0.5 + 1.0*0.5

    def test_negative_speed_contracts(self):
        g = create_grid([-2.0, -2.0], [2.0, 2.0], 101)
        phi = sphere(g, radius=1.0, dtype=jnp.float64)
        rhs = make_normal_term(g, -0.5, accuracy="eno2")
        out = integrate(rhs, 0.0, phi, 0.5, factor_cfl=0.5, rk_order=2)
        v = np.asarray(out.v)
        line = v[50, 50:]
        r_eff = np.interp(0.0, line, np.linspace(0, 2, 51))
        assert abs(r_eff - 0.75) < 0.03, r_eff


class TestSimpleTerms:
    def test_forcing(self):
        g = create_grid([0.0], [1.0], 11)
        phi = jnp.zeros(11)
        rhs = make_forcing_term(2.0)
        out = integrate(rhs, 0.0, phi, 1.0, max_step=0.1)
        np.testing.assert_allclose(out.v, 2.0, atol=1e-9)

    def test_discount_decays(self):
        g = create_grid([0.0], [1.0], 11)
        phi = jnp.ones(11)
        rhs = make_discount_term(1.0)
        out = integrate(rhs, 0.0, phi, 1.0, max_step=0.01, rk_order=3)
        np.testing.assert_allclose(out.v, np.exp(-1.0), atol=1e-5)

    def test_sum_terms_combines(self):
        g = create_grid([0.0], [1.0], 11)
        phi = jnp.zeros(11)
        rhs = sum_terms(make_forcing_term(1.0), make_forcing_term(2.0))
        d, sb = rhs(0.0, phi)
        np.testing.assert_allclose(d, 3.0)
        assert np.isinf(sb)

    def test_restrict_update_min(self):
        rhs = restrict_update(make_forcing_term(2.0), positive=False)
        d, _ = rhs(0.0, jnp.zeros(5))
        np.testing.assert_allclose(d, 0.0)

    def test_trace_hessian_heat_equation(self):
        """With sigma = sqrt(2 D) I the trace term is D * laplacian — a
        gaussian bump should diffuse (peak decreases, mass spreads)."""
        g = create_grid([-3.0, -3.0], [3.0, 3.0], 61)
        xs = g.mesh(jnp.float64)
        phi = jnp.exp(-(xs[0] ** 2 + xs[1] ** 2))
        sigma = jnp.sqrt(2 * 0.1) * jnp.eye(2)
        rhs = make_trace_hessian_term(g, sigma)
        out = integrate(rhs, 0.0, phi, 0.5, factor_cfl=0.4, rk_order=2)
        v = np.asarray(out.v)
        assert v.max() < float(phi.max()) - 0.05
        assert v.min() > -1e-6  # diffusion keeps positivity (approx)
