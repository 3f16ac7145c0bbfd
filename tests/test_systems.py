"""Generic-Hamiltonian machinery: MIE side/TI-dim branch and fixed
control/disturbance overrides (ref Hamiltonians/generic_ham.py:23-59)."""
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import System, register_system


@register_system
class _Mie1D(System):
    """1-state system with a TI dimension: f = u, TIdyn = c."""

    c: float = 2.0
    u_max: float = 1.0

    n_states = 1
    u_mode = "min"

    def dynamics(self, t, x, u, d):
        return (u[0],)

    def opt_control(self, t, x, p, mode):
        s = jnp.sign(p[0])
        return ((-s if mode == "min" else s) * self.u_max,)

    def ti_dynamics(self, t, x, u, d):
        return self.c * jnp.ones_like(x[0])


@register_system
class _MieLower(_Mie1D):
    mie_side = "lower"


@register_system
class _MieUpper(_Mie1D):
    mie_side = "upper"


@register_system
class _MieBad(_Mie1D):
    mie_side = "sideways"


@register_system
class _FixedU(_Mie1D):
    u_fixed = (0.5,)


class TestMIE:
    def setup_method(self):
        self.x = (jnp.linspace(-1, 1, 5),)
        self.p = (jnp.ones(5),)

    def test_plain_backward(self):
        sys_ = _Mie1D()
        # u* = -1 (min, p=1): H = -(p*u) = 1
        np.testing.assert_allclose(sys_.hamiltonian(0.0, self.x, self.p),
                                   1.0)

    def test_lower_side_subtracts_ti(self):
        sys_ = _MieLower()
        # ham = p*u - c = -1 - 2 = -3; backward -> +3
        np.testing.assert_allclose(sys_.hamiltonian(0.0, self.x, self.p),
                                   3.0)

    def test_upper_side_adds_ti_and_negates(self):
        sys_ = _MieUpper()
        # ham = p*u + c = 1; backward -> -1; upper negates -> +1
        np.testing.assert_allclose(sys_.hamiltonian(0.0, self.x, self.p),
                                   1.0)

    def test_bad_side_rejected(self):
        sys_ = _MieBad()
        with pytest.raises(ValueError, match="upper or lower"):
            sys_.hamiltonian(0.0, self.x, self.p)

    def test_fixed_control_override(self):
        sys_ = _FixedU()
        # H = -(p * 0.5) = -0.5 regardless of the optimal policy
        np.testing.assert_allclose(sys_.hamiltonian(0.0, self.x, self.p),
                                   -0.5)
