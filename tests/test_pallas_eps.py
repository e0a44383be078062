"""The fused Pallas eps-structure kernel (interpret mode on CPU) must match
the XLA implementation exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod
from metalens_tpu.solver.epsilon import (ellipse_structure_toeplitz,
                                         toeplitz_from_structure)
from metalens_tpu.solver.pallas_eps import ellipse_structure_toeplitz_pallas
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                  [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])


def test_pallas_structure_matches_xla():
    orders = ordmod.select_orders(LX, LY, 50)
    S_ref, z_ref = ellipse_structure_toeplitz(
        orders, LX, LY, jnp.asarray(XYRRA, jnp.float32),
        small_arg_only=True)
    S_pal, z_pal = ellipse_structure_toeplitz_pallas(
        orders, LX, LY, jnp.asarray(XYRRA, jnp.float32), interpret=True)
    np.testing.assert_allclose(cpx.to_np(S_pal), cpx.to_np(S_ref),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref),
                               atol=0)
    # and the assembled eps matrix agrees
    E_ref = toeplitz_from_structure(S_ref, z_ref, 2.372 ** 2)
    E_pal = toeplitz_from_structure(S_pal, z_pal, 2.372 ** 2)
    np.testing.assert_allclose(cpx.to_np(E_pal), cpx.to_np(E_ref),
                               rtol=2e-5, atol=2e-6)
