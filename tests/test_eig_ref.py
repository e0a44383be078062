"""Cross-validation: the eig-free production solver vs the classical
eigenmode reference solver (two independent propagation methods, same
physics) -- the framework's analog of the reference's Lumerical FDTD
cross-check (README.md:41), but automated and tight."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa, basis
from metalens_tpu.solver.eig import reference_cell_smatrix
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
NG, NT = 1.459, 2.372
XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                  [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])


@pytest.mark.parametrize("ux,uy", [(0.45, 0.0), (0.3, 0.15)])
def test_production_matches_eigenmode_reference(ux, uy):
    numG = 33
    orders = ordmod.select_orders(LX, LY, numG)
    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, NT ** 2)
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)

    S_prod, Kx, Ky = rcwa.cell_smatrix(orders, jnp.asarray(XYRRA), LX, LY,
                                       H, NT ** 2, NG ** 2, LAM, ux, uy,
                                       n_slabs=ns, taylor_terms=12)
    S_ref, Kx2, Ky2 = reference_cell_smatrix(orders, XYRRA, LX, LY, H,
                                             NT ** 2, NG ** 2, LAM, ux, uy)
    np.testing.assert_allclose(np.asarray(Kx), Kx2, atol=1e-12)

    s11_p = cpx.to_np(S_prod.s11)
    s11_r = np.asarray(S_ref.s11)
    s21_p = cpx.to_np(S_prod.s21)
    s21_r = np.asarray(S_ref.s21)
    # compare where amplitudes are significant (tiny evanescent couplings
    # are representation-sensitive)
    scale = np.abs(s11_r).max()
    assert np.abs(s11_p - s11_r).max() < 1e-7 * scale
    assert np.abs(s21_p - s21_r).max() < 1e-7 * scale


def test_reference_solver_conserves_energy():
    numG = 25
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    ux, uy = 0.45, 0.1
    S, Kx, Ky = reference_cell_smatrix(orders, XYRRA, LX, LY, H, NT ** 2,
                                       NG ** 2, LAM, ux, uy)
    cy, cx = basis.incident_sp_amplitudes(ux, uy, "p")
    c = np.zeros(2 * numG, complex)
    c[i0], c[i0 + numG] = float(cy), float(cx)
    ampf = S.s11 @ c
    ampr = S.s21 @ c
    Kz_g = basis.kz_norm(jnp.asarray(Kx), jnp.asarray(Ky), NG ** 2)
    Kz_a = basis.kz_norm(jnp.asarray(Kx), jnp.asarray(Ky), 1.0)
    Pt = float(basis.order_powers(ampf, jnp.asarray(Kx), jnp.asarray(Ky),
                                  Kz_g, NG).sum())
    Pr = float(basis.backward_order_powers(ampr, jnp.asarray(Kx),
                                           jnp.asarray(Ky), Kz_a, 1.0).sum())
    Pin = float(basis.order_powers(c, jnp.asarray(Kx), jnp.asarray(Ky),
                                   Kz_a, 1.0).sum())
    assert abs((Pt + Pr) / Pin - 1.0) < 1e-8
