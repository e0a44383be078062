"""Solver vs analytic transfer-matrix limits: uniform layers must reproduce
Fresnel/TMM exactly.  This is the primary independent physics cross-check
(the role Lumerical plays for the reference, README.md:41), plus energy
conservation with real pillar patterns."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa, basis
from metalens_tpu.solver.epsilon import rect_layer_toeplitz
from metalens_tpu.units import nm

from tmm_reference import tmm_rt

NUMG = 33
LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
NG = 1.459
ORDERS = ordmod.select_orders(LX, LY, NUMG)
I0 = ordmod.order_index(ORDERS, 0, 0)


def solve_uniform(eps_layer, ux, uy, pol, h=H, eps_glass=NG ** 2):
    """Solve air / uniform-eps layer / glass with the full 2D machinery and
    return (T, R, ampf, ampr, Kx, Ky); amplitudes as host numpy complex."""
    E = cpx.from_np(complex(eps_layer) * np.eye(NUMG))
    q2 = rcwa.q2_upper_bound(ORDERS, LX, LY, LAM, abs(eps_layer))
    ns = rcwa.default_n_slabs(2 * np.pi * h / LAM, q2)
    S, Kx, Ky = rcwa.cell_smatrix_with_eps(
        ORDERS, E, LX, LY, h, eps_glass, LAM, ux, uy,
        n_slabs=ns, taylor_terms=10)
    cy, cx = basis.incident_sp_amplitudes(ux, uy, pol)
    c_inc = jnp.zeros(2 * NUMG).at[I0].set(cy).at[I0 + NUMG].set(cx)
    ampf_c, ampr_c = rcwa.scatter_amplitudes(S, c_inc)
    ampf, ampr = cpx.to_np(ampf_c), cpx.to_np(ampr_c)
    n_g = np.sqrt(eps_glass)
    Kz_g = basis.kz_norm(Kx, Ky, eps_glass)
    Kz_a = basis.kz_norm(Kx, Ky, 1.0)
    Pt = float(basis.order_powers(ampf, Kx, Ky, Kz_g, n_g).sum())
    Pr = float(basis.backward_order_powers(ampr, Kx, Ky, Kz_a, 1.0).sum())
    Pin = float(basis.order_powers(c_inc, Kx, Ky, Kz_a, 1.0).sum())
    return Pt / Pin, Pr / Pin, ampf, ampr, Kx, Ky


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("theta_deg", [0.001, 20.0, 47.0])
def test_uniform_dielectric_slab_matches_tmm(pol, theta_deg):
    """air / (n=2) slab / glass at oblique incidence vs textbook TMM."""
    theta = np.deg2rad(theta_deg)
    ux, uy = np.sin(theta), 0.0
    T, R, *_ = solve_uniform(4.0 + 0j, ux, uy, pol)
    R_ref, T_ref = tmm_rt([1.0, 2.0, NG], [H], LAM, theta, pol)
    assert abs(T - T_ref) < 1e-8
    assert abs(R - R_ref) < 1e-8
    assert abs((T + R) - 1.0) < 1e-8


@pytest.mark.parametrize("pol", ["s", "p"])
def test_skewed_incidence_energy(pol):
    """Conical (ux and uy nonzero) incidence through a uniform slab still
    matches TMM (the effective incidence plane is rotated; T/R depend only on
    the polar angle for uniform layers... for s/p defined w.r.t. the plane of
    incidence, which our incident vectors implement)."""
    ux, uy = 0.35, 0.25
    theta = np.arcsin(np.hypot(ux, uy))
    T, R, *_ = solve_uniform(4.0 + 0j, ux, uy, pol)
    R_ref, T_ref = tmm_rt([1.0, 2.0, NG], [H], LAM, theta, pol)
    assert abs(T - T_ref) < 1e-8
    assert abs(R - R_ref) < 1e-8


def test_transmission_phase_normal_incidence():
    """Empty layer (air) over glass: transmitted x amplitude must be the
    Fresnel t times n_glass (S4 amplitude normalization) with the air
    propagation phase e^{i k0 h} referenced at the glass interface."""
    T, R, ampf, ampr, Kx, Ky = solve_uniform(1.0 + 0j, 0.0, 0.0, "p")
    tx = complex(ampf[I0 + NUMG])
    t_expected = 2 * NG / (1 + NG) * np.exp(1j * 2 * np.pi * H / LAM)
    assert abs(tx - t_expected) < 1e-8
    # reflected x amplitude: -r_E * e^{2 i k0 h} (backward modes carry -E)
    rx = complex(ampr[I0 + NUMG])
    r_expected = (NG - 1) / (NG + 1) * np.exp(2j * 2 * np.pi * H / LAM)
    assert abs(rx - r_expected) < 1e-8


def test_lamellar_grating_energy_and_zero_contrast():
    """A rect pattern with eps_fill == 1 must behave exactly like air; with
    contrast, energy must still be conserved to float64 precision."""
    E_air = rect_layer_toeplitz(ORDERS, LX, LY, (0.0, 0.0),
                                (600 * nm, 200 * nm), 1.0 + 0j)
    q2 = rcwa.q2_upper_bound(ORDERS, LX, LY, LAM, 1.0)
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    S, Kx, Ky = rcwa.cell_smatrix_with_eps(
        ORDERS, E_air, LX, LY, H, NG ** 2, LAM, 0.3, 0.1,
        n_slabs=ns, taylor_terms=10)
    # off-diagonal scattering must vanish for a uniform layer
    off = cpx.to_np(S.s11)
    # s11 couples only within the same order for uniform media (2x2 pol blocks)
    for i in range(NUMG):
        off[i, i] = off[i + NUMG, i + NUMG] = 0.0
        off[i, i + NUMG] = off[i + NUMG, i] = 0.0
    assert np.abs(off).max() < 1e-10

    E_gr = rect_layer_toeplitz(ORDERS, LX, LY, (0.0, 0.0),
                               (600 * nm, 200 * nm), 5.6 + 0j)
    q2 = rcwa.q2_upper_bound(ORDERS, LX, LY, LAM, 5.6)
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    S, Kx, Ky = rcwa.cell_smatrix_with_eps(
        ORDERS, E_gr, LX, LY, H, NG ** 2, LAM, 0.3, 0.1,
        n_slabs=ns, taylor_terms=10)
    for pol in ("s", "p"):
        cy, cx = basis.incident_sp_amplitudes(0.3, 0.1, pol)
        c = jnp.zeros(2 * NUMG).at[I0].set(cy).at[I0 + NUMG].set(cx)
        ampf, ampr = rcwa.scatter_amplitudes(S, c)
        Kz_g = basis.kz_norm(Kx, Ky, NG ** 2)
        Kz_a = basis.kz_norm(Kx, Ky, 1.0)
        Pt = float(basis.order_powers(ampf, Kx, Ky, Kz_g, NG).sum())
        Pr = float(basis.backward_order_powers(ampr, Kx, Ky, Kz_a, 1.0).sum())
        Pin = float(basis.order_powers(c, Kx, Ky, Kz_a, 1.0).sum())
        assert abs((Pt + Pr) / Pin - 1.0) < 1e-8
