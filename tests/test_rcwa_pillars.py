"""Physics checks of the solver on real pillar patterns: energy conservation
at every truncation, convergence in numG, dtype robustness, and analytic
gradients vs finite differences (the capability the reference's
derivative-free optimizers lack)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa, basis
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
NG, NT = 1.459, 2.372
XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                  [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])


def solve(numG, ux, uy, pol, rdtype=np.float64, xyrra=XYRRA):
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, NT ** 2)
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    eps_p = cpx.from_np(np.asarray(NT ** 2 + 0j)).astype(rdtype)
    eps_g = cpx.from_np(np.asarray(NG ** 2 + 0j)).astype(rdtype)
    S, Kx, Ky = rcwa.cell_smatrix(orders, jnp.asarray(xyrra, rdtype), LX, LY,
                                  H, eps_p, eps_g, LAM, ux, uy,
                                  n_slabs=ns, taylor_terms=10)
    cy, cx = basis.incident_sp_amplitudes(ux, uy, pol)
    c = jnp.zeros(2 * numG, rdtype).at[i0].set(cy).at[i0 + numG].set(cx)
    ampf, ampr = rcwa.scatter_amplitudes(S, c)
    return orders, Kx, Ky, np.asarray(c), cpx.to_np(ampf), cpx.to_np(ampr)


def powers(orders, Kx, Ky, c, ampf, ampr):
    numG = len(orders)
    Kz_g = basis.kz_norm(Kx, Ky, NG ** 2)
    Kz_a = basis.kz_norm(Kx, Ky, 1.0)
    Pt = float(basis.order_powers(ampf, Kx, Ky, Kz_g, NG).sum())
    Pr = float(basis.backward_order_powers(ampr, Kx, Ky, Kz_a, 1.0).sum())
    Pin = float(basis.order_powers(c, Kx, Ky, Kz_a, 1.0).sum())
    return Pt, Pr, Pin


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("numG", [25, 51])
def test_energy_conservation_pillars(pol, numG):
    out = solve(numG, 0.45, 0.1, pol)
    Pt, Pr, Pin = powers(*out)
    assert abs((Pt + Pr) / Pin - 1.0) < 1e-8


def test_convergence_in_numG():
    """Laurent-rule RCWA converges; the (-1,0) amplitude at numG=51 vs 81
    should agree to a few percent, and 81 vs 121 better still."""
    vals = {}
    for numG in (51, 81, 121):
        orders, Kx, Ky, c, ampf, ampr = solve(numG, 0.45, 0.0, "p")
        im1 = ordmod.order_index(orders, -1, 0)
        vals[numG] = complex(ampf[im1 + numG])
    err_51 = abs(vals[51] - vals[121]) / abs(vals[121])
    err_81 = abs(vals[81] - vals[121]) / abs(vals[121])
    assert err_81 < err_51
    assert err_81 < 0.05


def test_float32_matches_float64():
    o1 = solve(41, 0.45, 0.1, "p", rdtype=np.float64)
    o2 = solve(41, 0.45, 0.1, "p", rdtype=np.float32)
    a128 = np.asarray(o1[4])
    a64 = np.asarray(o2[4])
    # significant amplitudes agree to ~1% relative (well inside the 5-10%
    # absolute-efficiency tolerance the reference validates against,
    # README.md:41); energy balance in single precision stays at ~1e-4
    big = np.abs(a128) > 1e-2
    rel = np.abs(a64[big] - a128[big]) / np.abs(a128[big])
    assert rel.max() < 2e-2
    Pt, Pr, Pin = powers(*o2)
    assert abs((Pt + Pr) / Pin - 1.0) < 1e-3


def test_gradient_matches_finite_difference():
    """d|amp(-1,0)|^2 / d(rx of pillar 0): jax.grad through the entire solve
    (Toeplitz build, thin-slab exponential, star products, interface) must
    match central finite differences."""
    numG = 33
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    im1 = ordmod.order_index(orders, -1, 0)
    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, NT ** 2)
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)

    def objective(rx0):
        xyrra = jnp.asarray(XYRRA).at[0, 2].set(rx0)
        S, Kx, Ky = rcwa.cell_smatrix(orders, xyrra, LX, LY, H, NT ** 2,
                                      NG ** 2, LAM, 0.45, 0.0,
                                      n_slabs=ns, taylor_terms=10)
        cy, cx = basis.incident_sp_amplitudes(0.45, 0.0, "p")
        c = jnp.zeros(2 * numG).at[i0].set(cy).at[i0 + numG].set(cx)
        ampf, _ = rcwa.scatter_amplitudes(S, c)
        return cpx.abs2(ampf[im1 + numG])

    rx0 = 144 * nm
    g_auto = float(jax.grad(objective)(rx0))
    eps = 0.03 * nm
    g_fd = float((objective(rx0 + eps) - objective(rx0 - eps)) / (2 * eps))
    assert abs(g_auto - g_fd) / max(abs(g_fd), 1e-30) < 1e-5


def test_fast_slab_config_is_machine_exact():
    """The production slab/Taylor defaults (target 4.5, 12 terms) must match
    a very conservative configuration to machine precision -- pins the
    accuracy claim behind the throughput tuning."""
    numG = 33
    orders = ordmod.select_orders(LX, LY, numG)

    def s11(ns, terms):
        S, Kx, Ky = rcwa.cell_smatrix(orders, jnp.asarray(XYRRA), LX, LY, H,
                                      NT ** 2, NG ** 2, LAM, 0.45, 0.0,
                                      n_slabs=ns, taylor_terms=terms)
        return cpx.to_np(S.s11)

    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, NT ** 2)
    ns_default = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    fast = s11(ns_default, 12)
    conservative = s11(4 * ns_default, 10)
    assert np.abs(fast - conservative).max() < 1e-12
