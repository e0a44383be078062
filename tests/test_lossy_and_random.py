"""Absorbing (complex-eps) pillar materials and randomized cross-validation
of the production solver against the independent eigenmode reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa, basis
from metalens_tpu.solver.eig import reference_cell_smatrix
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
NG = 1.459


def solve(eps_p, xyrra, ux, uy, numG=25, hermitian=True):
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, abs(eps_p))
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    S, Kx, Ky = rcwa.cell_smatrix(orders, jnp.asarray(xyrra), LX, LY, H,
                                  eps_p, NG ** 2, LAM, ux, uy,
                                  n_slabs=ns, hermitian_eps=hermitian)
    cy, cx = basis.incident_sp_amplitudes(ux, uy, "p")
    c = jnp.zeros(2 * numG).at[i0].set(cy).at[i0 + numG].set(cx)
    ampf, ampr = rcwa.scatter_amplitudes(S, c)
    Kz_g = basis.kz_norm(Kx, Ky, NG ** 2)
    Kz_a = basis.kz_norm(Kx, Ky, 1.0)
    Pt = float(basis.order_powers(cpx.to_np(ampf), Kx, Ky, Kz_g, NG).sum())
    Pr = float(basis.backward_order_powers(cpx.to_np(ampr), Kx, Ky, Kz_a,
                                           1.0).sum())
    Pin = float(basis.order_powers(np.asarray(c), Kx, Ky, Kz_a, 1.0).sum())
    return S, Pt / Pin, Pr / Pin


XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                  [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])


def test_absorbing_pillars_dissipate():
    """UV-like TiO2 (complex index): T + R < 1 with the deficit equal to the
    absorbed power, and the result matches the eigenmode reference (which
    uses a plain LU inverse, so it is immune to the Cholesky-assumption
    bug this test guards against)."""
    n_uv = 2.9 + 0.25j
    eps_p = n_uv ** 2
    S, T, R = solve(eps_p, XYRRA, 0.45, 0.0, hermitian=False)
    assert T + R < 0.995
    assert T > 0.05 and R > 0.0

    orders = ordmod.select_orders(LX, LY, 25)
    S_ref, Kx, Ky = reference_cell_smatrix(orders, XYRRA, LX, LY, H, eps_p,
                                           NG ** 2, LAM, 0.45, 0.0)
    d = np.abs(cpx.to_np(S.s11) - np.asarray(S_ref.s11)).max()
    scale = np.abs(np.asarray(S_ref.s11)).max()
    assert d < 1e-7 * scale


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_cells_match_eigenmode_reference(seed):
    """Randomized geometries/incidence: production eig-free solver vs the
    classical eigenmode solver (independent propagation method)."""
    rng = np.random.default_rng(seed)
    n_ell = int(rng.integers(1, 4))
    xyrra = np.zeros((n_ell, 5))
    # spread pillars along x to avoid overlap; modest radii
    xs = np.linspace(-LX / 3, LX / 3, n_ell)
    for i in range(n_ell):
        xyrra[i] = [xs[i] + rng.uniform(-30, 30) * nm,
                    rng.uniform(-20, 20) * nm,
                    rng.uniform(60, 110) * nm,
                    rng.uniform(60, 110) * nm,
                    rng.uniform(-0.6, 0.6)]
    ux = float(rng.uniform(0.1, 0.6))
    uy = float(rng.uniform(-0.2, 0.2))
    numG = 21
    S, T, R = solve(2.372 ** 2, xyrra, ux, uy, numG=numG)
    assert abs(T + R - 1.0) < 1e-8
    orders = ordmod.select_orders(LX, LY, numG)
    S_ref, *_ = reference_cell_smatrix(orders, xyrra, LX, LY, H,
                                       2.372 ** 2, NG ** 2, LAM, ux, uy)
    scale = np.abs(np.asarray(S_ref.s11)).max()
    assert np.abs(cpx.to_np(S.s11) - np.asarray(S_ref.s11)).max() < 1e-6 * scale
    assert np.abs(cpx.to_np(S.s21) - np.asarray(S_ref.s21)).max() < 1e-6 * scale


def test_engine_fff_with_absorbing_material():
    """End-to-end engine plumbing for a lossy pillar material: a complex
    n_tio2 override must auto-route static_solve_config to hermitian=False
    (pivoted <<1/eps>> inverse + anticommutator NV symmetrization) and
    produce a finite, strictly-lower passthrough FOM than its lossless
    twin (absorption can only remove transmitted power here)."""
    from metalens_tpu import Grating
    from metalens_tpu.engine import fom_of_grating, static_solve_config
    from metalens_tpu.solver.fom import FomTerm
    from metalens_tpu.units import degree

    def make(nt):
        return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                       target_wavelength=580 * nm, angle_in_air=30 * degree,
                       n_tio2=nt,
                       xyrra_list_in_nm_deg=np.array(
                           [[0., 0., 120., 90., 0.],
                            [500., 10., 80., 110., 5.]]))

    g_lossy = make(2.372 + 0.08j)
    g_real = make(2.372)
    *_, herm_lossy = static_solve_config(g_lossy, [LAM], 30)
    *_, herm_real = static_solve_config(g_real, [LAM], 30)
    assert herm_lossy is False and herm_real is True

    terms = [FomTerm(LAM, 1.0, 0, False)]
    f_lossy = fom_of_grating(g_lossy, target_wavelength=LAM, numG=30,
                             terms=terms)
    f_real = fom_of_grating(g_real, target_wavelength=LAM, numG=30,
                            terms=terms)
    assert 0.0 < f_lossy < f_real < 1.0
