"""Production solver vs a FULLY independent 1D RCWA (own Fourier
coefficients, own eigenmode solve, own boundary matching -- see
tests/rcwa1d_reference.py) on lamellar gratings, plus the published
Rytov effective-medium asymptote for deep-subwavelength gratings.

This closes the independence gap of solver/eig.py (which shares
epsilon.py/basis.py with production): every number here comes from a
disjoint code path, playing the role Lumerical played for the reference
(/root/reference/README.md:41).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import basis, cpx, orders as ordmod, rcwa
from metalens_tpu.solver.epsilon import rect_layer_toeplitz
from metalens_tpu.units import nm

from rcwa1d_reference import lamellar_rcwa
from tmm_reference import tmm_rt

LAM = 580 * nm
NG = 1.459


def _production_efficiencies(pol, L, h, eps_fill, fill, theta, M=16,
                             fff=False):
    """Per-order T/R efficiencies from the production 2D machinery on a
    my=0 order line (the lamellar structure leaves my != 0 dark)."""
    m = np.arange(-M, M + 1)
    orders = np.stack([m, np.zeros_like(m)], axis=1)
    N = orders.shape[0]
    i0 = ordmod.order_index(orders, 0, 0)
    LY = 320 * nm
    E = rect_layer_toeplitz(orders, L, LY, (0.0, 0.0), (fill * L, LY),
                            complex(eps_fill))
    ux = float(np.sin(theta))
    q2 = rcwa.q2_upper_bound(orders, L, LY, LAM, abs(eps_fill))
    ns = rcwa.default_n_slabs(2 * np.pi * h / LAM, q2)
    M_blocks = None
    if fff:
        from metalens_tpu.solver.fff import nv_blocks
        # lamellar: normals are +-x everywhere -> Pxx = I, Pxy = Pyy = 0,
        # and <<1/eps>> is the same rect profile with reciprocal fills
        E_recip = rect_layer_toeplitz(orders, L, LY, (0.0, 0.0),
                                      (fill * L, LY),
                                      1.0 / complex(eps_fill))
        Delta = E - cpx.solve(E_recip, cpx.eye(N, E.re.dtype))
        Pxx = cpx.eye(N, E.re.dtype)
        zero = cpx.C(jnp.zeros((N, N), E.re.dtype),
                     jnp.zeros((N, N), E.re.dtype))
        M_blocks = nv_blocks(E, Delta, Pxx, zero, zero, hermitian=True)
    S, Kx, Ky = rcwa.cell_smatrix_with_eps(
        orders, E, L, LY, h, NG ** 2, LAM, ux, 0.0, n_slabs=ns,
        taylor_terms=12, M_blocks=M_blocks)
    cy, cx = basis.incident_sp_amplitudes(ux, 0.0, pol)
    c = jnp.zeros(2 * N).at[i0].set(cy).at[i0 + N].set(cx)
    ampf, ampr = rcwa.scatter_amplitudes(S, c)
    Kz_g = basis.kz_norm(Kx, Ky, NG ** 2)
    Kz_a = basis.kz_norm(Kx, Ky, 1.0)
    Pin = float(np.asarray(basis.order_powers(c, Kx, Ky, Kz_a, 1.0)).sum())
    Pt = np.asarray(basis.order_powers(ampf, Kx, Ky, Kz_g, NG))
    Pr = np.asarray(basis.backward_order_powers(ampr, Kx, Ky, Kz_a, 1.0))
    return m, Pr / Pin, Pt / Pin


def test_independent_reference_reproduces_tmm_uniform():
    """The independent solver itself is validated on the uniform limit
    (fill=1) against analytic TMM before being trusted on gratings."""
    for pol in ("s", "p"):
        for theta in (0.001, np.deg2rad(35.0)):
            m, DE_r, DE_t = lamellar_rcwa(
                pol, LAM, 900 * nm, 550 * nm, 4.0, 4.0, 1.0, NG ** 2,
                theta, M=6, fill=0.5)
            R_ref, T_ref = tmm_rt([1.0, 2.0, NG], [550 * nm], LAM, theta,
                                  pol)
            assert abs(DE_r.sum() - R_ref) < 1e-10
            assert abs(DE_t.sum() - T_ref) < 1e-10


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("theta_deg,fill,epsf", [
    (25.0, 0.45, 5.6257),        # TiO2-class contrast at 580 nm
    (0.001, 0.6, 4.0),
    (40.0, 0.3, 5.6257 + 0.05j),  # absorbing fill
])
def test_lamellar_matches_independent_rcwa(pol, theta_deg, fill, epsf):
    """Per-order efficiencies agree with the independent implementation.
    Both sides run plain Laurent factorization at M=16; residual
    difference is the (shared-limit) truncation tail, bounded tight for
    these dielectric contrasts."""
    theta = np.deg2rad(theta_deg)
    L, h = 900 * nm, 550 * nm
    m1, r1, t1 = lamellar_rcwa(pol, LAM, L, h, epsf, 1.0, 1.0, NG ** 2,
                               theta, M=16, fill=fill)
    m2, r2, t2 = _production_efficiencies(pol, L, h, epsf, fill, theta,
                                          M=16)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(t2, t1, atol=5e-5)
    np.testing.assert_allclose(r2, r1, atol=5e-5)
    # sanity: real diffraction is happening (several propagating orders)
    assert (t1 > 1e-3).sum() >= 3


def test_deep_subwavelength_matches_rytov_effective_medium():
    """Published physics anchor: a lamellar grating with period << lambda
    behaves as a uniform birefringent film -- eps_TE = <eps>,
    eps_TM = <1/eps>^-1 (Rytov 1956), corrections O((L/lam)^2).  The
    production solver must land on the analytic TMM of that effective
    slab with NO reference to the independent RCWA at all.  Run with the
    production-default NV factorization: plain-Laurent TM is the classic
    slow-converging case (Li 1996) and at M=8 still sits 5e-3 off the
    static limit, which the NV correction removes.  NORMAL incidence: the
    effective film is biaxial (E along the stripes sees <eps>, across
    them <1/eps>^-1, and E_z -- parallel to the lamellae planes -- sees
    <eps> again), so only at normal incidence do the two polarizations
    reduce to isotropic Fresnel slabs (an oblique TM probe of this very
    test measured the 4e-3 eps_z admixture the isotropic TMM misses)."""
    L = LAM / 50
    h = 550 * nm
    fill, epsf = 0.47, 5.6257
    theta = np.deg2rad(0.001)
    eps_te = fill * epsf + (1 - fill) * 1.0
    eps_tm = 1.0 / (fill / epsf + (1 - fill) / 1.0)
    for pol, eps_eff in (("s", eps_te), ("p", eps_tm)):
        m, r, t = _production_efficiencies(pol, L, h, epsf, fill, theta,
                                           M=8, fff=True)
        R_ref, T_ref = tmm_rt([1.0, np.sqrt(eps_eff), NG], [h], LAM,
                              theta, pol)
        assert abs(t.sum() - T_ref) < 2e-3, (pol, t.sum(), T_ref)
        assert abs(r.sum() - R_ref) < 2e-3, (pol, r.sum(), R_ref)
