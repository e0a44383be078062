"""Property tests of the polarization-basis algebra: the executable version
of the reference's S4conventions.py inline asserts
(``S4conventions.py:63-64,101-102,114-115,126-127,135``)."""

import numpy as np
import jax.numpy as jnp

from metalens_tpu.solver import basis, cpx

rng = np.random.default_rng(0)


def sp_vectors(kx, ky, kz):
    """Full 3-vector s/p basis (reference S4conventions.py:38-68), n=1."""
    k = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    kap = np.sqrt(kx ** 2 + ky ** 2)
    Es = np.array([-ky / kap, kx / kap, 0.0])
    Ep = np.array([kx * kz / (k * kap), ky * kz / (k * kap), -kap / k])
    Hp, Hs = Es, -Ep
    return Es, Ep, Hs, Hp


def xy_vectors(kx, ky, kz, n):
    """Full 3-vector x/y basis (reference S4conventions.py:70-103)."""
    k = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    H_xpol = np.array([0.0, 1.0, -ky / kz])
    E_xpol = np.array([(ky ** 2 + kz ** 2) / (k * kz * n),
                       -kx * ky / (k * kz * n), -kx / (k * n)])
    H_ypol = np.array([1.0, 0.0, -kx / kz])
    E_ypol = np.array([kx * ky / (k * kz * n),
                       (-kx ** 2 - kz ** 2) / (k * kz * n), ky / (k * n)])
    return E_xpol, E_ypol, H_xpol, H_ypol


def test_xy_basis_is_cross_product_consistent():
    """E_pol must equal (H_pol x khat)/n for both basis waves (the derivation
    checks at S4conventions.py:99-102)."""
    for _ in range(20):
        kx, ky, kz = rng.uniform(0.1, 1.0, size=3)
        n = rng.uniform(1.0, 2.5)
        k = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
        E_x, E_y, H_x, H_y = xy_vectors(kx, ky, kz, n)
        khat = np.array([kx, ky, kz]) / k
        np.testing.assert_allclose(E_x, np.cross(H_x, khat) / n, atol=1e-12)
        np.testing.assert_allclose(E_y, np.cross(H_y, khat) / n, atol=1e-12)


def test_we_blocks_match_xy_vectors():
    """The solver's diagonal-block We operator must reproduce the transverse
    components of the S4 x/y basis fields."""
    for _ in range(20):
        Kx, Ky = rng.uniform(0.05, 0.7, size=2)
        n = rng.uniform(1.0, 2.5)
        Kz = np.sqrt(n ** 2 - Kx ** 2 - Ky ** 2)
        A, B, C, D = [cpx.to_np(v) for v in basis.we_blocks(
            jnp.array([Kx]), jnp.array([Ky]),
            cpx.C(jnp.array([Kz]), jnp.array([0.0])), n)]
        E_x, E_y, H_x, H_y = xy_vectors(Kx, Ky, Kz, n)
        # c = (c_y, c_x) = (1, 0): field E = E_ypol
        np.testing.assert_allclose([A[0].real, C[0].real], E_y[:2], atol=1e-12)
        # c = (0, 1): E = E_xpol
        np.testing.assert_allclose([B[0].real, D[0].real], E_x[:2], atol=1e-12)


def test_we_inverse():
    Kx = jnp.array([0.3, -0.2, 0.0])
    Ky = jnp.array([0.1, 0.4, 0.0])
    n = 1.7
    Kz = basis.kz_norm(Kx, Ky, n ** 2)
    w = basis.we_blocks(Kx, Ky, Kz, n)
    wi = basis.we_inv_blocks(Kx, Ky, Kz, n)
    prod = basis.block_compose(wi, w)
    np.testing.assert_allclose(cpx.to_np(prod[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(cpx.to_np(prod[3]), 1.0, atol=1e-12)
    np.testing.assert_allclose(cpx.to_np(prod[1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(cpx.to_np(prod[2]), 0.0, atol=1e-12)


def test_incident_sp_is_unit_E_with_correct_H():
    """incident_sp_amplitudes returns transverse H of a unit-E s/p wave; the
    reconstructed full fields must satisfy |E| = 1 and H = khat x E."""
    for pol in ("s", "p"):
        for _ in range(10):
            ux, uy = rng.uniform(0.05, 0.6, size=2)
            uz = np.sqrt(1 - ux ** 2 - uy ** 2)
            Es, Ep, Hs, Hp = sp_vectors(ux, uy, uz)
            H_expected = Hs if pol == "s" else Hp
            cy, cx = basis.incident_sp_amplitudes(ux, uy, pol)
            np.testing.assert_allclose([float(cy), float(cx)],
                                       H_expected[:2], atol=1e-12)


def test_sp_to_xy_coefficients_reconstruct_x_and_y():
    """x_p*Hp + x_s*Hs == H_xpol etc. (reference S4conventions.py:105-127 and
    the conversion applied in grating.py:447-451)."""
    for _ in range(10):
        ux, uy = rng.uniform(0.05, 0.6, size=2)
        uz = np.sqrt(1 - ux ** 2 - uy ** 2)
        Es, Ep, Hs, Hp = sp_vectors(ux, uy, uz)
        E_x, E_y, H_x, H_y = xy_vectors(ux, uy, uz, 1.0)
        x_p, x_s, y_p, y_s = [float(v) for v in basis.sp_to_xy_coefficients(ux, uy)]
        np.testing.assert_allclose(x_p * Hp + x_s * Hs, H_x, atol=1e-12)
        np.testing.assert_allclose(x_p * Ep + x_s * Es, E_x, atol=1e-12)
        np.testing.assert_allclose(y_p * Hp + y_s * Hs, H_y, atol=1e-12)
        np.testing.assert_allclose(y_p * Ep + y_s * Es, E_y, atol=1e-12)


def test_order_powers_normal_incidence():
    """Unit x amplitude at normal incidence in medium n carries power 1/n
    (this pins the 1/(n_glass cos) normalization in the FOM,
    grating.lua:216-219)."""
    Kx = jnp.array([0.0])
    Ky = jnp.array([0.0])
    n = 1.459
    Kz = basis.kz_norm(Kx, Ky, n ** 2)
    c = jnp.array([0.0, 1.0 + 0j])
    P = float(basis.order_powers(c, Kx, Ky, Kz, n).sum())
    assert abs(P - 1.0 / n) < 1e-12


def test_sp_to_xy_coefficients_normal_incidence_limit():
    """Exactly-normal incidence must take the ux -> 0+ limit (1, 0, 0, -1)
    instead of 0/0 NaNs, consistent with incident_sp_amplitudes' normal
    special case and continuous with nearby directions."""
    vals = [float(v) for v in basis.sp_to_xy_coefficients(0.0, 0.0)]
    assert np.isfinite(vals).all()
    np.testing.assert_allclose(vals, [1.0, 0.0, 0.0, -1.0], atol=1e-12)
    near = [float(v) for v in basis.sp_to_xy_coefficients(1e-7, 0.0)]
    np.testing.assert_allclose(near, vals, atol=1e-6)
