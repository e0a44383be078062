"""Independent re-derivation of the near-to-far-field transform.

``farfield._angular_power`` follows the Taflove route: spherical radiation
vectors (N_theta, N_phi, L_theta, L_phi) and

    P r^2 / uz = k^2/(32 pi^2 Z) (|L_phi + Z N_theta|^2
                                  + |L_theta - Z N_phi|^2) / uz.

This module re-derives the same quantity through the *potentials* route of
Schneider, "Understanding the FDTD Method" ch. 14 (the reference keeps the
same second derivation as a disabled cross-check,
``/root/reference/nearfield_farfield.py:194-337``): far-zone vector
potentials A = mu0 N / 4pi, F = eps L / 4pi, then the full Cartesian
far-zone field

    E = i w [A - u (u . A)] - (i / eps) k x F,

and P r^2/uz = |E|^2 / (Z uz).  No spherical basis, no theta/phi
decomposition, no on-axis special case -- a silent error in the angular
algebra of either route cannot survive agreement between the two.

Both routes share only the inputs (radiation integrals N, L) and the
(uz + 1e-5) grazing regularizer.  Notably the potentials route needs NO
empty-aperture calibration: it lands exactly on the calibrated Taflove
output.  That *explains* the reference's "mystery factor 2"
(``nearfield_farfield.py:188-189``): Taflove's k^2/(32 pi^2 Z) prefactor
contains the time-average 1/2 of <S> = |E|^2/(2Z), while the codebase's
power normalization (basis.order_powers and the incident-power convention)
uses |E|^2/Z throughout -- so the Taflove-route result is low by exactly 2,
at every angle, which is what the empty-aperture calibration absorbs.
"""

import numpy as np
import jax.numpy as jnp

from metalens_tpu import units as nu
from metalens_tpu.farfield import _angular_power, _u_lists
from metalens_tpu.solver import cpx
from metalens_tpu.units import pi, nm


def schneider_power(fftEx, fftEy, fftHx, fftHy, ux_list, uy_list,
                    dxp, dyp, wavelength, n_glass):
    """Potentials-route angular power (numpy complex, host)."""
    ux = np.asarray(ux_list)[:, None]
    uy = np.asarray(uy_list)[None, :]
    uz2 = 1.0 - ux ** 2 - uy ** 2
    uz = np.sqrt(np.where(uz2 < 0, np.nan, uz2))

    dA = dxp * dyp
    Nx, Ny = -fftHy * dA, fftHx * dA          # J = z x H
    Lx, Ly = fftEy * dA, -fftEx * dA          # M = -z x E

    eps = nu.eps0 * n_glass ** 2
    k = 2 * pi * n_glass / wavelength
    omega = 2 * pi * nu.c0 / wavelength
    Ax = Nx * nu.mu0 / (4 * pi)
    Ay = Ny * nu.mu0 / (4 * pi)
    Fx = Lx * eps / (4 * pi)
    Fy = Ly * eps / (4 * pi)
    udotA = ux * Ax + uy * Ay
    kx, ky, kz = k * ux, k * uy, k * uz
    Ex = 1j * omega * (Ax - ux * udotA) - (1j / eps) * (-kz * Fy)
    Ey = 1j * omega * (Ay - uy * udotA) - (1j / eps) * (kz * Fx)
    Ez = 1j * omega * (-uz * udotA) - (1j / eps) * (kx * Fy - ky * Fx)

    Z = nu.Z0 / n_glass
    # |E|^2 / Z (not /2Z): matches the codebase's power convention, and
    # lands on the calibrated Taflove output with no fudge factor.  Exact
    # 1/uz, matching farfield._angular_power's divide-then-mask semantics
    # (grazing bins -> inf, evanescent -> nan, dropped by the callers'
    # finite-entry sums).
    with np.errstate(divide="ignore", invalid="ignore"):
        return (abs(Ex) ** 2 + abs(Ey) ** 2 + abs(Ez) ** 2) / Z / uz


def test_taflove_and_schneider_routes_agree():
    rng = np.random.default_rng(7)
    lam, n_glass = 580 * nm, 1.459
    num_x, num_y = 24, 20
    dxp = dyp = 0.4 * lam / n_glass
    fields = [rng.standard_normal((num_x, num_y))
              + 1j * rng.standard_normal((num_x, num_y)) for _ in range(4)]
    ux_list, uy_list = _u_lists(num_x, num_y, dxp, dyp, lam, n_glass)

    P_taflove = np.asarray(_angular_power(
        *(cpx.promote(jnp.asarray(f)) for f in fields),
        jnp.asarray(ux_list), jnp.asarray(uy_list), dxp, dyp, lam, n_glass))
    P_schneider = schneider_power(*fields, ux_list, uy_list, dxp, dyp,
                                  lam, n_glass)

    finite = np.isfinite(P_taflove) & np.isfinite(P_schneider)
    assert finite.sum() > 0.3 * finite.size
    scale = np.abs(P_taflove[finite]).max()
    np.testing.assert_allclose(P_taflove[finite] / scale,
                               P_schneider[finite] / scale, atol=1e-12)
    # the two NaN masks (evanescent bins) must coincide as well
    np.testing.assert_array_equal(np.isfinite(P_taflove),
                                  np.isfinite(P_schneider))


def test_routes_agree_including_on_axis_bin():
    """The Taflove route takes an explicit on-axis limit; the potentials
    route has no special case there -- agreement validates the limit."""
    rng = np.random.default_rng(11)
    lam, n_glass = 532 * nm, 1.5
    num = 8
    dxp = dyp = 0.45 * lam / n_glass
    fields = [rng.standard_normal((num, num))
              + 1j * rng.standard_normal((num, num)) for _ in range(4)]
    ux_list, uy_list = _u_lists(num, num, dxp, dyp, lam, n_glass)
    assert ux_list[0] == 0.0 and uy_list[0] == 0.0

    P_t = np.asarray(_angular_power(
        *(cpx.promote(jnp.asarray(f)) for f in fields),
        jnp.asarray(ux_list), jnp.asarray(uy_list), dxp, dyp, lam, n_glass))
    P_s = schneider_power(*fields, ux_list, uy_list, dxp, dyp, lam, n_glass)
    assert np.isfinite(P_t[0, 0])
    np.testing.assert_allclose(P_t[0, 0], P_s[0, 0], rtol=1e-12)
