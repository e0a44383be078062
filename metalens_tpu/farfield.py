"""Near-to-far-field transform (Taflove surface equivalence).

Parity with reference ``nearfield_farfield.py:14-191``: equivalent currents
J = n x H, M = -n x E on the aperture plane, radiation vectors N, L via 2-D
FFT, and angular power density

    P(ux, uy) * r^2 / uz = k^2/(32 pi^2 Z) * (|Lphi + Z*Ntheta|^2
                                             + |Ltheta - Z*Nphi|^2) / uz

including the reference's empirically calibrated x2 normalization (fixed so
an empty aperture transmits 100%; ``nearfield_farfield.py:188-189`` -- and
pinned here by tests/test_farfield.py::test_empty_aperture_calibration).

TPU-first: the FFT and all the angular algebra run on device as one jnp
program (no RAM-slab chunk loop; the aperture lives in HBM).  The
``farfield_from_nearfield`` entry point keeps the reference's exact
signature -- it takes *pre-FFT'd* fields fft2(fftshift(field)) -- and
``farfield`` is the convenience wrapper doing the FFT on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import units as nu
from .units import pi


def farfield_from_nearfield(fftEx, fftEy, fftHx, fftHy, xp_list, yp_list,
                            wavelength, n_glass):
    """Angular power distribution from pre-FFT'd aperture fields.

    Returns (P_here_times_r2_over_uz, total_P, ux, uy, dux, duy) with
    fftshift applied, exactly like the reference."""
    xp_list = np.asarray(xp_list)
    yp_list = np.asarray(yp_list)
    dxp = xp_list[1] - xp_list[0]
    dyp = yp_list[1] - yp_list[0]
    num_x = len(xp_list)
    num_y = len(yp_list)
    assert fftEx.shape == fftEy.shape == fftHx.shape == fftHy.shape == (num_x, num_y)
    for l in (xp_list, yp_list):
        diffs = np.diff(l)
        assert 0 < diffs[0] < wavelength / 2
        assert diffs.max() - diffs.min() <= 1e-9 * np.abs(diffs).max()

    # FFT bin -> direction cosine in glass, aliased to the principal branch
    # (reference nearfield_farfield.py:35-39)
    ux_list = np.arange(num_x) * (wavelength / n_glass) / (dxp * num_x)
    uy_list = np.arange(num_y) * (wavelength / n_glass) / (dyp * num_y)
    ux_list[ux_list > ux_list.max() / 2] -= (wavelength / n_glass) / dxp
    uy_list[uy_list > uy_list.max() / 2] -= (wavelength / n_glass) / dyp

    P = _angular_power(jnp.asarray(fftEx), jnp.asarray(fftEy),
                       jnp.asarray(fftHx), jnp.asarray(fftHy),
                       jnp.asarray(ux_list), jnp.asarray(uy_list),
                       dxp, dyp, wavelength, n_glass)

    P = jnp.fft.fftshift(P)
    ux_list = np.fft.fftshift(ux_list)
    uy_list = np.fft.fftshift(uy_list)
    dux = ux_list[1] - ux_list[0]
    duy = uy_list[1] - uy_list[0]
    ux, uy = np.meshgrid(ux_list, uy_list, indexing="ij", sparse=True)
    total_P = float((jnp.where(jnp.isfinite(P), P, 0.0) * dux * duy).sum())
    return P, total_P, ux, uy, dux, duy


def _angular_power(fftEx, fftEy, fftHx, fftHy, ux_list, uy_list, dxp, dyp,
                   wavelength, n_glass):
    """The Taflove 8.15/8.17/8.23-25 pipeline on unshifted FFT bins
    (reference ``nearfield_farfield.py:77-191``)."""
    ux = ux_list[:, None]
    uy = uy_list[None, :]

    # J = n x H, M = -n x E with n = +zhat; N, L = FFT * dx dy
    Nx = -fftHy * dxp * dyp
    Ny = fftHx * dxp * dyp
    Lx = fftEy * dxp * dyp
    Ly = -fftEx * dxp * dyp

    uz2 = 1.0 - ux ** 2 - uy ** 2
    uz = jnp.sqrt(jnp.where(uz2 < 0, jnp.nan, uz2))
    sintheta = jnp.sqrt(ux ** 2 + uy ** 2)
    s = sintheta + 1e-9
    Ntheta = Nx * ux * uz / s + Ny * uy * uz / s
    Nphi = -Nx * uy / s + Ny * ux / s
    Ltheta = Lx * ux * uz / s + Ly * uy * uz / s
    Lphi = -Lx * uy / s + Ly * ux / s
    # on-axis limit (uy = 0, ux -> 0+): theta-hat -> x-hat, phi-hat -> y-hat
    # (reference nearfield_farfield.py:160-169)
    on_axis = (ux == 0.0) & (uy == 0.0)
    Ntheta = jnp.where(on_axis, Nx, Ntheta)
    Nphi = jnp.where(on_axis, Ny, Nphi)
    Ltheta = jnp.where(on_axis, Lx, Ltheta)
    Lphi = jnp.where(on_axis, Ly, Lphi)

    Z = nu.Z0 / n_glass
    P = ((2 * pi * n_glass / wavelength) ** 2 / (32 * pi ** 2 * Z)
         * (jnp.abs(Lphi + Z * Ntheta) ** 2
            + jnp.abs(Ltheta - Z * Nphi) ** 2)) / (uz + 1e-5)
    # calibration factor: empty aperture must transmit 100%
    # (reference nearfield_farfield.py:188-189)
    P = P * 2
    return P


def farfield(Ex, Ey, Hx, Hy, xp_list, yp_list, wavelength, n_glass):
    """Convenience wrapper: does the fftshift + fft2 on device, then the
    angular transform.  Accepts numpy or jnp field arrays."""
    fftEx = jnp.fft.fft2(jnp.fft.fftshift(jnp.asarray(Ex)))
    fftEy = jnp.fft.fft2(jnp.fft.fftshift(jnp.asarray(Ey)))
    fftHx = jnp.fft.fft2(jnp.fft.fftshift(jnp.asarray(Hx)))
    fftHy = jnp.fft.fft2(jnp.fft.fftshift(jnp.asarray(Hy)))
    return farfield_from_nearfield(fftEx, fftEy, fftHx, fftHy, xp_list,
                                   yp_list, wavelength, n_glass)


def focal_metrics(P, ux, uy, dux, duy, total_P, power_through_lens,
                  spot_radius_u=None):
    """Focusing diagnostics: peak direction, encircled power within
    ``spot_radius_u`` of the peak (in direction-cosine units), and overall
    transmission total_P / power_through_lens.  (New in metalens_tpu; the
    reference leaves this to by-hand analysis.)"""
    P = jnp.asarray(P)
    Pz = jnp.where(jnp.isfinite(P), P, 0.0)
    idx = jnp.unravel_index(jnp.argmax(Pz), P.shape)
    ux_pk = float(np.asarray(ux).ravel()[idx[0]])
    uy_pk = float(np.asarray(uy).ravel()[idx[1]])
    out = {"peak_ux": ux_pk, "peak_uy": uy_pk,
           "transmission": total_P / power_through_lens}
    if spot_radius_u is not None:
        UX = np.asarray(ux).reshape(-1, 1)
        UY = np.asarray(uy).reshape(1, -1)
        mask = ((UX - ux_pk) ** 2 + (UY - uy_pk) ** 2
                <= spot_radius_u ** 2)
        out["power_in_spot"] = float(
            (jnp.where(jnp.asarray(mask), Pz, 0.0) * dux * duy).sum())
        out["spot_fraction_of_total"] = out["power_in_spot"] / max(total_P,
                                                                   1e-300)
    return out
