"""Near-to-far-field transform (Taflove surface equivalence).

Parity with reference ``nearfield_farfield.py:14-191``: equivalent currents
J = n x H, M = -n x E on the aperture plane, radiation vectors N, L via 2-D
DFT, and angular power density

    P(ux, uy) * r^2 / uz = k^2/(32 pi^2 Z) * (|Lphi + Z*Ntheta|^2
                                             + |Ltheta - Z*Nphi|^2) / uz

including the reference's empirically calibrated x2 normalization (fixed so
an empty aperture transmits 100%; ``nearfield_farfield.py:188-189`` -- and
pinned here by tests/test_farfield.py::test_empty_aperture_calibration).

TPU-first: the transform runs on device in the cpx real-pair representation
with the DFT as MXU matmuls (:mod:`metalens_tpu.solver.dft` -- the backend
has no complex FFT), no RAM-slab chunk loop (the aperture lives in HBM).
``farfield_from_nearfield`` keeps the reference's exact signature (pre-FFT'd
fields); ``farfield`` is the convenience wrapper doing the transform from
the raw fields.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import units as nu
from .solver import cpx, dft
from .solver.cpx import C
from .units import pi


def _u_lists(num_x, num_y, dxp, dyp, wavelength, n_glass):
    """FFT bin -> direction cosine in glass, aliased to the principal branch
    (reference nearfield_farfield.py:35-39)."""
    ux_list = np.arange(num_x) * (wavelength / n_glass) / (dxp * num_x)
    uy_list = np.arange(num_y) * (wavelength / n_glass) / (dyp * num_y)
    ux_list[ux_list > ux_list.max() / 2] -= (wavelength / n_glass) / dxp
    uy_list[uy_list > uy_list.max() / 2] -= (wavelength / n_glass) / dyp
    return ux_list, uy_list


def _check_grids(xp_list, yp_list, wavelength):
    for l in (xp_list, yp_list):
        diffs = np.diff(l)
        assert 0 < diffs[0] < wavelength / 2
        assert diffs.max() - diffs.min() <= 1e-9 * np.abs(diffs).max()


def farfield_from_nearfield(fftEx, fftEy, fftHx, fftHy, xp_list, yp_list,
                            wavelength, n_glass):
    """Angular power distribution from pre-FFT'd aperture fields (C pairs or
    host complex arrays).  Returns (P_times_r2_over_uz, total_P, ux, uy,
    dux, duy) with fftshift applied, exactly like the reference."""
    xp_list = np.asarray(xp_list)
    yp_list = np.asarray(yp_list)
    dxp = xp_list[1] - xp_list[0]
    dyp = yp_list[1] - yp_list[0]
    num_x, num_y = len(xp_list), len(yp_list)
    fftEx, fftEy, fftHx, fftHy = (cpx.promote(f)
                                  for f in (fftEx, fftEy, fftHx, fftHy))
    assert fftEx.shape == fftEy.shape == fftHx.shape == fftHy.shape \
        == (num_x, num_y)
    _check_grids(xp_list, yp_list, wavelength)

    ux_list, uy_list = _u_lists(num_x, num_y, dxp, dyp, wavelength, n_glass)
    P = _angular_power(fftEx, fftEy, fftHx, fftHy, jnp.asarray(ux_list),
                       jnp.asarray(uy_list), dxp, dyp, wavelength, n_glass)

    P = jnp.roll(jnp.roll(P, num_x // 2, axis=0), num_y // 2, axis=1)
    ux_list = np.fft.fftshift(ux_list)
    uy_list = np.fft.fftshift(uy_list)
    dux = ux_list[1] - ux_list[0]
    duy = uy_list[1] - uy_list[0]
    ux, uy = np.meshgrid(ux_list, uy_list, indexing="ij", sparse=True)
    total_P = float((jnp.where(jnp.isfinite(P), P, 0.0) * dux * duy).sum())
    return P, total_P, ux, uy, dux, duy


def _angular_power(fftEx: C, fftEy: C, fftHx: C, fftHy: C, ux_list, uy_list,
                   dxp, dyp, wavelength, n_glass):
    """The Taflove 8.15/8.17/8.23-25 pipeline on unshifted FFT bins
    (reference ``nearfield_farfield.py:77-191``).  Returns a real array."""
    ux = ux_list[:, None]
    uy = uy_list[None, :]

    # J = n x H, M = -n x E with n = +zhat; N, L = FFT * dx dy
    dA = dxp * dyp
    Nx = fftHy * (-dA)
    Ny = fftHx * dA
    Lx = fftEy * dA
    Ly = fftEx * (-dA)

    uz2 = 1.0 - ux ** 2 - uy ** 2
    uz = jnp.sqrt(jnp.where(uz2 < 0, jnp.nan, uz2))
    sintheta = jnp.sqrt(ux ** 2 + uy ** 2)
    # exact spherical basis for every off-axis bin; the on-axis bin (the only
    # place sintheta = 0 on an FFT grid) is overridden by its limit below
    s = jnp.where(sintheta == 0.0, 1.0, sintheta)
    a = ux * uz / s
    b = uy * uz / s
    cphi = ux / s
    sphi = uy / s
    Ntheta = Nx * a + Ny * b
    Nphi = Nx * (-sphi) + Ny * cphi
    Ltheta = Lx * a + Ly * b
    Lphi = Lx * (-sphi) + Ly * cphi
    # on-axis limit (uy = 0, ux -> 0+): theta-hat -> x-hat, phi-hat -> y-hat
    # (reference nearfield_farfield.py:160-169)
    on_axis = (ux == 0.0) & (uy == 0.0)
    Ntheta = cpx.where(on_axis, Nx, Ntheta)
    Nphi = cpx.where(on_axis, Ny, Nphi)
    Ltheta = cpx.where(on_axis, Lx, Ltheta)
    Lphi = cpx.where(on_axis, Ly, Lphi)

    Z = nu.Z0 / n_glass
    # exact 1/uz, matching the reference's divide-then-mask semantics
    # (nearfield_farfield.py:183-185 divides by uz and sums finite entries
    # at :74): a grazing bin (uz == 0) yields inf and an evanescent bin
    # (uz2 < 0) yields nan, both dropped by the finite-entry sum in
    # farfield_from_nearfield / focal_metrics.  An earlier +1e-5 softening
    # silently biased exactly the high-|u| bins where a high-NA lens's
    # power lives (pinned by test_farfield.py::test_high_na_grazing_bins).
    P = ((2 * pi * n_glass / wavelength) ** 2 / (32 * pi ** 2 * Z)
         * (cpx.abs2(Lphi + Ntheta * Z)
            + cpx.abs2(Ltheta - Nphi * Z))) / uz
    # calibration factor: empty aperture must transmit 100%
    # (reference nearfield_farfield.py:188-189)
    return P * 2


def farfield(Ex, Ey, Hx, Hy, xp_list, yp_list, wavelength, n_glass):
    """Convenience wrapper: fftshift + 2-D DFT on device (cpx matmul-DFT),
    then the angular transform.  Accepts C pairs or host complex arrays."""
    def prep(f):
        return dft.fft2(dft.fftshift(cpx.promote(f)))
    return farfield_from_nearfield(prep(Ex), prep(Ey), prep(Hx), prep(Hy),
                                   xp_list, yp_list, wavelength, n_glass)


def _to_host_complex(f):
    if isinstance(f, C):
        return cpx.to_np(f)
    return np.asarray(f)


def farfield_big(Ex, Ey, Hx, Hy, xp_list, yp_list, wavelength, n_glass,
                 pts_at_a_time=1e7, progress=False):
    """Slab-chunked :func:`farfield` for apertures past the single-chip HBM
    ceiling (``benchmarks/hbm_ceiling.py``), and for RAM-bound CPU parity
    runs -- the counterpart of the reference's uy-slab chunked transform
    (reference ``nearfield_farfield.py:45-66``, 1e7 points per slab).

    The four aperture fields and their spectra live in HOST RAM; the device
    only ever holds one (slab x n) block plus the four-step DFT factor
    matrices.  The separable 2-D DFT runs as an axis-1 pass over row slabs
    then an axis-0 pass over column slabs, and the angular transform runs
    over row slabs.  Results are identical to :func:`farfield` (pinned by
    tests/test_farfield.py::test_farfield_big_matches_unchunked); ``P``
    comes back as a host numpy array."""
    xp_list = np.asarray(xp_list)
    yp_list = np.asarray(yp_list)
    num_x, num_y = len(xp_list), len(yp_list)
    dxp = xp_list[1] - xp_list[0]
    dyp = yp_list[1] - yp_list[0]
    _check_grids(xp_list, yp_list, wavelength)
    rows = max(1, int(pts_at_a_time // num_y))
    cols = max(1, int(pts_at_a_time // num_x))

    spectra = []
    for name, f in (("Ex", Ex), ("Ey", Ey), ("Hx", Hx), ("Hy", Hy)):
        f = np.fft.fftshift(_to_host_complex(f))
        assert f.shape == (num_x, num_y)
        G = np.empty_like(f)
        for s in range(0, num_x, rows):          # axis-1 DFT, row slabs
            e = min(s + rows, num_x)
            blk = dft.dft_axis0(cpx.from_np(f[s:e].T))
            G[s:e] = cpx.to_np(blk).T
            if progress:
                print(f"farfield_big: {name} axis-1 rows {s}..{e}",
                      flush=True)
        for s in range(0, num_y, cols):          # axis-0 DFT, column slabs
            e = min(s + cols, num_y)
            G[:, s:e] = cpx.to_np(dft.dft_axis0(cpx.from_np(G[:, s:e])))
            if progress:
                print(f"farfield_big: {name} axis-0 cols {s}..{e}",
                      flush=True)
        spectra.append(G)

    ux_list, uy_list = _u_lists(num_x, num_y, dxp, dyp, wavelength, n_glass)
    uy_dev = jnp.asarray(uy_list)
    P = np.empty((num_x, num_y), dtype=spectra[0].real.dtype)
    for s in range(0, num_x, rows):              # angular map, row slabs
        e = min(s + rows, num_x)
        blk = _angular_power(*(cpx.promote(g[s:e]) for g in spectra),
                             jnp.asarray(ux_list[s:e]), uy_dev, dxp, dyp,
                             wavelength, n_glass)
        P[s:e] = np.asarray(blk)

    P = np.fft.fftshift(P)                       # == the roll in
    ux_list = np.fft.fftshift(ux_list)           # farfield_from_nearfield
    uy_list = np.fft.fftshift(uy_list)
    dux = ux_list[1] - ux_list[0]
    duy = uy_list[1] - uy_list[0]
    ux, uy = np.meshgrid(ux_list, uy_list, indexing="ij", sparse=True)
    total_P = float(np.where(np.isfinite(P), P, 0.0).sum() * dux * duy)
    return P, total_P, ux, uy, dux, duy


def focal_metrics(P, ux, uy, dux, duy, total_P, power_through_lens,
                  spot_radius_u=None):
    """Focusing diagnostics: peak direction, encircled power within
    ``spot_radius_u`` of the peak (in direction-cosine units), and overall
    transmission total_P / power_through_lens.  (New in metalens_tpu; the
    reference leaves this to by-hand analysis.)"""
    P = jnp.asarray(P)
    Pz = jnp.where(jnp.isfinite(P), P, 0.0)
    flat_idx = int(jnp.argmax(Pz))
    i, j = np.unravel_index(flat_idx, P.shape)
    ux_pk = float(np.asarray(ux).ravel()[i])
    uy_pk = float(np.asarray(uy).ravel()[j])
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
