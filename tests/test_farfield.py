"""Far-field transform calibration tests: the reference's own known-answer
checks (empty aperture = 100% transmission, ``nearfield_farfield.py:188``)
plus directionality."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.farfield import farfield
from metalens_tpu import units as nu
from metalens_tpu.units import nm

LAM = 580 * nm
NG = 1.459


def plane_wave_aperture(n_pts, spacing, ux0=0.0):
    """Fields of a unit-E x-polarized plane wave in glass traveling at
    direction cosine ux0, sampled on the aperture plane."""
    xs = (np.arange(n_pts) - n_pts / 2) * spacing
    ys = (np.arange(n_pts) - n_pts / 2) * spacing
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    kg = 2 * np.pi * NG / LAM
    uz0 = np.sqrt(1 - ux0 ** 2)
    phase = np.exp(1j * kg * ux0 * X)
    Ex = phase
    Ey = np.zeros_like(Ex)
    # H = (n/Z0) khat x E; for E = x-hat * e^{i k.r}, k = (ux0, 0, uz0) kg:
    # H = (n/Z0) (ux0,0,uz0) x (1,0,0) * phase = (n/Z0)(0, uz0, 0) * phase
    Hy = NG / nu.Z0 * uz0 * phase
    Hx = np.zeros_like(Ex)
    return Ex, Ey, Hx, Hy, xs, ys


def test_empty_aperture_calibration():
    """Uniform normally-propagating plane wave over the aperture: total
    far-field power must equal the power through the aperture (this is the
    calibration that fixes the x2 factor)."""
    n_pts, spacing = 192, LAM / 2.2
    Ex, Ey, Hx, Hy, xs, ys = plane_wave_aperture(n_pts, spacing)
    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys, LAM, NG)
    area = (n_pts * spacing) ** 2
    power_in = area * NG / nu.Z0 * 1.0  # Ex*Hy convention, no 1/2 factor
    assert abs(total_P / power_in - 1.0) < 1e-3


def test_tilted_plane_wave_peaks_at_its_direction():
    n_pts, spacing = 192, LAM / 2.2
    ux0 = 0.3
    Ex, Ey, Hx, Hy, xs, ys = plane_wave_aperture(n_pts, spacing, ux0=ux0)
    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys, LAM, NG)
    Pz = np.asarray(jnp.where(jnp.isfinite(P), P, 0.0))
    i, j = np.unravel_index(np.argmax(Pz), Pz.shape)
    assert abs(np.asarray(ux).ravel()[i] - ux0) < 2 * dux
    assert abs(np.asarray(uy).ravel()[j]) < 2 * duy
    # energy still accounted (slightly less than unity: tilt reduces the
    # projected power by uz0 and the x2-calibrated formula tracks it)
    area = (n_pts * spacing) ** 2
    uz0 = np.sqrt(1 - ux0 ** 2)
    power_in = area * NG / nu.Z0 * uz0
    assert abs(total_P / power_in - 1.0) < 2e-2


def test_farfield_big_matches_unchunked():
    """The host-RAM slab-chunked transform (farfield_big) must reproduce
    the one-shot device path bit-for-bit up to accumulation order: same P
    grid, same total, on a NON-SQUARE aperture (catches axis swaps) with
    awkward slab sizes (forces partial chunks on both axes)."""
    from metalens_tpu.farfield import farfield_big

    rng = np.random.default_rng(3)
    num_x, num_y, spacing = 48, 36, LAM / 2.2
    xs = (np.arange(num_x) - num_x / 2) * spacing
    ys = (np.arange(num_y) - num_y / 2) * spacing
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    kg = 2 * np.pi * NG / LAM
    # structured + noisy fields: tilted carrier, radial defocus, speckle
    phase = np.exp(1j * kg * (0.25 * X + 0.1 * Y
                              - 0.002 * (X ** 2 + Y ** 2) / spacing))
    def fld():
        return phase * (1 + 0.1 * (rng.standard_normal((num_x, num_y))
                                   + 1j * rng.standard_normal((num_x,
                                                               num_y))))
    Ex, Ey = fld(), 0.3 * fld()
    Hy, Hx = NG / nu.Z0 * fld(), -0.2 * NG / nu.Z0 * fld()

    P0, tot0, ux0, uy0, dux0, duy0 = farfield(Ex, Ey, Hx, Hy, xs, ys,
                                              LAM, NG)
    # 500 points/slab -> ~11 partial row slabs and 4 column slabs
    P1, tot1, ux1, uy1, dux1, duy1 = farfield_big(Ex, Ey, Hx, Hy, xs, ys,
                                                  LAM, NG,
                                                  pts_at_a_time=500)
    assert np.allclose(np.asarray(ux1), np.asarray(ux0))
    assert np.allclose(np.asarray(uy1), np.asarray(uy0))
    assert (dux1, duy1) == (dux0, duy0)
    P0n = np.asarray(P0)
    both = np.isfinite(P0n) & np.isfinite(P1)
    assert (np.isfinite(P0n) == np.isfinite(P1)).all()
    scale = np.abs(P0n[both]).max()
    assert np.abs(P1[both] - P0n[both]).max() < 1e-10 * scale
    assert abs(tot1 - tot0) < 1e-10 * abs(tot0)


def test_focused_phase_profile_spot():
    """A converging spherical phase across the aperture concentrates power
    into the angular cone of its NA."""
    n_pts, spacing = 256, LAM / 2.2
    xs = (np.arange(n_pts) - n_pts / 2) * spacing
    ys = xs.copy()
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    R = n_pts * spacing / 2
    f = 2 * R  # NA ~ 0.45 in glass
    kg = 2 * np.pi * NG / LAM
    aperture = (X ** 2 + Y ** 2 < R ** 2)
    phase = np.exp(-1j * kg * (np.sqrt(f ** 2 + X ** 2 + Y ** 2) - f))
    Ex = aperture * phase
    Hy = NG / nu.Z0 * Ex
    zero = np.zeros_like(Ex)
    P, total_P, ux, uy, dux, duy = farfield(Ex, zero, zero, Hy, xs, ys,
                                            LAM, NG)
    Pz = np.asarray(jnp.where(jnp.isfinite(P), P, 0.0))
    na = R / np.sqrt(R ** 2 + f ** 2)
    UX = np.asarray(ux).reshape(-1, 1)
    UY = np.asarray(uy).reshape(1, -1)
    in_cone = UX ** 2 + UY ** 2 < (1.1 * na) ** 2
    frac = (Pz * in_cone).sum() / Pz.sum()
    assert frac > 0.95



def test_high_na_grazing_bins():
    """|u| -> 1 semantics: exact 1/uz (divide-then-mask, matching reference
    nearfield_farfield.py:183-185 + the finite-entry sum at :74), NOT a
    softened 1/(uz+eps).  With constant aperture spectra fftEx = 1,
    fftHy = h and uy = 0 the transform collapses analytically to

        P(ux) = 2 * k^2/(32 pi^2 Z) * dA^2 * (1 + Z h uz)^2 / uz,

    which pins the grazing bins to 4+ digits (the retired 1e-5 softening
    is a 1% error at uz = 1e-3).  Grazing (uz = 0) must be inf, evanescent
    (|u| > 1) must be nan -- both masked out of every power total."""
    from metalens_tpu.farfield import _angular_power
    from metalens_tpu.solver import cpx

    uz_probe = 1e-3
    ux_list = jnp.asarray([0.0, 0.3, np.sqrt(1 - uz_probe ** 2), 1.0, 1.04])
    uy_list = jnp.asarray([0.0])
    shape = (len(ux_list), 1)
    h = NG / nu.Z0          # plane-wave-ish H amplitude (any constant works)
    one = cpx.from_np(np.ones(shape, np.complex128))
    zero = cpx.from_np(np.zeros(shape, np.complex128))
    dxp = dyp = float(LAM / 2.2)
    P = np.asarray(_angular_power(one, zero, zero, one * h,
                                  ux_list, uy_list, dxp, dyp, LAM, NG))
    Z = nu.Z0 / NG
    dA = dxp * dyp
    kg = 2 * np.pi * NG / LAM
    uz = np.sqrt(np.maximum(1 - np.asarray(ux_list) ** 2, 0.0))
    expect = 2 * kg ** 2 / (32 * np.pi ** 2 * Z) * dA ** 2 \
        * (1 + Z * h * uz) ** 2 / np.where(uz == 0, np.nan, uz)
    for i in (0, 1, 2):     # incl. the uz = 1e-3 grazing bin
        np.testing.assert_allclose(P[i, 0], expect[i], rtol=1e-6)
    assert np.isposinf(P[3, 0])      # uz == 0: divide gives inf
    assert np.isnan(P[4, 0])         # |u| > 1: evanescent gives nan
    # and the public API's totals mask them (finite-entry sum semantics)
    assert np.isfinite(np.where(np.isfinite(P), P, 0.0).sum())


_trapz = getattr(np, "trapezoid", None) or np.trapz   # numpy<2 fallback


def _J1(x):
    """Bessel J1 by its integral representation (vectorized trapezoid;
    ~1e-9 accurate here) -- an analytic anchor independent of the code
    under test."""
    tau = np.linspace(0.0, np.pi, 4001)
    return _trapz(np.cos(tau[None, :] - np.outer(x, np.sin(tau))),
                  tau, axis=1) / np.pi


def test_circular_aperture_matches_airy_pattern():
    """Uniformly illuminated circular disk: the angular power must follow
    the analytic Airy pattern [2 J1(v)/v]^2 (v = k_g a sin(theta)) times
    the transform's own obliquity factor (1+uz)^2/uz, and the encircled
    energy must follow the textbook cumulative 1 - J0^2 - J1^2.  This
    pins the SHAPE of the far field (the other tests pin totals, peak
    direction, and grazing bins), against a formula the code never
    computes.  Reference role: the by-hand near-field phase plots the
    reference used as its only pattern check (lens_center.py:181-184)."""
    n_pts, spacing = 256, LAM / 2.2
    xs = (np.arange(n_pts) - n_pts / 2) * spacing
    ys = xs.copy()
    a = 12.0 * spacing                      # disk radius
    # anti-aliased disk: per-pixel coverage by 4x4 subsampling (a hard
    # pixel mask would put ~2% edge noise on the first ring)
    sub = (np.arange(4) - 1.5) / 4 * spacing
    cover = np.zeros((n_pts, n_pts))
    for dx in sub:
        for dy in sub:
            X, Y = np.meshgrid(xs + dx, ys + dy, indexing="ij")
            cover += (X ** 2 + Y ** 2 < a ** 2) / 16.0
    Ex = cover.astype(complex)
    Hy = NG / nu.Z0 * Ex
    zero = np.zeros_like(Ex)
    P, total_P, ux, uy, dux, duy = farfield(Ex, zero, zero, Hy, xs, ys,
                                            LAM, NG)
    Pz = np.asarray(jnp.where(jnp.isfinite(P), P, 0.0))
    UX = np.asarray(ux).reshape(-1, 1)
    UY = np.asarray(uy).reshape(1, -1)
    s = np.sqrt(UX ** 2 + UY ** 2)          # sin(theta) in glass
    kg_a = 2 * np.pi * NG / LAM * a
    s1 = 3.8317059702 / kg_a                # first Airy zero

    s_full = np.broadcast_to(s, Pz.shape)

    # encircled energy: the analytic cumulative is E(v) = 1 - J0^2 - J1^2;
    # compare the first-zero / third-ring ratio (a total-power denominator
    # would fold in the pixelated disk's spectral tail, ~2% here)
    def _J0(x):
        tau = np.linspace(0.0, np.pi, 4001)
        return _trapz(np.cos(np.outer(x, np.sin(tau))), tau,
                      axis=1) / np.pi

    def encircled(v):
        return 1.0 - _J0([v])[0] ** 2 - _J1([v])[0] ** 2

    v1 = 3.8317059702
    ratio = Pz[s_full < s1].sum() / Pz[s_full < 3.3 * s1].sum()
    assert abs(ratio - encircled(v1) / encircled(3.3 * v1)) < 0.01

    # radial shape over the main lobe + first two rings
    sel = (s_full > 0) & (s_full < 3.3 * s1)
    v = kg_a * s_full[sel]
    uz = np.sqrt(1 - s_full[sel] ** 2)
    airy = (2 * _J1(v) / v) ** 2 * (1 + uz) ** 2 / uz
    # normalize by the on-axis bin, where (2J1/v)^2 -> 1 and (1+uz)^2/uz = 4
    i0, j0 = np.unravel_index(np.argmin(s_full), Pz.shape)
    assert s_full[i0, j0] == 0.0
    airy = airy * (Pz[i0, j0] / 4.0)
    got = Pz[sel]
    rel_l2 = np.linalg.norm(got - airy) / np.linalg.norm(airy)
    assert rel_l2 < 0.01          # measured 0.0016


def test_dft_four_step_recursion(monkeypatch):
    """Force the four-step Cooley-Tukey path (normally only above 4096) and
    check it against the direct matmul DFT / numpy."""
    from metalens_tpu.solver import cpx, dft
    monkeypatch.setattr(dft, "DIRECT_LIMIT", 16)
    dft._dft_factors.cache_clear()
    rng = np.random.default_rng(0)
    for n in (60, 64, 90):
        x = rng.normal(size=(n, 7)) + 1j * rng.normal(size=(n, 7))
        got = cpx.to_np(dft.dft_axis0(cpx.from_np(x)))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=0), rtol=1e-9,
                                   atol=1e-9)
    dft._dft_factors.cache_clear()

def test_dft_device_cache_not_poisoned_by_tracing(monkeypatch):
    """Calling dft inside a jit trace must not cache tracers: the device
    constant cache is shared with eager calls, and a cached tracer leaks
    as UnexpectedTracerError in every later eager/jit call (this bit the
    sharded farfield + viz tests when run after test_parallel)."""
    import jax
    from metalens_tpu.solver import cpx, dft
    monkeypatch.setattr(dft, "DIRECT_LIMIT", 16)
    dft._dft_factors.cache_clear()
    dft._DFT_MAT_CACHE.clear()
    dft._TWIDDLE_CACHE.clear()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(60, 3)) + 1j * rng.normal(size=(60, 3))

    # populate the caches from INSIDE a trace first
    def f(xc):
        return dft.dft_axis0(xc)
    _ = cpx.to_np(jax.jit(f)(cpx.from_np(x)))
    for cache in (dft._DFT_MAT_CACHE, dft._TWIDDLE_CACHE):
        for v in cache.values():
            assert not isinstance(v.re, jax.core.Tracer)

    # eager call afterwards must still work and agree with numpy
    got = cpx.to_np(dft.dft_axis0(cpx.from_np(x)))
    np.testing.assert_allclose(got, np.fft.fft(x, axis=0), rtol=1e-9,
                               atol=1e-9)
    dft._dft_factors.cache_clear()
    dft._DFT_MAT_CACHE.clear()
    dft._TWIDDLE_CACHE.clear()
