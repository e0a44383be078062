"""End-to-end RGB workflow: RGB-FOM design -> 3-wavelength amplitude
database -> lens assembly -> per-wavelength stitched near-field +
far-field focus.

This composes the steps the reference README walks through for the RGB
collimator (``/root/reference/README.md:52-94``; RGB FOM table
``/root/reference/grating.lua:295-311``) at miniature scale: the design
step scores all three wavelengths jointly, the database is characterized
at 450/580/650 nm in one sweep, and the finished lens is stitched and
focused at EACH wavelength.  benchmarks/northstar2.py runs the same
composition at production scale on chip; this pins it on CPU."""

import numpy as np
import pytest

from test_full_lens import make_round_collection

from metalens_tpu.assembly import make_design
from metalens_tpu.farfield import farfield, focal_metrics
from metalens_tpu.hexgrid import HexGridSet
from metalens_tpu.nearfield import build_nearfield
from metalens_tpu.optimize import optimize2
from metalens_tpu.solver import cpx
from metalens_tpu.solver.fom import FomTerm
from metalens_tpu.units import nm, um, degree

LAMS_NM = (450, 580, 650)
# reference RGB FOM table: in-phase scoring at the center wavelength,
# magnitude-only at the outer two, equal weights (grating.lua:295-311)
RGB_TERMS = [FomTerm(650 * nm, 1.0, -1, False),
             FomTerm(580 * nm, 1.0, -1, True),
             FomTerm(450 * nm, 1.0, -1, False)]
NUMG = 16


@pytest.fixture(scope="module")
def rgb_lens():
    angle_lo, angle_hi = 8.0, 18.0
    gc = make_round_collection(angle_lo, angle_hi)

    # RGB design step: a short random-perturbation ratchet on the middle
    # member, scored with the 3-wavelength FOM
    mid = len(gc.grating_list) // 2
    g = gc.grating_list[mid]
    fom_before = g.fom(target_wavelength=580 * nm, numG=NUMG,
                       terms=RGB_TERMS)
    g_opt = optimize2(g, 580 * nm, attempts=6, numG=NUMG, terms=RGB_TERMS,
                      verbose=False, rng=np.random.default_rng(0))
    fom_after = g_opt.fom(target_wavelength=580 * nm, numG=NUMG,
                          terms=RGB_TERMS)
    gc.grating_list[mid] = g_opt

    lams = [l * nm for l in LAMS_NM]
    gc.characterize(wavelength=lams, numG=NUMG, u_steps=3)
    gc.build_interpolators()
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=5)
    hgs.characterize(wavelength=lams, numG=NUMG, just_normal=False,
                     u_steps=3)
    hgs.build_interpolators()

    collections = [[(angle_lo * degree, angle_hi * degree), gc]]
    source_distance, radius = 25 * um, 7.5 * um
    lps, lcs, r_switch = make_design(collections, source_distance, radius,
                                     hgs)
    return (gc, hgs, lps, lcs, source_distance, radius,
            fom_before, fom_after)


def test_rgb_fom_ratchet(rgb_lens):
    (_, _, _, _, _, _, fom_before, fom_after) = rgb_lens
    # the ratchet only ever accepts FOM-non-decreasing steps
    assert fom_after >= fom_before - 1e-12
    assert fom_after > 0


def test_rgb_database_covers_three_wavelengths(rgb_lens):
    (gc, hgs, *_rest) = rgb_lens
    for obj in (gc, hgs):
        wls = {k[0] for k in obj.interpolators}
        assert set(LAMS_NM) <= wls, (type(obj).__name__, wls)


@pytest.mark.parametrize("lam_nm", LAMS_NM)
def test_rgb_stitch_and_focus_each_wavelength(rgb_lens, lam_nm):
    """The 580-designed lens, evaluated at each database wavelength,
    produces a finite, roughly collimated beam with sane transmission —
    the chromatic sweep the reference's RGB README workflow ends with."""
    (gc, hgs, lps, lcs, d, radius, _, _) = rgb_lens
    from metalens_tpu.geometry import good_fft_number
    lam = lam_nm * nm
    half = radius * 1.05
    n_pts = good_fft_number(2 * half / (lam / 2.2))
    x_pts = np.linspace(-half, half, n_pts)
    Ex, Ey, Hx, Hy, xs, ys, P_lens, n_glass = build_nearfield(
        source_x=0.0, source_y=0.0, source_z=-d, source_pol="x",
        wavelength=lam, lens_periphery_summary=lps,
        lens_center_summary=lcs, hexgridset=hgs,
        x_pts=x_pts, y_pts=x_pts, dipole_moment=1e-30)
    Ex_np = cpx.to_np(Ex)
    assert np.isfinite(Ex_np).all()
    assert P_lens > 0

    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys, lam,
                                            n_glass)
    m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                      spot_radius_u=0.2)
    assert abs(m["peak_ux"]) < 0.2 and abs(m["peak_uy"]) < 0.2
    assert 0.02 < m["transmission"] < 1.001
