"""End-to-end round-lens pipeline: GratingCollection periphery + hex center
-> design_periphery/make_design -> stitched near-field (periphery branch)
-> far-field focusing.  This is the reference's flagship workflow
(README 'Using the code'), exercised on a miniature lens."""

import math

import numpy as np
import pytest

from metalens_tpu import Grating, GratingCollection
from metalens_tpu.assembly import (design_periphery, make_design,
                                   target_phase_zeros,
                                   make_periphery_xyrra_list)
from metalens_tpu.hexgrid import HexGridSet
from metalens_tpu.nearfield import build_nearfield
from metalens_tpu.farfield import farfield, focal_metrics
from metalens_tpu.solver import cpx
from metalens_tpu.units import nm, um, degree

LAM = 580 * nm


def make_round_collection(angle_lo_deg, angle_hi_deg, n_members=3):
    """A round-lens GratingCollection spanning [angle_lo, angle_hi] with
    simple (unoptimized) two-pillar cells -- efficiency is modest but the
    physics pipeline is fully exercised."""
    lp_over_tan = None
    gs = []
    angles = np.linspace(angle_lo_deg, angle_hi_deg, n_members) * degree
    # choose the invariant so that lateral_period ~ 320nm mid-range
    mid = angles[len(angles) // 2]
    lp_over_tan = 320 * nm / math.tan(mid)
    for ang in angles:
        gp = LAM / math.sin(ang)
        lp = lp_over_tan * math.tan(ang)
        frac = (ang - angles[0]) / (angles[-1] - angles[0] + 1e-12)
        gs.append(Grating(
            lateral_period=lp, cyl_height=550 * nm, grating_period=gp,
            xyrra_list_in_nm_deg=np.array(
                [[-gp / nm / 4, 0.0, 90.0 + 5 * frac, 70.0, 0.0],
                 [gp / nm / 4, 0.0, 70.0, 80.0 + 5 * frac, 0.0]])))
    gc = GratingCollection(target_wavelength=LAM,
                           lateral_period=lp_over_tan,
                           lens_type="round", grating_list=gs)
    return gc


@pytest.fixture(scope="module")
def mini_lens():
    source_distance = 25 * um
    radius = 7.5 * um
    angle_lo, angle_hi = 8.0, 18.0

    gc = make_round_collection(angle_lo, angle_hi)
    gc.characterize(wavelength=LAM, numG=25, u_steps=3)
    gc.build_interpolators()

    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=5)
    # full angle grid: the dipole illuminates the center at |u| up to
    # r_switch/d ~ 0.2, beyond the just_normal interpolation bounds (the
    # grid straddles (0.001, 0.001) so the phase library still extracts)
    hgs.characterize(wavelength=LAM, numG=25, just_normal=False, u_steps=3)
    hgs.build_interpolators()

    collections = [[(angle_lo * degree, angle_hi * degree), gc]]
    out = make_design(collections, source_distance, radius, hgs,
                      make_xyrra_list=True)
    lens_periphery_summary, lens_center_summary, r_switch, xyrra = out
    return (gc, hgs, lens_periphery_summary, lens_center_summary, r_switch,
            xyrra, source_distance, radius)


def test_design_summary_structure(mini_lens):
    (gc, hgs, lps, lcs, r_switch, xyrra, d, radius) = mini_lens
    # rings are contiguous: r_center[i] +- half periods meet
    # (reference design_collimator.py:159-162)
    rc = lps["r_center_list"]
    gp = lps["grating_period_list"]
    np.testing.assert_allclose(rc[:-1] + 0.5 * gp[:-1] + 0.5 * gp[1:],
                               rc[1:], rtol=1e-9)
    assert (lps["r_min_list"] < lps["r_max_list"]).all()
    assert lps["r_min_list"][0] == r_switch
    assert (np.diff(lps["r_min_list"]) > 0).all()
    # angle bracket honored
    ang = np.arctan(rc / d)
    assert ang.min() > 7.9 * degree and ang.max() < 18.1 * degree
    # every ring's period within the collection's (padded) range
    gps = [g.grating_period for g in gc.grating_list]
    assert gp.min() > 0.985 * min(gps) and gp.max() < 1.015 * max(gps)
    # center sites exist and pillar list covers center + periphery
    assert len(lcs) > 0
    assert xyrra.shape[0] > len(lcs)
    r_pillars = np.hypot(xyrra[:, 0], xyrra[:, 1])
    assert r_pillars.max() <= radius + 1 * um


def test_periphery_xyrra_geometry(mini_lens):
    (gc, hgs, lps, lcs, r_switch, xyrra, d, radius) = mini_lens
    peri = make_periphery_xyrra_list(lps)
    # all pillars inside the annulus (with a cell-size margin)
    r = np.hypot(peri[:, 0], peri[:, 1])
    assert r.min() > lps["r_min_list"][0] - 2 * um
    assert r.max() < lps["r_max_list"][-1] + 2 * um
    # rotational tiling: number of pillars is a multiple of pillars/cell x
    # copies for each ring; at least num_around * n_pillars total
    assert peri.shape[0] >= lps["num_around_circle_list"].sum() * 2 * 0.9


def test_nearfield_farfield_focuses(mini_lens):
    (gc, hgs, lps, lcs, r_switch, xyrra, d, radius) = mini_lens
    # dipole source at the design distance: the collimator should produce a
    # mostly-collimated (near-normal) beam in glass
    n_pts = 60  # covers the lens at ~lambda/2.2... (7.5um -> need ~57)
    half = radius * 1.05
    x_pts = np.linspace(-half, half, 60)
    spacing = x_pts[1] - x_pts[0]
    assert spacing < LAM / 2
    Ex, Ey, Hx, Hy, xs, ys, P_lens, n_glass = build_nearfield(
        source_x=0.0, source_y=0.0, source_z=-d, source_pol="x",
        wavelength=LAM, lens_periphery_summary=lps,
        lens_center_summary=lcs, hexgridset=hgs,
        x_pts=x_pts, y_pts=x_pts, dipole_moment=1e-30 * 1.0)
    Ex_np = cpx.to_np(Ex)
    assert np.isfinite(Ex_np).all()
    assert P_lens > 0
    # periphery contributes: nonzero field in the annulus
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    R = np.hypot(X, Y)
    annulus = (R > lps["r_min_list"][0]) & (R < lps["r_max_list"][-1])
    assert np.abs(Ex_np[annulus]).max() > 0

    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys, LAM,
                                            n_glass)
    m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                      spot_radius_u=0.15)
    # collimation: the far-field peak is near normal
    assert abs(m["peak_ux"]) < 0.1 and abs(m["peak_uy"]) < 0.1
    # energy sane: transmission between 5% and 100%
    assert 0.05 < m["transmission"] < 1.001
    # focused fraction dominates scattered background
    assert m["spot_fraction_of_total"] > 0.3


def test_design_periphery_ring_layout_invariants(mini_lens):
    """The vectorized ring layout (round 4): rings exactly tile the phase
    zeros from the innermost bracket edge to the first zero past the rim;
    each ring's bracket contains its center angle; error paths raise."""
    (gc, hgs, lps, lcs, r_switch, xyrra, d, radius) = mini_lens
    zeros = np.asarray(target_phase_zeros(radius + 2 * um, d))
    lo = 8.0 * degree
    zeros = zeros[zeros > d * math.tan(lo)]
    np.testing.assert_allclose(lps["r_min_list"], zeros[:len(lps["r_min_list"])])
    np.testing.assert_allclose(lps["r_max_list"],
                               zeros[1:1 + len(lps["r_max_list"])])
    # exactly one ring crosses the rim, and it is the last
    assert (lps["r_max_list"] > radius).sum() == 1
    assert lps["r_max_list"][-1] > radius >= lps["r_min_list"][-1]
    # bracket containment at ring centers
    ang = np.arctan2(lps["r_center_list"], d)
    assert (ang <= 18.0 * degree + 1e-12).all()
    assert (lps["gratingcollection_index_here_list"] == 0).all()
    # error paths
    coll = [[(8.0 * degree, 18.0 * degree), gc]]
    with pytest.raises(ValueError, match="radius is too big"):
        design_periphery(coll, d, 5 * radius)
    # the first zero past d*tan(lo)=3.5um sits at 5.44um; a rim whose
    # +2um zero window ends before it leaves no ring
    with pytest.raises(ValueError, match="too small"):
        design_periphery(coll, d, 3.0 * um)


def test_vary_angle_one_step_gradient():
    """A single continuation step of vary_angle with the gradient inner
    loop: collection grows by one member whose angle decreased (cyl lens),
    trust region respected."""
    from metalens_tpu.optimize import vary_angle
    g0 = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                 target_wavelength=LAM, angle_in_air=30 * degree,
                 xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))
    from metalens_tpu.solver.fom import FomTerm
    terms = [FomTerm(LAM, 1.0, -1, True)]
    gc = vary_angle(start_grating=g0, end_angle=29.2 * degree,
                    lens_type="cyl", target_wavelength=LAM, numG=20,
                    terms=terms, use_gradient=True, gradient_steps=8,
                    optimize2_attempts=2, verbose=False)
    assert len(gc.grating_list) >= 2
    angles = [g.get_angle_in_air(LAM) for g in gc.grating_list]
    assert min(angles) < 30 * degree
    # trust region: geometry changed by less than ~3% of the periods
    a = gc.grating_list[0].xyrra_list
    b = gc.grating_list[-1].xyrra_list
    assert np.abs(a[:, 2:4] - b[:, 2:4]).max() < 0.1 * 320 * nm
