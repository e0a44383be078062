"""Scene-object tests: Grating/GratingCollection geometry, spec-roundtrip
persistence, validate() fabrication constraints, resize continuation
seeding.  Mirrors the behaviors pinned in reference grating.py."""

import math

import numpy as np
import pytest

from metalens_tpu import Grating, GratingCollection, validate, resize
from metalens_tpu import geometry
from metalens_tpu.units import nm, degree, pi


def simple_grating(**kw):
    args = dict(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.],
                                               [500., 10., 80., 110., 5.]]))
    args.update(kw)
    return Grating(**args)


def test_constructor_period_from_angle():
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 100., 100., 0.]]))
    assert abs(g.grating_period - 580 * nm / math.sin(30 * degree)) < 1e-18
    assert abs(g.get_angle_in_air(580 * nm) - 30 * degree) < 1e-12


def test_angle_in_air_raises_for_subwavelength_period():
    g = simple_grating(grating_period=500 * nm)
    with pytest.raises(ValueError):
        g.get_angle_in_air(580 * nm)


def test_unit_conversions():
    g = simple_grating()
    nmdeg = g.xyrra_list_in_nm_deg
    umdeg = g.xyrra_list_in_um_deg
    np.testing.assert_allclose(nmdeg[:, 0:4] / 1000.0, umdeg[:, 0:4])
    np.testing.assert_allclose(nmdeg[:, 4], umdeg[:, 4])
    assert abs(nmdeg[1, 0] - 500.0) < 1e-9


def test_repr_roundtrip():
    g = simple_grating()
    g.data = [{"wavelength_in_nm": 580.0, "x_or_y": "x", "ux": 0.1, "uy": 0.0,
               "ox": -1, "oy": 0, "ampfy": 0.1 + 0.2j, "ampfx": 0.3 - 0.1j,
               "ampry": 0j, "amprx": 0.05j}]
    env = {"Grating": Grating, "np": np, "nm": nm}
    g2 = eval(repr(g), env)
    np.testing.assert_allclose(g2.xyrra_list, g.xyrra_list, rtol=1e-12)
    assert g2.data == g.data
    assert g2.lateral_period == g.lateral_period
    g3 = g.copy()
    np.testing.assert_allclose(g3.xyrra_list, g.xyrra_list)
    g3.xyrra_list[0, 0] += nm
    assert g3.xyrra_list[0, 0] != g.xyrra_list[0, 0]  # deep copy


def test_standardize_wraps_into_cell():
    g = simple_grating()
    g.xyrra_list[0, 0] += 3 * g.grating_period + 0.3 * g.grating_period
    g.xyrra_list[1, 1] -= 2 * g.lateral_period
    g.xyrra_list[0, 4] = 1.5 * pi
    g.standardize()
    assert abs(g.xyrra_list[0, 0] - 0.3 * g.grating_period) < 1e-15
    assert abs(g.xyrra_list[1, 1] - 10 * nm) < 1e-15
    assert -pi <= g.xyrra_list[0, 4] <= pi


def test_replicas_cover_boundary_pillars():
    g = simple_grating(xyrra_list_in_nm_deg=np.array(
        [[590., 0., 100., 80., 0.]]))  # sticks out of the +x boundary
    reps = g.get_xyrra_list(replicas=True)
    assert reps.shape[0] >= 2  # itself and the wrapped-around copy


def test_validate_min_diameter():
    g = simple_grating(xyrra_list_in_nm_deg=np.array([[0., 0., 49., 100., 0.]]))
    assert validate(g) is False
    g = simple_grating(xyrra_list_in_nm_deg=np.array([[0., 0., 51., 100., 0.]]))
    assert validate(g) is True


def test_validate_min_distance_between_pillars():
    # two 100nm-radius circles, centers 290nm apart -> 90nm gap < 100nm
    g = simple_grating(xyrra_list_in_nm_deg=np.array(
        [[0., 0., 100., 100., 0.], [290., 0., 100., 100., 0.]]))
    assert validate(g) is False
    g = simple_grating(xyrra_list_in_nm_deg=np.array(
        [[0., 0., 100., 100., 0.], [320., 0., 100., 100., 0.]]))
    assert validate(g) is True


def test_validate_self_replica_in_y():
    # lateral period 320nm, radius 115nm: gap to own y-replica = 320-230=90nm
    g = simple_grating(xyrra_list_in_nm_deg=np.array([[0., 0., 150., 115., 0.]]))
    assert validate(g) is False


def test_validate_trust_region():
    g = simple_grating()
    similar = g.xyrra_list.copy()
    assert validate(g, similar_to=similar, how_similar=0.03)
    g.xyrra_list[0, 2] *= 1.05
    assert not validate(g, similar_to=similar, how_similar=0.03)
    assert validate(g, similar_to=similar, how_similar=0.10)


def test_resize_shrinks_through_gap():
    g_old = simple_grating(grating_period=1200 * nm, xyrra_list_in_nm_deg=np.array(
        [[-350., 0., 120., 90., 0.], [100., 10., 80., 110., 5.]]))
    assert validate(g_old)
    shell = Grating(lateral_period=330 * nm, cyl_height=550 * nm,
                    grating_period=1150 * nm,
                    xyrra_list_in_nm_deg=np.zeros((0, 5)))
    g_new = resize(g_old, shell)
    assert validate(g_new)
    assert g_new.grating_period == 1150 * nm


def test_resize_multi_gap_fallback():
    """A boundary-packed cell whose slack is SPREAD across three equal
    gaps: the reference's single-cut repair cannot absorb the shrink (any
    one gap would go below min_distance), the multi-gap fallback
    distributes it and validates.  Geometry: three rx=80nm pillars with
    160nm gaps (period 960nm); shrinking by 120nm needs 40nm from each
    gap (leaving 120 >= min_distance=100), while one cut would leave
    160-120=40 < 100."""
    g_old = simple_grating(grating_period=960 * nm, xyrra_list_in_nm_deg=np.array(
        [[-320., 0., 80., 80., 0.],
         [0., 0., 80., 80., 0.],
         [320., 0., 80., 80., 0.]]))
    assert validate(g_old)
    shell = Grating(lateral_period=g_old.lateral_period,
                    cyl_height=550 * nm, grating_period=840 * nm,
                    xyrra_list_in_nm_deg=np.zeros((0, 5)))
    g_new = resize(g_old, shell)
    assert validate(g_new)
    assert g_new.grating_period == 840 * nm
    # all pairwise x-separations survived >= min_distance
    from metalens_tpu.grating import min_distance
    from metalens_tpu.geometry import ellipse_outlines
    pts = ellipse_outlines(g_new.xyrra_list).reshape(-1, 2)
    for i in range(3):
        a = ellipse_outlines(g_new.xyrra_list[i:i + 1]).reshape(-1, 2)
        for j in range(i + 1, 3):
            b = ellipse_outlines(g_new.xyrra_list[j:j + 1]).reshape(-1, 2)
            dx = np.abs(a[:, None, 0] - b[None, :, 0])
            dx = np.minimum(dx, g_new.grating_period - dx)
            d = np.sqrt(dx ** 2 + (a[:, None, 1] - b[None, :, 1]) ** 2)
            assert d.min() >= min_distance - 1e-12


def make_collection():
    gs = []
    for gp in (1100., 1200., 1300.):
        gs.append(Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                          grating_period=gp * nm,
                          xyrra_list_in_nm_deg=np.array(
                              [[gp / 10, 0., 100., 90., 0.]])))
    return GratingCollection(target_wavelength=580 * nm,
                             lateral_period=320 * nm,
                             lens_type="cyl", grating_list=gs)


def test_collection_sorted_and_accessors():
    gc = make_collection()
    assert gc.get_outermost().grating_period == 1100 * nm
    assert gc.get_innermost().grating_period == 1300 * nm


def test_collection_get_one_interpolates():
    gc = make_collection()
    g = gc.get_one(grating_period=1150 * nm)
    # x coordinate blends linearly: (110 + 120)/2 = 115
    assert abs(g.xyrra_list_in_nm_deg[0, 0] - 115.0) < 1e-9
    assert g.lateral_period == 320 * nm
    # exact member
    g = gc.get_one(grating_period=1200 * nm)
    assert abs(g.xyrra_list_in_nm_deg[0, 0] - 120.0) < 1e-9
    # 1% clamp zone uses the edge pattern
    g = gc.get_one(grating_period=1310 * nm)
    assert abs(g.xyrra_list_in_nm_deg[0, 0] - 130.0) < 1e-9
    # far outside -> empty
    g = gc.get_one(grating_period=1500 * nm)
    assert not hasattr(g, "xyrra_list")


def test_collection_round_lateral_period_law():
    lam = 580 * nm
    gs = []
    lp_over_tan = 261.0 * nm
    for gp in (900., 1000.):
        angle = math.asin(lam / (gp * nm))
        lp = lp_over_tan * math.tan(angle)
        gs.append(Grating(lateral_period=lp, cyl_height=550 * nm,
                          grating_period=gp * nm,
                          xyrra_list_in_nm_deg=np.array(
                              [[0., 0., 100., 90., 0.]])))
    gc = GratingCollection(target_wavelength=lam, lateral_period=lp_over_tan,
                           lens_type="round", grating_list=gs)
    g = gc.get_one(grating_period=950 * nm)
    expected_lp = lp_over_tan * math.tan(math.asin(lam / (950 * nm)))
    assert abs(g.lateral_period - expected_lp) < 1e-15


def test_collection_repr_roundtrip():
    gc = make_collection()
    env = {"GratingCollection": GratingCollection, "Grating": Grating,
           "np": np, "nm": nm}
    gc2 = eval(repr(gc), env)
    assert len(gc2.grating_list) == 3
    np.testing.assert_allclose(gc2.grating_list[1].xyrra_list,
                               gc.grating_list[1].xyrra_list)


def test_good_fft_number():
    assert geometry.good_fft_number(1) == 1
    assert geometry.good_fft_number(7) == 8
    assert geometry.good_fft_number(11) == 12
    assert geometry.good_fft_number(121) == 125
    assert geometry.good_fft_number(2000) == 2000
    assert geometry.good_fft_number(2001) == 2025


def test_ellipse_pts_matches_reference_parametrization():
    pts = geometry.ellipse_pts(1.0, 2.0, 0.5, 0.25, 0.3, num_points=16)
    assert pts.shape == (16, 2)
    theta = 0.0
    dx0, dy0 = 0.5 * math.cos(theta), 0.25 * math.sin(theta)
    x = 1.0 + dx0 * math.cos(0.3) - dy0 * math.sin(0.3)
    y = 2.0 + dx0 * math.sin(0.3) + dy0 * math.cos(0.3)
    np.testing.assert_allclose(pts[0], [x, y], rtol=1e-12)
