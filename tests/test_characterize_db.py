"""Interpolation-table tests: AmpInterpolator vs direct evaluation, the
collection period-padding semantics, and the HexGridSet phase library."""

import numpy as np
import pytest

from metalens_tpu import Grating, GratingCollection
from metalens_tpu.characterize import (AmpInterpolator,
                                       build_collection_interpolators)
from metalens_tpu.hexgrid import HexGridSet
from metalens_tpu.units import nm, degree


def test_amp_interpolator_matches_manual_trilinear():
    gx = np.array([0.0, 1.0, 3.0])
    gy = np.array([-1.0, 1.0])
    gz = np.array([10.0, 20.0])
    vals = (np.random.default_rng(1).normal(size=(3, 2, 2))
            + 1j * np.random.default_rng(2).normal(size=(3, 2, 2)))
    f = AmpInterpolator((gx, gy, gz), vals)
    # exact at nodes
    out = np.asarray(f(np.array([[1.0, 1.0, 20.0]])))
    assert abs(out[0] - vals[1, 1, 1]) < 1e-12
    # midpoint average along one axis
    out = np.asarray(f(np.array([[0.5, -1.0, 10.0]])))
    assert abs(out[0] - 0.5 * (vals[0, 0, 0] + vals[1, 0, 0])) < 1e-12
    # full trilinear
    p = np.array([[2.0, 0.0, 12.5]])
    wx, wy, wz = 0.5, 0.5, 0.25
    manual = 0.0
    for ix, vx in ((1, 1 - wx), (2, wx)):
        for iy, vy in ((0, 1 - wy), (1, wy)):
            for iz, vz in ((0, 1 - wz), (1, wz)):
                manual += vx * vy * vz * vals[ix, iy, iz]
    assert abs(np.asarray(f(p))[0] - manual) < 1e-12


def test_amp_interpolator_degenerate_axis():
    f = AmpInterpolator((np.array([0.5]), np.array([0.0, 1.0])),
                        np.array([[1 + 1j, 3 + 3j]]))
    out = np.asarray(f(np.array([[123.0, 0.5]])))
    assert abs(out[0] - (2 + 2j)) < 1e-12


def make_characterized_collection():
    gs = []
    for gp in (1100.0, 1200.0):
        gs.append(Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                          grating_period=gp * nm,
                          xyrra_list_in_nm_deg=np.array(
                              [[gp / 10, 0., 100., 90., 0.]])))
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=gs)
    gc.characterize(wavelength=580 * nm, numG=25, u_steps=3)
    return gc


def test_collection_interpolators_roundtrip_and_padding():
    gc = make_characterized_collection()
    gc.build_interpolators()
    key = (580, (0, 0), "x", "ampfx")
    assert key in gc.interpolators
    f = gc.interpolators[key]
    # at a data node the interpolator reproduces the stored value
    g0 = gc.grating_list[0]
    e = [e for e in g0.data if e["x_or_y"] == "x" and (e["ox"], e["oy"]) == (0, 0)][0]
    got = complex(np.asarray(f(np.array([[e["ux"], e["uy"], g0.grating_period]])))[0])
    assert abs(got - e["ampfx"]) < 1e-10
    # the +-1% padded period region returns the edge grating's value
    got_pad = complex(np.asarray(f(np.array(
        [[e["ux"], e["uy"], g0.grating_period * 0.995]])))[0])
    assert abs(got_pad - e["ampfx"]) < 1e-10
    lo, hi = gc.interpolator_bounds[4], gc.interpolator_bounds[5]
    assert abs(lo - 0.99 * g0.grating_period) < 1e-18
    assert abs(hi - 1.01 * gc.grating_list[1].grating_period) < 1e-18


def test_hexgridset_phase_library():
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=5)
    assert len(hgs.grating_list) == 5
    hgs.characterize(wavelength=580 * nm, numG=25, just_normal=True)
    assert hgs.x_amp_list.shape == (5,)
    # transmission can't exceed unity
    Ts = np.abs(hgs.x_amp_list) ** 2 / 1.459
    assert (Ts < 1.0 + 1e-6).all()
    # phase must advance with diameter (the core physics of the pillar
    # library: larger pillars delay the phase more)
    phases = np.unwrap(np.angle(hgs.x_amp_list))
    total_span = abs(phases[-1] - phases[0])
    assert total_span > 1.0  # radians of phase coverage across the set
    # pick_from_phase returns the member whose phase matches best
    idx = hgs.pick_from_phase(float(np.angle(hgs.x_amp_list[2]) + np.pi / 2))
    assert 0 <= idx < 5
    # repr roundtrip
    env = {"HexGridSet": HexGridSet, "Grating": Grating, "np": np, "nm": nm}
    hgs2 = eval(repr(hgs), env)
    np.testing.assert_allclose(hgs2.x_amp_list, hgs.x_amp_list)
    # interpolators build and reproduce stored values
    hgs.build_interpolators()
    f = hgs.interpolators[(580, (0, 0), "x", "ampfx")]
    got = complex(np.asarray(f(np.array([[0.001, 0.001, 2.0]])))[0])
    assert abs(got - hgs.x_amp_list[2]) < 1e-10


def test_multiwavelength_single_sweep_and_append():
    """An RGB database is ONE device sweep (wavelength list batches jointly
    with directions in the characterize program); append=True replaces
    same-wavelength entries instead of duplicating."""
    gs = [Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                  target_wavelength=580 * nm, angle_in_air=a * degree,
                  xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))
          for a in (18, 20)]
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm,
                           lens_type="cyl", grating_list=gs)
    gc.characterize(wavelength=[450 * nm, 580 * nm], numG=16, u_steps=2)
    wls = sorted({e["wavelength_in_nm"] for g in gc.grating_list
                  for e in g.data})
    assert wls == [450.0, 580.0]
    gc.characterize(wavelength=650 * nm, numG=16, u_steps=2, append=True)
    gc.build_interpolators()
    assert sorted({k[0] for k in gc.interpolators}) == [450, 580, 650]
    n_before = len(gs[0].data)
    gc.characterize(wavelength=580 * nm, numG=16, u_steps=2, append=True)
    assert len(gs[0].data) == n_before      # replaced, not duplicated


def test_hexgrid_multiwavelength_append():
    """HexGridSet.characterize(append=True) accumulates an RGB database;
    the phase library x_amp_list tracks the first wavelength of each call."""
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=4)
    hgs.characterize(wavelength=580 * nm, numG=12, just_normal=True)
    xa580 = hgs.x_amp_list.copy()
    hgs.characterize(wavelength=[450 * nm, 650 * nm], numG=12,
                     just_normal=True, append=True)
    wls = sorted({e["wavelength_in_nm"] for g in hgs.grating_list
                  for e in g.data})
    assert wls == [450.0, 580.0, 650.0]
    hgs.characterize(wavelength=580 * nm, numG=12, just_normal=True,
                     append=True)
    np.testing.assert_allclose(hgs.x_amp_list, xa580, rtol=1e-12)
    hgs.build_interpolators()
    assert sorted({k[0] for k in hgs.interpolators}) == [450, 580, 650]


def test_one_program_characterizes_a_collection():
    """Members differ in grating period (distinct order sets), but the
    traced-orders characterize program must compile ONCE for the whole
    collection sweep (the per-member remote compile was the bulk of a
    production characterize; see also the engine-side FOM pin)."""
    from metalens_tpu import engine
    gs = [Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                  target_wavelength=580 * nm,
                  angle_in_air=float(ang) * degree,
                  xyrra_list_in_nm_deg=np.array([[0., 0., 115., 88., 0.]]))
          for ang in (28.0, 30.5, 33.0)]
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=gs)
    engine._characterize_program.cache_clear()
    gc.characterize(wavelength=[580 * nm, 450 * nm], numG=25, u_steps=2)
    info = engine._characterize_program.cache_info()
    assert info.currsize == 1, info
    assert info.hits >= len(gs) - 1, info
    assert all(len(g.data) > 0 for g in gs)
