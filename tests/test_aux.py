"""Auxiliary parity pieces: the reference-format job-file shim, analytic
eps map, viz helpers, RGB multi-wavelength databases."""

import numpy as np
import pytest

from metalens_tpu import Grating, GratingCollection
from metalens_tpu.units import nm, degree
from metalens_tpu.viz import eps_map, correct_imshow_extent


def simple_grating():
    return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                   grating_period=1200 * nm,
                   xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))


def test_write_reference_job_format(tmp_path):
    g = simple_grating()
    g.write(str(tmp_path), angle_in_air=0.5)
    setup = open(tmp_path / "grating_setup.txt").read().split()
    assert setup[0] == "1"
    assert float(setup[1]) == pytest.approx(1200e-9)
    assert float(setup[3]) == 0.5
    assert int(setup[7]) == 50
    xyrra = np.loadtxt(tmp_path / "grating_xyrra_list.txt")
    np.testing.assert_allclose(np.atleast_2d(xyrra)[0, 2], 0.12)  # rx in um

    g.write(str(tmp_path), ux_min=0.1, ux_max=0.3, uy_min=-0.1, uy_max=0.1,
            u_steps=3, wavelength=580 * nm, index=7)
    setup = open(tmp_path / "grating_setup7.txt").read().split()
    assert setup[0] == "2"
    assert float(setup[-1]) == 0.58   # wavelength in um, rounded-nm format


def test_eps_map_analytic():
    g = simple_grating()
    eps, xs, ys = eps_map(g, wavelength=580 * nm, n_points=81)
    # pillar center is TiO2, corner is air
    assert abs(np.sqrt(eps[40, 40].real) - 2.372) < 1e-9
    assert abs(eps[0, 0].real - 1.0) < 1e-9
    # fill fraction approximately matches the ellipse area
    frac = (eps.real > 2.0).mean()
    expected = np.pi * 120e-9 * 90e-9 / (1200e-9 * 320e-9)
    assert abs(frac - expected) < 0.02


def test_correct_imshow_extent():
    a = np.zeros((3, 5))
    ext = correct_imshow_extent(a, 0.0, 4.0, 0.0, 2.0)
    assert ext == [-0.5, 4.5, -0.5, 2.5]


def test_rgb_multiwavelength_database():
    g = simple_grating()
    g.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                   u_steps=2, wavelength=580 * nm, numG=20)
    n_580 = len(g.data)
    g.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                   u_steps=2, wavelength=450 * nm, numG=20, append=True)
    wls = {round(e["wavelength_in_nm"]) for e in g.data}
    assert wls == {450, 580}
    assert len(g.data) > n_580
    # re-characterizing one wavelength replaces, not duplicates
    g.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                   u_steps=2, wavelength=580 * nm, numG=20, append=True)
    assert len([e for e in g.data
                if round(e["wavelength_in_nm"]) == 580]) == n_580

    # collection-level: interpolators keyed per wavelength
    g2 = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                 grating_period=1250 * nm,
                 xyrra_list_in_nm_deg=np.array([[10., 0., 110., 85., 0.]]))
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=[simple_grating(), g2])
    gc.characterize(580 * nm, numG=20, u_steps=2)
    gc.characterize(450 * nm, numG=20, u_steps=2, append=True)
    gc.build_interpolators()
    wl_keys = {k[0] for k in gc.interpolators}
    assert wl_keys == {450, 580}


def test_single_sweep_rgb_characterize():
    """Passing a wavelength list runs one joint (lambda x direction) device
    batch and must match per-wavelength sweeps entry for entry."""
    g1 = simple_grating()
    g1.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                    u_steps=2, wavelength=[450 * nm, 580 * nm], numG=20)
    joint = sorted(
        g1.data, key=lambda e: (e["wavelength_in_nm"], e["ux"], e["uy"],
                                e["ox"], e["oy"], e["x_or_y"]))
    g2 = simple_grating()
    g2.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                    u_steps=2, wavelength=580 * nm, numG=20)
    g2.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                    u_steps=2, wavelength=450 * nm, numG=20, append=True)
    seq = sorted(
        g2.data, key=lambda e: (e["wavelength_in_nm"], e["ux"], e["uy"],
                                e["ox"], e["oy"], e["x_or_y"]))
    assert len(joint) == len(seq)
    for a, b in zip(joint, seq):
        for k in ("wavelength_in_nm", "ux", "uy", "ox", "oy", "x_or_y"):
            assert a[k] == b[k]
        for k in ("ampfy", "ampfx", "ampry", "amprx"):
            assert abs(a[k] - b[k]) < 1e-10



def test_job_file_roundtrip():
    """write() then read_job_files() reconstructs the grating (migration
    path for reference-era job files)."""
    import tempfile
    from metalens_tpu.grating import read_job_files
    g = simple_grating()
    with tempfile.TemporaryDirectory() as d:
        g.write(d, angle_in_air=0.5, numG=77)
        g2, info = read_job_files(d)
        assert info["mode"] == "fom" and info["numG"] == 77
        assert abs(info["angle_in_air"] - 0.5) < 1e-12
        np.testing.assert_allclose(g2.xyrra_list, g.xyrra_list, rtol=1e-9)
        assert g2.n_glass == 0 and isinstance(g2.n_glass, int)
        g.write(d, ux_min=0.1, ux_max=0.3, uy_min=-0.1, uy_max=0.1,
                u_steps=3, wavelength=580 * nm)
        g3, info = read_job_files(d)
        assert info["mode"] == "characterize"
        assert abs(info["wavelength"] - 580 * nm) < 1e-15


def test_reference_readme_example_custom_indices():
    """The reference README's getting-started example: a 785nm two-pillar
    deflector. 785nm is off the operational tables (the reference requires
    editing grating.lua); here explicit indices + a FomTerm express it
    directly."""
    from metalens_tpu.solver.fom import FomTerm
    g = Grating(lateral_period=560 * nm, cyl_height=500 * nm,
                target_wavelength=785 * nm, angle_in_air=65 * degree,
                n_glass=1.45, n_tio2=2.3,
                xyrra_list_in_nm_deg=np.array(
                    [[0., 0., 200., 150., 0.],
                     [400., 280., 150., 200., 10.]]))
    terms = [FomTerm(785 * nm, 1.0, -1, True)]
    f = g.fom(target_wavelength=785 * nm, numG=25, terms=terms)
    assert np.isfinite(f)
    data = g.characterize(ux_min=0.8, ux_max=0.95, uy_min=-0.05, uy_max=0.05,
                          u_steps=2, wavelength=785 * nm, numG=25)
    assert len(data) > 0
    assert {round(e["wavelength_in_nm"]) for e in data} == {785}



def test_run_lua_initiate_getresult_shim():
    from metalens_tpu.solver.fom import FomTerm
    g = simple_grating()
    terms = [FomTerm(580 * nm, 1.0, -1, False)]
    handle = g.run_lua_initiate(target_wavelength=580 * nm, numG=20,
                                terms=terms)
    val = g.run_lua_getresult(handle)
    assert val == g.fom(target_wavelength=580 * nm, numG=20, terms=terms)


def test_write_replicas_includes_boundary_pillars(tmp_path):
    """replicas=True must add the periodic replicas of boundary-crossing
    pillars (what a non-periodic Lumerical volume needs; the reference
    documents this but left it TODO, reference grating.py:209)."""
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array(
                    [[590., 0., 100., 90., 0.],      # sticks across x edge
                     [0., 0., 80., 80., 0.]]))
    g.write(str(tmp_path), angle_in_air=0.5)
    base = np.atleast_2d(np.loadtxt(tmp_path / "grating_xyrra_list.txt"))
    g.write(str(tmp_path), angle_in_air=0.5, replicas=True)
    repl = np.atleast_2d(np.loadtxt(tmp_path / "grating_xyrra_list.txt"))
    assert base.shape[0] == 2
    assert repl.shape[0] > base.shape[0]      # the x-edge replica appears
    # the replica of pillar 0 sits one grating period to the left
    xs = np.sort(repl[:, 0])
    assert np.any(np.isclose(xs, 0.59 - 1.2, atol=1e-9))


def test_characterize_process_handle_runs_deferred_sweep():
    """Reference pattern: h = run_lua_initiate(<sweep args>);
    g.characterize(process=h) collects THAT sweep (this call's own sweep
    args are ignored), reference grating.py:389-405."""
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))
    h = g.run_lua_initiate(ux_min=0.2, ux_max=0.2, uy_min=0.0, uy_max=0.0,
                           u_steps=1, wavelength=580 * nm, numG=25)
    data = g.characterize(process=h, wavelength=450 * nm, numG=99)
    assert data is g.data and len(data) > 0
    # the initiate call's parameters won, not this call's
    assert {round(e["wavelength_in_nm"]) for e in data} == {580}
    assert all(abs(e["ux"] - 0.2) < 1e-12 for e in data)


def test_vary_angle_argument_validation():
    from metalens_tpu.optimize import vary_angle
    g = simple_grating()
    with pytest.raises(ValueError, match="target_wavelength"):
        vary_angle(start_grating=g, end_angle=0.6, lens_type="cyl")
    with pytest.raises(ValueError):
        vary_angle(end_angle=0.6, lens_type="cyl")
