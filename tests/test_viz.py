"""Smoke tests of the diagnostics/plots (Agg backend): every viz entry point
produces a figure/artifact without touching a display."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from metalens_tpu import Grating, GratingCollection
from metalens_tpu import viz
from metalens_tpu.units import nm


@pytest.fixture(scope="module")
def characterized_grating():
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 10.]]))
    g.characterize(ux_min=0.3, ux_max=0.5, uy_min=-0.1, uy_max=0.1,
                   u_steps=2, wavelength=580 * nm, numG=20)
    return g


def test_show_config(characterized_grating):
    fig = viz.show_config(characterized_grating)
    import matplotlib.patches as mp
    kids = fig.gca().get_children()
    assert sum(isinstance(k, mp.Ellipse) for k in kids) >= 1
    assert sum(isinstance(k, mp.Rectangle) for k in kids) >= 1


def test_show_characterization(characterized_grating):
    fig = viz.show_characterization(characterized_grating, my_order=(0, 0),
                                    my_pol="x", my_wavelength=580,
                                    which_amp="ampfx")
    assert fig is not None


def test_plot_eps(characterized_grating):
    fig = viz.plot_eps(characterized_grating, wavelength=580 * nm,
                       n_points=41)
    assert fig is not None


def test_show_collection_graphs_and_gif(tmp_path, characterized_grating):
    g2 = characterized_grating.copy()
    g2.grating_period = 1250 * nm
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=[characterized_grating.copy(), g2])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        gif = str(tmp_path / "anim.gif")
        frames = viz.show_collection_graphs(gc, anim_filename=gif)
        assert len(frames) == 2
        assert all(os.path.isfile(f) for f in frames)
        assert os.path.isfile(gif) and os.path.getsize(gif) > 0
    finally:
        os.chdir(cwd)


def test_plot_round_lateral_period():
    figs = viz.plot_round_lateral_period(150e-6, 3427)
    assert len(figs) == 2


def test_hexgrid_show_properties():
    from metalens_tpu.hexgrid import HexGridSet
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=3)
    hgs.characterize(wavelength=580 * nm, numG=20, just_normal=True)
    fig = hgs.show_properties()
    assert fig is not None


def test_export_to_lumerical_series(tmp_path):
    g1 = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                 grating_period=1200 * nm,
                 xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))
    g2 = g1.copy()
    g2.grating_period = 1250 * nm
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=[g1, g2])
    d = str(tmp_path / "lum")
    gc.export_to_lumerical(directory=d)
    assert os.path.isfile(os.path.join(d, "grating_setup0.txt"))
    assert os.path.isfile(os.path.join(d, "grating_setup1.txt"))
    assert not os.path.isfile(os.path.join(d, "grating_setup2.txt"))
    setup = open(os.path.join(d, "grating_setup0.txt")).read().split()
    assert setup[0] == "1"  # FOM-mode file with angle_in_air


def test_plot_farfield():
    """plot_farfield renders a tilted-plane-wave far field without error
    and marks the escape circles."""
    import numpy as np
    from metalens_tpu.viz import plot_farfield
    from metalens_tpu.farfield import farfield
    from metalens_tpu import units as nu
    from metalens_tpu.units import nm

    LAM, NG = 580 * nm, 1.459
    n_pts, spacing = 64, LAM / 2.2
    xs = (np.arange(n_pts) - n_pts / 2) * spacing
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    kg = 2 * np.pi * NG / LAM
    Ex = np.exp(1j * kg * 0.3 * X)
    Hy = NG / nu.Z0 * np.sqrt(1 - 0.3 ** 2) * Ex
    zero = np.zeros_like(Ex)
    P, total_P, ux, uy, dux, duy = farfield(Ex, zero, zero, Hy, xs, xs,
                                            LAM, NG)
    fig = plot_farfield(P, ux, uy, n_glass=NG, title="test")
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_nearfield_kinds():
    import numpy as np
    import pytest
    from metalens_tpu.viz import plot_nearfield
    from metalens_tpu.solver import cpx
    import matplotlib.pyplot as plt

    x = np.linspace(-5e-6, 5e-6, 24)
    E = np.exp(1j * np.add.outer(x, x) * 1e6)
    for field in (E, cpx.from_np(E)):        # host complex AND cpx.C pair
        for kind in ("phase", "abs", "power"):
            fig = plot_nearfield(field, x, x, kind=kind, title=kind)
            assert fig is not None
            plt.close(fig)
    with pytest.raises(ValueError):
        plot_nearfield(E, x, x, kind="bogus")
