"""Matplotlib diagnostics (reference component: ``show_config``,
``show_characterization``, efficiency plots -- ``grating.py:344-362,480-505,
1059-1135``).  Imported lazily so headless/device-only workflows never pay
for matplotlib."""

from __future__ import annotations

import numpy as np

from .units import nm, degree


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def show_config(grating):
    """Unit-cell plot with periodic replicas (reference ``grating.py:344-362``)."""
    plt = _plt()
    import matplotlib.patches
    grating_period = grating.grating_period
    lateral_period = grating.lateral_period
    fig = plt.figure()
    plt.xlim(-grating_period / nm, grating_period / nm)
    plt.ylim(-lateral_period / nm, lateral_period / nm)
    for x, y, rx, ry, a in grating.get_xyrra_list(replicas=3):
        ell = matplotlib.patches.Ellipse((x / nm, y / nm), 2 * rx / nm,
                                         2 * ry / nm, angle=a / degree,
                                         color="k", alpha=0.5)
        plt.gcf().gca().add_artist(ell)
    rect = matplotlib.patches.Rectangle(
        (-grating_period / 2 / nm, -lateral_period / 2 / nm),
        grating_period / nm, lateral_period / nm, facecolor="none",
        linestyle="dashed", linewidth=2, edgecolor="red")
    plt.gcf().gca().add_artist(rect)
    plt.gcf().gca().set_aspect("equal")
    return fig


def show_characterization(mygrating, my_order=(0, 0), my_pol="x",
                          my_wavelength=580, which_amp="amprx"):
    """Amplitude-vs-angle heatmap (reference ``grating.py:480-505``)."""
    plt = _plt()
    all_data = mygrating.data
    ux_list = sorted({x["ux"] for x in all_data})
    uy_list = sorted({x["uy"] for x in all_data})
    filt = [x for x in all_data if x["x_or_y"] == my_pol
            and x["ox"] == my_order[0] and x["oy"] == my_order[1]
            and x["wavelength_in_nm"] == my_wavelength]
    data = np.zeros((len(ux_list), len(uy_list)), dtype=complex) + np.nan
    for entry in filt:
        ix = ux_list.index(entry["ux"])
        iy = uy_list.index(entry["uy"])
        data[ix, iy] = entry[which_amp]
    fig = plt.figure()
    plt.imshow(np.abs(data).T, interpolation="none",
               extent=(min(ux_list), max(ux_list), min(uy_list), max(uy_list)))
    plt.xlabel("ux (x-component of unit vector of incoming light direction)")
    plt.ylabel("uy (y-component of unit vector of incoming light direction)")
    plt.colorbar()
    return fig


def plot_angle_efficiencies(angles_efficiencies_list):
    plt = _plt()
    fig = plt.figure()
    plt.plot([x[0] / degree for x in angles_efficiencies_list],
             [x[1] for x in angles_efficiencies_list])
    plt.xlabel("angle in air (deg)")
    plt.ylabel("figure of merit")
    return fig


def show_collection_graphs(gc, with_efficiencies=False,
                           anim_filename="grating_collection_anim.gif",
                           numG=100):
    """Per-member config plots (reference ``grating.py:1095-1135``; the
    ImageMagick GIF step is dropped -- saves PNGs and returns their names)."""
    plt = _plt()
    max_gp = max(g.grating_period for g in gc.grating_list)
    max_lp = max(g.lateral_period for g in gc.grating_list)
    effs = None
    if with_efficiencies:
        from .engine import fom_of_gratings
        effs = fom_of_gratings(gc.grating_list[::-1],
                               target_wavelength=gc.target_wavelength,
                               numG=numG)
    filenames = []
    for i, g in enumerate(gc.grating_list[::-1]):
        show_config(g)
        plt.xlim(-max_gp / nm, max_gp / nm)
        plt.ylim(-max_lp / nm, max_lp / nm)
        angle = g.get_angle_in_air(gc.target_wavelength) / degree
        if effs is not None:
            plt.title("From angle: {:.1f} deg, effic={:.2%}".format(angle, effs[i]))
        else:
            plt.title("From angle: {:.1f} deg".format(angle))
        fname = f"grating_collection{i}.png"
        plt.savefig(fname)
        plt.close()
        filenames.append(fname)
    return filenames
