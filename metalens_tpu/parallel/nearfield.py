"""Multi-device near-field assembly.

The stitcher is embarrassingly parallel over aperture points, so the
multi-chip strategy mirrors (and replaces) the reference's RAM-slab loop
(``nearfield.py:482-516``): the y-axis is split into one slab per device and
each device assembles its slab concurrently (async dispatch overlaps all
devices).  Combined with :func:`metalens_tpu.parallel.fft.farfield_sharded`
this scales the whole aperture pipeline across the mesh.
"""

from __future__ import annotations

import numpy as np
import jax

from .. import nearfield as nf
from ..solver import cpx


def build_nearfield_sharded(mesh_or_devices, source_x, source_y, source_z,
                            source_pol, wavelength, lens_periphery_summary,
                            lens_center_summary, hexgridset, x_pts, y_pts,
                            dipole_moment=1e-30):
    """Slab-parallel :func:`metalens_tpu.nearfield.build_nearfield` over the
    devices of a mesh (or an explicit device list).  Returns host numpy
    complex field arrays plus the usual extras."""
    devices = (list(mesh_or_devices.devices.flat)
               if hasattr(mesh_or_devices, "devices") else
               list(mesh_or_devices))
    n_dev = len(devices)
    y_pts = np.asarray(y_pts)
    bounds = np.linspace(0, y_pts.size, n_dev + 1).astype(int)

    outs = []
    for d, dev in enumerate(devices):
        lo, hi = bounds[d], bounds[d + 1]
        if lo == hi:
            continue
        with jax.default_device(dev):
            outs.append((lo, hi, nf.build_nearfield(
                source_x=source_x, source_y=source_y, source_z=source_z,
                source_pol=source_pol, wavelength=wavelength,
                lens_periphery_summary=lens_periphery_summary,
                lens_center_summary=lens_center_summary,
                hexgridset=hexgridset, x_pts=x_pts, y_pts=y_pts[lo:hi],
                dipole_moment=dipole_moment)))

    Ex = np.zeros((len(x_pts), y_pts.size), complex)
    Ey = np.zeros_like(Ex)
    Hx = np.zeros_like(Ex)
    Hy = np.zeros_like(Ex)
    power = 0.0
    n_glass = None
    for lo, hi, out in outs:
        Ex[:, lo:hi] = cpx.to_np(out[0])
        Ey[:, lo:hi] = cpx.to_np(out[1])
        Hx[:, lo:hi] = cpx.to_np(out[2])
        Hy[:, lo:hi] = cpx.to_np(out[3])
        power += out[6]
        n_glass = out[7]
    return Ex, Ey, Hx, Hy, np.asarray(x_pts), y_pts, power, n_glass
