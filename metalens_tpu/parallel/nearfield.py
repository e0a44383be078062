"""Multi-device near-field assembly.

The stitcher is embarrassingly parallel over aperture points, so the
multi-chip strategy replaces the reference's RAM-slab loop
(``nearfield.py:482-516``) with SPMD: the aperture's x-axis is sharded over
the mesh and XLA's partitioner runs the single stitch program distributed
-- the amplitude tables are replicated per device, each device computes its
slab of every elementwise stage and of the jitted scan-over-orders kernel,
and no steady-state collectives are needed (results are fetched once at the
end).  Round 1 used a per-device host loop (`jax.default_device` +
per-slab dispatch); sharding the meshgrid instead lets one program span the
mesh, composes with the scanned stitcher, and extends unchanged to
multi-host (see :mod:`.distributed`).
"""

from __future__ import annotations

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import nearfield as nf
from ..solver import cpx


def build_nearfield_sharded(mesh_or_devices, source_x, source_y, source_z,
                            source_pol, wavelength, lens_periphery_summary,
                            lens_center_summary, hexgridset, x_pts, y_pts,
                            dipole_moment=1e-30):
    """:func:`metalens_tpu.nearfield.build_nearfield` sharded over the
    first axis of the aperture grid.  Accepts a Mesh (first axis used) or an
    explicit device list.  Returns host numpy complex field arrays plus the
    usual extras."""
    if hasattr(mesh_or_devices, "devices"):
        mesh = mesh_or_devices
        axis = mesh.axis_names[0]
        sharding = NamedSharding(mesh, P(axis, None))
    else:
        from .mesh import make_mesh
        mesh = make_mesh(devices=list(mesh_or_devices),
                         axis_names=("slab",))
        sharding = NamedSharding(mesh, P("slab", None))

    out = nf.build_nearfield(
        source_x=source_x, source_y=source_y, source_z=source_z,
        source_pol=source_pol, wavelength=wavelength,
        lens_periphery_summary=lens_periphery_summary,
        lens_center_summary=lens_center_summary, hexgridset=hexgridset,
        x_pts=x_pts, y_pts=y_pts, dipole_moment=dipole_moment,
        sharding=sharding)
    Ex, Ey, Hx, Hy, xs, ys, power, n_glass = out
    return (cpx.to_np(Ex), cpx.to_np(Ey), cpx.to_np(Hx), cpx.to_np(Hy),
            np.asarray(xs), np.asarray(ys), power, n_glass)
