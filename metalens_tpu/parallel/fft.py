"""Distributed 2-D DFT over the device mesh.

The aperture field (up to ~10^8 points for a mm-scale lens at lambda/2.2
sampling) is sharded row-wise across device HBMs in the cpx real-pair
representation.  The 2-D transform runs as the classic transpose algorithm:
local matmul-DFT along the unsharded axis (:mod:`metalens_tpu.solver.dft`),
all_to_all re-shard (rides ICI), local DFT along the other axis, transpose
back.  This replaces the reference's RAM-bound slab chunking
(``nearfield_farfield.py:45-66``) with an aperture that never leaves HBM.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding
from jax import shard_map

from ..farfield import _angular_power, _u_lists
from ..solver import cpx, dft
from ..solver.cpx import C


def _all_to_all_c(x: C, axis_name, split_axis, concat_axis) -> C:
    return C(jax.lax.all_to_all(x.re, axis_name, split_axis, concat_axis),
             jax.lax.all_to_all(x.im, axis_name, split_axis, concat_axis))


def fft2_sharded(mesh, axis_name="cells"):
    """Build a jitted distributed fft2 for C arrays sharded on axis 0.
    Both dimensions must divide the mesh axis size."""
    n_dev = mesh.shape[axis_name]

    def per_shard(x: C):
        # x: (N/n_dev, M) local rows; DFT along the local column axis
        x = C(x.re.T, x.im.T)
        x = dft.dft_axis0(x)
        x = C(x.re.T, x.im.T)
        nloc, M = x.shape
        # re-shard: each device takes one column block of all rows
        x = x.reshape((nloc, n_dev, M // n_dev))
        x = _all_to_all_c(x, axis_name, 1, 0)
        x = x.reshape((nloc * n_dev, M // n_dev))
        x = dft.dft_axis0(x)
        # shard back to rows
        x = x.reshape((n_dev, nloc, M // n_dev))
        x = _all_to_all_c(x, axis_name, 0, 1)
        return x.reshape((nloc, M))

    fn = shard_map(per_shard, mesh=mesh, in_specs=P(axis_name),
                   out_specs=P(axis_name))
    return jax.jit(fn)


def farfield_sharded(mesh, Ex, Ey, Hx, Hy, xp_list, yp_list, wavelength,
                     n_glass, axis_name="cells"):
    """Sharded near-to-far-field transform: fftshift + distributed DFT +
    angular transform, with the aperture sharded row-wise over the mesh.
    Same outputs as :func:`metalens_tpu.farfield.farfield_from_nearfield`.
    """
    xp_list = np.asarray(xp_list)
    yp_list = np.asarray(yp_list)
    dxp = xp_list[1] - xp_list[0]
    dyp = yp_list[1] - yp_list[0]
    num_x, num_y = len(xp_list), len(yp_list)
    n_dev = mesh.shape[axis_name]
    assert num_x % n_dev == 0 and num_y % n_dev == 0, (
        "pad the aperture so both axes divide the mesh")

    sharding = NamedSharding(mesh, P(axis_name))
    fft2 = fft2_sharded(mesh, axis_name)

    ux_list, uy_list = _u_lists(num_x, num_y, dxp, dyp, wavelength, n_glass)
    ux_dev = jax.device_put(jnp.asarray(ux_list), sharding)
    uy_dev = jnp.asarray(uy_list)

    def one_field(f):
        c = cpx.promote(f)
        c = dft.fftshift(c)
        c = C(jax.device_put(c.re, sharding), jax.device_put(c.im, sharding))
        return fft2(c)

    fftEx, fftEy, fftHx, fftHy = (one_field(f) for f in (Ex, Ey, Hx, Hy))

    @jax.jit
    def power(fftEx, fftEy, fftHx, fftHy, ux_dev, uy_dev):
        return _angular_power(fftEx, fftEy, fftHx, fftHy, ux_dev, uy_dev,
                              dxp, dyp, wavelength, n_glass)

    Pgrid = power(fftEx, fftEy, fftHx, fftHy, ux_dev, uy_dev)
    Pgrid = jnp.roll(jnp.roll(Pgrid, num_x // 2, axis=0), num_y // 2, axis=1)
    ux_s = np.fft.fftshift(ux_list)
    uy_s = np.fft.fftshift(uy_list)
    dux = ux_s[1] - ux_s[0]
    duy = uy_s[1] - uy_s[0]
    ux, uy = np.meshgrid(ux_s, uy_s, indexing="ij", sparse=True)
    total_P = float((jnp.where(jnp.isfinite(Pgrid), Pgrid, 0.0)
                     * dux * duy).sum())
    return Pgrid, total_P, ux, uy, dux, duy
