"""Amplitude-database interpolation tables.

The reference builds SciPy ``RegularGridInterpolator`` objects over dense
complex grids assembled from the characterize data (``grating.py:1186-1232``,
``lens_center.py:188-226``).  Here the same dense grids feed
:class:`AmpInterpolator`, a pure-jnp multilinear interpolator that works
inside jit (the near-field stitcher evaluates millions of points per call on
device) and transparently from NumPy code.

Semantics preserved:

* key layout ``(wavelength_nm, (ox, oy), 'x'|'y', amp_kind)``;
* missing grid entries (order not propagating at that direction) are 0;
* collection tables use grating_period as the third axis, edge-padded by
  +-1% (``grating.py:1219-1226``); hexgrid tables use the member index and
  keep all four amplitude kinds.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .solver import cpx


class AmpInterpolator:
    """Multilinear interpolation of a complex grid over an N-d rectilinear
    coordinate system.  Internally the values are a *real* array with a
    trailing (re, im) channel so the interpolation runs on the TPU backend
    (no complex dtypes there).

    ``__call__`` with an (M, ndim) array returns (M,) host numpy complex
    (matching the reference's RegularGridInterpolator usage); ``pair``
    returns the device-resident :class:`~metalens_tpu.solver.cpx.C` pair for
    use inside device programs.  Degenerate (length-1) axes behave as
    constants.  Queries are clamped to the grid (callers enforce bounds
    explicitly, matching the reference's pattern of pre-checking
    ``interpolator_bounds``, ``nearfield.py:294-305``)."""

    def __init__(self, grids, values):
        self.grids = tuple(jnp.asarray(np.asarray(g, dtype=float))
                           for g in grids)
        values = np.asarray(values)
        assert values.ndim == len(self.grids)
        for ax, g in enumerate(self.grids):
            assert values.shape[ax] == g.shape[0]
        self.values = jnp.asarray(
            np.stack([values.real, values.imag], axis=-1))

    def __call__(self, pts):
        return cpx.to_np(self.pair(pts))

    def pair(self, pts) -> cpx.C:
        # one-channel view of the shared weight/gather kernels below, so the
        # host interpolator and the jitted stitcher path can never diverge
        pts = jnp.asarray(pts)
        if pts.ndim == 1:
            pts = pts[None, :]
        idxs, ws = interp_weights(self.grids, pts)
        out = interp_gather(self.values[None], self.grids, idxs, ws)
        return cpx.C(out.re[0], out.im[0])


def interp_weights(grids, pts):
    """Per-axis (cell indices, fractional weights) of multilinear
    interpolation: ``pts`` (M, ndim) -> two length-ndim lists of (M,)
    arrays.  Hoisting this out lets many value tables (channels AND
    diffraction orders) share one weight computation -- the near-field
    stitcher evaluates it once per collection and gathers per order inside
    a ``lax.scan``.  Degenerate (length-1) axes get index 0 / weight 0."""
    pts = jnp.asarray(pts)
    idxs, ws = [], []
    for ax, g in enumerate(grids):
        x = pts[:, ax]
        if g.shape[0] == 1:
            idxs.append(jnp.zeros(x.shape, dtype=jnp.int32))
            ws.append(jnp.zeros(x.shape))
            continue
        i = jnp.clip(jnp.searchsorted(g, x, side="right") - 1,
                     0, g.shape[0] - 2)
        w = (x - g[i]) / (g[i + 1] - g[i])
        ws.append(jnp.clip(w, 0.0, 1.0))
        idxs.append(i)
    return idxs, ws


def interp_gather(values_stack, grids, idxs, ws):
    """Corner-gather half of the multilinear interpolation:
    ``values_stack`` (n_channels, *grid_shape, 2) real, weights from
    :func:`interp_weights`.  Returns a C of shape (n_channels, M)."""
    ndim = len(grids)
    M = idxs[0].shape[0]
    out = jnp.zeros((values_stack.shape[0], M, 2),
                    dtype=values_stack.dtype)
    for corner in range(2 ** ndim):
        weight = jnp.ones(M)
        coords = []
        for ax in range(ndim):
            hi = (corner >> ax) & 1
            if grids[ax].shape[0] == 1:
                coords.append(idxs[ax])
                if hi:
                    weight = weight * 0.0
                continue
            coords.append(idxs[ax] + hi)
            weight = weight * jnp.where(hi, ws[ax], 1.0 - ws[ax])
        vals = values_stack[(slice(None),) + tuple(coords)]  # (C, M, 2)
        out = out + weight[None, :, None] * vals
    return cpx.C(out[..., 0], out[..., 1])


def interp_multi(values_stack, grids, pts):
    """Multilinear interpolation of C channels sharing one coordinate
    system: ``values_stack`` is (n_channels, *grid_shape, 2) real,
    ``pts`` (M, ndim).  Returns a C of shape (n_channels, M).  The index
    and weight computation is shared across channels (4x cheaper than
    calling per-channel interpolators) and the whole function is jnp
    (jit-friendly)."""
    idxs, ws = interp_weights(grids, pts)
    return interp_gather(values_stack, grids, idxs, ws)


def _gather_axes(grating_list):
    ux_list = sorted({e["ux"] for g in grating_list for e in g.data})
    uy_list = sorted({e["uy"] for g in grating_list for e in g.data})
    wavelengths = sorted({round(e["wavelength_in_nm"])
                          for g in grating_list for e in g.data})
    orders = sorted({(e["ox"], e["oy"]) for g in grating_list for e in g.data})
    return ux_list, uy_list, wavelengths, orders


def build_collection_interpolators(gc):
    """(ux, uy, grating_period) tables for a GratingCollection (reference
    ``grating.py:1186-1232``): forward amps only, +-1% period padding."""
    glist = gc.grating_list
    ux_list, uy_list, wavelengths, orders = _gather_axes(glist)
    period_list = sorted({g.grating_period for g in glist})
    lookup = {}
    for g in glist:
        for e in g.data:
            key = (round(e["wavelength_in_nm"]), e["ox"], e["oy"],
                   e["x_or_y"], e["ux"], e["uy"], g.grating_period)
            lookup[key] = e

    period_ext = np.hstack((0.99 * min(period_list), period_list,
                            1.01 * max(period_list)))
    interpolators = {}
    for wl in wavelengths:
        for (ox, oy) in orders:
            for x_or_y in ("x", "y"):
                for amp in ("ampfy", "ampfx"):
                    grid = np.zeros((len(ux_list), len(uy_list),
                                     len(period_list)), dtype=complex)
                    for i, ux in enumerate(ux_list):
                        for j, uy in enumerate(uy_list):
                            for k, p in enumerate(period_list):
                                e = lookup.get((wl, ox, oy, x_or_y, ux, uy, p))
                                if e is not None:
                                    grid[i, j, k] = e[amp]
                    ext = np.zeros((len(ux_list), len(uy_list),
                                    len(period_list) + 2), dtype=complex)
                    ext[:, :, 1:-1] = grid
                    ext[:, :, 0] = grid[:, :, 0]
                    ext[:, :, -1] = grid[:, :, -1]
                    interpolators[(wl, (ox, oy), x_or_y, amp)] = \
                        AmpInterpolator((ux_list, uy_list, period_ext), ext)
    bounds = (min(ux_list), max(ux_list), min(uy_list), max(uy_list),
              float(period_ext.min()), float(period_ext.max()))
    return interpolators, bounds


def build_hexgrid_interpolators(hgs):
    """(ux, uy, member-index) tables for a HexGridSet (reference
    ``lens_center.py:188-226``): all four amplitude kinds, index axis."""
    glist = hgs.grating_list
    ux_list, uy_list, wavelengths, orders = _gather_axes(glist)
    index_list = np.arange(len(glist), dtype=float)
    interpolators = {}
    for wl in wavelengths:
        for (ox, oy) in orders:
            for x_or_y in ("x", "y"):
                for amp in ("ampfy", "ampfx", "ampry", "amprx"):
                    grid = np.zeros((len(ux_list), len(uy_list),
                                     len(index_list)), dtype=complex)
                    for k, g in enumerate(glist):
                        for e in g.data:
                            if (round(e["wavelength_in_nm"]) == wl
                                    and (e["ox"], e["oy"]) == (ox, oy)
                                    and e["x_or_y"] == x_or_y):
                                i = ux_list.index(e["ux"])
                                j = uy_list.index(e["uy"])
                                grid[i, j, k] = e[amp]
                    interpolators[(wl, (ox, oy), x_or_y, amp)] = \
                        AmpInterpolator((ux_list, uy_list, index_list), grid)
    bounds = (min(ux_list), max(ux_list), min(uy_list), max(uy_list),
              float(index_list.min()), float(index_list.max()))
    return interpolators, bounds
