"""Analytic Fourier representation of the patterned (pillar) layer.

The reference describes the pattern to S4 as a list of ellipses
(``grating.lua:130-135``, ``S:SetLayerPatternEllipse``); S4 computes the
Fourier coefficients of eps(x, y) analytically.  Same here, but as a jnp
program differentiable w.r.t. every ellipse parameter -- this is what makes
the whole solve differentiable w.r.t. geometry (no staircasing, no FFT).

All complex quantities are :class:`metalens_tpu.solver.cpx.C` real pairs
(the TPU backend has no complex dtypes).

Closed forms used (A_cell = Lx * Ly):

* ellipse (semi-axes rx, ry, rotation a, center r0):
    FT[indicator](G) = 2*pi*rx*ry * J1(u)/u,
    u = sqrt((G.e1 * rx)^2 + (G.e2 * ry)^2),  e1/e2 = rotated axes
* rectangle (widths wx, wy, center r0), used for tests / lamellar gratings:
    FT[indicator](G) = wx*wy * sinc(Gx*wx/2) * sinc(Gy*wy/2)

The Toeplitz ("convolution") matrix is E[i, j] = eps_hat(G_i - G_j); this is
the Laurent-rule factorization.  S4's extra accuracy settings
(``UsePolarizationDecomposition`` / ``UseNormalVectorBasis``,
``grating.lua:180-181``) correspond to normal-vector-field Fourier
factorization; that refinement slots in here without touching propagation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import cpx
from .cpx import C
from .special import j1_over_x_from_sq

TWO_PI = 2.0 * np.pi


def _order_differences(orders):
    """Integer order differences dm[i,j] = m_i - m_j, for x and y."""
    orders = np.asarray(orders)
    mx = orders[:, 0]
    my = orders[:, 1]
    return (mx[:, None] - mx[None, :]).astype(np.float64), \
           (my[:, None] - my[None, :]).astype(np.float64)


def _distinct_differences(orders):
    """The Toeplitz structure means the N^2 order differences take only
    O(range_x * range_y) distinct values.  Returns (dmx_u, dmy_u) unique
    difference vectors and the (N, N) int gather map into them -- computing
    eps_hat once per distinct difference cuts the special-function work
    ~20x."""
    dmx, dmy = _order_differences(orders)
    pairs = np.stack([dmx.ravel(), dmy.ravel()], axis=1)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    return (uniq[:, 0], uniq[:, 1],
            inv.reshape(dmx.shape).astype(np.int32))


def ellipse_shape_sum(gx, gy, xyrra, area, small_arg_only=False):
    """Geometry-only structure factor S(G) = (1/area) * sum_ellipses
    FT[indicator](G) e^{-i G.r0}: the lambda- and material-independent part
    of eps_hat.  eps_hat = eps_bg at_zero + (eps_fill - eps_bg) * S."""
    x0, y0 = xyrra[:, 0], xyrra[:, 1]
    rx, ry = xyrra[:, 2], xyrra[:, 3]
    ang = xyrra[:, 4]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    gxe = gx[..., None]
    gye = gy[..., None]
    u1 = (gxe * ca + gye * sa) * rx
    u2 = (-gxe * sa + gye * ca) * ry
    shape_ft = TWO_PI * rx * ry * j1_over_x_from_sq(
        u1 * u1 + u2 * u2, small_arg_only=small_arg_only)
    phase = cpx.expi(-(gxe * x0 + gye * y0))          # e^{-i G.r0}
    return (phase * shape_ft).sum(-1) * (1.0 / area)


def eps_fourier_ellipses(gx, gy, xyrra, eps_fill, eps_bg, area,
                         small_arg_only=False) -> C:
    """eps_hat at wavevectors (gx, gy): eps_bg background plus ellipses of
    eps_fill.  gx, gy real arrays of matching shape; xyrra (nE, 5).
    eps_fill/eps_bg may be python complex (absorbing materials)."""
    S = ellipse_shape_sum(gx, gy, xyrra, area, small_arg_only)
    d_eps = cpx.promote(eps_fill) - cpx.promote(eps_bg)   # traceable C scalar
    contrib = S * d_eps
    at_zero = jnp.where((gx == 0) & (gy == 0), 1.0, 0.0)
    return contrib + cpx.promote(eps_bg) * at_zero


def eps_fourier_rect(gx, gy, center, widths, eps_fill, eps_bg, area) -> C:
    """eps_hat for a single axis-aligned rectangle (test/lamellar helper)."""
    x0, y0 = center
    wx, wy = widths
    sx = jnp.sinc(gx * wx / (2 * np.pi))
    sy = jnp.sinc(gy * wy / (2 * np.pi))
    shape_ft = wx * wy * sx * sy
    phase = cpx.expi(-(gx * x0 + gy * y0))
    d_eps = cpx.promote(eps_fill) - cpx.promote(eps_bg)
    contrib = phase * shape_ft * d_eps * (1.0 / area)
    at_zero = jnp.where((gx == 0) & (gy == 0), 1.0, 0.0)
    return contrib + cpx.promote(eps_bg) * at_zero


def ellipse_structure_toeplitz(orders, grating_period, lateral_period,
                               xyrra, small_arg_only=False):
    """The lambda-/material-independent Toeplitz structure pair:
    (S_matrix, at_zero_mask) such that
    E = eps_bg * diag-ish(at_zero) + (eps_pillar - eps_bg) * S.
    Computing S once amortizes the special-function work across all
    wavelength terms of a figure of merit (it does not depend on lambda)."""
    area = grating_period * lateral_period
    xyrra = jnp.asarray(xyrra)
    dmx_u, dmy_u, gather = _distinct_differences(orders)
    gx = jnp.asarray(dmx_u, dtype=xyrra.dtype) * (TWO_PI / grating_period)
    gy = jnp.asarray(dmy_u, dtype=xyrra.dtype) * (TWO_PI / lateral_period)
    S_flat = ellipse_shape_sum(gx, gy, xyrra, area, small_arg_only)
    zero_flat = jnp.where((gx == 0) & (gy == 0), 1.0, 0.0)
    idx = jnp.asarray(gather)
    return C(S_flat.re[idx], S_flat.im[idx]), zero_flat[idx]


def dense_difference_grid(Dx: int, Dy: int):
    """Static flat grid of ALL integer order differences with |dmx| <= Dx,
    |dmy| <= Dy, flat index k = (dmx+Dx)*(2*Dy+1) + (dmy+Dy).  The traced-
    orders path evaluates eps_hat on this static superset and gathers with
    a TRACED index map, so one compiled program serves every member of a
    design chain (each member's order set differs, which would otherwise
    bake a fresh program per member -- the remote-tunnel compile tax that
    dominated the NS2 design stage)."""
    dd_x = np.arange(-Dx, Dx + 1)
    dd_y = np.arange(-Dy, Dy + 1)
    DMX, DMY = np.meshgrid(dd_x, dd_y, indexing="ij")
    return DMX.ravel().astype(np.float64), DMY.ravel().astype(np.float64)


def traced_gather_idx(mx, my, Dx: int, Dy: int):
    """(N, N) flat indices into :func:`dense_difference_grid` for the
    traced integer order vectors mx, my.

    PRECONDITION: every order difference must satisfy |mx_i - mx_j| <= Dx
    and |my_i - my_j| <= Dy.  When mx/my are concrete this is checked; for
    tracers it cannot be (JAX gathers CLAMP out-of-range indices, which
    would silently substitute edge structure-factor values -- wrong physics
    with no error), so callers must size (Dx, Dy) from the SAME order set
    they pass here, as ``engine._order_bounds`` does."""
    dmx = mx[:, None] - mx[None, :]
    dmy = my[:, None] - my[None, :]
    if not isinstance(dmx, jax.core.Tracer):    # concrete: check for free
        dmx_c, dmy_c = np.asarray(dmx), np.asarray(dmy)
        if np.abs(dmx_c).max() > Dx or np.abs(dmy_c).max() > Dy:
            raise ValueError(
                f"order differences (|dmx| <= {int(np.abs(dmx_c).max())}, "
                f"|dmy| <= {int(np.abs(dmy_c).max())}) exceed the dense "
                f"grid bounds (Dx={Dx}, Dy={Dy})")
    return (dmx + Dx) * (2 * Dy + 1) + (dmy + Dy)


def ellipse_structure_toeplitz_traced(mx, my, Dx: int, Dy: int,
                                      grating_period, lateral_period,
                                      xyrra, small_arg_only=False):
    """:func:`ellipse_structure_toeplitz` with the order set TRACED: mx, my
    are (N,) integer arrays (jnp or tracer).  Evaluates the structure
    factor on the static dense difference grid (a few x more J1 points
    than the distinct-difference dedup -- negligible) and gathers with the
    traced index map.  Identical values to the static path."""
    area = grating_period * lateral_period
    xyrra = jnp.asarray(xyrra)
    DMX, DMY = dense_difference_grid(Dx, Dy)
    gx = jnp.asarray(DMX, dtype=xyrra.dtype) * (TWO_PI / grating_period)
    gy = jnp.asarray(DMY, dtype=xyrra.dtype) * (TWO_PI / lateral_period)
    S_flat = ellipse_shape_sum(gx, gy, xyrra, area, small_arg_only)
    zero_flat = jnp.asarray((DMX == 0) & (DMY == 0), xyrra.dtype)
    idx = traced_gather_idx(mx, my, Dx, Dy)
    return C(S_flat.re[idx], S_flat.im[idx]), zero_flat[idx]


def toeplitz_from_structure(structure, at_zero, eps_pillar, eps_bg=1.0) -> C:
    """Assemble the eps Toeplitz from a precomputed structure pair."""
    d_eps = cpx.promote(eps_pillar) - cpx.promote(eps_bg)
    return structure * d_eps + cpx.promote(eps_bg) * at_zero


def ellipse_layer_toeplitz(orders, grating_period, lateral_period, xyrra,
                           eps_pillar, eps_bg=1.0,
                           small_arg_only=False) -> C:
    """N x N Laurent Toeplitz eps matrix of the pillar layer.
    Differentiable w.r.t. xyrra and the periods.  eps_hat is evaluated once
    per *distinct* order difference and gathered into the Toeplitz layout."""
    S, at_zero = ellipse_structure_toeplitz(orders, grating_period,
                                            lateral_period, xyrra,
                                            small_arg_only)
    return toeplitz_from_structure(S, at_zero, eps_pillar, eps_bg)


def rect_layer_toeplitz(orders, grating_period, lateral_period, center,
                        widths, eps_fill, eps_bg=1.0) -> C:
    area = grating_period * lateral_period
    dmx, dmy = _order_differences(orders)
    gx = jnp.asarray(dmx) * (TWO_PI / grating_period)
    gy = jnp.asarray(dmy) * (TWO_PI / lateral_period)
    return eps_fourier_rect(gx, gy, center, widths, eps_fill, eps_bg, area)
