"""Analytic Fourier representation of the patterned (pillar) layer.

The reference describes the pattern to S4 as a list of ellipses
(``grating.lua:130-135``, ``S:SetLayerPatternEllipse``); S4 computes the
Fourier coefficients of eps(x, y) analytically.  Same here, but as a jnp
program differentiable w.r.t. every ellipse parameter -- this is what makes
the whole solve differentiable w.r.t. geometry (no staircasing, no FFT).

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
factorization; hooks for that refinement live here (``fff`` flag) and can be
added without touching the propagation code.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .special import j1_over_x_from_sq

TWO_PI = 2.0 * np.pi


def _order_difference_vectors(orders, grating_period, lateral_period):
    """G_i - G_j for every order pair: two (N, N) arrays (rad/m)."""
    mx = orders[:, 0]
    my = orders[:, 1]
    dmx = mx[:, None] - mx[None, :]
    dmy = my[:, None] - my[None, :]
    gx = dmx * (TWO_PI / grating_period)
    gy = dmy * (TWO_PI / lateral_period)
    return gx, gy


def eps_fourier_ellipses(gx, gy, xyrra, eps_fill, eps_bg, area):
    """eps_hat evaluated at wavevectors (gx, gy) for a background medium
    eps_bg with ellipses of eps_fill described by xyrra rows.

    gx, gy: arrays of any (matching) shape; xyrra: (nE, 5).
    Returns complex array of gx.shape."""
    x0, y0 = xyrra[:, 0], xyrra[:, 1]
    rx, ry = xyrra[:, 2], xyrra[:, 3]
    ang = xyrra[:, 4]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # rotate G into the ellipse frame, scale by semi-axes
    gxe = gx[..., None]
    gye = gy[..., None]
    u1 = (gxe * ca + gye * sa) * rx
    u2 = (-gxe * sa + gye * ca) * ry
    shape_ft = TWO_PI * rx * ry * j1_over_x_from_sq(u1 * u1 + u2 * u2)
    phase = jnp.exp(-1j * (gxe * x0 + gye * y0))
    contrib = (eps_fill - eps_bg) / area * (shape_ft * phase).sum(-1)
    at_zero = jnp.where((gx == 0) & (gy == 0), eps_bg, 0.0)
    return contrib + at_zero


def eps_fourier_rect(gx, gy, center, widths, eps_fill, eps_bg, area):
    """eps_hat for a single axis-aligned rectangle (test/lamellar helper)."""
    x0, y0 = center
    wx, wy = widths
    sx = jnp.sinc(gx * wx / (2 * np.pi))  # jnp.sinc(t) = sin(pi t)/(pi t)
    sy = jnp.sinc(gy * wy / (2 * np.pi))
    shape_ft = wx * wy * sx * sy
    phase = jnp.exp(-1j * (gx * x0 + gy * y0))
    contrib = (eps_fill - eps_bg) / area * shape_ft * phase
    at_zero = jnp.where((gx == 0) & (gy == 0), eps_bg, 0.0)
    return contrib + at_zero


def toeplitz_from_hat(eps_hat_fn, orders, grating_period, lateral_period):
    """Build the N x N Laurent Toeplitz matrix E[i,j] = eps_hat(G_i - G_j)."""
    gx, gy = _order_difference_vectors(np.asarray(orders), grating_period,
                                       lateral_period)
    return eps_hat_fn(jnp.asarray(gx), jnp.asarray(gy))


def ellipse_layer_toeplitz(orders, grating_period, lateral_period, xyrra,
                           eps_pillar, eps_bg=1.0):
    """Toeplitz eps matrix of the pillar layer (ellipses of eps_pillar in
    air).  Differentiable w.r.t. xyrra, eps_pillar and the periods."""
    area = grating_period * lateral_period
    gx, gy = _order_difference_vectors(np.asarray(orders), 1.0, 1.0)
    # recompute g with (possibly traced) periods: dm * 2pi / period
    gx = jnp.asarray(gx) * (1.0 / grating_period)
    gy = jnp.asarray(gy) * (1.0 / lateral_period)
    return eps_fourier_ellipses(gx, gy, xyrra, eps_pillar, eps_bg, area)


def rect_layer_toeplitz(orders, grating_period, lateral_period, center,
                        widths, eps_fill, eps_bg=1.0):
    area = grating_period * lateral_period
    gx, gy = _order_difference_vectors(np.asarray(orders), 1.0, 1.0)
    gx = jnp.asarray(gx) * (1.0 / grating_period)
    gy = jnp.asarray(gy) * (1.0 / lateral_period)
    return eps_fourier_rect(gx, gy, center, widths, eps_fill, eps_bg, area)
