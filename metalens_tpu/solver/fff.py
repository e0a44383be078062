"""Normal-vector-field Fourier factorization (FFF).

The Laurent rule converges slowly in numG for TM-like field components
because it mis-factorizes the product eps * E at material boundaries.  The
normal-vector formulation (Schuster et al.; what S4 enables with
``UsePolarizationDecomposition`` + ``UseNormalVectorBasis``, reference
``grating.lua:180-181``) applies Li's inverse rule along the local boundary
normal and the direct rule tangentially:

    [eps E]  =  <<eps>> E  -  Delta (P_hat E),
    Delta    =  <<eps>> - inv(<<1/eps>>),
    P_hat    =  Toeplitz blocks of the tensor field  w(r) n_i(r) n_j(r)

with n the unit normal of the pillar boundaries (extended into a band
around each ellipse, faded to zero away from boundaries -- the correction
only matters where eps jumps).

Implementation notes (TPU-first):

* ``<<1/eps>>`` reuses the same analytic geometry structure matrix as
  ``<<eps>>`` (1/eps is the same indicator pattern with a different fill
  value) -- no extra special functions.
* The P_hat Fourier coefficients are computed by rasterizing the normal
  field on a static fractional-coordinate grid and projecting onto the
  distinct order differences with one matmul against a *compile-time
  constant* DFT basis (g . r depends only on integer differences and
  fractional coordinates, not on the traced periods).
* The normal-field build is wrapped in stop_gradient: the factorization
  correction improves *accuracy*; shape gradients flow through the exact
  analytic Laurent part (standard practice -- the correction's own
  geometric derivative is noise-level for optimization).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import cpx
from .cpx import C
from .epsilon import _distinct_differences, ellipse_structure_toeplitz, \
    toeplitz_from_structure

TWO_PI = 2.0 * np.pi


@functools.lru_cache(maxsize=32)
def _raster_and_basis(orders_key, R: int):
    """Static raster fractional coords and the DFT basis e^{-i g.r} over the
    distinct order differences.  Returns numpy arrays (compile constants)."""
    orders = np.asarray(orders_key, dtype=np.int64).reshape(-1, 2)
    dmx_u, dmy_u, gather = _distinct_differences(orders)
    f = (np.arange(R) + 0.5) / R - 0.5
    FX, FY = np.meshgrid(f, f, indexing="ij")
    ang = -TWO_PI * (np.outer(FX.ravel(), dmx_u) + np.outer(FY.ravel(), dmy_u))
    return (FX.ravel(), FY.ravel(), np.cos(ang) / (R * R),
            np.sin(ang) / (R * R), gather)


def normal_projector_toeplitz(orders, grating_period, lateral_period, xyrra,
                              R: int = 64):
    """Toeplitz blocks (Pxx, Pxy, Pyy) of the normal-projector field
    n_i n_j.  The field is *global* (|n| = 1 everywhere, so
    Pxx + Pyy = identity): at every point the normal of the nearest pillar
    (in its scaled elliptic coordinate) -- the standard requirement for the
    NV factorization (a windowed/faded field breaks the rule and degrades
    convergence)."""
    orders_key = tuple(map(tuple, np.asarray(orders).tolist()))
    fx, fy, dft_re, dft_im, gather = _raster_and_basis(orders_key, R)
    xyrra = jax.lax.stop_gradient(jnp.asarray(xyrra))
    Lx, Ly = (jax.lax.stop_gradient(jnp.asarray(grating_period)),
              jax.lax.stop_gradient(jnp.asarray(lateral_period)))
    X = jnp.asarray(fx, xyrra.dtype) * Lx      # (R^2,)
    Y = jnp.asarray(fy, xyrra.dtype) * Ly

    nx_acc = jnp.zeros_like(X)
    ny_acc = jnp.zeros_like(X)
    u_best = jnp.full_like(X, jnp.inf)
    nE = xyrra.shape[0]
    for e in range(nE):
        x0, y0, rx, ry, a = (xyrra[e, 0], xyrra[e, 1], xyrra[e, 2],
                             xyrra[e, 3], xyrra[e, 4])
        ca, sa = jnp.cos(a), jnp.sin(a)
        # periodic-nearest displacement to the pillar center
        dx = X - x0
        dx = dx - Lx * jnp.round(dx / Lx)
        dy = Y - y0
        dy = dy - Ly * jnp.round(dy / Ly)
        xp = dx * ca + dy * sa
        yp = -dx * sa + dy * ca
        u = jnp.sqrt((xp / rx) ** 2 + (yp / ry) ** 2 + 1e-30)
        # outward normal of the level set: grad of ((xp/rx)^2 + (yp/ry)^2)
        gx_ = xp / rx ** 2
        gy_ = yp / ry ** 2
        norm = jnp.sqrt(gx_ ** 2 + gy_ ** 2 + 1e-30)
        nxp, nyp = gx_ / norm, gy_ / norm
        # rotate back to cell frame
        nx = nxp * ca - nyp * sa
        ny = nxp * sa + nyp * ca
        # distance-to-boundary proxy in scaled coords: |u - 1|
        d = jnp.abs(u - 1.0)
        take = d < u_best
        nx_acc = jnp.where(take, nx, nx_acc)
        ny_acc = jnp.where(take, ny, ny_acc)
        u_best = jnp.minimum(u_best, d)

    def project(field):
        re = field @ jnp.asarray(dft_re, field.dtype)
        im = field @ jnp.asarray(dft_im, field.dtype)
        idx = jnp.asarray(gather)
        return C(re[idx], im[idx])

    Pxx = project(nx_acc * nx_acc)
    Pxy = project(nx_acc * ny_acc)
    Pyy = project(ny_acc * ny_acc)
    return Pxx, Pxy, Pyy


def fff_eps_blocks(orders, grating_period, lateral_period, xyrra,
                   eps_pillar, eps_bg=1.0, R: int = 64,
                   small_arg_only: bool = False):
    """The in-plane eps operator blocks (Mxx, Mxy, Myy) of the NV-corrected
    factorization [eps E] = <<eps>> E - Delta (P_hat E), plus <<eps>>
    itself (still used for the E_z inverse in F)."""
    S, at_zero = ellipse_structure_toeplitz(orders, grating_period,
                                            lateral_period, xyrra,
                                            small_arg_only)
    E = toeplitz_from_structure(S, at_zero, eps_pillar, eps_bg)
    inv_fill = cpx.promote(1.0) / cpx.promote(eps_pillar)
    inv_bg = cpx.promote(1.0) / cpx.promote(eps_bg)
    E_recip = S * (inv_fill - inv_bg) + cpx.promote(inv_bg) * at_zero
    N = E.shape[0]
    inv_recip = cpx.cho_solve_hermitian(E_recip, cpx.eye(N, E.re.dtype))
    Delta = E - inv_recip
    Pxx, Pxy, Pyy = normal_projector_toeplitz(
        orders, grating_period, lateral_period, xyrra, R=R)
    Mxx = E - Delta @ Pxx
    Mxy = -(Delta @ Pxy)
    Myy = E - Delta @ Pyy
    return E, Mxx, Mxy, Myy
