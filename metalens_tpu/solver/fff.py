"""Normal-vector-field Fourier factorization (FFF).

The Laurent rule converges slowly in numG for TM-like field components
because it mis-factorizes the product eps * E at material boundaries.  The
normal-vector formulation (Schuster et al.; what S4 enables with
``UsePolarizationDecomposition`` + ``UseNormalVectorBasis``, reference
``grating.lua:180-181``) applies Li's inverse rule along the local boundary
normal and the direct rule tangentially:

    [eps E]  =  <<eps>> E  -  sym(Delta P_hat) E,
    Delta    =  <<eps>> - inv(<<1/eps>>),
    P_hat    =  Toeplitz blocks of the tensor field  n_i(r) n_j(r)

with n the unit normal field of the pillar boundaries (global,
nearest-pillar) and sym(Delta P) = (Delta P + P Delta)/2 the anticommutator
symmetrization (for lossless Delta this equals the Hermitian part
(X + X^H)/2, which is what :func:`nv_blocks` computes there -- one matmul
cheaper; see its docstring for why the Hermitian part is *wrong* for lossy
Delta).

The symmetrization is the load-bearing detail: Delta and P_hat are each
Hermitian (lossless) and persymmetric, but their *product* is neither at
finite truncation.  A non-Hermitian eps operator for a lossless structure
breaks S-matrix unitarity -- measured 1.4-2.1% energy defect at numG=25-49
without it; a non-persymmetric operator breaks Lorentz reciprocity --
measured 8e-3 on the s21 identity (tests/test_reciprocity.py).
Symmetrizing restores machine-exact energy conservation (defect < 1e-14,
same as the Laurent rule) and 1e-8-level reciprocity while keeping the
convergence acceleration (measured 4.5% vs Laurent's 16.9% relative
amplitude error at numG=61 against a numG=161 reference);
sym(Delta P) - Delta P is O(commutator truncation error), i.e. it vanishes
at the same rate the correction itself converges.

Implementation notes (TPU-first):

* ``<<1/eps>>`` reuses the same analytic geometry structure matrix as
  ``<<eps>>`` (1/eps is the same indicator pattern with a different fill
  value) -- no extra special functions.
* The P_hat Fourier coefficients are computed by rasterizing the normal
  field on a static fractional-coordinate grid and projecting onto the
  distinct order differences with one matmul against a *compile-time
  constant* DFT basis (g . r depends only on integer differences and
  fractional coordinates, not on the traced periods).
* The normal-field build is fully differentiable (periodic rounding and
  the nearest-pillar selection are piecewise-constant/a.e.-smooth, like
  any max/where): shape gradients flow through the correction as well as
  the analytic Laurent part.  (Round 1 stop-gradiented the projector on a
  "noise-level" assumption; measured against finite differences the
  correction's geometric term is ~10% of the FOM gradient for radius
  perturbations -- pinned by tests/test_parallel.py's FD check.)
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


def _raster_basis_for(dmx_u, dmy_u, R: int):
    """Raster fractional coords + the DFT basis e^{-i g.r} over the given
    difference list (numpy compile constants).  The single source for the
    raster convention (half-pixel offset, 1/R^2 normalization) -- the
    traced-vs-static parity pinned by test_program_structure depends on the
    static and dense variants below staying identical."""
    f = (np.arange(R) + 0.5) / R - 0.5
    FX, FY = np.meshgrid(f, f, indexing="ij")
    ang = -TWO_PI * (np.outer(FX.ravel(), dmx_u) + np.outer(FY.ravel(), dmy_u))
    return (FX.ravel(), FY.ravel(), np.cos(ang) / (R * R),
            np.sin(ang) / (R * R))


@functools.lru_cache(maxsize=4)
def _raster_and_basis(orders_key, R: int):
    """Static raster fractional coords and the DFT basis e^{-i g.r} over the
    distinct order differences.  Returns numpy arrays (compile constants).

    maxsize is small on purpose: one entry is O(R^2 x nDiff) float64 pairs
    (~90 MB at R=64, numG~100), and the basis is only consumed at TRACE
    time -- production chains hit one or two signatures, while a sweep over
    many distinct static order sets would otherwise pin gigabytes of host
    RAM (the traced/dense variant below exists for exactly that case)."""
    orders = np.asarray(orders_key, dtype=np.int64).reshape(-1, 2)
    dmx_u, dmy_u, gather = _distinct_differences(orders)
    return _raster_basis_for(dmx_u, dmy_u, R) + (gather,)


@functools.lru_cache(maxsize=4)
def _dense_raster_and_basis(Dx: int, Dy: int, R: int):
    """As :func:`_raster_and_basis` but over the STATIC dense difference
    grid (see epsilon.dense_difference_grid): the basis does not depend on
    the concrete order set, so programs taking orders as traced inputs can
    share it."""
    from .epsilon import dense_difference_grid
    dmx_u, dmy_u = dense_difference_grid(Dx, Dy)
    return _raster_basis_for(dmx_u, dmy_u, R)


def _normal_field(xyrra, X, Y, Lx, Ly):
    """Raster samples of the global nearest-pillar outward normal
    (nx, ny) at points (X, Y) of one unit cell."""
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
    return nx_acc, ny_acc


def normal_projector_toeplitz_traced(mx, my, Dx: int, Dy: int,
                                     grating_period, lateral_period, xyrra,
                                     R: int = 64):
    """:func:`normal_projector_toeplitz` with the order set TRACED (static
    bound |dmx| <= Dx, |dmy| <= Dy): projects onto the static dense
    difference basis and gathers with the traced index map."""
    from .epsilon import traced_gather_idx
    fx, fy, dft_re, dft_im = _dense_raster_and_basis(Dx, Dy, R)
    xyrra = jnp.asarray(xyrra)
    Lx, Ly = jnp.asarray(grating_period), jnp.asarray(lateral_period)
    X = jnp.asarray(fx, xyrra.dtype) * Lx      # (R^2,)
    Y = jnp.asarray(fy, xyrra.dtype) * Ly
    nx_acc, ny_acc = _normal_field(xyrra, X, Y, Lx, Ly)
    idx = traced_gather_idx(mx, my, Dx, Dy)

    def project(field):
        re = jnp.matmul(field, jnp.asarray(dft_re, field.dtype),
                        precision=cpx.MATMUL_PRECISION)
        im = jnp.matmul(field, jnp.asarray(dft_im, field.dtype),
                        precision=cpx.MATMUL_PRECISION)
        return C(re[idx], im[idx])

    Pxx = project(nx_acc * nx_acc)
    Pxy = project(nx_acc * ny_acc)
    Pyy = project(ny_acc * ny_acc)
    return Pxx, Pxy, Pyy


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
    xyrra = jnp.asarray(xyrra)
    Lx, Ly = jnp.asarray(grating_period), jnp.asarray(lateral_period)
    X = jnp.asarray(fx, xyrra.dtype) * Lx      # (R^2,)
    Y = jnp.asarray(fy, xyrra.dtype) * Ly
    nx_acc, ny_acc = _normal_field(xyrra, X, Y, Lx, Ly)

    def project(field):
        re = jnp.matmul(field, jnp.asarray(dft_re, field.dtype),
                        precision=cpx.MATMUL_PRECISION)
        im = jnp.matmul(field, jnp.asarray(dft_im, field.dtype),
                        precision=cpx.MATMUL_PRECISION)
        idx = jnp.asarray(gather)
        return C(re[idx], im[idx])

    Pxx = project(nx_acc * nx_acc)
    Pxy = project(nx_acc * ny_acc)
    Pyy = project(ny_acc * ny_acc)
    return Pxx, Pxy, Pyy


def hermitian_part(X):
    """(X + X^H)/2 for a cpx matrix."""
    return C((X.re + X.re.T) * 0.5, (X.im - X.im.T) * 0.5)


def nv_blocks(E, Delta, Pxx, Pxy, Pyy, hermitian: bool = True):
    """The symmetrized NV-corrected in-plane eps operator blocks.

    The correct symmetrization is the anticommutator (Delta P + P Delta)/2:
    Delta and the projector blocks are persymmetric (Sigma X Sigma = X^T
    under the order-negation map Sigma -- every convolution operator is),
    so the anticommutator keeps the eps operator persymmetric, which is the
    condition for the truncated S-matrix to satisfy Lorentz reciprocity
    (pinned by tests/test_reciprocity.py).

    ``hermitian=True`` (lossless Delta) takes the one-matmul shortcut
    (X + X^H)/2, *identical* to the anticommutator when Delta^H = Delta and
    P^H = P, and then also Hermitian -- the condition for a lossless layer's
    truncated S-matrix to be flux-unitary (see the module docstring).  For
    lossy Delta the Hermitian part is wrong twice over: it conjugates
    Delta's anti-Hermitian piece (breaking reciprocity, measured 8e-3 on
    the s21 identity) and deletes the correction's absorption contribution.
    Pass ``hermitian=False`` there; the second product costs 3 extra
    matmuls, off the lossless production hot path.
    """
    if hermitian:
        def sym(P):
            return hermitian_part(Delta @ P)
    else:
        def sym(P):
            X, Y = Delta @ P, P @ Delta
            return C((X.re + Y.re) * 0.5, (X.im + Y.im) * 0.5)
    Mxx = E - sym(Pxx)
    Mxy = -sym(Pxy)
    Myy = E - sym(Pyy)
    return Mxx, Mxy, Myy


def nv_blocks_from_structure(S_struct, at_zero, eps_pillar, P_blocks,
                             hermitian: bool = True, eps_bg=1.0,
                             E: C | None = None):
    """The whole NV eps build from a precomputed geometry structure matrix:
    <<eps>> Toeplitz, <<1/eps>> inverse (same structure, reciprocal fill),
    Delta, and the symmetrized blocks.  Returns (E, (Mxx, Mxy, Myy)).

    The single source of the recipe shared by :func:`fff_eps_blocks`
    (static orders) and both of the engine's traced-orders programs --
    including the conditioning/routing rule: ``hermitian=True`` (lossless
    dielectric) means <<1/eps>> is HPD, every leading block is HPD, and
    the unpivoted cpx.solve contract holds (dispatching to the grouped
    Pallas inverse on TPU -- round-3 chip A/B vs cho_solve in CLAUDE.md);
    absorbing eps (``hermitian=False``) may have Re(1/eps) <= 0 diagonals,
    voiding that contract, so it takes the pivoted full-embedding LU --
    once per eps build, off the per-slab hot path, so the cost is noise.

    Pass ``E`` if the caller already built the <<eps>> Toeplitz (avoids
    re-emitting it; XLA would CSE the duplicate anyway)."""
    if E is None:
        E = toeplitz_from_structure(S_struct, at_zero, eps_pillar, eps_bg)
    inv_fill = cpx.promote(1.0) / cpx.promote(eps_pillar)
    inv_bg = cpx.promote(1.0) / cpx.promote(eps_bg)
    E_recip = S_struct * (inv_fill - inv_bg) + cpx.promote(inv_bg) * at_zero
    solve_h = cpx.solve if hermitian else cpx.solve_embed
    inv_recip = solve_h(E_recip, cpx.eye(E.shape[0], E.re.dtype))
    Delta = E - inv_recip
    Pxx, Pxy, Pyy = P_blocks
    return E, nv_blocks(E, Delta, Pxx, Pxy, Pyy, hermitian=hermitian)


def fff_eps_blocks(orders, grating_period, lateral_period, xyrra,
                   eps_pillar, eps_bg=1.0, R: int = 64,
                   small_arg_only: bool = False, hermitian: bool = True):
    """The in-plane eps operator blocks (Mxx, Mxy, Myy) of the NV-corrected
    factorization [eps E] = <<eps>> E - sym(Delta P_hat) E, plus <<eps>>
    itself (still used for the E_z inverse in F).  ``hermitian=False`` must
    be passed for absorbing pillar materials (complex eps): <<1/eps>> is
    then non-Hermitian and its inverse uses LU instead of Cholesky."""
    S, at_zero = ellipse_structure_toeplitz(orders, grating_period,
                                            lateral_period, xyrra,
                                            small_arg_only)
    P_blocks = normal_projector_toeplitz(
        orders, grating_period, lateral_period, xyrra, R=R)
    E, (Mxx, Mxy, Myy) = nv_blocks_from_structure(
        S, at_zero, eps_pillar, P_blocks, hermitian=hermitian, eps_bg=eps_bg)
    return E, Mxx, Mxy, Myy
