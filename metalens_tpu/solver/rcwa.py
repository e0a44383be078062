"""TPU-native RCWA (Fourier Modal Method) S-matrix solver.

Replaces the reference's external S4.exe binary + grating.lua driver
(reference ``grating.py:300-317``, ``grating.lua:110-186``) with an
in-framework, batched, differentiable array program.

Why eig-free: classic RCWA eigendecomposes the 2N x 2N layer operator FG,
but XLA has no non-symmetric eigensolver on TPU, and differentiating through
degenerate eigenpairs is fragile.  Instead, the patterned layer's S-matrix is
computed *without any eigendecomposition*:

1.  Maxwell's equations in Fourier space give the first-order system
        d/dz [e; h] = i k0 [[0, F], [G, 0]] [e; h]
    with F, G built from the Laurent Toeplitz matrix of eps(x,y)
    (see module docstrings for the exact blocks; derived from scratch, and
    validated against analytic Fresnel/TMM limits in tests/).
2.  The transfer matrix over a *thin* sub-slab dz = h/n_slabs is the matrix
    exponential, which -- because A^2 = blockdiag(FG, GF) -- reduces to three
    short Taylor series in the single 2N x 2N matrix Y = (k0 dz)^2 FG:
        T11 = cos-series(Y),  T12 = i t sinc-series(Y) F,
        T21 = i t G sinc-series(Y),  T22 = I + G R(Y) F.
    n_slabs is chosen so ||Y|| <~ 2, making an 8-12 term series exact to
    machine precision and every T entry O(e^1.5): no exponential blow-up.
3.  The thin-slab T is converted to an S-matrix in the (analytic) plane-wave
    basis of air, and the full-layer S-matrix is assembled by *Redheffer
    star-product doubling* of identical slabs: log2(n_slabs) star products.
    Star products are unconditionally stable (this is the same reason
    classical RCWA uses S-matrix recursion instead of transfer matrices).
4.  A final analytic interface S-matrix (per-order 2x2 algebra) connects to
    the glass half-space.

Everything is jnp matmuls + linear solves: MXU-friendly, vmap/jit/grad
compatible.  Amplitude conventions (bases, phase references at the air-pillar
interface for reflection and the pillar-glass interface for transmission,
e^{-iwt}/e^{+ikz}) match S4 exactly -- see :mod:`metalens_tpu.solver.basis`.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import basis
from .epsilon import ellipse_layer_toeplitz

TWO_PI = 2.0 * np.pi


class SMatrix(NamedTuple):
    """Scattering matrix with ports [c_f(top-in); c_b(bottom-in)] ->
    [c_f(bottom-out); c_b(top-out)]:

        c_f(bot) = s11 c_f(top) + s12 c_b(bot)
        c_b(top) = s21 c_f(top) + s22 c_b(bot)
    """
    s11: jnp.ndarray
    s12: jnp.ndarray
    s21: jnp.ndarray
    s22: jnp.ndarray


# ----- block helpers: multiply dense (2N,2N) by diag-block operators -----

def _left_bmul(blocks, M):
    A, B, C, D = blocks
    N = A.shape[0]
    top = A[:, None] * M[:N] + B[:, None] * M[N:]
    bot = C[:, None] * M[:N] + D[:, None] * M[N:]
    return jnp.concatenate([top, bot], axis=0)


def _right_bmul(M, blocks):
    A, B, C, D = blocks
    N = A.shape[0]
    left = M[:, :N] * A[None, :] + M[:, N:] * C[None, :]
    right = M[:, :N] * B[None, :] + M[:, N:] * D[None, :]
    return jnp.concatenate([left, right], axis=1)


def build_FG(E, Einv, Kx, Ky):
    """The first-order Maxwell operators for a patterned layer (Laurent
    factorization; K's normalized by k0):

        dz [ex;ey] = i k0 F [hx;hy],   dz [hx;hy] = i k0 G [ex;ey].
    """
    N = Kx.shape[0]
    I = jnp.eye(N, dtype=E.dtype)
    KxE = Kx[:, None] * Einv
    KyE = Ky[:, None] * Einv
    F = jnp.block([
        [KxE * Ky[None, :], I - KxE * Kx[None, :]],
        [KyE * Ky[None, :] - I, -KyE * Kx[None, :]],
    ])
    dKxKy = jnp.diag((Kx * Ky).astype(E.dtype))
    G = jnp.block([
        [-dKxKy, jnp.diag((Kx * Kx).astype(E.dtype)) - E],
        [E - jnp.diag((Ky * Ky).astype(E.dtype)), dKxKy],
    ])
    return F, G


def thin_slab_T_blocks(F, G, t, taylor_terms: int):
    """Blocks of expm(i t [[0,F],[G,0]]) via Taylor series in Y = -t^2 FG?
    Precisely: with Y = (t^2) (F @ G),

        T11 = sum_k (-1)^k Y^k / (2k)!
        T12 = i t [sum_k (-1)^k Y^k / (2k+1)!] F
        T21 = i t G [sum_k (-1)^k Y^k / (2k+1)!]
        T22 = I + G [sum_k (-1)^{k+1} t^2 Y^k / (2k+2)!] F
    """
    n2 = F.shape[0]
    I = jnp.eye(n2, dtype=F.dtype)
    Y = (t * t) * (F @ G)
    P = I
    Csum = I * (1.0 / math.factorial(0))
    Ssum = I * (1.0 / math.factorial(1))
    Rsum = I * (-1.0 / math.factorial(2))
    sign = 1.0
    for k in range(1, taylor_terms + 1):
        P = P @ Y
        sign = -sign
        Csum = Csum + (sign / math.factorial(2 * k)) * P
        Ssum = Ssum + (sign / math.factorial(2 * k + 1)) * P
        Rsum = Rsum + (-sign / math.factorial(2 * k + 2)) * P
    T11 = Csum
    T12 = (1j * t) * (Ssum @ F)
    T21 = (1j * t) * (G @ Ssum)
    T22 = I + (t * t) * (G @ (Rsum @ F))
    return T11, T12, T21, T22


def _transfer_to_smatrix(M11, M12, M21, M22) -> SMatrix:
    """Amplitude-space transfer matrix -> scattering matrix."""
    n2 = M11.shape[0]
    I = jnp.eye(n2, dtype=M11.dtype)
    M22inv = jnp.linalg.solve(M22, I)
    s21 = -M22inv @ M21
    s11 = M11 + M12 @ s21
    s12 = M12 @ M22inv
    s22 = M22inv
    return SMatrix(s11, s12, s21, s22)


def slab_smatrix_in_basis(T, we, we_inv) -> SMatrix:
    """Convert a field-space transfer matrix T (blocks T11..T22 acting on
    [e; h]) to an amplitude-space S-matrix in a uniform-medium basis given by
    diag-block operators ``we`` / ``we_inv`` (same medium both sides).

    Field/amplitude relation: e = We (c_f - c_b), h = c_f + c_b, so
    Phi = [[We, -We], [I, I]], Phi^-1 = (1/2) [[We^-1, I], [-We^-1, I]].
    """
    T11, T12, T21, T22 = T
    # T @ Phi, column blocks
    P11 = _right_bmul(T11, we) + T12      # acts on c_f
    P12 = -_right_bmul(T11, we) + T12     # acts on c_b
    P21 = _right_bmul(T21, we) + T22
    P22 = -_right_bmul(T21, we) + T22
    M11 = 0.5 * (_left_bmul(we_inv, P11) + P21)
    M12 = 0.5 * (_left_bmul(we_inv, P12) + P22)
    M21 = 0.5 * (-_left_bmul(we_inv, P11) + P21)
    M22 = 0.5 * (-_left_bmul(we_inv, P12) + P22)
    return _transfer_to_smatrix(M11, M12, M21, M22)


def redheffer_star(A: SMatrix, B: SMatrix) -> SMatrix:
    """Stack S-matrix A (top) on B (bottom): standard star product."""
    n2 = A.s11.shape[0]
    I = jnp.eye(n2, dtype=A.s11.dtype)
    X = jnp.linalg.solve(I - A.s12 @ B.s21, jnp.concatenate([A.s11, A.s12 @ B.s22], axis=1))
    XA11 = X[:, :n2]
    XA12B22 = X[:, n2:]
    s11 = B.s11 @ XA11
    s12 = B.s12 + B.s11 @ XA12B22
    s21 = A.s21 + A.s22 @ (B.s21 @ XA11)
    s22 = A.s22 @ (B.s21 @ XA12B22 + B.s22)
    return SMatrix(s11, s12, s21, s22)


def interface_smatrix(we_top, we_top_inv, we_bot, we_bot_inv, dtype) -> SMatrix:
    """Analytic S-matrix of a flat interface between two uniform media, in
    their own plane-wave bases (per-order 2x2 algebra, no dense solves).

    Transfer (top amps -> bottom amps): M = Phi_bot^-1 Phi_top gives
    M11 = M22 = (Wb^-1 Wa + I)/2,  M12 = M21 = (I - Wb^-1 Wa)/2.
    """
    N = we_top[0].shape[0]
    one = jnp.ones((N,), dtype=dtype)
    zero = jnp.zeros((N,), dtype=dtype)
    ident = (one, zero, zero, one)
    WbiWa = basis.block_compose(we_bot_inv, we_top)
    half = lambda b: tuple(0.5 * x for x in b)
    add = lambda b1, b2: tuple(x + y for x, y in zip(b1, b2))
    sub = lambda b1, b2: tuple(x - y for x, y in zip(b1, b2))
    M11 = half(add(WbiWa, ident))
    M12 = half(sub(ident, WbiWa))
    # S-matrix from block transfer, all per-order 2x2:
    M22inv = basis.block_inv(M11)       # M22 == M11, M21 == M12
    s21_b = tuple(-x for x in basis.block_compose(M22inv, M12))
    s11_b = add(M11, basis.block_compose(M12, s21_b))
    s12_b = basis.block_compose(M12, M22inv)
    s22_b = M22inv
    return SMatrix(*(basis.block_to_dense(b).astype(dtype)
                     for b in (s11_b, s12_b, s21_b, s22_b)))


# ----- top-level cell solve -----

def default_n_slabs(k0h_max: float, q2_max: float, target: float = 1.4) -> int:
    """Static slab count: smallest power of two making t*q_max <= target."""
    n = max(1.0, k0h_max * math.sqrt(q2_max) / target)
    return int(2 ** math.ceil(math.log2(n)))


def q2_upper_bound(orders, grating_period, lateral_period, wavelength,
                   eps_max: float) -> float:
    """Cheap upper bound on the spectral radius of FG (normalized q^2)."""
    orders = np.asarray(orders)
    kx = orders[:, 0] * wavelength / grating_period
    ky = orders[:, 1] * wavelength / lateral_period
    kmax2 = float(((np.abs(kx) + 1.0) ** 2 + (np.abs(ky) + 1.0) ** 2).max())
    return kmax2 + eps_max


def layer_smatrix(E, Kx, Ky, k0h, n_slabs: int, taylor_terms: int,
                  eps_in=1.0 + 0j, branch_eps: float = 1e-9) -> SMatrix:
    """S-matrix of the patterned layer of normalized thickness ``k0h``,
    expressed in the plane-wave basis of the ``eps_in`` medium (air) on both
    faces."""
    dtype = E.dtype
    Einv = jnp.linalg.solve(E, jnp.eye(E.shape[0], dtype=dtype))
    F, G = build_FG(E, Einv, Kx, Ky)
    t = k0h / n_slabs
    T = thin_slab_T_blocks(F, G, t, taylor_terms)

    n_in = jnp.sqrt(jnp.asarray(eps_in, dtype=dtype))
    Kz_in = basis.kz_norm(Kx, Ky, eps_in, branch_eps).astype(dtype)
    we = tuple(b.astype(dtype) for b in basis.we_blocks(Kx, Ky, Kz_in, n_in))
    we_inv = tuple(b.astype(dtype) for b in basis.we_inv_blocks(Kx, Ky, Kz_in, n_in))

    S = slab_smatrix_in_basis(T, we, we_inv)
    for _ in range(int(math.log2(n_slabs))):
        S = redheffer_star(S, S)
    return S


def cell_smatrix(orders, xyrra, grating_period, lateral_period, cyl_height,
                 eps_pillar, eps_glass, wavelength, ux, uy,
                 n_slabs: int, taylor_terms: int = 10,
                 dtype=jnp.complex64, branch_eps: float = 1e-9):
    """Full air / pillar-layer / glass S-matrix for one unit cell at one
    incidence direction and wavelength.  Ports: top = air plane-wave basis,
    bottom = glass plane-wave basis (exactly S4's GetAmplitudes bases).

    All geometric/physical arguments may be traced (vmap/grad); ``orders``,
    ``n_slabs``, ``taylor_terms`` are static.

    Returns (S, Kx, Ky): normalized transverse k per order included for
    downstream power/mask computations.
    """
    E = ellipse_layer_toeplitz(np.asarray(orders), grating_period,
                               lateral_period, xyrra, eps_pillar).astype(dtype)
    return cell_smatrix_with_eps(orders, E, grating_period, lateral_period,
                                 cyl_height, eps_glass, wavelength, ux, uy,
                                 n_slabs=n_slabs, taylor_terms=taylor_terms,
                                 dtype=dtype, branch_eps=branch_eps)


def cell_smatrix_with_eps(orders, E, grating_period, lateral_period,
                          cyl_height, eps_glass, wavelength, ux, uy,
                          n_slabs: int, taylor_terms: int = 10,
                          dtype=jnp.complex64, branch_eps: float = 1e-9):
    """As :func:`cell_smatrix` but with the layer's Toeplitz eps matrix given
    directly (any pattern: ellipses, rectangles, uniform media)."""
    orders = np.asarray(orders)
    mx = jnp.asarray(orders[:, 0], dtype=jnp.float32 if dtype == jnp.complex64 else jnp.float64)
    my = jnp.asarray(orders[:, 1], dtype=mx.dtype)
    Kx = ux + mx * (wavelength / grating_period)
    Ky = uy + my * (wavelength / lateral_period)

    E = E.astype(dtype)
    k0h = TWO_PI * cyl_height / wavelength
    S_layer = layer_smatrix(E, Kx, Ky, k0h, n_slabs, taylor_terms,
                            eps_in=1.0 + 0j, branch_eps=branch_eps)

    # air | glass interface at the bottom face
    Kz_a = basis.kz_norm(Kx, Ky, 1.0 + 0j, branch_eps).astype(dtype)
    Kz_g = basis.kz_norm(Kx, Ky, eps_glass, branch_eps).astype(dtype)
    n_a = jnp.asarray(1.0 + 0j, dtype=dtype)
    n_g = jnp.sqrt(jnp.asarray(eps_glass, dtype=dtype))
    we_a = tuple(b.astype(dtype) for b in basis.we_blocks(Kx, Ky, Kz_a, n_a))
    wei_a = tuple(b.astype(dtype) for b in basis.we_inv_blocks(Kx, Ky, Kz_a, n_a))
    we_g = tuple(b.astype(dtype) for b in basis.we_blocks(Kx, Ky, Kz_g, n_g))
    wei_g = tuple(b.astype(dtype) for b in basis.we_inv_blocks(Kx, Ky, Kz_g, n_g))
    S_iface = interface_smatrix(we_a, wei_a, we_g, wei_g, dtype)

    S = redheffer_star(S_layer, S_iface)
    return S, Kx, Ky


def scatter_amplitudes(S: SMatrix, c_inc):
    """Transmitted (into glass, forward) and reflected (into air, backward)
    amplitude vectors for incident amplitudes c_inc (top, forward).  Layouts
    match S4 GetAmplitudes: [y-block; x-block]."""
    ampf = S.s11 @ c_inc
    ampr = S.s21 @ c_inc
    return ampf, ampr
