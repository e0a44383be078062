"""Eigenmode reference solver -- the independent validation backend.

The production solver (:mod:`metalens_tpu.solver.rcwa`) propagates through
the patterned layer eig-free (thin-slab exponential + star doubling).  This
module solves the *same* physical problem by the classical, completely
different route: complex eigendecomposition of the layer operator FG into
Bloch modes, diagonal propagation e^{i q k0 h}, and S-matrix mode matching
at both faces.  Agreement between the two is a strong end-to-end check of
the propagation machinery (the role the Lumerical FDTD cross-check plays
for the reference, README.md:41 -- but automated, in tests/test_eig_ref.py).

Host NumPy on purpose: general complex eigendecomposition does not exist on
TPU, and this path's job is validation, not speed.  It shares only the
Toeplitz/F/G construction and the basis definitions with the production
solver; everything downstream (modes, propagation, matching) is distinct.
"""

from __future__ import annotations

import numpy as np

from . import cpx, basis
from .epsilon import ellipse_layer_toeplitz
from .rcwa import build_FG, SMatrix

TWO_PI = 2.0 * np.pi


def _np_blocks(b):
    return tuple(cpx.to_np(x) for x in b)


def _we_dense(Kx, Ky, eps, n):
    Kz = basis.kz_norm(Kx, Ky, eps)
    A, B, Cb, D = _np_blocks(basis.we_blocks(Kx, Ky, Kz, n))
    N = len(A)
    W = np.zeros((2 * N, 2 * N), dtype=complex)
    W[:N, :N] = np.diag(A)
    W[:N, N:] = np.diag(B)
    W[N:, :N] = np.diag(Cb)
    W[N:, N:] = np.diag(D)
    return W


def reference_cell_smatrix(orders, xyrra, grating_period, lateral_period,
                           cyl_height, eps_pillar, eps_glass, wavelength,
                           ux, uy):
    """Air / pillars / glass S-matrix via eigenmodes (host numpy).

    Same ports and amplitude conventions as
    :func:`metalens_tpu.solver.rcwa.cell_smatrix`.
    Returns (SMatrix of numpy arrays, Kx, Ky).
    """
    orders = np.asarray(orders)
    N = orders.shape[0]
    Kx = ux + orders[:, 0] * (wavelength / grating_period)
    Ky = uy + orders[:, 1] * (wavelength / lateral_period)

    E_c = ellipse_layer_toeplitz(orders, grating_period, lateral_period,
                                 np.asarray(xyrra, dtype=np.float64),
                                 eps_pillar)
    E = cpx.to_np(E_c)
    Einv = np.linalg.inv(E)
    F_c, G_c = build_FG(cpx.from_np(E), cpx.from_np(Einv),
                        np.asarray(Kx), np.asarray(Ky))
    F = cpx.to_np(F_c)
    G = cpx.to_np(G_c)

    # Bloch modes: FG w = q^2 w; q on the physical branch (Im >= 0, and +
    # real for propagating modes)
    q2, W = np.linalg.eig(F @ G)
    q = np.sqrt(q2 + 0j)
    flip = q.imag < 0
    q = np.where(flip, -q, q)
    # nearly-real eigenvalues: force the +real root
    real_prop = (np.abs(q.imag) < 1e-9 * np.abs(q.real)) & (q.real < 0)
    q = np.where(real_prop, -q, q)
    # mode H-fields: v = G w / q
    V = (G @ W) / q[None, :]

    k0h = TWO_PI * cyl_height / wavelength
    lam_prop = np.exp(1j * q * k0h)

    # interface air | modes at z=0 and modes | glass at z=h.
    # field <-> amplitudes: [e; h] = [[W, W], [V, -V]] [m_f; m_b] for modes;
    # [e; h] = [[Wa, -Wa], [I, I]] [c_f; c_b] for uniform media.
    Wa = _we_dense(np.asarray(Kx), np.asarray(Ky), 1.0, 1.0)
    ng = np.sqrt(complex(eps_glass))
    Wg = _we_dense(np.asarray(Kx), np.asarray(Ky), complex(eps_glass), ng)
    I = np.eye(2 * N, dtype=complex)

    def iface_uniform_to_modes(Wu):
        """Transfer (c_f, c_b) in a uniform basis -> (m_f, m_b):
        m_f = (W^-1 e + V^-1 h)/2, m_b = (W^-1 e - V^-1 h)/2 with
        e = Wu (c_f - c_b), h = c_f + c_b."""
        Wi_e = np.linalg.solve(W, Wu)
        Vi_h = np.linalg.solve(V, I)
        M11 = 0.5 * (Wi_e + Vi_h)
        M12 = 0.5 * (-Wi_e + Vi_h)
        M21 = 0.5 * (Wi_e - Vi_h)
        M22 = 0.5 * (-Wi_e - Vi_h)
        return M11, M12, M21, M22

    def iface_modes_to_uniform(Wu):
        """Transfer (m_f, m_b) -> (c_f, c_b) in a uniform basis:
        c_f = (Wu^-1 e + h)/2, c_b = (-Wu^-1 e + h)/2 with e = W(m_f+m_b),
        h = V(m_f - m_b)."""
        WiW = np.linalg.solve(Wu, W)
        M11 = 0.5 * (WiW + V)
        M12 = 0.5 * (WiW - V)
        M21 = 0.5 * (-WiW + V)
        M22 = 0.5 * (-WiW - V)
        return M11, M12, M21, M22

    def transfer_to_s(M11, M12, M21, M22):
        M22i = np.linalg.inv(M22)
        s21 = -M22i @ M21
        return (M11 + M12 @ s21, M12 @ M22i, s21, M22i)

    def star(A, B):
        X = np.linalg.solve(I - A[1] @ B[2],
                            np.concatenate([A[0], A[1] @ B[3]], axis=1))
        XA11, XA12B22 = X[:, :2 * N], X[:, 2 * N:]
        return (B[0] @ XA11, B[1] + B[0] @ XA12B22,
                A[2] + A[3] @ (B[2] @ XA11),
                A[3] @ (B[2] @ XA12B22 + B[3]))

    S_top = transfer_to_s(*iface_uniform_to_modes(Wa))
    S_prop = (np.diag(lam_prop), np.zeros((2 * N, 2 * N), complex),
              np.zeros((2 * N, 2 * N), complex), np.diag(lam_prop))
    S_bot = transfer_to_s(*iface_modes_to_uniform(Wg))

    S = star(S_top, star(S_prop, S_bot))
    return SMatrix(*S), np.asarray(Kx), np.asarray(Ky)
