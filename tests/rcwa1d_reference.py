"""Fully independent 1D lamellar RCWA (classic Moharam-Gaylord eigenmode
formulation, plain numpy) for air / binary-grating layer / substrate.

Role: the external cross-validator the reference used Lumerical for
(/root/reference/README.md:41).  Shares NOTHING with metalens_tpu -- its
own analytic (sinc) Fourier coefficients, its own Toeplitz assembly, a
numpy.linalg.eig eigenmode solve (the production solver is eig-free), and
its own boundary matching.  Validated against analytic Fresnel/TMM in the
uniform-layer limit (tests/test_lamellar_independent.py) before being
trusted on gratings.

Conventions: time dependence e^{-i w t}; z into the stack; incidence from
medium 1 (superstrate) at angle theta in the x-z plane; the grating is
periodic in x (period L) and uniform in y.  TE = E along y, TM = H along
y.  Returns per-order reflection/transmission efficiencies keyed by the
diffraction-order integer m (kx_m = k0 (n1 sin theta + m lam/L)).
"""

import numpy as np


def _toeplitz_eps(eps_fill, eps_bg, fill, M):
    """Toeplitz [eps] of a centered binary profile: eps(x) = eps_fill for
    |x| < fill*L/2 else eps_bg.  Fourier: e_k = (ef-eb)*fill*sinc(k*fill)
    (+ eb at k=0)."""
    k = np.arange(-2 * M, 2 * M + 1)
    coef = (eps_fill - eps_bg) * fill * np.sinc(k * fill)
    coef = coef.astype(complex)
    coef[2 * M] += eps_bg
    N = 2 * M + 1
    E = np.empty((N, N), complex)
    for i in range(N):
        for j in range(N):
            E[i, j] = coef[(i - j) + 2 * M]
    return E


def _kz(n2eps, kx_over_k0):
    """Normalized kz/k0 with Im >= 0 (decay along +z)."""
    v = np.asarray(n2eps - kx_over_k0 ** 2, complex)
    r = np.sqrt(v)
    return np.where(r.imag < 0, -r, r)


def lamellar_rcwa(pol, lam, L, h, eps_fill, eps_bg, eps1, eps2, theta,
                  M=20, fill=0.5):
    """Diffraction efficiencies of a single binary-grating layer.

    Returns (m_orders, DE_r, DE_t): integer order indices and per-order
    reflected/transmitted efficiencies (power fractions of the incident
    wave; only propagating orders carry nonzero efficiency)."""
    N = 2 * M + 1
    m = np.arange(-M, M + 1)
    n1 = np.sqrt(complex(eps1)).real
    kx = n1 * np.sin(theta) + m * lam / L          # kx / k0
    Kx = np.diag(kx.astype(complex))
    kz1 = _kz(eps1, kx)
    kz2 = _kz(eps2, kx)
    E = _toeplitz_eps(eps_fill, eps_bg, fill, M)
    I = np.eye(N, dtype=complex)

    if pol == "s":            # TE: d2 Ey/dz'2 = (Kx^2 - E) Ey
        A = Kx @ Kx - E
        Z1 = np.diag(kz1)
        Z2 = np.diag(kz2)
    elif pol == "p":          # TM (Laurent): d2 Hy/dz'2 = E (Kx E^-1 Kx - I) Hy
        A = E @ (Kx @ np.linalg.solve(E, Kx) - I)
        Z1 = np.diag(kz1 / eps1)
        Z2 = np.diag(kz2 / eps2)
    else:
        raise ValueError(pol)

    q2, W = np.linalg.eig(A)
    q = np.sqrt(q2.astype(complex))
    q = np.where(q.real < 0, -q, q)                # e^{-k0 q z} decays
    if pol == "s":
        V = W @ np.diag(q)
    else:                                          # Ex ~ E^{-1} dHy/dz
        V = np.linalg.solve(E, W) @ np.diag(q)
    k0 = 2 * np.pi / lam
    X = np.diag(np.exp(-k0 * q * h))

    delta = np.zeros(N, complex)
    delta[M] = 1.0

    # unknowns [c+; c-]; see tests module docstring for the matching.
    #   z=0:  delta + r = W c+ + W X c-
    #         i Z1 (delta - r) = -V c+ + V X c-
    #   z=h:  W X c+ + W c- = t
    #         -V X c+ + V c- = i Z2 t
    top = np.hstack([1j * Z1 @ W - V, (1j * Z1 @ W + V) @ X])
    bot = np.hstack([-(V + 1j * Z2 @ W) @ X, V - 1j * Z2 @ W])
    rhs = np.concatenate([2j * Z1 @ delta, np.zeros(N, complex)])
    sol = np.linalg.solve(np.vstack([top, bot]), rhs)
    cp, cm = sol[:N], sol[N:]

    r = W @ cp + W @ X @ cm - delta
    t = W @ X @ cp + W @ cm

    kz_inc = kz1[M].real
    if pol == "s":
        DE_r = np.abs(r) ** 2 * kz1.real / kz_inc
        DE_t = np.abs(t) ** 2 * kz2.real / kz_inc
    else:
        DE_r = np.abs(r) ** 2 * (kz1 / eps1).real / (kz_inc / eps1)
        DE_t = np.abs(t) ** 2 * (kz2 / eps2).real / (kz_inc / eps1)
    return m, DE_r, DE_t
