"""Plane-wave polarization bases and field <-> amplitude relations.

This is the executable-conventions module: the equivalent of the reference's
``S4conventions.py``, but used *by the solver itself* rather than as an
offline check.  The framework's native amplitude basis is exactly S4's
"x/y" output basis so every downstream formula in the reference
(``grating.py:447-451``, ``nearfield.py:313-327``) carries over verbatim:

* amplitude vector layout: ``c = [c_y (N orders); c_x (N orders)]`` --
  matching S4's ``GetAmplitudes`` blocks (first numG entries = 'y', next
  numG = 'x'; reference ``grating.lua:278-281``),
* transverse H of a mode with amplitudes (c_y, c_x): ``(hx, hy) = (c_y,
  c_x)`` (reference ``S4conventions.py:94-97``: H_xpol = [0,1,*],
  H_ypol = [1,0,*]),
* transverse E (kz, K's normalized by k0, medium index n):
    E_xpol = [ (Ky^2+Kz^2)/(n^2 Kz),  -Kx*Ky/(n^2 Kz) ]
    E_ypol = [  Kx*Ky/(n^2 Kz),     -(Kx^2+Kz^2)/(n^2 Kz) ]
  (reference ``S4conventions.py:95-97`` divided through by k0^2; the n>0
  normal-incidence special case [sign(kz)/n, 0] is the Kz = +-n limit).

Everything below is dimensionless: K = k/k0.  Time convention e^{-i w t};
forward propagation is e^{+i k z} (reference ``nearfield.py:335``).
"""

from __future__ import annotations

import jax.numpy as jnp


def kz_norm(Kx, Ky, eps, branch_eps: float = 1e-12):
    """Normalized kz = sqrt(eps - Kx^2 - Ky^2), branch Im >= 0 (evanescent
    waves decay along +z).  ``branch_eps`` nudges the branch cut so lossless
    evanescent orders land on +i sqrt|.| exactly."""
    arg = eps - Kx * Kx - Ky * Ky
    arg = jnp.asarray(arg, dtype=jnp.result_type(arg, 1j))
    return jnp.sqrt(arg + 1j * branch_eps)


def we_blocks(Kx, Ky, Kz, n):
    """Diagonal blocks (A, B, C, D) of the E-from-amplitude map for a uniform
    medium of index n:  with c = (c_y, c_x),

        ex = A c_y + B c_x,   ey = C c_y + D c_x

    (forward modes; backward modes have kz -> -kz, i.e. E_trans -> -E_trans).
    Each of A..D is a length-N complex vector (a diagonal)."""
    n2Kz = (n * n) * Kz
    A = Kx * Ky / n2Kz
    B = (Ky * Ky + Kz * Kz) / n2Kz
    C = -(Kx * Kx + Kz * Kz) / n2Kz
    D = -Kx * Ky / n2Kz
    return A, B, C, D


def we_inv_blocks(Kx, Ky, Kz, n):
    """Blocks of the inverse map (amplitudes from transverse E).  The
    per-order 2x2 determinant is exactly 1/n^2 (since Kx^2+Ky^2+Kz^2 = n^2),
    so the inverse is analytic."""
    A, B, C, D = we_blocks(Kx, Ky, Kz, n)
    det = A * D - B * C   # == 1/n^2 identically; keep the algebraic form
    return D / det, -B / det, -C / det, A / det


def block_mul_vec(blocks, v):
    """Apply a diag-block 2x2 operator (A,B,C,D) to a 2N amplitude-layout
    vector or to the rows of a (2N, M) matrix."""
    A, B, C, D = blocks
    N = A.shape[0]
    if v.ndim == 1:
        top = A * v[:N] + B * v[N:]
        bot = C * v[:N] + D * v[N:]
    else:
        top = A[:, None] * v[:N] + B[:, None] * v[N:]
        bot = C[:, None] * v[:N] + D[:, None] * v[N:]
    return jnp.concatenate([top, bot], axis=0)


def block_compose(b1, b2):
    """Compose two diag-block operators: b1 @ b2."""
    A1, B1, C1, D1 = b1
    A2, B2, C2, D2 = b2
    return (A1 * A2 + B1 * C2, A1 * B2 + B1 * D2,
            C1 * A2 + D1 * C2, C1 * B2 + D1 * D2)


def block_inv(b):
    A, B, C, D = b
    det = A * D - B * C
    return D / det, -B / det, -C / det, A / det


def block_to_dense(b):
    A, B, C, D = b
    return jnp.block([[jnp.diag(A), jnp.diag(B)], [jnp.diag(C), jnp.diag(D)]])


# ----- incident amplitude vectors -----

def incident_sp_amplitudes(ux, uy, pol):
    """Amplitude (c_y, c_x) pair of a unit-E s- or p-polarized incident plane
    wave in air traveling (ux, uy, +uz).

    c = transverse H of the wave: Hs = -Ep, Hp = Es (reference
    ``S4conventions.py:66-67``), with the exact-normal special case
    Es=[0,1,0], Ep=[1,0,0], Hs=[-1,0,0], Hp=[0,1,0]
    (``S4conventions.py:44-50``)."""
    ux = jnp.asarray(ux)
    uy = jnp.asarray(uy)
    kap2 = ux * ux + uy * uy
    kap = jnp.sqrt(jnp.maximum(kap2, 1e-30))
    uz = jnp.sqrt(jnp.maximum(1.0 - kap2, 0.0))
    normal = kap2 < 1e-18
    if pol == "s":
        # Hs = -Ep = (-Kx Kz / kap, -Ky Kz / kap)
        hx = jnp.where(normal, -1.0, -ux * uz / kap)
        hy = jnp.where(normal, 0.0, -uy * uz / kap)
    elif pol == "p":
        # Hp = Es = (-Ky / kap, Kx / kap)
        hx = jnp.where(normal, 0.0, -uy / kap)
        hy = jnp.where(normal, 1.0, ux / kap)
    else:
        raise ValueError(pol)
    return hx, hy   # = (c_y, c_x)


def sp_to_xy_coefficients(ux, uy):
    """The s/p -> x/y combination coefficients for incoming light in air
    (reference ``grating.py:447-451`` / ``S4conventions.py:105-127``).
    Returns (x_p, x_s, y_p, y_s)."""
    kap = jnp.sqrt(ux * ux + uy * uy)
    uz = jnp.sqrt(1.0 - ux * ux - uy * uy)
    x_p = ux / kap
    x_s = -uy / (uz * kap)
    y_p = -uy / kap
    y_s = -ux / (uz * kap)
    return x_p, x_s, y_p, y_s


# ----- power -----

def order_powers(c, Kx, Ky, Kz, n):
    """z-directed power flux per order carried by amplitude vector c (layout
    [c_y; c_x]) of forward modes in a uniform medium of index n, in the same
    (unit-impedance) units S4 uses: Sz_i = Re(ex hy* - ey hx*)."""
    N = Kx.shape[0]
    cy, cx = c[:N], c[N:]
    A, B, C, D = we_blocks(Kx, Ky, Kz, n)
    ex = A * cy + B * cx
    ey = C * cy + D * cx
    hx, hy = cy, cx
    return jnp.real(ex * jnp.conj(hy) - ey * jnp.conj(hx))


def backward_order_powers(c, Kx, Ky, Kz, n):
    """Power (positive = flowing toward -z) of backward modes."""
    return order_powers(c, Kx, Ky, -Kz, n) * (-1.0)
