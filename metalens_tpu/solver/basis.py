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
  (reference ``S4conventions.py:95-97`` divided through by k0^2; the
  normal-incidence special case [sign(kz)/n, 0] is the Kz = +-n limit).

Complex quantities are :class:`metalens_tpu.solver.cpx.C` real pairs.
Time convention e^{-i w t}; forward propagation e^{+i k z} (reference
``nearfield.py:335``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cpx
from .cpx import C


def kz_norm(Kx, Ky, eps, branch_eps: float = 1e-9) -> C:
    """Normalized kz = sqrt(eps - Kx^2 - Ky^2) with the Im >= 0 branch
    (evanescent waves decay along +z).  ``eps`` may be real, python complex,
    or a C scalar; ``branch_eps`` nudges the cut so lossless evanescent
    orders land exactly on +i sqrt|.|."""
    e = cpx.promote(eps)
    arg = C(e.re - Kx * Kx - Ky * Ky,
            e.im + jnp.zeros_like(Kx) + branch_eps)
    return cpx.csqrt_posim(arg)


def we_blocks(Kx, Ky, Kz: C, n):
    """Diagonal blocks (A, B, C, D) of the E-from-amplitude map for a
    uniform medium of index n (real, python complex, or C scalar): with
    c = (c_y, c_x),

        ex = A c_y + B c_x,   ey = C c_y + D c_x

    (forward modes; backward modes have kz -> -kz, i.e. E_trans -> -E_trans).
    Each block is a length-N C vector."""
    n_ = cpx.promote(n)
    n2Kz = n_ * n_ * Kz
    Kz2 = Kz * Kz
    A = C(Kx * Ky, jnp.zeros_like(Kx)) / n2Kz
    B = (Kz2 + Ky * Ky) / n2Kz
    D = -A
    Cb = -(Kz2 + Kx * Kx) / n2Kz
    return A, B, Cb, D


def we_inv_blocks(Kx, Ky, Kz: C, n):
    """Blocks of the inverse map (amplitudes from transverse E).  The
    per-order 2x2 determinant is exactly 1/n^2 (since Kx^2+Ky^2+Kz^2 = n^2),
    so the inverse is analytic."""
    return block_inv(we_blocks(Kx, Ky, Kz, n))


def block_compose(b1, b2):
    A1, B1, C1, D1 = b1
    A2, B2, C2, D2 = b2
    return (A1 * A2 + B1 * C2, A1 * B2 + B1 * D2,
            C1 * A2 + D1 * C2, C1 * B2 + D1 * D2)


def block_inv(b):
    A, B, Cb, D = b
    det = A * D - B * Cb
    return D / det, -B / det, -Cb / det, A / det


def block_to_dense(b) -> C:
    A, B, Cb, D = b
    return C(jnp.block([[jnp.diag(A.re), jnp.diag(B.re)],
                        [jnp.diag(Cb.re), jnp.diag(D.re)]]),
             jnp.block([[jnp.diag(A.im), jnp.diag(B.im)],
                        [jnp.diag(Cb.im), jnp.diag(D.im)]]))


# ----- incident amplitude vectors -----

def incident_sp_amplitudes(ux, uy, pol):
    """Amplitude (c_y, c_x) pair (real values) of a unit-E s- or p-polarized
    incident plane wave in air traveling (ux, uy, +uz).

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
        hx = jnp.where(normal, -1.0, -ux * uz / kap)
        hy = jnp.where(normal, 0.0, -uy * uz / kap)
    elif pol == "p":
        hx = jnp.where(normal, 0.0, -uy / kap)
        hy = jnp.where(normal, 1.0, ux / kap)
    else:
        raise ValueError(pol)
    return hx, hy   # = (c_y, c_x), real for propagating incidence


def sp_to_xy_coefficients(ux, uy):
    """The s/p -> x/y combination coefficients for incoming light in air
    (reference ``grating.py:447-451`` / ``S4conventions.py:105-127``).
    Returns (x_p, x_s, y_p, y_s).

    Exactly-normal incidence takes the ux -> 0+ limit along +x
    ((1, 0, 0, -1)), consistent with :func:`incident_sp_amplitudes`'s
    normal special case (the generic formula is 0/0 there)."""
    ux = jnp.asarray(ux)
    uy = jnp.asarray(uy)
    kap2 = ux * ux + uy * uy
    normal = kap2 < 1e-18
    kap = jnp.sqrt(jnp.where(normal, 1.0, kap2))
    uz = jnp.sqrt(jnp.maximum(1.0 - kap2, 0.0))
    x_p = jnp.where(normal, 1.0, ux / kap)
    x_s = jnp.where(normal, 0.0, -uy / (uz * kap))
    y_p = jnp.where(normal, 0.0, -uy / kap)
    y_s = jnp.where(normal, -1.0, -ux / (uz * kap))
    return x_p, x_s, y_p, y_s


# ----- power -----

def order_powers(c: C, Kx, Ky, Kz: C, n):
    """z-directed power flux per order carried by amplitude vector c (layout
    [c_y; c_x]) of forward modes in a uniform medium of index n, in the same
    (unit-impedance) units S4 uses: Sz_i = Re(ex hy* - ey hx*)."""
    c = cpx.promote(c)
    N = Kx.shape[0]
    cy, cx = c[:N], c[N:]
    A, B, Cb, D = we_blocks(Kx, Ky, Kz, n)
    ex = A * cy + B * cx
    ey = Cb * cy + D * cx
    hx, hy = cy, cx
    sz = ex * hy.conj() - ey * hx.conj()
    return sz.re


def backward_order_powers(c: C, Kx, Ky, Kz: C, n):
    """Power (positive = flowing toward -z) of backward modes."""
    return -order_powers(c, Kx, Ky, -Kz, n)
