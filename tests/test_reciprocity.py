"""Lorentz reciprocity of the cell S-matrix.

An independent physics invariant orthogonal to energy conservation: for any
reciprocal medium (scalar eps, lossy or not), the Lorentz reciprocity theorem
applied to the volume between a plane in air and a plane in glass ties the
S-matrix at incidence (ux, uy) to the S-matrix at (-ux, -uy) with diffraction
orders mapped G -> -G.  Energy conservation cannot see phase errors or
transmission/reflection basis mix-ups; reciprocity pins all four blocks,
including the glass-side ones (s12, s22) that the engine's production path
never exercises.  (The reference has no such check -- its oracle was
Lumerical, README.md:41; this is a self-contained replacement in the spirit
of tests/test_eig_ref.py.)

Derivation (verified against the Fresnel limit below): with the *bilinear*
(unconjugated) flux form per side

    M = [[-diag(C), diag(A)], [diag(A), diag(B)]],

where (A, B, C, D) are the we_blocks of that side's medium (M is symmetric
since D = -A), and Sigma the permutation sending order G to -G (extended
blockwise to the [c_y; c_x] layout), reciprocity requires, writing S for the
S-matrix at (ux, uy) and S' for the one at (-ux, -uy):

    M_a s21 = (Sig s21' Sig)^T M_a          (air-side reflection)
    M_g s12 = (Sig s12' Sig)^T M_g          (glass-side reflection)
    M_g s11 = (Sig s22' Sig)^T M_a          (transmission both ways)
    M_a s22 = (Sig s11' Sig)^T M_g

Scalar check at normal incidence (air/glass Fresnel): M = I/n per side, so
the transmission identity reads s11 / n_g = s22 -- and indeed the S4
H-amplitude normalization gives s11 = 2 n_g / (1 + n_g) (pinned in
test_rcwa_fresnel.py) and s22 = 2 / (1 + n_g).

These identities hold for the *full* matrices, evanescent orders included
(the bilinear form needs no conjugation, so complex Kz is fine), and for
lossy pillars (reciprocity, unlike unitarity, survives absorption).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa, basis
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
NG, NT = 1.459, 2.372
# two rotated ellipses: no mirror symmetry, so the identities are non-trivial
XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.35],
                  [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])


def closed_orders(target_numG):
    """Smallest numG >= target whose truncated order set is closed under
    G -> -G (the (|G|^2, mx, my) tie-break can split a +-G pair exactly at
    the truncation boundary), plus the negation permutation."""
    for numG in range(target_numG, target_numG + 64):
        orders = ordmod.select_orders(LX, LY, numG)
        index = {(int(mx), int(my)): i for i, (mx, my) in enumerate(orders)}
        if all((-mx, -my) in index for (mx, my) in index):
            perm = np.array([index[(-int(mx), -int(my))] for mx, my in orders])
            return orders, perm
    raise AssertionError("no negation-closed order set near target")


def flux_form(Kx, Ky, eps, n):
    """The symmetric bilinear form M = [[-C, A], [A, B]] (dense numpy
    complex) pairing amplitudes at (ux, uy) with amplitudes at (-ux, -uy)."""
    Kz = basis.kz_norm(np.asarray(Kx), np.asarray(Ky), eps)
    A, B, C, _ = basis.we_blocks(np.asarray(Kx), np.asarray(Ky), Kz, n)
    A, B, C = (cpx.to_np(v) for v in (A, B, C))
    return np.block([[np.diag(-C), np.diag(A)], [np.diag(A), np.diag(B)]])


def solve(orders, ux, uy, fff, eps_pillar):
    q2 = rcwa.q2_upper_bound(orders, LX, LY, LAM, abs(eps_pillar))
    ns = rcwa.default_n_slabs(2 * np.pi * H / LAM, q2)
    S, Kx, Ky = rcwa.cell_smatrix(
        orders, jnp.asarray(XYRRA), LX, LY, H,
        cpx.from_np(np.asarray(eps_pillar)), cpx.from_np(np.asarray(NG ** 2)),
        LAM, ux, uy, n_slabs=ns, taylor_terms=10, fff=fff,
        hermitian_eps=(complex(eps_pillar).imag == 0.0))
    blocks = {k: cpx.to_np(getattr(S, k)) for k in ("s11", "s12", "s21", "s22")}
    return blocks, np.asarray(Kx), np.asarray(Ky)


def rel(lhs, rhs):
    return np.linalg.norm(lhs - rhs) / max(np.linalg.norm(lhs), 1e-300)


@pytest.mark.parametrize("fff", [False, True])
@pytest.mark.parametrize("eps_pillar", [NT ** 2 + 0j, NT ** 2 + 0.4j])
def test_smatrix_lorentz_reciprocity(fff, eps_pillar):
    orders, perm = closed_orders(25)
    N = len(orders)
    p2 = np.concatenate([perm, perm + N])   # Sigma on the [c_y; c_x] layout

    ux, uy = 0.31, 0.12
    S, Kx, Ky = solve(orders, ux, uy, fff, eps_pillar)
    Sp, Kxp, Kyp = solve(orders, -ux, -uy, fff, eps_pillar)
    # the negated problem's K vectors must be exactly -K under the order map
    np.testing.assert_allclose(Kxp[perm], -Kx, atol=1e-12)
    np.testing.assert_allclose(Kyp[perm], -Ky, atol=1e-12)

    Ma = flux_form(Kx, Ky, 1.0, 1.0)
    Mg = flux_form(Kx, Ky, NG ** 2, NG)

    def mapped(name):     # (Sig S'[name] Sig)^T
        return Sp[name][np.ix_(p2, p2)].T

    tol = 1e-8
    assert rel(Ma @ S["s21"], mapped("s21") @ Ma) < tol
    assert rel(Mg @ S["s12"], mapped("s12") @ Mg) < tol
    assert rel(Mg @ S["s11"], mapped("s22") @ Ma) < tol
    assert rel(Ma @ S["s22"], mapped("s11") @ Mg) < tol


def test_normal_incidence_internal_reciprocity():
    """At ux = uy = 0 the negated problem is the same problem, so reciprocity
    becomes an internal symmetry of a single S-matrix."""
    orders, perm = closed_orders(25)
    N = len(orders)
    p2 = np.concatenate([perm, perm + N])

    S, Kx, Ky = solve(orders, 0.0, 0.0, False, NT ** 2 + 0j)
    Ma = flux_form(Kx, Ky, 1.0, 1.0)
    Mg = flux_form(Kx, Ky, NG ** 2, NG)

    tol = 1e-8
    assert rel(Ma @ S["s21"], S["s21"][np.ix_(p2, p2)].T @ Ma) < tol
    assert rel(Mg @ S["s12"], S["s12"][np.ix_(p2, p2)].T @ Mg) < tol
    assert rel(Mg @ S["s11"], S["s22"][np.ix_(p2, p2)].T @ Ma) < tol
