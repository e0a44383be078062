"""The hot-path complex solve (cpx.solve = Schur elimination of the real
embedding, two n x n LUs) must agree with the full-embedding LU reference
(cpx.solve_embed) on the matrices the solver actually produces.

The Schur route additionally requires Re(A) well-conditioned -- guaranteed
on the RCWA path by the lossy EPS_REF doubling basis (star/conversion
matrices are I-plus-contraction in REAL part) and by the SPD real part of
the Hermitian Toeplitz eps.  This file pins that contract empirically:
every solve issued by cell_smatrix across a stress domain (grazing orders,
fat pillars, lossy eps, oblique incidence) is captured and checked for
(a) agreement with solve_embed and (b) small true residual.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa
from metalens_tpu.units import nm


def _rel_diff(a, b):
    an, bn = cpx.to_np(a), cpx.to_np(b)
    return float(np.abs(an - bn).max() / (np.abs(bn).max() + 1e-300))


def _residual(A, X, B):
    An, Xn, Bn = cpx.to_np(A), cpx.to_np(X), cpx.to_np(B)
    return float(np.abs(An @ Xn - Bn).max() / (np.abs(Bn).max() + 1e-300))


def test_schur_matches_embed_on_random():
    rng = np.random.default_rng(0)
    for n, k in [(8, 8), (20, 40), (33, 5)]:
        A = cpx.from_np(np.eye(n) + 0.4 * (rng.normal(size=(n, n))
                                           + 1j * rng.normal(size=(n, n))))
        B = cpx.from_np(rng.normal(size=(n, k)) + 1j * rng.normal(size=(n, k)))
        Xs = cpx.solve_schur(A, B)
        Xe = cpx.solve_embed(A, B)
        assert _rel_diff(Xs, Xe) < 1e-12
        assert _residual(A, Xs, B) < 1e-12
        Xm = cpx.solve_matmul(A, B)
        assert _rel_diff(Xm, Xe) < 1e-11
        assert _residual(A, Xm, B) < 1e-11


def test_hermitian_blockrec_matches_cholesky():
    rng = np.random.default_rng(5)
    for n in (20, 100):
        M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        A_np = M @ M.conj().T + n * np.eye(n)
        B_np = rng.normal(size=(n, 7)) + 1j * rng.normal(size=(n, 7))
        A, B = cpx.from_np(A_np), cpx.from_np(B_np)
        Xc = cpx.cho_solve_hermitian(A, B)
        Xm = cpx.cho_solve_hermitian_matmul(A, B) if n > 64 else \
            cpx.inv_blockrec_hermitian(A, base=16) @ B
        assert _rel_diff(Xm, Xc) < 1e-11
        assert _residual(A, Xm, B) < 1e-11


def test_inv_blockrec_recurses_below_base():
    rng = np.random.default_rng(2)
    n = 200   # 200 -> 100 -> 50: two recursion levels before the base case
    A = cpx.from_np(np.eye(n) + 0.3 * (rng.normal(size=(n, n))
                                       + 1j * rng.normal(size=(n, n))) / np.sqrt(n))
    Ai = cpx.inv_blockrec(A, base=64)
    I = cpx.to_np(Ai) @ cpx.to_np(A)
    assert np.abs(I - np.eye(n)).max() < 1e-12


def test_embed_handles_singular_real_part():
    """solve_embed is the fallback for matrices outside cpx.solve's
    contract: here Re(A) is exactly singular but A is perfectly
    conditioned (A = i Q for orthogonal Q)."""
    rng = np.random.default_rng(1)
    n = 12
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = cpx.from_np(1j * Q)
    B = cpx.from_np(rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3)))
    Xe = cpx.solve_embed(A, B)
    assert _residual(A, Xe, B) < 1e-12


@pytest.mark.parametrize("ux,uy,eps_p,xyrra_nm", [
    # grazing: ux just inside the light line, several orders near cutoff
    (0.9999, 0.0, 2.372 ** 2, [[0., 0., 120., 90., 0.]]),
    # fat pillar, high fill factor, oblique
    (0.5, 0.2, 2.372 ** 2, [[-40., 10., 150., 150., 0.3]]),
    # lossy pillar material
    (0.3, 0.0, 6.25 + 1.5j, [[0., 0., 110., 80., 0.1]]),
    # two-pillar cell, normal incidence
    (0.0, 0.0, 2.372 ** 2, [[-215., 2., 144., 111., 0.], [196., -8., 100., 130., 0.1]]),
])
def test_every_hot_path_solve_is_inside_the_schur_contract(
        ux, uy, eps_p, xyrra_nm, monkeypatch):
    """Capture every cpx.solve issued during an eager cell_smatrix and pin
    schur-vs-embed agreement + true residual on the ACTUAL matrices."""
    captured = []
    orig = cpx.solve

    def capturing(A, B):
        X = orig(A, B)
        captured.append((A, B, X))
        return X

    monkeypatch.setattr(cpx, "solve", capturing)
    monkeypatch.setattr(rcwa.cpx, "solve", capturing)

    LX = 1200 * nm if len(xyrra_nm) > 1 else 420 * nm
    LY = 320 * nm
    LAM, H = 580 * nm, 550 * nm
    orders = ordmod.select_orders(LX, LY, 25)
    hermitian = (np.imag(eps_p) == 0)
    n_slabs, taylor = rcwa.slab_schedule(
        2 * np.pi * H / LAM, orders, LX, LY, LAM, abs(eps_p))
    xyrra = jnp.asarray(np.asarray(xyrra_nm, float) * [nm, nm, nm, nm, 1.0])
    S, Kx, Ky = rcwa.cell_smatrix(
        orders, xyrra, LX, LY, H, eps_p, 1.459 ** 2, LAM, ux, uy,
        n_slabs=n_slabs, taylor_terms=taylor, hermitian_eps=hermitian)
    np.asarray(S.s11.re)  # materialize
    assert len(captured) >= 3  # slab->S, >=0 doublings, 2 conversions
    # snapshot: the blockrec check below re-enters the patched cpx.solve
    # at its base case, which would otherwise grow the list mid-iteration
    for A, B, X in list(captured):
        Xe = cpx.solve_embed(A, B)
        assert _rel_diff(X, Xe) < 1e-9
        assert _residual(A, X, B) < 1e-9
        # the unpivoted all-matmul route must hold on the same matrices
        # (base=16 forces real recursion depth even at these small n)
        Xm = cpx.solve_matmul(A, B) if A.shape[0] > 64 else \
            cpx.inv_blockrec(A, base=16) @ B
        assert _rel_diff(Xm, Xe) < 1e-8
        assert _residual(A, Xm, B) < 1e-8
        # Re(A) must itself be invertible with modest conditioning --
        # the structural property the lossy EPS_REF basis buys us
        condR = np.linalg.cond(np.asarray(A.re))
        assert condR < 1e8, f"Re(A) conditioning broke the Schur contract: {condR:.2e}"


def test_numpy_left_operand_and_complex_arrays():
    """numpy on the LEFT of an operator must defer to C's reflected ops
    (__array_ufunc__ = None); complex numpy operands promote instead of
    silently corrupting the real branch."""
    rng = np.random.default_rng(7)
    z = rng.normal(size=4) + 1j * rng.normal(size=4)
    c = cpx.from_np(z)
    w = rng.normal(size=4) + 1j * rng.normal(size=4)

    got = np.array([10.0, 20.0, 30.0, 40.0]) + c
    assert isinstance(got, cpx.C)
    np.testing.assert_allclose(cpx.to_np(got),
                               np.array([10., 20., 30., 40.]) + z, rtol=1e-6)
    got = np.float64(2.0) * c
    assert isinstance(got, cpx.C)
    np.testing.assert_allclose(cpx.to_np(got), 2.0 * z, rtol=1e-6)
    # complex numpy arrays promote through * and /
    np.testing.assert_allclose(cpx.to_np(c * w), z * w, rtol=1e-6)
    np.testing.assert_allclose(cpx.to_np(c / w), z / w, rtol=1e-6)
    np.testing.assert_allclose(cpx.to_np(c * np.complex128(1 + 2j)),
                               z * (1 + 2j), rtol=1e-6)


def test_adjoint_and_T_are_batch_safe():
    """adjoint/.T must swap only the matrix axes: with batch == n, plain
    .T produced valid shapes but silently wrong values."""
    rng = np.random.default_rng(8)
    B = n = 3
    z = rng.normal(size=(B, n, n)) + 1j * rng.normal(size=(B, n, n))
    c = cpx.from_np(z)
    np.testing.assert_allclose(cpx.to_np(cpx.adjoint(c)),
                               np.conj(np.swapaxes(z, -1, -2)), rtol=1e-12)
    np.testing.assert_allclose(cpx.to_np(c.T),
                               np.swapaxes(z, -1, -2), rtol=1e-12)
    v = cpx.from_np(z[0, 0])
    np.testing.assert_allclose(cpx.to_np(v.T), z[0, 0], rtol=1e-12)


def test_inv_blockrec_rejects_batched():
    rng = np.random.default_rng(9)
    z = np.eye(8) + 0.1 * (rng.normal(size=(4, 8, 8))
                           + 1j * rng.normal(size=(4, 8, 8)))
    with pytest.raises(ValueError, match="2-D"):
        cpx.inv_blockrec(cpx.from_np(z))
