"""Fused Pallas complex inverse: correctness (interpret mode on CPU),
agreement with the XLA block-recursive route on actual hot-path matrices,
and the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa
from metalens_tpu.solver.pallas_inv import inv_pallas, pad_size
from metalens_tpu.units import nm


def _rand_wellcond(rng, n, B=None):
    shape = (n, n) if B is None else (B, n, n)
    A = (np.eye(n) + 0.4 * (rng.normal(size=shape)
         + 1j * rng.normal(size=shape)) / np.sqrt(n))
    return A.astype(np.complex64)


@pytest.mark.parametrize("n,B", [(100, 3), (200, 2), (32, 1), (130, 2)])
def test_interpret_inverse_random(n, B):
    rng = np.random.default_rng(0)
    A_np = _rand_wellcond(rng, n, B)
    W = inv_pallas(cpx.from_np(A_np), True)
    Wn = cpx.to_np(W)
    for b in range(B):
        assert np.abs(Wn[b] @ A_np[b] - np.eye(n)).max() < 5e-5


def test_unbatched_and_pad_size():
    rng = np.random.default_rng(1)
    A_np = _rand_wellcond(rng, 100)
    W = cpx.to_np(inv_pallas(cpx.from_np(A_np), True))
    assert np.abs(W @ A_np - np.eye(100)).max() < 5e-5
    assert pad_size(100) == 112 and pad_size(200) == 224
    assert pad_size(20) == 32 and pad_size(130) == 160
    assert pad_size(100, gj_base=32) == 128   # power-of-two chain only
    assert pad_size(300) is None


def test_matches_blockrec_on_hot_path_matrices(monkeypatch):
    """Capture the solves cell_smatrix actually issues and pin the fused
    kernel against the XLA block recursion on those matrices."""
    captured = []
    orig = cpx.solve

    def capturing(A, B):
        X = orig(A, B)
        captured.append(A)
        return X

    monkeypatch.setattr(cpx, "solve", capturing)
    monkeypatch.setattr(rcwa.cpx, "solve", capturing)
    LX, LY, LAM, H = 1200 * nm, 320 * nm, 580 * nm, 550 * nm
    orders = ordmod.select_orders(LX, LY, 25)
    ns, taylor = rcwa.slab_schedule(2 * np.pi * H / LAM, orders, LX, LY,
                                    LAM, 2.372 ** 2)
    xyrra = jnp.asarray(np.asarray(
        [[-215., 2., 144., 111., 0.], [196., -8., 100., 130., 0.1]])
        * [nm, nm, nm, nm, 1.0])
    S, _, _ = rcwa.cell_smatrix(orders, xyrra, LX, LY, H, 2.372 ** 2,
                                1.459 ** 2, LAM, 0.45, 0.1,
                                n_slabs=ns, taylor_terms=taylor)
    np.asarray(S.s11.re)
    monkeypatch.setattr(cpx, "solve", orig)
    assert len(captured) >= 3
    for A in captured:
        A32 = A.astype(jnp.float32)
        W_pl = cpx.to_np(inv_pallas(A32, True))
        W_br = cpx.to_np(cpx.inv_blockrec(A32))
        scale = np.abs(W_br).max()
        assert np.abs(W_pl - W_br).max() / scale < 5e-5


def test_custom_vjp_matches_blockrec_grad():
    rng = np.random.default_rng(2)
    n = 40
    A_np = _rand_wellcond(rng, n)
    G_np = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
            ).astype(np.complex64)
    Gc = cpx.from_np(G_np)

    def loss_pl(A):
        W = inv_pallas(A, True)
        return jnp.sum(W.re * Gc.re + W.im * Gc.im)

    def loss_br(A):
        W = cpx.inv_blockrec(A, base=16)
        return jnp.sum(W.re * Gc.re + W.im * Gc.im)

    A = cpx.from_np(A_np)
    g_pl = jax.grad(loss_pl)(A)
    g_br = jax.grad(loss_br)(A)
    scale = np.abs(cpx.to_np(g_br)).max()
    assert np.abs(cpx.to_np(g_pl) - cpx.to_np(g_br)).max() / scale < 1e-4


def test_vmap_odd_batch_identity_pad():
    """A vmap batch NOT divisible by the interleave group (e.g. a 25- or
    75-direction characterize sweep) must still route through the grouped
    kernel: the rule identity-pads up to a group multiple and slices the
    pad off.  Pinned in interpret mode against the direct inverse."""
    from metalens_tpu.solver import pallas_inv
    rng = np.random.default_rng(2)
    for B in (3, 25):
        A_np = _rand_wellcond(rng, 40, B)
        Ac = cpx.from_np(A_np)
        W = jax.vmap(lambda a: inv_pallas(a, True))(Ac)
        Wn = cpx.to_np(W)
        assert Wn.shape == (B, 40, 40)
        for b in range(B):
            assert np.abs(Wn[b] @ A_np[b] - np.eye(40)).max() < 5e-5
    # the picker no longer demands divisibility and caps at ~2x the batch
    assert pallas_inv._pick_group(112, 25) == 8
    assert pallas_inv._pick_group(112, 3) == 4
    assert pallas_inv._pick_group(112, 1) == 1
    assert pallas_inv._pick_group(224, 25) == 4
    assert pallas_inv._pick_group(256, 25) == 2


def test_out_of_range_n_raises():
    rng = np.random.default_rng(3)
    A_np = _rand_wellcond(rng, 300)
    with pytest.raises(ValueError, match="256"):
        inv_pallas(cpx.from_np(A_np), True)
