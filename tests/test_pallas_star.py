"""Fused Pallas star-doubling: agreement with the XLA doubling loop
(interpret mode on CPU), on random contractive S-matrices and on the
actual hot-path S-matrix the layer assembly produces, plus the custom
VJP and vmap batching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metalens_tpu.solver import basis, cpx, orders as ordmod, rcwa
from metalens_tpu.solver.pallas_star import _double_xla, double_sym_pallas
from metalens_tpu.units import nm


def _rand_sym_smatrix(rng, n, scale11=0.5, scale12=0.3):
    """Random mirror-symmetric PASSIVE S-matrix (||s11|| + ||s12|| < 1, the
    physical case): the doubling chain then stays contractive, matching the
    kernel's well-conditioned-blocks contract.  Non-passive random chains
    blow up the conditioning and are not representative of any layer."""
    s11 = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    s11 = (scale11 * s11 / (2.0 * np.sqrt(n))).astype(np.complex64)
    s12 = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    s12 = (scale12 * s12 / (2.0 * np.sqrt(n))).astype(np.complex64)
    return s11, s12


@pytest.mark.parametrize("n,K", [(100, 3), (64, 1), (130, 2)])
def test_matches_xla_loop_random(n, K):
    """Same accuracy class as the XLA f32 loop, judged against the f64
    truth (comparing the two f32 routes to each other is unstable when the
    random chain grows near-non-contractive -- both drift equally)."""
    rng = np.random.default_rng(0)
    s11_np, s12_np = _rand_sym_smatrix(rng, n)
    s11, s12 = cpx.from_np(s11_np), cpx.from_np(s12_np)
    a_pl, b_pl = double_sym_pallas(s11, s12, K, True)
    a_x, b_x = _double_xla(s11, s12, K)
    a64, b64 = _double_xla(cpx.from_np(s11_np.astype(np.complex128)),
                           cpx.from_np(s12_np.astype(np.complex128)), K)
    err_pl = max(np.abs(cpx.to_np(a_pl) - cpx.to_np(a64)).max(),
                 np.abs(cpx.to_np(b_pl) - cpx.to_np(b64)).max())
    err_x = max(np.abs(cpx.to_np(a_x) - cpx.to_np(a64)).max(),
                np.abs(cpx.to_np(b_x) - cpx.to_np(b64)).max())
    assert err_pl < 3.0 * err_x + 1e-5


def test_xla_chain_matches_rcwa_star():
    """_double_xla (the VJP-replay reference) IS the rcwa doubling loop."""
    rng = np.random.default_rng(1)
    s11_np, s12_np = _rand_sym_smatrix(rng, 80)
    S = rcwa.SMatrix(cpx.from_np(s11_np), cpx.from_np(s12_np),
                     cpx.from_np(s12_np), cpx.from_np(s11_np))
    for _ in range(2):
        S = rcwa.redheffer_star_self_symmetric(S)
    a, b = _double_xla(cpx.from_np(s11_np), cpx.from_np(s12_np), 2)
    assert np.abs(cpx.to_np(a) - cpx.to_np(S.s11)).max() < 1e-5
    assert np.abs(cpx.to_np(b) - cpx.to_np(S.s12)).max() < 1e-5


def test_vmap_batching():
    rng = np.random.default_rng(2)
    pairs = [_rand_sym_smatrix(rng, 100) for _ in range(3)]
    s11 = cpx.from_np(np.stack([p[0] for p in pairs]))
    s12 = cpx.from_np(np.stack([p[1] for p in pairs]))
    a_v, b_v = jax.vmap(lambda a, b: double_sym_pallas(a, b, 2, True))(s11,
                                                                       s12)
    for i in range(3):
        a_x, b_x = _double_xla(s11[i], s12[i], 2)
        assert np.abs(cpx.to_np(a_v[i]) - cpx.to_np(a_x)).max() < 2e-5
        assert np.abs(cpx.to_np(b_v[i]) - cpx.to_np(b_x)).max() < 2e-5


def test_custom_vjp_matches_xla_grad():
    rng = np.random.default_rng(3)
    s11_np, s12_np = _rand_sym_smatrix(rng, 48)
    v11, v12 = _rand_sym_smatrix(rng, 48)

    def loss_pl(s11, s12):
        a, b = double_sym_pallas(s11, s12, 2, True)
        return jnp.sum(a.re * cpx.from_np(v11).re + b.im * cpx.from_np(v12).im)

    def loss_x(s11, s12):
        a, b = _double_xla(s11, s12, 2)
        return jnp.sum(a.re * cpx.from_np(v11).re + b.im * cpx.from_np(v12).im)

    args = (cpx.from_np(s11_np), cpx.from_np(s12_np))
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(*args)
    g_x = jax.grad(loss_x, argnums=(0, 1))(*args)
    for gp, gx in zip(jax.tree_util.tree_leaves(g_pl),
                      jax.tree_util.tree_leaves(g_x)):
        assert np.abs(np.asarray(gp) - np.asarray(gx)).max() < 3e-5


def test_hot_path_smatrix_parity():
    """Pin the fused doubling against the XLA loop on the ACTUAL thin-slab
    S-matrix the layer assembly produces (lossy EPS_REF basis, real
    pillar pattern, f32)."""
    import math

    LX, LY, LAM, H = 1200 * nm, 320 * nm, 580 * nm, 550 * nm
    orders = ordmod.select_orders(LX, LY, 25)
    ns, taylor = rcwa.slab_schedule(2 * np.pi * H / LAM, orders, LX, LY,
                                    LAM, 2.372 ** 2)
    xyrra = jnp.asarray(np.asarray(
        [[-215., 2., 144., 111., 0.], [196., -8., 100., 130., 0.1]])
        * [nm, nm, nm, nm, 1.0], dtype=np.float32)
    from metalens_tpu.solver.epsilon import ellipse_layer_toeplitz
    E = ellipse_layer_toeplitz(np.asarray(orders), LX, LY, xyrra,
                               2.372 ** 2).astype(jnp.float32)
    rdt = np.float32
    mx = jnp.asarray(np.asarray(orders)[:, 0], rdt)
    my = jnp.asarray(np.asarray(orders)[:, 1], rdt)
    Kx = (rdt(0.3) + mx * rdt(LAM / LX)).astype(rdt)
    Ky = (my * rdt(LAM / LY)).astype(rdt)
    k0h = 2 * np.pi * H / LAM

    # full assembly (XLA doubling loop) vs thin slab + fused doubling
    S_loop = rcwa.layer_smatrix(E, Kx, Ky, k0h, ns, taylor)
    S_thin = rcwa.layer_smatrix(E, Kx, Ky, k0h / ns, 1, taylor)
    K = int(math.log2(ns))
    a, b = double_sym_pallas(S_thin.s11, S_thin.s12, K, True)
    assert np.abs(cpx.to_np(a) - cpx.to_np(S_loop.s11)).max() < 5e-5
    assert np.abs(cpx.to_np(b) - cpx.to_np(S_loop.s12)).max() < 5e-5
