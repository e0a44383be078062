"""Fused Taylor kernel (interpret mode on CPU): agreement with the XLA
shared-power formulation, batched dispatch via the custom vmap rule
(including a batched coefficient table, i.e. per-element t), and the
replayed VJP."""

import numpy as np
import jax
import jax.numpy as jnp

from metalens_tpu.solver import cpx
from metalens_tpu.solver.pallas_taylor import (taylor_factors, xla_factors,
                                               _taylor_pad)


def _rand_fg(rng, n, scale=0.35):
    F = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) * scale
    G = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) * scale
    return (cpx.from_np(F.astype(np.complex64)),
            cpx.from_np(G.astype(np.complex64)))


def _close(a: cpx.C, b: cpx.C, tol):
    an, bn = cpx.to_np(a), cpx.to_np(b)
    scale = max(np.abs(bn).max(), 1e-30)
    assert np.abs(an - bn).max() / scale < tol


def test_matches_xla_formulation():
    rng = np.random.default_rng(0)
    for n, terms in ((100, 12), (40, 8)):
        F, G = _rand_fg(rng, n)
        t = 1.37
        fused = taylor_factors(F, G, t, terms, True)
        plain = xla_factors(F, G, t, terms)
        for a, b in zip(fused, plain):
            assert a.shape == (n, n)
            _close(a, b, 2e-5)
    assert _taylor_pad(100) == 104 and _taylor_pad(200) == 200


def test_vmap_batched_matrices_shared_t():
    rng = np.random.default_rng(1)
    n, B, terms = 48, 3, 10
    Fs, Gs = zip(*[_rand_fg(rng, n) for _ in range(B)])
    F, G = cpx.stack(Fs), cpx.stack(Gs)
    t = 0.9
    fused = jax.vmap(lambda f, g: taylor_factors(f, g, t, terms, True))(F, G)
    for b in range(B):
        plain = xla_factors(F[b], G[b], t, terms)
        for a, p in zip(fused, plain):
            _close(a[b], p, 2e-5)


def test_vmap_batched_t():
    """Joint wavelength-direction programs batch t as well: the vmap rule
    must thread a BATCHED coefficient table through SMEM."""
    rng = np.random.default_rng(2)
    n, B, terms = 48, 4, 10
    Fs, Gs = zip(*[_rand_fg(rng, n) for _ in range(B)])
    F, G = cpx.stack(Fs), cpx.stack(Gs)
    ts = jnp.asarray([0.7, 0.9, 1.1, 1.4], jnp.float32)
    fused = jax.vmap(
        lambda f, g, tt: taylor_factors(f, g, tt, terms, True))(F, G, ts)
    for b in range(B):
        plain = xla_factors(F[b], G[b], float(ts[b]), terms)
        for a, p in zip(fused, plain):
            _close(a[b], p, 2e-5)


def test_vjp_replays_xla_path():
    rng = np.random.default_rng(3)
    n, terms = 24, 8
    F, G = _rand_fg(rng, n)
    t = 1.1

    def loss_fused(F, G):
        CS, SF, GS, GRF = taylor_factors(F, G, t, terms, True)
        return (jnp.sum(CS.re) + jnp.sum(SF.im) + jnp.sum(GS.re)
                + jnp.sum(GRF.im))

    def loss_plain(F, G):
        CS, SF, GS, GRF = xla_factors(F, G, t, terms)
        return (jnp.sum(CS.re) + jnp.sum(SF.im) + jnp.sum(GS.re)
                + jnp.sum(GRF.im))

    gF, gG = jax.grad(loss_fused, argnums=(0, 1))(F, G)
    pF, pG = jax.grad(loss_plain, argnums=(0, 1))(F, G)
    _close(gF, pF, 1e-5)
    _close(gG, pG, 1e-5)


def test_thin_slab_blocks_route_matches():
    """rcwa.thin_slab_T_blocks through the fused path (forced interpret)
    equals the XLA path on the same inputs."""
    from metalens_tpu.solver import rcwa, pallas_taylor
    rng = np.random.default_rng(4)
    n = 40
    F, G = _rand_fg(rng, n)
    t, terms = 1.2, 12
    plain = rcwa.thin_slab_T_blocks(F, G, t, terms)   # CPU -> xla route
    fused = pallas_taylor.taylor_factors(F, G, t, terms, True)
    I = cpx.eye(n, jnp.float32)
    fusedT = (fused[0], fused[1] * 1j * t, fused[2] * 1j * t,
              I + fused[3] * (t * t))
    for a, b in zip(fusedT, plain):
        _close(a, b, 2e-5)
