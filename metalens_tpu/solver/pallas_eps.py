"""Fused Pallas kernel for the ellipse Fourier structure factor.

On this backend every HLO op costs milliseconds regardless of tensor size
(no fusion), and the eps-structure build -- a ~50-op elementwise chain
(axis rotation, J1 rational fit, phase trig, ellipse sum) on tiny arrays --
dominates the tuned solve (~80%).  This kernel collapses the whole chain
into ONE op: per batch element, all distinct order differences are padded
into a single (8, 128) VPU tile and the complete structure factor is
computed in VMEM.

Forward-only (Pallas kernels don't autodiff): used by the characterize
sweep and the benchmark; gradient paths (optimize_gradient) keep the XLA
implementation in :mod:`metalens_tpu.solver.epsilon`.  Equality with the
XLA path is pinned by tests/test_pallas_eps.py on CPU (interpret mode) and
exercised on chip by bench.py --pallas.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .cpx import C
from .epsilon import _distinct_differences
from .special import _P1, _Q1

TWO_PI = 2.0 * np.pi
_TILE = (8, 128)
_PAD = _TILE[0] * _TILE[1]


def _poly_kernel(coeffs, x):
    acc = jnp.full_like(x, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * x + c
    return acc


def _make_kernel(n_ell: int):
    def kernel(xyrra_ref, gxu_ref, gyu_ref, inv_area_ref, sre_ref, sim_ref):
        gx = gxu_ref[:]
        gy = gyu_ref[:]
        inv_area = inv_area_ref[0]
        sre = jnp.zeros(_TILE, jnp.float32)
        sim = jnp.zeros(_TILE, jnp.float32)
        for e in range(n_ell):
            x0 = xyrra_ref[e, 0]
            y0 = xyrra_ref[e, 1]
            rx = xyrra_ref[e, 2]
            ry = xyrra_ref[e, 3]
            ang = xyrra_ref[e, 4]
            ca = jnp.cos(ang)
            sa = jnp.sin(ang)
            u1 = (gx * ca + gy * sa) * rx
            u2 = (-gx * sa + gy * ca) * ry
            x2 = u1 * u1 + u2 * u2
            small = x2 < 1e-12
            safe = jnp.where(small, 1.0, x2)
            # J1(x)/x via the |x|<8 rational fit (callers guarantee range)
            j1ox = _poly_kernel(_P1, safe) / _poly_kernel(_Q1, safe)
            j1ox = jnp.where(small, 0.5 - x2 / 16.0, j1ox)
            shape_ft = (TWO_PI * inv_area) * rx * ry * j1ox
            theta = gx * x0 + gy * y0
            sre = sre + shape_ft * jnp.cos(theta)
            sim = sim - shape_ft * jnp.sin(theta)
        sre_ref[:] = sre
        sim_ref[:] = sim
    return kernel


@functools.lru_cache(maxsize=64)
def _build_call(orders_key, n_ell: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orders = np.asarray(orders_key, dtype=np.int64).reshape(-1, 2)
    dmx_u, dmy_u, gather = _distinct_differences(orders)
    n_u = len(dmx_u)
    assert n_u <= _PAD, "order-difference set exceeds one VPU tile"
    dmx_pad = np.zeros(_PAD, np.float32)
    dmy_pad = np.zeros(_PAD, np.float32)
    dmx_pad[:n_u] = dmx_u
    dmy_pad[:n_u] = dmy_u

    kernel = _make_kernel(n_ell)

    def call(xyrra, grating_period, lateral_period):
        """xyrra (n_ell, 5) f32 -> flat structure C of shape (n_u,)."""
        gxu = (jnp.asarray(dmx_pad.reshape(_TILE))
               * (TWO_PI / grating_period).astype(jnp.float32))
        gyu = (jnp.asarray(dmy_pad.reshape(_TILE))
               * (TWO_PI / lateral_period).astype(jnp.float32))
        inv_area = (1.0 / (grating_period * lateral_period)
                    ).astype(jnp.float32).reshape(1)
        sre, sim = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct(_TILE, jnp.float32),
                       jax.ShapeDtypeStruct(_TILE, jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(xyrra.astype(jnp.float32), gxu, gyu, inv_area)
        return C(sre.reshape(-1)[:n_u], sim.reshape(-1)[:n_u]), gather

    return call


def ellipse_structure_toeplitz_pallas(orders, grating_period, lateral_period,
                                      xyrra, interpret: bool = False):
    """Drop-in (forward-only) replacement for
    :func:`metalens_tpu.solver.epsilon.ellipse_structure_toeplitz` computing
    the whole structure chain in one fused kernel.  Requires every Bessel
    argument < 8 (the small_u regime; see engine.small_u_ok)."""
    orders_key = tuple(map(tuple, np.asarray(orders).tolist()))
    xyrra = jnp.asarray(xyrra)
    call = _build_call(orders_key, int(xyrra.shape[0]), interpret)
    flat, gather = call(xyrra, jnp.asarray(grating_period),
                        jnp.asarray(lateral_period))
    idx = jnp.asarray(gather)
    dmx_u, dmy_u, _ = _distinct_differences(np.asarray(orders))
    at_zero_flat = jnp.asarray(((dmx_u == 0) & (dmy_u == 0))
                               .astype(np.float32))
    return C(flat.re[idx], flat.im[idx]), at_zero_flat[idx]
