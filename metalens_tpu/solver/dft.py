"""Fourier transforms as MXU matmuls.

The TPU backend exposes no FFT (and no complex dtypes), so spectral
transforms are computed as dense DFT matmuls in the cpx real-pair
representation -- which is genuinely TPU-idiomatic: a 4096-point DFT matrix
applied to a 4096-row field is exactly the kind of large real matmul the MXU
is built for, and XLA overlaps the two axis passes.

For sizes above ``DIRECT_LIMIT`` the classic four-step (Cooley-Tukey
N = N1*N2) decomposition is applied recursively: DFT along one factor,
twiddle multiply, DFT along the other, index transpose -- every step still a
matmul or an elementwise multiply.  Aperture grids are 5-smooth
(:func:`metalens_tpu.geometry.good_fft_number`), so factors stay balanced.

Conventions match numpy.fft: fft uses e^{-2 pi i jk/N}.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp
from jax import core as jax_core

from . import cpx
from .cpx import C

DIRECT_LIMIT = 4096

_DEV_CACHE_MAX = 4
_DFT_MAT_CACHE: OrderedDict = OrderedDict()
_TWIDDLE_CACHE: OrderedDict = OrderedDict()


@functools.lru_cache(maxsize=64)
def _dft_factors(n: int):
    """Factor n into (n1, n2), n1*n2 = n, n1 <= sqrt(n), as balanced as
    possible (n2 may still exceed DIRECT_LIMIT -- the recursion splits it
    again).  Returns None if n <= DIRECT_LIMIT (direct matmul)."""
    if n <= DIRECT_LIMIT:
        return None
    best = None
    for n1 in range(int(np.sqrt(n)), 1, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    assert best is not None, f"cannot factor DFT size {n}"
    return best


@functools.lru_cache(maxsize=64)
def _dft_matrix_np(n: int):
    j = np.arange(n)
    ang = -2.0 * np.pi / n * np.outer(j, j)
    return np.cos(ang), np.sin(ang)


def _dev_cached(cache: "OrderedDict", key, np_pair, dtype_str: str) -> C:
    """Device-resident constant with a tiny manual LRU.  Without this every
    EAGER dft call re-uploads the full n x n cos/sin pair (~66 MB at n=2025
    f64) host to device -- the dominant cost of the convenience farfield()
    path over the remote tunnel.  Must NOT be an lru_cache: inside a jit /
    shard_map trace jnp.asarray returns a Tracer, and caching that poisons
    every later call (UnexpectedTracerError) -- so tracer results are
    returned uncached (under jit the matrix is a trace-time constant
    anyway).  Size stays tiny: one n=4096 f64 entry is ~268 MB of HBM; a
    farfield call touches two sizes."""
    hit = cache.get((key, dtype_str))
    if hit is not None:
        cache.move_to_end((key, dtype_str))
        return hit
    out = C(jnp.asarray(np_pair[0], dtype_str), jnp.asarray(np_pair[1], dtype_str))
    if not isinstance(out.re, jax_core.Tracer):
        cache[(key, dtype_str)] = out
        while len(cache) > _DEV_CACHE_MAX:
            cache.popitem(last=False)
    return out


def _dft_mat(n: int, rdtype) -> C:
    return _dev_cached(_DFT_MAT_CACHE, n, _dft_matrix_np(n),
                       np.dtype(rdtype).name)


@functools.lru_cache(maxsize=64)
def _twiddle_np(n1: int, n2: int):
    j1 = np.arange(n1)
    k2 = np.arange(n2)
    ang = -2.0 * np.pi / (n1 * n2) * np.outer(j1, k2)
    return np.cos(ang), np.sin(ang)


def _twiddle_dev(n1: int, n2: int, dtype_str: str) -> C:
    return _dev_cached(_TWIDDLE_CACHE, (n1, n2), _twiddle_np(n1, n2),
                       dtype_str)


def dft_axis0(x: C) -> C:
    """DFT along axis 0 of a C array of shape (n, ...)."""
    n = x.shape[0]
    rdtype = x.re.dtype
    fac = _dft_factors(n)
    if fac is None:
        return _dft_mat(n, rdtype) @ x
    n1, n2 = fac
    rest = x.shape[1:]
    # x[j] with j = j1*n2 + j2  ->  X[k] with k = k1 + n1*k2
    y = x.reshape((n1, n2) + rest)
    # DFT over j1 (axis 0, length n1)
    y = dft_axis0(y.reshape((n1, -1))).reshape((n1, n2) + rest)
    # twiddle e^{-2pi i k1 j2 / n}; (k1, j2) axes are (0, 1)
    tw = _twiddle_dev(n1, n2, np.dtype(rdtype).name)
    extra = (1,) * len(rest)
    y = y * tw.reshape((n1, n2) + extra)
    # DFT over j2 (axis 1, length n2): move to front
    y = C(jnp.moveaxis(y.re, 1, 0), jnp.moveaxis(y.im, 1, 0))
    y = dft_axis0(y.reshape((n2, -1))).reshape((n2, n1) + rest)
    # output index k = k1 + n1*k2: axes currently (k2, k1) -> flatten in
    # order (k2 slow, k1 fast)? k = k1 + n1 k2 means k1 fast -> order
    # (k2, k1) flattened C-style gives index k2*n1 + k1 = k.  Correct.
    return y.reshape((n,) + rest)


def fft2(x: C) -> C:
    """2-D DFT of a C matrix (both axes), numpy fft2 convention."""
    x = dft_axis0(x)
    xt = C(x.re.T, x.im.T)
    xt = dft_axis0(xt)
    return C(xt.re.T, xt.im.T)


def fftshift(x: C, axes=(0, 1)) -> C:
    re, im = x.re, x.im
    for ax in np.atleast_1d(axes):
        sh = x.shape[ax] // 2
        re = jnp.roll(re, sh, axis=ax)
        im = jnp.roll(im, sh, axis=ax)
    return C(re, im)
