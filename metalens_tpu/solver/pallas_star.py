"""Fused star-product doubling as a Pallas TPU kernel.

After the fused inverse (:mod:`pallas_inv`) removed the solve's HBM
round trips, the remaining hot-loop traffic is the ~5 complex (15 real)
matmuls *around* each doubling solve in
:func:`rcwa.redheffer_star_self_symmetric`, each a separate XLA op that
reads and writes its n2 x n2 operands through HBM.  This kernel runs the
ENTIRE doubling loop -- all K = log2(n_slabs) iterations of the
mirror-symmetric Redheffer star, inverse included -- inside VMEM: HBM
traffic for the whole layer-assembly stage drops to one read of
(s11, s12) and one write of the doubled pair, regardless of K.

The per-iteration math is exactly rcwa.redheffer_star_self_symmetric
(pinned by tests/test_pallas_star.py against the XLA loop):

    X0   = (I - s12 s12)^-1          (fused block-recursive inverse)
    s11' = s11 X0 s11
    s12' = s12 + s11 X0 s12 s11

Shape contract: pad to P in {128, 256} with ZEROS in both blocks -- the
pad rows/cols of I - s12^2 are then exactly the identity (invertible) and
propagate zeros through every product, so the top-left n2 x n2 block of
the result is exact.  Stability contract is rcwa's own: the doubling runs
in the lossy EPS_REF basis, which bounds the conditioning of I - s12^2
and of every leading block inside the inverse recursion.

Differentiation: custom VJP that replays the (differentiable) XLA
doubling chain under ``jax.vjp`` -- same FLOPs as the pre-fusion forward,
and its inner solves still dispatch to the fused inverse kernel.

Reference role: the hot S-matrix assembly the reference delegated to
S4.exe's closed eigensolver path (SURVEY 3.1, grating.lua:139), rebuilt
as a TPU-native fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import cpx
from .cpx import C
from .pallas_inv import _cinv, _cmul, pad_size


def _double_kernel(s11r_ref, s11i_ref, s12r_ref, s12i_ref,
                   o11r_ref, o11i_ref, o12r_ref, o12i_ref, *, P, K):
    ar, ai = s11r_ref[0], s11i_ref[0]
    br, bi = s12r_ref[0], s12i_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (rows == cols).astype(ar.dtype)
    for _ in range(K):
        pr, pi = _cmul(br, bi, br, bi)                 # s12 @ s12
        wr, wi = _cinv(eye - pr, -pi, P)               # X0
        x11r, x11i = _cmul(wr, wi, ar, ai)             # X0 s11
        tr, ti = _cmul(br, bi, ar, ai)                 # s12 s11
        x12r, x12i = _cmul(wr, wi, tr, ti)             # X0 s12 s11
        n11r, n11i = _cmul(ar, ai, x11r, x11i)         # s11 X0 s11
        ur, ui = _cmul(ar, ai, x12r, x12i)             # s11 X0 s12 s11
        br, bi = br + ur, bi + ui
        ar, ai = n11r, n11i
    o11r_ref[0] = ar
    o11i_ref[0] = ai
    o12r_ref[0] = br
    o12i_ref[0] = bi


@functools.lru_cache(maxsize=16)
def _build_call(P: int, K: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((1, P, P), lambda b: (b, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)

    def call(s11r, s11i, s12r, s12i):
        B = s11r.shape[0]
        return pl.pallas_call(
            functools.partial(_double_kernel, P=P, K=K),
            grid=(B,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((B, P, P), jnp.float32)] * 4,
            cost_estimate=pl.CostEstimate(
                flops=B * K * 21 * P ** 3, transcendentals=0,
                bytes_accessed=B * 8 * P * P * 4),
            interpret=interpret,
        )(s11r, s11i, s12r, s12i)
    return call


def _double_xla(s11: C, s12: C, K: int):
    """Reference XLA chain (identical math; used for the VJP replay and as
    the test pin).  Matches rcwa.redheffer_star_self_symmetric iterated K
    times, with the two X-applications as one concatenated solve."""
    n2 = s11.shape[-1]
    I = cpx.eye(n2, s11.re.dtype)
    for _ in range(K):
        X = cpx.solve(I - s12 @ s12,
                      cpx.concatenate([s11, s12 @ s11], axis=-1))
        s11, s12 = s11 @ X[..., :n2], s12 + s11 @ X[..., n2:]
    return s11, s12


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def double_sym_pallas(s11: C, s12: C, K: int, interpret: bool = False):
    """K mirror-symmetric star doublings of (s11, s12) fused in VMEM.
    float32 only, n2 <= 256; returns the doubled (s11, s12)."""
    n2 = s11.shape[-1]
    P = pad_size(n2)
    batched = s11.ndim == 3
    parts = [x if batched else x[None]
             for x in (s11.re, s11.im, s12.re, s12.im)]
    if P != n2:
        pad = ((0, 0), (0, P - n2), (0, P - n2))
        parts = [jnp.pad(x, pad) for x in parts]
    o11r, o11i, o12r, o12i = _build_call(P, K, interpret)(*parts)
    out11 = C(o11r[:, :n2, :n2], o11i[:, :n2, :n2])
    out12 = C(o12r[:, :n2, :n2], o12i[:, :n2, :n2])
    if not batched:
        out11, out12 = out11[0], out12[0]
    return out11, out12


def _double_fwd(s11, s12, K, interpret):
    return double_sym_pallas(s11, s12, K, interpret), (s11, s12)


def _double_bwd(K, interpret, res, cots):
    s11, s12 = res
    _, vjp = jax.vjp(lambda a, b: _double_xla(a, b, K), s11, s12)
    return vjp(cots)


double_sym_pallas.defvjp(_double_fwd, _double_bwd)
