"""Fused batched complex inverse as a Pallas TPU kernel.

Why this exists: after cpx.solve became the all-matmul block-recursive
inverse, the solve stage executes ~54 small (<=200) matmuls per matrix as
separate XLA ops -- each a full HBM round trip on operands that would fit
in VMEM ~30x over.  This kernel runs the SAME recursion (unpivoted 2x2
block elimination, Karatsuba products, float32-precision MXU passes)
entirely in VMEM: HBM traffic per matrix drops to one read of A and one
write of A^-1.

Shape contract: the complex matrix is padded to P in {128, 256} with an
identity block (inv(diag(A, I)) = diag(inv(A), I)), the kernel inverts the
padded matrix with a statically unrolled recursion P -> ... -> 32 and an
unpivoted Gauss-Jordan base case at 32, and the caller slices the top-left
n x n block back out.  Stability contract is identical to
cpx.inv_blockrec (well-conditioned leading blocks -- the RCWA hot-path
matrices; pinned in tests/test_pallas_inv.py and test_cpx_solve.py).

Differentiation: matrix inverse is holomorphic, so the custom VJP is the
textbook Abar = -W^H Wbar W^H (W = A^-1), evaluated with the ordinary cpx
ops outside the kernel.

Reference role: this is the hot kernel the reference delegated to S4.exe's
closed-source eigensolver/linear algebra (SURVEY 3.1, grating.lua:139),
rebuilt as a TPU-native fused kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import cpx
from .cpx import C

_GJ_BASE = 32
_HIGH = jax.lax.Precision.HIGHEST


def _cmul(ar, ai, br, bi):
    """Karatsuba complex matmul at float32 MXU precision."""
    t1 = jnp.dot(ar, br, precision=_HIGH, preferred_element_type=jnp.float32)
    t2 = jnp.dot(ai, bi, precision=_HIGH, preferred_element_type=jnp.float32)
    t3 = jnp.dot(ar + ai, br + bi, precision=_HIGH,
                 preferred_element_type=jnp.float32)
    return t1 - t2, t3 - t1 - t2


def _gj_inverse(ar, ai, n):
    """Unpivoted Gauss-Jordan inverse of one n x n complex matrix (values,
    not refs).  n is static and small (32); runs on the VPU.

    The elimination is STATICALLY UNROLLED over the pivot index k, so every
    slice is static (Mosaic has no dynamic_slice of VMEM *values*, but
    static slices lower fine) and each step is a single fused rank-1
    broadcast update of the augmented [M | X]:

        M <- M - (f - e_k) s,   f = M[:, k],  s = M[k, :] / M[k, k]

    which both eliminates column k from every other row and writes the
    scaled pivot row in place (row k of M is pivot * s, so subtracting
    (pivot - 1) s leaves exactly s).  No iota masks, no reductions, no
    loop-carried fori state -- ~3x fewer VPU ops than the masked-reduction
    formulation this replaces (kept in git history)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(ar.dtype)
    Mr = jnp.concatenate([ar, eye], axis=1)
    Mi = jnp.concatenate([ai, jnp.zeros((n, n), ar.dtype)], axis=1)
    for k in range(n):
        pr = Mr[k, k]
        pi = Mi[k, k]
        d = pr * pr + pi * pi
        cr = pr / d
        ci = -pi / d
        rowr = Mr[k:k + 1, :]
        rowi = Mi[k:k + 1, :]
        sr = rowr * cr - rowi * ci          # s = row_k / pivot
        si = rowr * ci + rowi * cr
        ek = (rows == k).astype(ar.dtype)
        gr = Mr[:, k:k + 1] - ek            # f - e_k
        gi = Mi[:, k:k + 1]
        Mr = Mr - (gr * sr - gi * si)
        Mi = Mi - (gr * si + gi * sr)
    return Mr[:, n:], Mi[:, n:]


def _cinv(ar, ai, size):
    """Statically unrolled block-recursive inverse (values in VMEM)."""
    if size <= _GJ_BASE:
        return _gj_inverse(ar, ai, size)
    m = size // 2
    A11r, A11i = ar[:m, :m], ai[:m, :m]
    A12r, A12i = ar[:m, m:], ai[:m, m:]
    A21r, A21i = ar[m:, :m], ai[m:, :m]
    A22r, A22i = ar[m:, m:], ai[m:, m:]
    I11r, I11i = _cinv(A11r, A11i, m)
    Wr, Wi = _cmul(I11r, I11i, A12r, A12i)
    Tr, Ti = _cmul(A21r, A21i, Wr, Wi)
    SIr, SIi = _cinv(A22r - Tr, A22i - Ti, m)
    Vr, Vi = _cmul(A21r, A21i, I11r, I11i)
    SiVr, SiVi = _cmul(SIr, SIi, Vr, Vi)
    Ur, Ui = _cmul(Wr, Wi, SiVr, SiVi)
    B12r, B12i = _cmul(Wr, Wi, SIr, SIi)
    top_r = jnp.concatenate([I11r + Ur, -B12r], axis=1)
    top_i = jnp.concatenate([I11i + Ui, -B12i], axis=1)
    bot_r = jnp.concatenate([-SiVr, SIr], axis=1)
    bot_i = jnp.concatenate([-SiVi, SIi], axis=1)
    return (jnp.concatenate([top_r, bot_r], axis=0),
            jnp.concatenate([top_i, bot_i], axis=0))


def _inv_kernel(ar_ref, ai_ref, or_ref, oi_ref, *, P):
    wr, wi = _cinv(ar_ref[0], ai_ref[0], P)
    or_ref[0] = wr
    oi_ref[0] = wi


@functools.lru_cache(maxsize=8)
def _build_call(P: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((1, P, P), lambda b: (b, 0, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)

    def call(ar, ai):
        B = ar.shape[0]
        return pl.pallas_call(
            functools.partial(_inv_kernel, P=P),
            grid=(B,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, P, P), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=B * 6 * P ** 3, transcendentals=0,
                bytes_accessed=B * 4 * P * P * 4),
            interpret=interpret,
        )(ar, ai)
    return call


def pad_size(n: int):
    """Smallest supported padded size, or None if n is out of range."""
    for P in (128, 256):
        if n <= P:
            return P
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def inv_pallas(A: C, interpret: bool = False) -> C:
    """Inverse of a well-conditioned complex matrix (cpx C, n <= 256) via
    the fused VMEM kernel.  float32 only; pads to 128/256 internally."""
    n = A.shape[-1]
    P = pad_size(n)
    batched = A.ndim == 3
    ar = A.re if batched else A.re[None]
    ai = A.im if batched else A.im[None]
    B = ar.shape[0]
    if P != n:
        eye_tail = jnp.eye(P, dtype=ar.dtype)[n:]
        ar = jnp.concatenate([
            jnp.pad(ar, ((0, 0), (0, 0), (0, P - n))),
            jnp.broadcast_to(eye_tail, (B, P - n, P))], axis=1)
        ai = jnp.pad(ai, ((0, 0), (0, P - n), (0, P - n)))
    wr, wi = _build_call(P, interpret)(ar, ai)
    out = C(wr[:, :n, :n], wi[:, :n, :n])
    return out if batched else out[0]


def _inv_fwd(A, interpret):
    W = inv_pallas(A, interpret)
    return W, W


def _inv_bwd(interpret, W, Wbar):
    # holomorphic inverse: Abar = -W^H Wbar W^H (JAX complex convention)
    Wh = C(jnp.swapaxes(W.re, -1, -2), -jnp.swapaxes(W.im, -1, -2))
    G = cpx.promote(Wbar) if not isinstance(Wbar, C) else Wbar
    with jax.default_matmul_precision(cpx.SOLVE_PRECISION):
        Abar = -(Wh @ (G @ Wh))
    return (Abar,)


inv_pallas.defvjp(_inv_fwd, _inv_bwd)


def solve_pallas(A: C, B: C) -> C:
    """cpx.solve via the fused kernel: inv_pallas(A) @ B."""
    with jax.default_matmul_precision(cpx.SOLVE_PRECISION):
        return inv_pallas(A) @ B
