"""Fused, group-interleaved batched complex inverse as a Pallas kernel.

Why this exists: after cpx.solve became the all-matmul block-recursive
inverse, the solve stage executes ~54 small (<=200) matmuls per matrix as
separate XLA ops -- each a full HBM round trip on operands that would fit
in VMEM ~30x over.  This kernel runs the SAME recursion (unpivoted 2x2
block elimination, Karatsuba products, float32-precision MXU passes)
entirely in VMEM: HBM traffic per matrix drops to one read of A and one
write of A^-1.

Grouping: kernel grid steps execute sequentially on the TensorCore, and
one matrix's recursion is a dependency chain of small matmuls that stalls
the MXU pipeline (measured 44us/inverse at P=128 however the base case is
tuned).  Each grid step therefore processes GROUP[P] matrices with every
primitive emitted stage-by-stage across the group (back-to-back
independent matmuls): 23us/inverse at P=128/G=8.  The group is bounded by
the 16MB v5e scoped-vmem limit (~1.1MB live per P=128 matrix).  Because
production code invokes the solve per cell under jax.vmap -- where
default pallas batching would pin one matrix per grid step -- the kernel
is entered through a jax.custom_batching.custom_vmap rule that sees the
whole batch at vmap time and dispatches the grouped call.

Shape contract: the complex matrix is padded up to the nearest usable
kernel size P (a multiple of 8 whose halving chain down to the
Gauss-Jordan base stays sublane-aligned -- see pad_size; 112 for the
production n=100, 224 for the characterize n=200) with an identity block
(inv(diag(A, I)) = diag(inv(A), I)), the kernel inverts the padded matrix
with a statically unrolled recursion P -> ... -> base and an unpivoted
Gauss-Jordan base case, and the caller slices the top-left n x n block
back out.  Stability contract is identical to
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

# Kernel tuning knobs.  These are DEFAULTS read once per inv_pallas
# dispatch and threaded through every cached builder as explicit cache-key
# arguments -- mutating them (bench.py --gj-base, bench_inv_kernel.py
# --passes/--group) takes effect on the next call instead of silently
# serving a stale lru-cached kernel (ADVICE r2).
#
# The Gauss-Jordan base is 56 so that the tight pad sizes 112 (production
# n=100) and 224 (characterize n=200) have a legal halving chain; GJ base
# size itself barely moves the needle (measured gj16/32/64 within 15%).
_GJ_BASE = 56
_HIGH = jax.lax.Precision.HIGHEST
_GROUP_OVERRIDE = None   # int to force matrices-per-grid-step (bench A/Bs)
# NEGATIVE result (round 4, removed -- code in git history): a rank-8
# BLOCKED Gauss-Jordan base (panel elimination + one MXU rank-pb update
# per block step, ~7x fewer elimination steps) measured whole-program
# SLOWER (numG=50 5065 vs 6411/s; numG=100 1915 vs 1977/s -- the K=8
# HIGHEST-precision MXU passes and tiny panel ops cost more issue slots
# than the rank-1 VPU broadcasts they replace) AND ~3 decimal digits
# less accurate on the large-dynamic-range slab-transfer class (pure
# f64 numpy: 2e-11 vs 2e-14 rel; f32 6e-3 vs 4e-6 on a cond-3e3 capture
# with |A|~2e3: the accumulated rank-8 products |G||S| ~ 1e4 cancel to
# O(1e3), where rank-1's immediately-applied updates keep intermediates
# small).


def _dot(a, b, prec):
    return jnp.dot(a, b, precision=prec,
                   preferred_element_type=jnp.float32)


def _cmul_multi(As, Bs, prec):
    """Karatsuba products of G independent pairs, INTERLEAVED: all first
    passes are emitted back to back, then all seconds, then all thirds.
    Each matrix's three products form a dependency-free run with the other
    matrices' -- the MXU pipeline stays fed instead of stalling on one
    matrix's chain (the measured per-instance floor of the G=1 kernel)."""
    t1 = [_dot(a[0], b[0], prec) for a, b in zip(As, Bs)]
    t2 = [_dot(a[1], b[1], prec) for a, b in zip(As, Bs)]
    t3 = [_dot(a[0] + a[1], b[0] + b[1], prec) for a, b in zip(As, Bs)]
    return [(x1 - x2, x3 - x1 - x2) for x1, x2, x3 in zip(t1, t2, t3)]


def _gj_multi(Ms, n):
    """G interleaved unpivoted Gauss-Jordan inverses of n x n complex
    matrices (values, not refs).  n is static and small; runs on the VPU.

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
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1))
    augs = []
    for ar, ai in Ms:
        augs.append((jnp.concatenate([ar, eye.astype(ar.dtype)], axis=1),
                     jnp.concatenate([ai, jnp.zeros((n, n), ar.dtype)],
                                     axis=1)))
    for k in range(n):
        ek = None
        nxt = []
        for Mr, Mi in augs:
            pr = Mr[k, k]
            pi = Mi[k, k]
            d = pr * pr + pi * pi
            cr = pr / d
            ci = -pi / d
            rowr = Mr[k:k + 1, :]
            rowi = Mi[k:k + 1, :]
            sr = rowr * cr - rowi * ci
            si = rowr * ci + rowi * cr
            if ek is None:
                ek = (rows == k).astype(Mr.dtype)
            gr = Mr[:, k:k + 1] - ek
            gi = Mi[:, k:k + 1]
            nxt.append((Mr - (gr * sr - gi * si), Mi - (gr * si + gi * sr)))
        augs = nxt
    return [(Mr[:, n:], Mi[:, n:]) for Mr, Mi in augs]





def _cinv_multi(As, size, gj_base, prec):
    """Statically unrolled block-recursive inverse of G independent
    matrices (values in VMEM), primitives interleaved across the G."""
    if size <= gj_base:
        return _gj_multi(As, size)
    m = size // 2
    A11 = [(ar[:m, :m], ai[:m, :m]) for ar, ai in As]
    A12 = [(ar[:m, m:], ai[:m, m:]) for ar, ai in As]
    A21 = [(ar[m:, :m], ai[m:, :m]) for ar, ai in As]
    A22 = [(ar[m:, m:], ai[m:, m:]) for ar, ai in As]
    I11 = _cinv_multi(A11, m, gj_base, prec)
    W = _cmul_multi(I11, A12, prec)
    T = _cmul_multi(A21, W, prec)
    SI = _cinv_multi([(a[0] - t[0], a[1] - t[1])
                      for a, t in zip(A22, T)], m, gj_base, prec)
    V = _cmul_multi(A21, I11, prec)
    SiV = _cmul_multi(SI, V, prec)
    U = _cmul_multi(W, SiV, prec)
    B12 = _cmul_multi(W, SI, prec)
    outs = []
    for i11, u, b12, siv, si in zip(I11, U, B12, SiV, SI):
        top_r = jnp.concatenate([i11[0] + u[0], -b12[0]], axis=1)
        top_i = jnp.concatenate([i11[1] + u[1], -b12[1]], axis=1)
        bot_r = jnp.concatenate([-siv[0], si[0]], axis=1)
        bot_i = jnp.concatenate([-siv[1], si[1]], axis=1)
        outs.append((jnp.concatenate([top_r, bot_r], axis=0),
                     jnp.concatenate([top_i, bot_i], axis=0)))
    return outs


def _inv_kernel(ar_ref, ai_ref, or_ref, oi_ref, *, P, G, gj_base, prec):
    outs = _cinv_multi([(ar_ref[g], ai_ref[g]) for g in range(G)], P,
                       gj_base, prec)
    for g, (wr, wi) in enumerate(outs):
        or_ref[g] = wr
        oi_ref[g] = wi


# matrices per kernel instance (grid step): interleaving G independent
# recursions hides the small-matmul dependency latency that floors the
# G=1 kernel at ~44us/inverse (P=128; G=8 measures 23us).  The group is
# VMEM-bounded: the v5e scoped-vmem limit is 16MB and the recursion's
# live set measures ~1.1MB per P=128 matrix (G=16 OOMs at 17.5MB),
# scaling with the matrix area -- so the picker scales the budget by
# (P/128)^2 instead of hardcoding per-size groups.
_LIVE_MB_P128 = 1.1
_VMEM_BUDGET_MB = 14.0
_MAX_GROUP = 16


def _pick_group(P: int, B: int, override=None) -> int:
    """Interleave group for a batch of B matrices.  Divisibility is NOT
    required: the vmap rule identity-pads the batch up to a multiple of
    the returned group (inverse of I is I; the pad is sliced off), so an
    odd production batch -- e.g. a 25- or 75-direction characterize sweep
    -- keeps the full group instead of silently falling to the ~2-4x
    slower G=1 kernel.  The group is only capped at the next power of two
    >= B so a tiny batch doesn't pad beyond itself."""
    if override:
        return max(1, override)
    # area scaling with a floor at the P=128 value: the compiler-reported
    # scoped allocation is 17.42MB for G=16 at P=112 and 17.5MB at P=128
    # (both ~1.09MB/matrix) -- below P~128 the live set bottoms out at the
    # gj-base augmented temporaries instead of shrinking with the matrix
    # area, so scaling down from 128 would overfill VMEM (measured OOM,
    # round 3).
    live = _LIVE_MB_P128 * max((P / 128.0) ** 2, 1.0)
    g = 1
    while (g < _MAX_GROUP and 2 * g * live <= _VMEM_BUDGET_MB
           and g < B):
        g *= 2
    return g


@functools.lru_cache(maxsize=32)
def _build_call(P: int, interpret: bool, G: int, gj_base: int, prec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((G, P, P), lambda b: (b, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)

    def call(ar, ai):
        B = ar.shape[0]
        return pl.pallas_call(
            functools.partial(_inv_kernel, P=P, G=G, gj_base=gj_base,
                              prec=prec),
            grid=(B // G,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, P, P), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=B * 6 * P ** 3, transcendentals=0,
                bytes_accessed=B * 4 * P * P * 4),
            interpret=interpret,
        )(ar, ai)
    return call


@functools.lru_cache(maxsize=16)
def _inv_core(P: int, interpret: bool, gj_base: int, prec, group=None):
    """Single-matrix (P, P) inverse with a CUSTOM VMAP RULE: production
    code calls the inverse per cell under jax.vmap, where the default
    pallas batching would lift to a G=1 grid (one matrix per grid step --
    the measured 44us/instance latency floor).  The rule sees the whole
    batch at vmap time and dispatches the GROUP-interleaved kernel."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def core(ar, ai):
        wr, wi = _build_call(P, interpret, 1, gj_base, prec)(ar[None],
                                                             ai[None])
        return wr[0], wi[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, ar, ai):
        ar = ar if in_batched[0] else jnp.broadcast_to(ar[None],
                                                       (axis_size, P, P))
        ai = ai if in_batched[1] else jnp.broadcast_to(ai[None],
                                                       (axis_size, P, P))
        G = _pick_group(P, axis_size, group)
        pad = (-axis_size) % G
        if pad:
            # identity-pad to a multiple of the group: same proven (P, G)
            # kernel, just more grid work -- still far cheaper than the
            # G=1 latency floor the old divisibility rule fell to
            ar = jnp.concatenate(
                [ar, jnp.broadcast_to(jnp.eye(P, dtype=ar.dtype),
                                      (pad, P, P))], axis=0)
            ai = jnp.concatenate(
                [ai, jnp.zeros((pad, P, P), ai.dtype)], axis=0)
        wr, wi = _build_call(P, interpret, G, gj_base, prec)(ar, ai)
        if pad:
            wr, wi = wr[:axis_size], wi[:axis_size]
        return (wr, wi), (True, True)

    return core


def _halving_ok(P: int, gj_base: int) -> bool:
    """A kernel size is usable iff every split in its halving chain down
    to the Gauss-Jordan base is a multiple of 8 (the f32 sublane): Mosaic
    rejects block concatenation at offsets that are not sublane-aligned
    ('result/input offset mismatch'), which rules out arbitrary multiples
    of 8 like 104 (-> 52 -> 26)."""
    while P > gj_base:
        if P % 16:          # the half must be a multiple of 8
            return False
        P //= 2
    return True


@functools.lru_cache(maxsize=None)
def _pad_size(n: int, gj_base: int):
    if n > 256:
        return None
    P = max(32, -(-n // 8) * 8)
    while not _halving_ok(P, gj_base):
        P += 8
    return P


def pad_size(n: int, gj_base=None):
    """Smallest usable padded kernel size >= n, or None if out of range.

    Padding to powers of two only (the first shipped version) wasted 2.1x
    FLOPs at n=200 (256^3 vs 200^3) and, worse, inflated the VMEM live set
    that caps the interleave group; with a base of 56 the usable sizes
    include 112 (for the production n=100) and 224 (for the
    characterize-grade n=200)."""
    return _pad_size(n, _GJ_BASE if gj_base is None else gj_base)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def inv_pallas(A: C, interpret: bool = False) -> C:
    """Inverse of a well-conditioned complex matrix (cpx C, n <= 256) via
    the fused VMEM kernel.  float32 only; pads to the nearest usable
    sublane-aligned size via :func:`pad_size` (112 for the production
    n=100, 224 for the characterize-grade n=200 at the default GJ base
    56)."""
    n = A.shape[-1]
    P = pad_size(n)
    if P is None:
        raise ValueError(
            f"inv_pallas supports n <= 256, got n = {n}; use "
            "cpx.solve_matmul / solve_embed for larger matrices")
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
    core = _inv_core(P, interpret, _GJ_BASE, _HIGH, _GROUP_OVERRIDE)
    if batched:
        wr, wi = jax.vmap(core)(ar, ai)       # rule -> grouped kernel
    else:
        wr, wi = core(ar[0], ai[0])           # engages the rule under an
        wr, wi = wr[None], wi[None]           # enclosing jax.vmap
    out = C(wr[:, :n, :n], wi[:, :n, :n])
    return out if batched else out[0]


def _inv_fwd(A, interpret):
    W = inv_pallas(A, interpret)
    return W, W


def _inv_bwd(interpret, W, Wbar):
    # holomorphic inverse: Abar = -W^H Wbar W^H (JAX complex convention)
    Wh = cpx.adjoint(W)
    G = cpx.promote(Wbar) if not isinstance(Wbar, C) else Wbar
    with jax.default_matmul_precision(cpx.SOLVE_PRECISION):
        Abar = -(Wh @ (G @ Wh))
    return (Abar,)


inv_pallas.defvjp(_inv_fwd, _inv_bwd)


def solve_pallas(A: C, B: C) -> C:
    """cpx.solve via the fused kernel: inv_pallas(A) @ B."""
    with jax.default_matmul_precision(cpx.SOLVE_PRECISION):
        return inv_pallas(A) @ B
