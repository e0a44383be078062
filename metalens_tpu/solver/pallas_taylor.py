"""Fused thin-slab Taylor series as a Pallas VMEM kernel.

The slab transfer blocks (rcwa.thin_slab_T_blocks) evaluate three matrix
polynomials sharing the powers of Y = t^2 F G by Paterson-Stockmeyer
chunking plus three wrapper products -- ~17 complex (~51 real) n=200
matmuls per cell as separate XLA ops.  The matmuls themselves are
MXU-sized, but each op is an HBM round trip on operands that fit VMEM
~30x over: at numG=100 b512 the stage ablates at ~49 ms against a ~16 ms
MXU-pass floor, i.e. it is HBM-traffic-bound exactly the way the solve
stage was before pallas_inv.

This kernel takes F, G and the three t-folded coefficient vectors, and
produces the four matrix factors

    CS  = sum_k cC_k t^{2k} Y0^k            (= T11)
    SF  = [sum_k cS_k t^{2k} Y0^k] F        (T12 = i t SF)
    GS  = G [sum_k cS_k t^{2k} Y0^k]        (T21 = i t GS)
    GRF = G [sum_k cR_k t^{2k} Y0^k] F      (T22 = I + t^2 GRF)

entirely in VMEM from one HBM read of (F, G): powers of the UNSCALED
Y0 = F G with the t^{2k} folded into the (SMEM) coefficient table -- the
same values as powers of the scaled Y, t being exact scalar factors --
so the traced scalar t never enters the kernel body.  The cheap scalar
wrappers (i t, t^2, + I) stay outside where XLA fuses them.

Grouping: unlike the inverse recursion (small-matmul dependency chains,
see pallas_inv), the polynomial's products are full P x P x P MXU work,
so the kernel is throughput- not latency-bound and runs one matrix per
grid step; its VMEM live set (Y0 powers + chunk accumulators + F, G +
four outputs) is ~10 MB at P = 224, which also rules out grouping.

Production entry is per-cell under jax.vmap (like the solve), so the
kernel is wrapped in a jax.custom_batching.custom_vmap rule that sees
the whole batch -- including a BATCHED coefficient table when the
program batches wavelengths jointly with directions (engine
characterize), where t varies across the batch.

Differentiation: the fused forward carries a custom VJP that REPLAYS the
plain XLA formulation under jax.vjp on the backward pass -- gradients are
only requested on the numG=50 design path (and in tests), where the
Taylor stage is ~5% of the program, while the characterize-grade forward
(numG=100, where the stage is ~20%) never differentiates.

Reference role: part of the eigensolver-free layer propagator replacing
S4.exe's closed eigendecomposition (SURVEY 3.1); the cos/sinc/R series
decomposition is rcwa.thin_slab_T_blocks' (rcwa.py:154).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from . import cpx
from .cpx import C

_HIGH = jax.lax.Precision.HIGHEST
# Default ON since round 4: whole-program measured on chip vs the XLA
# formulation at the same commit -- numG=50 b1024: 6411 -> 6924/7250
# best-of-windows (two runs), numG=100 b512 fff: 1977 -> 2234/2289 --
# with the bench.py accuracy guard green (operating-point f32 error vs
# committed f64 truth unchanged at ~2e-4).  bench.py --taylor-kernel
# forces it on when the default is off (A/B).
USE_PALLAS_TAYLOR = True


def _ps_split(d: int, n_poly: int = 3):
    """Paterson-Stockmeyer chunk size s and chunk count r minimizing
    (s-1) + n_poly*(r-1) matmuls for degree d (same rule as
    rcwa._shared_power_polys so the two paths do the identical
    computation)."""
    s_best, cost_best = 1, None
    for s in range(1, d + 2):
        r = -(-(d + 1) // s)
        cost = (s - 1) + n_poly * (r - 1)
        if cost_best is None or cost < cost_best:
            s_best, cost_best = s, cost
    return s_best, -(-(d + 1) // s_best)


def _cmul(a, b, prec):
    """Karatsuba complex product of two (re, im) VMEM values."""
    t1 = jnp.dot(a[0], b[0], precision=prec,
                 preferred_element_type=jnp.float32)
    t2 = jnp.dot(a[1], b[1], precision=prec,
                 preferred_element_type=jnp.float32)
    t3 = jnp.dot(a[0] + a[1], b[0] + b[1], precision=prec,
                 preferred_element_type=jnp.float32)
    return (t1 - t2, t3 - t1 - t2)


def _taylor_kernel(cf_ref, fr_ref, fi_ref, gr_ref, gi_ref,
                   csr, csi, sfr, sfi, gsr, gsi, grr, gri,
                   *, P, terms, prec):
    """One matrix per grid step: shared-power PS evaluation of the three
    series, then the F/G wrapper products, all in VMEM.  cf_ref is the
    per-step (1, 3, terms+1) SMEM coefficient block, t^{2k} folded in."""
    F = (fr_ref[0], fi_ref[0])
    G = (gr_ref[0], gi_ref[0])
    Y = _cmul(F, G, prec)
    s, _ = _ps_split(terms)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
           ).astype(jnp.float32)
    zero = jnp.zeros((P, P), jnp.float32)
    pows = [(eye, zero), Y]
    for _ in range(2, s + 1):
        pows.append(_cmul(pows[-1], Y, prec))
    X = pows[s]
    outs = []
    for p in range(3):
        chunks = []
        for j in range(0, terms + 1, s):
            hi = min(s, terms + 1 - j)
            br = pows[0][0] * cf_ref[0, p, j]
            bi = pows[0][1] * cf_ref[0, p, j]
            for i in range(1, hi):
                br = br + pows[i][0] * cf_ref[0, p, j + i]
                bi = bi + pows[i][1] * cf_ref[0, p, j + i]
            chunks.append((br, bi))
        acc = chunks[-1]
        for Bj in chunks[-2::-1]:
            ar, ai = _cmul(acc, X, prec)
            acc = (ar + Bj[0], ai + Bj[1])
        outs.append(acc)
    CS, SS, RS = outs
    csr[0], csi[0] = CS
    sf = _cmul(SS, F, prec)
    sfr[0], sfi[0] = sf
    gs = _cmul(G, SS, prec)
    gsr[0], gsi[0] = gs
    rf = _cmul(RS, F, prec)
    gr = _cmul(G, rf, prec)
    grr[0], gri[0] = gr


@functools.lru_cache(maxsize=16)
def _build_call(P: int, terms: int, interpret: bool, prec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mspec = pl.BlockSpec((1, P, P), lambda b: (b, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    cspec = pl.BlockSpec((1, 3, terms + 1), lambda b: (b, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.SMEM)
    s, r = _ps_split(terms)
    n_mm = 3 * ((s - 1) + 3 * (r - 1) + 5)

    def call(coeffs, fr, fi, gr, gi):
        B = fr.shape[0]
        return pl.pallas_call(
            functools.partial(_taylor_kernel, P=P, terms=terms, prec=prec),
            grid=(B,),
            in_specs=[cspec] + [mspec] * 4,
            out_specs=[mspec] * 8,
            out_shape=[jax.ShapeDtypeStruct((B, P, P), jnp.float32)] * 8,
            cost_estimate=pl.CostEstimate(
                flops=B * n_mm * 2 * P ** 3, transcendentals=0,
                bytes_accessed=B * 12 * P * P * 4),
            interpret=interpret,
        )(coeffs, fr, fi, gr, gi)
    return call


@functools.lru_cache(maxsize=16)
def _factors_core(P: int, terms: int, interpret: bool, prec):
    """Per-matrix entry with a custom vmap rule (same pattern as
    pallas_inv._inv_core): production code calls the slab series per cell
    under jax.vmap; the rule sees the whole batch and dispatches one
    grid=(B,) kernel.  The coefficient table may itself be batched (joint
    wavelength x direction programs vary t across the batch)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def core(coeffs, fr, fi, gr, gi):
        outs = _build_call(P, terms, interpret, prec)(
            coeffs[None], fr[None], fi[None], gr[None], gi[None])
        return tuple(o[0] for o in outs)

    @core.def_vmap
    def _rule(axis_size, in_batched, coeffs, fr, fi, gr, gi):
        def bcast(x, batched, shape):
            return x if batched else jnp.broadcast_to(x[None],
                                                      (axis_size,) + shape)
        coeffs = bcast(coeffs, in_batched[0], (3, terms + 1))
        fr = bcast(fr, in_batched[1], (P, P))
        fi = bcast(fi, in_batched[2], (P, P))
        gr = bcast(gr, in_batched[3], (P, P))
        gi = bcast(gi, in_batched[4], (P, P))
        outs = _build_call(P, terms, interpret, prec)(coeffs, fr, fi,
                                                      gr, gi)
        return tuple(outs), tuple([True] * 8)

    return core


def _coeff_table(t, terms: int):
    """(3, terms+1) array of cos/sinc/R series coefficients with t^{2k}
    folded in (t traced OK -- a tiny elementwise program)."""
    ks = np.arange(terms + 1)
    cC = np.array([(-1.0) ** k / math.factorial(2 * k) for k in ks])
    cS = np.array([(-1.0) ** k / math.factorial(2 * k + 1) for k in ks])
    cR = np.array([(-1.0) ** (k + 1) / math.factorial(2 * k + 2)
                   for k in ks])
    tp = jnp.asarray(t, jnp.float32) ** (2 * ks)
    return jnp.stack([jnp.asarray(cC, jnp.float32) * tp,
                      jnp.asarray(cS, jnp.float32) * tp,
                      jnp.asarray(cR, jnp.float32) * tp])


def _taylor_pad(n: int) -> int:
    """Smallest multiple of 8 >= n (no halving-chain constraint here --
    the kernel only multiplies; zero-padding is exact for every factor,
    the pad block of CS being c0 I which the caller slices off)."""
    return max(32, -(-n // 8) * 8)


def _pad(M: C, P: int) -> C:
    n = M.shape[-1]
    if n == P:
        return M
    w = [(0, 0)] * (M.ndim - 2) + [(0, P - n), (0, P - n)]
    return C(jnp.pad(M.re, w), jnp.pad(M.im, w))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def taylor_factors(F: C, G: C, t, terms: int, interpret: bool = False):
    """(CS, SF, GS, GRF) of the three shared-power slab series via the
    fused kernel.  Unbatched (n, n) -- call under jax.vmap for batches
    (the custom vmap rule dispatches one grid=(B,) kernel)."""
    n = F.shape[-1]
    P = _taylor_pad(n)
    Fp, Gp = _pad(F, P), _pad(G, P)
    coeffs = _coeff_table(t, terms)
    core = _factors_core(P, terms, interpret, _HIGH)
    outs = core(coeffs, Fp.re, Fp.im, Gp.re, Gp.im)
    return tuple(C(outs[2 * i][..., :n, :n], outs[2 * i + 1][..., :n, :n])
                 for i in range(4))


def xla_factors(F: C, G: C, t, terms: int):
    """The plain XLA formulation (identical math; the VJP replay and the
    ineligible-backend path)."""
    from . import rcwa
    I = cpx.eye(F.shape[-1], F.re.dtype)
    Y = (F @ G) * (t * t)
    ks = range(terms + 1)
    cC = [(-1.0) ** k / math.factorial(2 * k) for k in ks]
    cS = [(-1.0) ** k / math.factorial(2 * k + 1) for k in ks]
    cR = [(-1.0) ** (k + 1) / math.factorial(2 * k + 2) for k in ks]
    CS, SS, RS = rcwa._shared_power_polys(Y, I, [cC, cS, cR])
    return CS, SS @ F, G @ SS, G @ (RS @ F)


def _taylor_fwd(F, G, t, terms, interpret):
    return taylor_factors(F, G, t, terms, interpret), (F, G, t)


def _taylor_bwd(terms, interpret, res, cts):
    F, G, t = res
    _, vjp = jax.vjp(lambda f, g, tt: xla_factors(f, g, tt, terms),
                     F, G, t)
    return vjp(tuple(cts))


taylor_factors.defvjp(_taylor_fwd, _taylor_bwd)


def eligible(F: C) -> bool:
    """Fused-Taylor routing: the knob plus the same backend/dtype/size
    gates as the Pallas solve (cpx._pallas_eligible)."""
    return USE_PALLAS_TAYLOR and cpx._pallas_eligible(F)
