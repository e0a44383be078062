"""Complex arithmetic as real pairs -- the TPU numeric substrate.

The TPU backend exposes no complex dtypes at all (every op touching
complex64 fails at runtime), so the entire compute path represents a complex
array as a pair of real arrays.  This is not merely a workaround: the
explicit representation maps complex matmuls onto exactly three real MXU
matmuls (Karatsuba), and linear solves onto the real 2n-embedding handled by
the TPU's QR/Cholesky, with none of XLA's complex-decomposition overhead.

`C(re, im)` is a registered pytree with operator overloading, so solver code
reads like complex math:

    Y = (F @ G) * (t * t)
    T12 = (S @ F) * 1j * t
    Einv = cho_solve_hermitian(E, eye_like(E))

Conventions: `C * z` accepts real scalars/arrays and python complex
scalars.  `abs2` is |.|^2.  `csqrt_posim` is the sqrt branch with Im >= 0
(the physical evanescent-decay branch used for kz).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class C(NamedTuple):
    re: jnp.ndarray
    im: jnp.ndarray

    # Refuse numpy ufunc dispatch: without this, a numpy array/scalar on
    # the LEFT of an operator treats the NamedTuple as a (2, ...) sequence
    # and silently returns a stacked ndarray with the real operand applied
    # to BOTH re and im (verified: np.array([10.]) + C(re, im) added 10 to
    # the imaginary part).  None makes numpy return NotImplemented so
    # Python falls back to the correct reflected C methods.
    __array_ufunc__ = None

    # ----- shape/indexing -----
    @property
    def shape(self):
        return jnp.shape(self.re)

    @property
    def ndim(self):
        return jnp.ndim(self.re)

    @property
    def T(self):
        """Matrix transpose: swaps the last two axes (leading batch axes
        untouched; same as a full transpose for 2-D, no-op for <2-D)."""
        if self.ndim < 2:
            return self
        return C(jnp.swapaxes(self.re, -1, -2), jnp.swapaxes(self.im, -1, -2))

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    def reshape(self, *shape):
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, rdtype):
        return C(self.re.astype(rdtype), self.im.astype(rdtype))

    def conj(self):
        return C(self.re, -self.im)

    def sum(self, axis=None, **kw):
        return C(self.re.sum(axis=axis, **kw), self.im.sum(axis=axis, **kw))

    # ----- arithmetic -----
    def __neg__(self):
        return C(-self.re, -self.im)

    def __add__(self, other):
        o = promote(other)
        return C(self.re + o.re, self.im + o.im)

    __radd__ = __add__

    def __sub__(self, other):
        o = promote(other)
        return C(self.re - o.re, self.im - o.im)

    def __rsub__(self, other):
        return promote(other) - self

    def __mul__(self, other):
        if isinstance(other, C):
            return C(self.re * other.re - self.im * other.im,
                     self.re * other.im + self.im * other.re)
        if isinstance(other, complex):
            return C(self.re * other.real - self.im * other.imag,
                     self.re * other.imag + self.im * other.real)
        if np.iscomplexobj(other):
            return self * promote(other)
        return C(self.re * other, self.im * other)   # real scalar/array

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, C):
            d = other.re * other.re + other.im * other.im
            return C((self.re * other.re + self.im * other.im) / d,
                     (self.im * other.re - self.re * other.im) / d)
        if isinstance(other, complex):
            return self * (1.0 / other)
        if np.iscomplexobj(other):
            return self / promote(other)
        return C(self.re / other, self.im / other)

    def __rtruediv__(self, other):
        return promote(other) / self

    def __matmul__(self, other):
        return matmul(self, promote(other))

    def __rmatmul__(self, other):
        return matmul(promote(other), self)


def promote(x) -> C:
    """Lift real arrays / python scalars / complex arrays to C.  (Complex
    *device* arrays only exist on backends that support them, i.e. CPU; on
    TPU complex data enters via :func:`from_np` or stays in C form.)"""
    if isinstance(x, C):
        return x
    if isinstance(x, complex):
        return C(jnp.asarray(x.real), jnp.asarray(x.imag))
    if isinstance(x, jnp.ndarray):
        if jnp.iscomplexobj(x):
            return C(jnp.real(x), jnp.imag(x))
        return C(x, jnp.zeros_like(x))
    x_np = np.asarray(x)
    if np.iscomplexobj(x_np):
        return from_np(x_np)
    arr = jnp.asarray(x_np)
    return C(arr, jnp.zeros_like(arr))


def from_np(x) -> C:
    x = np.asarray(x)
    return C(jnp.asarray(np.ascontiguousarray(x.real)),
             jnp.asarray(np.ascontiguousarray(x.imag)))


def to_np(c: C) -> np.ndarray:
    """Materialize to a host numpy complex array."""
    return np.asarray(c.re) + 1j * np.asarray(c.im)


def zeros(shape, rdtype=None) -> C:
    rdtype = rdtype or jnp.zeros(0).dtype
    return C(jnp.zeros(shape, rdtype), jnp.zeros(shape, rdtype))


def eye(n, rdtype=None) -> C:
    rdtype = rdtype or jnp.zeros(0).dtype
    return C(jnp.eye(n, dtype=rdtype), jnp.zeros((n, n), rdtype))


# Precision of every cpx matmul.  TPU f32 matmuls default to bf16 inputs
# (8 mantissa bits); across the solver's assembly chain (Taylor powers,
# star products) that compounds to a ~3e-2 absolute error floor on O(1)
# S-matrix amplitudes vs f64 truth -- measured on chip, where forcing f32
# passes cost 0-3% whole-program (the small batched matmuls are
# bandwidth/latency-bound, so the extra MXU passes are free).
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def matmul(a: C, b: C) -> C:
    """Karatsuba complex matmul: 3 real matmuls instead of 4, at
    MATMUL_PRECISION (see note above)."""
    t1 = jnp.matmul(a.re, b.re, precision=MATMUL_PRECISION)
    t2 = jnp.matmul(a.im, b.im, precision=MATMUL_PRECISION)
    t3 = jnp.matmul(a.re + a.im, b.re + b.im, precision=MATMUL_PRECISION)
    return C(t1 - t2, t3 - t1 - t2)


def abs2(c: C):
    return c.re * c.re + c.im * c.im

def cabs(c: C):
    return jnp.sqrt(abs2(c))


def exp(c: C) -> C:
    m = jnp.exp(c.re)
    return C(m * jnp.cos(c.im), m * jnp.sin(c.im))


def expi(theta) -> C:
    """e^{i theta} for real theta."""
    return C(jnp.cos(theta), jnp.sin(theta))


def csqrt_posim(c: C) -> C:
    """Principal-physical sqrt with Im >= 0: for real positive input gives
    +sqrt, for real negative gives +i sqrt|.| (evanescent decay along +z)."""
    r = cabs(c)
    re = jnp.sqrt(jnp.maximum((r + c.re) / 2, 0.0))
    im = jnp.sqrt(jnp.maximum((r - c.re) / 2, 0.0))
    # sign of Im: principal sqrt has sign(im_out) = sign(im_in); flip the
    # whole result when that lands in the lower half plane
    flip = c.im < 0
    re = jnp.where(flip, -re, re)
    return C(re, im)


def diag(v: C) -> C:
    return C(jnp.diag(v.re), jnp.diag(v.im))


def stack(cs, axis=0) -> C:
    return C(jnp.stack([c.re for c in cs], axis),
             jnp.stack([c.im for c in cs], axis))


def concatenate(cs, axis=0) -> C:
    return C(jnp.concatenate([c.re for c in cs], axis),
             jnp.concatenate([c.im for c in cs], axis))


def where(mask, a: C, b: C) -> C:
    return C(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))


# ----- linear solves via the real 2n-embedding -----

def _embed(A: C):
    return jnp.block([[A.re, -A.im], [A.im, A.re]])


def solve_embed(A: C, B: C) -> C:
    """Solve A X = B for general complex A via partial-pivoted LU on the
    full real 2n-embedding (backward stable regardless of the conditioning
    of Re(A); the reference implementation that :func:`solve` is checked
    against)."""
    n = A.re.shape[0]
    M = _embed(A)
    rhs = jnp.concatenate([B.re, B.im], axis=0)
    sol = jnp.linalg.solve(M, rhs)
    return C(sol[:n], sol[n:])


# Matmul precision for the solve kernels.  TPU f32 matmuls default to
# bf16 inputs (8 mantissa bits): harmless for single products in the layer
# assembly, but solve-internal products (Schur complements, block
# recursions) amplify it -- measured 6.9e-3 absolute error on an n=200
# solve via solve_schur at default precision vs 2.8e-6 with f32-precision
# products (see CLAUDE.md).  'float32' = exact f32; 'bfloat16_3x' = 3-pass
# compensated bf16 (~f32 class, 2x cheaper).
SOLVE_PRECISION = "float32"


def solve_schur(A: C, B: C) -> C:
    """Solve A X = B via block elimination of the real 2n-embedding.

    With A = R + iI, the embedding [[R, -I], [I, R]] is eliminated through
    its (1,1) block: factor R, form the Schur complement S = R + I R^-1 I,
    factor S, then

        Xi = S^-1 (Bi - I R^-1 Br),   Xr = R^-1 Br + (R^-1 I) Xi.

    Two real n x n LUs instead of one (2n)^3 LU -- 4x fewer factorization
    FLOPs -- with the remaining work as triangular solves and plain matmuls
    (nearly free on the MXU).  Caveat: stability additionally requires Re(A)
    to be well-conditioned, which every solve on the RCWA hot path satisfies
    by construction (pinned by tests/test_star_specializations.py against
    :func:`solve_embed` across the design domain, incl. grazing orders):
    the lossy ``rcwa.EPS_REF`` doubling basis keeps the star and conversion
    matrices I-dominant-real, and the Toeplitz eps has SPD real part.  For
    matrices without that structure use :func:`solve_embed`."""
    from jax.scipy.linalg import lu_factor, lu_solve
    with jax.default_matmul_precision(SOLVE_PRECISION):
        R, Im = A.re, A.im
        fR = lu_factor(R)
        W = lu_solve(fR, Im)                 # R^-1 I
        S = R + Im @ W
        fS = lu_factor(S)
        u = lu_solve(fR, B.re)               # R^-1 Br
        Xi = lu_solve(fS, B.im - Im @ u)
        return C(u + W @ Xi, Xi)


def inv_blockrec(A: C, base: int = 64) -> C:
    """Explicit inverse of a well-conditioned complex matrix by UNPIVOTED
    recursive 2x2 block elimination -- every flop is a (Karatsuba) matmul,
    so the whole inversion runs at MXU throughput instead of the
    triangular-substitution rate that dominates LU-based solves on TPU.

        A = [[A11, A12], [A21, A22]],  S = A22 - A21 A11^-1 A12,
        A^-1 = [[A11^-1 + W Si V, -W Si], [-Si V, Si]],
        W = A11^-1 A12,  V = A21 A11^-1,  Si = S^-1.

    6 complex (18 real) half-size matmuls + 2 half-size recursive inversions
    per level; blocks of size <= ``base`` fall back to :func:`solve`.

    Stability caveat (same class as :func:`solve_schur`): no pivoting means
    the leading principal blocks must be well-conditioned, which the RCWA
    hot-path matrices (I-dominant stars in the lossy reference basis, SPD-
    real-part Toeplitz eps) satisfy by construction; pinned against
    :func:`solve_embed` across the design domain in tests/test_cpx_solve.py.

    All matmuls inside run at float32 precision (not the TPU's default
    bf16-input mode): the recursion chains products through two Schur
    levels, and bf16's 8 mantissa bits compound to O(0.3) absolute error on
    O(1) S-matrix entries (measured) -- the 3-pass f32 emulation costs ~3x
    on ops that are far from the bottleneck and restores the normal f32
    error envelope.
    """
    if A.ndim != 2:
        raise ValueError(
            f"inv_blockrec expects a 2-D matrix, got shape {A.shape}; "
            "use jax.vmap for batches (the Pallas TPU path accepts a "
            "leading batch axis, this XLA fallback does not)")
    n = A.shape[0]
    if n <= base:
        return solve_schur(A, eye(n, A.re.dtype))
    with jax.default_matmul_precision(SOLVE_PRECISION):
        m = n // 2
        A11, A12 = A[:m, :m], A[:m, m:]
        A21, A22 = A[m:, :m], A[m:, m:]
        A11i = inv_blockrec(A11, base)
        W = A11i @ A12
        V = A21 @ A11i
        Si = inv_blockrec(A22 - A21 @ W, base)
        SiV = Si @ V
        top = concatenate([A11i + W @ SiV, -(W @ Si)], axis=1)
        bot = concatenate([-SiV, Si], axis=1)
        return concatenate([top, bot], axis=0)


def adjoint(A: C) -> C:
    """Conjugate transpose of the last two axes (batch axes untouched;
    plain .T on a (B, n, n) stack would transpose the batch axis into the
    matrix and, when B == n, produce silently wrong values downstream)."""
    return C(jnp.swapaxes(A.re, -1, -2), -jnp.swapaxes(A.im, -1, -2))


def inv_blockrec_hermitian(A: C, base: int = 64) -> C:
    """:func:`inv_blockrec` specialized to Hermitian positive-definite A:
    A21 = A12^H and Schur complements stay HPD (so the unpivoted recursion
    is unconditionally stable, same certificate as Cholesky), and symmetry
    yields V = W^H and B12 = -(Si W^H)^H for free -- 4 matmuls per level
    instead of 6."""
    n = A.shape[0]
    if n <= base:
        return cho_solve_hermitian_schur(A, eye(n, A.re.dtype))
    with jax.default_matmul_precision(SOLVE_PRECISION):
        m = n // 2
        A11, A12, A22 = A[:m, :m], A[:m, m:], A[m:, m:]
        A11i = inv_blockrec_hermitian(A11, base)
        W = A11i @ A12
        Si = inv_blockrec_hermitian(A22 - adjoint(A12) @ W, base)
        SiWh = Si @ adjoint(W)
        top = concatenate([A11i + W @ SiWh, -adjoint(SiWh)], axis=1)
        bot = concatenate([-SiWh, Si], axis=1)
        return concatenate([top, bot], axis=0)


def cho_solve_hermitian_matmul(A: C, B: C) -> C:
    """Hermitian-PD solve as inv_blockrec_hermitian(A) @ B (all-matmul
    alternative to :func:`cho_solve_hermitian`)."""
    with jax.default_matmul_precision(SOLVE_PRECISION):
        return inv_blockrec_hermitian(A) @ B


def solve_matmul(A: C, B: C) -> C:
    """Solve A X = B as inv_blockrec(A) @ B: trades LU's backward stability
    for all-matmul execution (see :func:`inv_blockrec` for when that's
    sound).  Wins whenever the RHS is wide, which every hot-path star /
    conversion solve is (RHS width n..2n)."""
    with jax.default_matmul_precision(SOLVE_PRECISION):
        return inv_blockrec(A) @ B


# Use the fused Pallas inverse kernel for hot-path solves on TPU-class
# backends (f32, n <= 256).  Measured whole-program wins over the XLA
# block recursion: numG=100 718 -> 935 solves/s, numG=50 2219 -> 2610
# (the kernel keeps the entire recursion in VMEM: one HBM read of A and
# one write of A^-1 instead of ~54 separate matmul round trips).
USE_PALLAS_SOLVE = True


def _pallas_eligible(A: C) -> bool:
    """Route this solve to the TPU Pallas kernel?  Decided from the
    process-wide default backend plus a best-effort check of
    jax.default_device -- a trace placed on CPU via
    ``jax.default_device(cpu_dev)`` on a TPU-default process falls back to
    the XLA recursion.  Not detectable here: per-call ``jit(...,
    backend='cpu')`` / explicit device_put placement; for full CPU runs set
    ``jax.config.update('jax_platforms', 'cpu')`` (what tests/conftest.py
    does) rather than per-call placement."""
    if not USE_PALLAS_SOLVE or A.re.dtype != jnp.float32:
        return False
    n = A.shape[-1]
    if not (32 < n <= 256):
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
        dd = jax.config.jax_default_device
        # jax.default_device accepts a Device OR a platform string/object
        # ('cpu'); cover both forms
        if dd is not None and (getattr(dd, "platform", None) == "cpu"
                               or str(dd).lower().startswith("cpu")):
            return False
        return True
    except RuntimeError:
        return False


def solve(A: C, B: C) -> C:
    """Solve A X = B for general complex A.  Hot-path default: the
    unpivoted block-recursive explicit inverse applied by matmul -- all
    MXU work, no triangular substitution -- as the fused Pallas VMEM
    kernel on TPU-class backends (f32, n <= 256) and as the XLA recursion
    (:func:`solve_matmul`) elsewhere.  With SOLVE_PRECISION products this
    is also the most accurate f32 route (2.8e-6 vs solve_schur's
    bf16-polluted 6.9e-3 on an n=200 probe).  Requires the
    well-conditioned-blocks contract (see :func:`inv_blockrec`); use
    :func:`solve_embed` outside it."""
    if _pallas_eligible(A):
        from .pallas_inv import solve_pallas
        return solve_pallas(A, B)
    return solve_matmul(A, B)


def qr_solve(A: C, B: C) -> C:
    """Solve A X = B for general complex A via QR on the real embedding
    (kept as an alternative to :func:`solve` for conditioning studies)."""
    n = A.re.shape[0]
    with jax.default_matmul_precision(SOLVE_PRECISION):
        M = _embed(A)
        rhs = jnp.concatenate([B.re, B.im], axis=0)
        Q, R = jnp.linalg.qr(M)
        sol = jax.lax.linalg.triangular_solve(R, Q.T @ rhs, left_side=True,
                                              lower=False)
    return C(sol[:n], sol[n:])


def cho_solve_hermitian_embed(A: C, B: C) -> C:
    """Solve A X = B for Hermitian positive-definite A via one Cholesky of
    the full real 2n-embedding (which is symmetric positive definite)."""
    n = A.re.shape[0]
    M = _embed(A)
    rhs = jnp.concatenate([B.re, B.im], axis=0)
    L = jnp.linalg.cholesky(M)
    y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
    sol = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                          transpose_a=True)
    return C(sol[:n], sol[n:])


def cho_solve_hermitian_schur(A: C, B: C) -> C:
    """Solve A X = B for Hermitian positive-definite A (e.g. the Laurent
    Toeplitz eps matrix) via Schur elimination of the SPD embedding: for
    A = R + iI Hermitian, R is SPD and so is the Schur complement
    S = R + I R^-1 I, so two n x n Choleskys replace one (2n)^3 one
    (same split as :func:`solve_schur`; unconditionally stable here because
    positive-definiteness certifies both pivots)."""
    def _cho(M):
        L = jnp.linalg.cholesky(M)
        def slv(rhs):
            y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True,
                                                lower=True)
            return jax.lax.linalg.triangular_solve(L, y, left_side=True,
                                                   lower=True,
                                                   transpose_a=True)
        return slv
    with jax.default_matmul_precision(SOLVE_PRECISION):
        R, Im = A.re, A.im
        solveR = _cho(R)
        W = solveR(Im)                       # R^-1 I
        solveS = _cho(R + Im @ W)
        u = solveR(B.re)
        Xi = solveS(B.im - Im @ u)
        return C(u + W @ Xi, Xi)


# Hot-path Hermitian solve default (rebindable; the blockrec base case pins
# the Cholesky route explicitly to stay rebind-safe).
cho_solve_hermitian = cho_solve_hermitian_schur
