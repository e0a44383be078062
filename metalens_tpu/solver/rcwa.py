"""TPU-native RCWA (Fourier Modal Method) S-matrix solver.

Replaces the reference's external S4.exe binary + grating.lua driver
(reference ``grating.py:300-317``, ``grating.lua:110-186``) with an
in-framework, batched, differentiable array program.

Two TPU realities shape the design:

* **No nonsymmetric eigensolver on TPU** -- classic RCWA eigendecomposes the
  2N x 2N layer operator FG; instead the layer S-matrix is built eig-free:

  1. Maxwell in Fourier space: d/dz [e; h] = i k0 [[0, F], [G, 0]] [e; h],
     F, G from the Laurent Toeplitz matrix of eps(x, y) (derived from
     scratch; validated against analytic Fresnel/TMM limits in tests/).
  2. The transfer matrix over a thin sub-slab dz = h/n_slabs is a matrix
     exponential which -- because A^2 = blockdiag(FG, GF) -- reduces to
     three short Taylor series in Y = (k0 dz)^2 FG:
         T11 = cos-series(Y),       T12 = i t sinc-series(Y) F,
         T21 = i t G sinc-series(Y), T22 = I + G R(Y) F.
     n_slabs keeps ||Y|| <~ 2 so ~10 series terms are exact to machine
     precision and no entry exceeds ~e^1.5 (no exponential blow-up).
  3. The thin-slab T is converted to an S-matrix in the analytic plane-wave
     basis of air, and the full layer is assembled by Redheffer
     star-product *doubling* of identical slabs: log2(n_slabs) stable star
     products (the same stability argument as classical S-matrix recursion).
  4. An analytic per-order 2x2 interface S-matrix connects to glass.

* **No complex dtypes on TPU** -- all arithmetic uses the
  :mod:`metalens_tpu.solver.cpx` real-pair layer: complex matmuls are 3 real
  MXU matmuls, solves are QR/Cholesky on the real 2n embedding.

Everything is matmuls + triangular solves: MXU-friendly, vmap/jit/grad
compatible.  Amplitude conventions (bases, phase references at the
air-pillar interface for reflection and the pillar-glass interface for
transmission, e^{-iwt}/e^{+ikz}) match S4 exactly -- see
:mod:`metalens_tpu.solver.basis`.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import basis, cpx
from .cpx import C
from .epsilon import ellipse_layer_toeplitz

TWO_PI = 2.0 * np.pi


class SMatrix(NamedTuple):
    """Scattering matrix with ports [c_f(top-in); c_b(bottom-in)] ->
    [c_f(bottom-out); c_b(top-out)]:

        c_f(bot) = s11 c_f(top) + s12 c_b(bot)
        c_b(top) = s21 c_f(top) + s22 c_b(bot)
    """
    s11: C
    s12: C
    s21: C
    s22: C


# ----- block helpers: multiply dense C (2N,2N) by diag-block operators -----

def _left_bmul(blocks, M: C) -> C:
    A, B, Cb, D = blocks
    N = A.shape[0]
    top = A[:, None] * M[:N] + B[:, None] * M[N:]
    bot = Cb[:, None] * M[:N] + D[:, None] * M[N:]
    return cpx.concatenate([top, bot], axis=0)


def _right_bmul(M: C, blocks) -> C:
    A, B, Cb, D = blocks
    N = A.shape[0]
    left = M[:, :N] * A[None, :] + M[:, N:] * Cb[None, :]
    right = M[:, :N] * B[None, :] + M[:, N:] * D[None, :]
    return cpx.concatenate([left, right], axis=1)


def build_FG(E: C, Einv: C, Kx, Ky, M_blocks=None):
    """The first-order Maxwell operators for a patterned layer (K's
    normalized by k0):

        dz [ex;ey] = i k0 F [hx;hy],   dz [hx;hy] = i k0 G [ex;ey].

    ``M_blocks = (Mxx, Mxy, Myy)`` is the in-plane eps operator
    ([eps E]_x = Mxx ex + Mxy ey etc.); None means the Laurent rule
    (Mxx = Myy = E, Mxy = 0).  The E_z elimination in F always uses the
    Laurent inverse Einv (Ez is tangential at pillar walls)."""
    N = Kx.shape[0]
    KxE = Einv * Kx[:, None]
    KyE = Einv * Ky[:, None]
    I = jnp.eye(N, dtype=Kx.dtype)
    F = cpx.concatenate([
        cpx.concatenate([KxE * Ky[None, :], (KxE * Kx[None, :]) * -1.0 + I],
                        axis=1),
        cpx.concatenate([KyE * Ky[None, :] - I, (KyE * Kx[None, :]) * -1.0],
                        axis=1)], axis=0)
    dKxKy = jnp.diag(Kx * Ky)
    dKx2 = jnp.diag(Kx * Kx)
    dKy2 = jnp.diag(Ky * Ky)
    if M_blocks is None:
        Mxx, Mxy, Myy = E, None, E
    else:
        Mxx, Mxy, Myy = M_blocks
    G11 = cpx.promote(-dKxKy) if Mxy is None else (-Mxy) + (-dKxKy)
    G22 = cpx.promote(dKxKy) if Mxy is None else Mxy + dKxKy
    G = cpx.concatenate([
        cpx.concatenate([G11, (-Myy) + dKx2], axis=1),
        cpx.concatenate([Mxx - dKy2, G22], axis=1)], axis=0)
    return F, G


def _shared_power_polys(Y: C, I: C, coeff_lists):
    """Evaluate several matrix polynomials p(Y) = sum_i c_i Y^i sharing the
    powers of one matrix Y, by Paterson-Stockmeyer chunking: with chunk size
    s and r = ceil((d+1)/s) chunks, the cost is (s-1) + n_polys*(r-1)
    matmuls (vs n_polys-independent Horner).  The chunk combinations are
    scalar*matrix adds, which XLA fuses."""
    d = max(len(c) for c in coeff_lists) - 1
    n_poly = len(coeff_lists)
    s_best, cost_best = 1, None
    for s in range(1, d + 2):
        r = -(-(d + 1) // s)
        cost = (s - 1) + n_poly * (r - 1)
        if cost_best is None or cost < cost_best:
            s_best, cost_best = s, cost
    s = s_best
    pows = [I, Y]
    for _ in range(2, s + 1):
        pows.append(pows[-1] @ Y)
    X = pows[s]
    outs = []
    for coeffs in coeff_lists:
        chunks = []
        for j in range(0, len(coeffs), s):
            cs = coeffs[j:j + s]
            Bj = pows[0] * cs[0]
            for i in range(1, len(cs)):
                Bj = Bj + pows[i] * cs[i]
            chunks.append(Bj)
        acc = chunks[-1]
        for Bj in chunks[-2::-1]:
            acc = acc @ X + Bj
        outs.append(acc)
    return outs


def thin_slab_T_blocks(F: C, G: C, t, taylor_terms: int):
    """Blocks of expm(i t [[0,F],[G,0]]) via Taylor series in
    Y = (t^2)(F @ G):

        T11 = sum_k (-1)^k Y^k / (2k)!
        T12 = i t [sum_k (-1)^k Y^k / (2k+1)!] F
        T21 = i t G [sum_k (-1)^k Y^k / (2k+1)!]
        T22 = I + t^2 G [sum_k (-1)^{k+1} Y^k / (2k+2)!] F

    The three series share powers of Y and are evaluated jointly by
    Paterson-Stockmeyer chunking (9 matmuls at the default 12 terms vs 12
    for a term-by-term loop).  On TPU-class backends the whole evaluation
    runs as one fused VMEM kernel (solver/pallas_taylor.py): the ~17
    complex matmuls are HBM-round-trip-bound as separate XLA ops.
    """
    n2 = F.shape[0]
    I = cpx.eye(n2, F.re.dtype)
    from . import pallas_taylor
    if pallas_taylor.eligible(F):
        Csum, SF, GS, GRF = pallas_taylor.taylor_factors(F, G, t,
                                                         taylor_terms)
    else:
        Csum, SF, GS, GRF = pallas_taylor.xla_factors(F, G, t,
                                                      taylor_terms)
    T11 = Csum
    T12 = SF * 1j * t
    T21 = GS * 1j * t
    T22 = I + GRF * (t * t)
    return T11, T12, T21, T22


def _transfer_to_smatrix(M11: C, M12: C, M21: C, M22: C) -> SMatrix:
    """Amplitude-space transfer matrix -> scattering matrix."""
    n2 = M11.shape[0]
    I = cpx.eye(n2, M11.re.dtype)
    M22inv = cpx.solve(M22, I)
    s21 = -(M22inv @ M21)
    s11 = M11 + M12 @ s21
    s12 = M12 @ M22inv
    s22 = M22inv
    return SMatrix(s11, s12, s21, s22)


def _transfer_to_smatrix_symmetric(M21: C, M22: C) -> SMatrix:
    """Transfer -> scattering for a MIRROR-SYMMETRIC slab (z-uniform layer
    with the same amplitude basis on both faces): there s11 = s22 = M22^-1
    and s12 = s21 = -M22^-1 M21 exactly (equivalent to the general formulas;
    pinned against them in tests), so M11/M12 and two of the four dense
    products are never formed."""
    n2 = M22.shape[0]
    I = cpx.eye(n2, M22.re.dtype)
    M22inv = cpx.solve(M22, I)
    s21 = -(M22inv @ M21)
    return SMatrix(M22inv, s21, s21, M22inv)


def slab_smatrix_in_basis(T, we, we_inv, symmetric: bool = True) -> SMatrix:
    """Convert a field-space transfer matrix T (blocks T11..T22 acting on
    [e; h]) to an amplitude-space S-matrix in a uniform-medium basis given by
    diag-block operators ``we`` / ``we_inv`` (same medium both sides).

    Field/amplitude relation: e = We (c_f - c_b), h = c_f + c_b, so
    Phi = [[We, -We], [I, I]], Phi^-1 = (1/2) [[We^-1, I], [-We^-1, I]].

    ``symmetric=True`` (always valid for a z-uniform slab, the only layer
    type here) uses the mirror-symmetric shortcut that skips M11/M12.
    """
    T11, T12, T21, T22 = T
    P11 = _right_bmul(T11, we) + T12      # acts on c_f
    P12 = -_right_bmul(T11, we) + T12     # acts on c_b
    P21 = _right_bmul(T21, we) + T22
    P22 = -_right_bmul(T21, we) + T22
    M21 = (-_left_bmul(we_inv, P11) + P21) * 0.5
    M22 = (-_left_bmul(we_inv, P12) + P22) * 0.5
    if symmetric:
        return _transfer_to_smatrix_symmetric(M21, M22)
    M11 = (_left_bmul(we_inv, P11) + P21) * 0.5
    M12 = (_left_bmul(we_inv, P12) + P22) * 0.5
    return _transfer_to_smatrix(M11, M12, M21, M22)


def redheffer_star_self_symmetric(S: SMatrix) -> SMatrix:
    """Star of a MIRROR-SYMMETRIC S-matrix (s11 == s22, s12 == s21) with
    itself -- the doubling step for identical z-uniform slabs.  Symmetry is
    preserved, so only two of the four output blocks are computed, and
    because X0 = (I - s12^2)^-1 commutes with s12 EXACTLY (it is a rational
    function of s12^2), the s12 update reuses the solve's single output:

        Y = X0 s11,   s11' = s11 Y,
        s12' = s12 + s11 X0 s12 s11 = s12 + s11 (s12 Y),

    exactly the general star specialized to A = B = S (pinned against it in
    tests).  Four matmuls + one n-wide solve vs the general star's seven +
    one (and one fewer matmul than the concatenated-RHS form this
    replaces)."""
    n2 = S.s11.shape[0]
    I = cpx.eye(n2, S.s11.re.dtype)
    Y = cpx.solve(I - S.s12 @ S.s12, S.s11)
    s11 = S.s11 @ Y
    s12 = S.s12 + S.s11 @ (S.s12 @ Y)
    return SMatrix(s11, s12, s12, s11)


def redheffer_star(A: SMatrix, B: SMatrix) -> SMatrix:
    """Stack S-matrix A (top) on B (bottom): standard star product."""
    n2 = A.s11.shape[0]
    I = cpx.eye(n2, A.s11.re.dtype)
    X = cpx.solve(I - A.s12 @ B.s21,
                     cpx.concatenate([A.s11, A.s12 @ B.s22], axis=1))
    XA11 = X[:, :n2]
    XA12B22 = X[:, n2:]
    s11 = B.s11 @ XA11
    s12 = B.s12 + B.s11 @ XA12B22
    s21 = A.s21 + A.s22 @ (B.s21 @ XA11)
    s22 = A.s22 @ (B.s21 @ XA12B22 + B.s22)
    return SMatrix(s11, s12, s21, s22)


class BlockSMatrix(NamedTuple):
    """S-matrix of a zero-thickness interface: every port map is a per-order
    2x2, stored as a (A, B, C, D) diag-block 4-tuple of length-N C vectors
    (densify with :func:`basis.block_to_dense`)."""
    s11: tuple
    s12: tuple
    s21: tuple
    s22: tuple


def interface_smatrix_blocks(we_top, we_top_inv, we_bot, we_bot_inv) \
        -> BlockSMatrix:
    """Analytic S-matrix of a flat interface between two uniform media, in
    their own plane-wave bases (per-order 2x2 algebra, no dense solves).

    Transfer (top amps -> bottom amps): M = Phi_bot^-1 Phi_top gives
    M11 = M22 = (Wb^-1 Wa + I)/2,  M12 = M21 = (I - Wb^-1 Wa)/2.
    """
    one = C(jnp.ones_like(we_top[0].re), jnp.zeros_like(we_top[0].re))
    zero = one * 0.0
    ident = (one, zero, zero, one)
    WbiWa = basis.block_compose(we_bot_inv, we_top)
    half = lambda b: tuple(x * 0.5 for x in b)
    add = lambda b1, b2: tuple(x + y for x, y in zip(b1, b2))
    sub = lambda b1, b2: tuple(x - y for x, y in zip(b1, b2))
    M11 = half(add(WbiWa, ident))
    M12 = half(sub(ident, WbiWa))
    M22inv = basis.block_inv(M11)       # M22 == M11, M21 == M12
    s21_b = tuple(-x for x in basis.block_compose(M22inv, M12))
    s11_b = add(M11, basis.block_compose(M12, s21_b))
    s12_b = basis.block_compose(M12, M22inv)
    s22_b = M22inv
    return BlockSMatrix(s11_b, s12_b, s21_b, s22_b)


def interface_smatrix(we_top, we_top_inv, we_bot, we_bot_inv) -> SMatrix:
    """Dense form of :func:`interface_smatrix_blocks`."""
    b = interface_smatrix_blocks(we_top, we_top_inv, we_bot, we_bot_inv)
    return SMatrix(*(basis.block_to_dense(x) for x in b))


FULL_OUTPUTS = ("s11", "s12", "s21", "s22")


def star_blockdiag_dense(A: BlockSMatrix, B: SMatrix,
                         outputs=FULL_OUTPUTS) -> SMatrix:
    """Star product with a diag-block TOP factor (a zero-thickness
    interface): algebraically :func:`redheffer_star` with A densified, but
    the block structure turns five dense matmuls into elementwise block
    scalings and narrows the solve's right-hand side (the dominant star cost
    is untouched dense algebra on B).

    ``outputs`` (static) selects which result blocks to form; skipped blocks
    are ``None``.  The engine's consumers only ever read ``s11`` (FOM,
    transmission) and ``s21`` (characterize, reflection) of the final cell
    S-matrix, so the composite's back-illumination blocks -- and the dense
    matmuls that build them -- are dead code there.

    ``B`` may itself have None blocks (a partial inner result), as long as
    the blocks this call actually reads are present: s21 always; s11 for
    s11' or s12'; s12 for s12'; s22 for s12'/s22'."""
    n2 = B.s21.shape[0]
    I = cpx.eye(n2, B.s21.re.dtype)
    A12B21 = _left_bmul(A.s12, B.s21)
    X0 = cpx.solve(I - A12B21, I)
    XA11 = _right_bmul(X0, A.s11)
    s11 = B.s11 @ XA11 if "s11" in outputs else None
    s21 = (basis.block_to_dense(A.s21) + _left_bmul(A.s22, B.s21 @ XA11)
           if "s21" in outputs else None)
    s12 = s22 = None
    if "s12" in outputs or "s22" in outputs:
        XA12B22 = _right_bmul(X0, A.s12) @ B.s22
        if "s12" in outputs:
            s12 = B.s12 + B.s11 @ XA12B22
        if "s22" in outputs:
            s22 = _left_bmul(A.s22, B.s21 @ XA12B22 + B.s22)
    return SMatrix(s11, s12, s21, s22)


def star_dense_blockdiag(A: SMatrix, B: BlockSMatrix,
                         outputs=FULL_OUTPUTS) -> SMatrix:
    """Star product with a diag-block BOTTOM factor (mirror of
    :func:`star_blockdiag_dense`, including the ``outputs`` selection --
    here dropping s12/s22 also halves the solve's right-hand side)."""
    n2 = A.s11.shape[0]
    I = cpx.eye(n2, A.s11.re.dtype)
    A12B21 = _right_bmul(A.s12, B.s21)
    back = "s12" in outputs or "s22" in outputs
    rhs = (cpx.concatenate([A.s11, _right_bmul(A.s12, B.s22)], axis=1)
           if back else A.s11)
    X = cpx.solve(I - A12B21, rhs)
    XA11 = X[:, :n2]
    s11 = _left_bmul(B.s11, XA11) if "s11" in outputs else None
    s21 = (A.s21 + A.s22 @ _left_bmul(B.s21, XA11)
           if "s21" in outputs else None)
    s12 = s22 = None
    if back:
        XA12B22 = X[:, n2:]
        if "s12" in outputs:
            s12 = basis.block_to_dense(B.s12) + _left_bmul(B.s11, XA12B22)
        if "s22" in outputs:
            s22 = A.s22 @ (_left_bmul(B.s21, XA12B22)
                           + basis.block_to_dense(B.s22))
    return SMatrix(s11, s12, s21, s22)


# ----- top-level cell solve -----

def default_n_slabs(k0h_max: float, q2_max: float, target: float = 4.5) -> int:
    """Static slab count: smallest power of two making t*q_max <= target.

    target 4.5 pairs with the 12-term Taylor default: per-slab ||Y|| <~ 21
    is still series-converged to machine precision (factorials dominate;
    ns=8/t=12 matches ns=32/t=10 to 1e-14 in f64, pinned by tests) and T
    entries stay below e^4.5 ~ 90, inside single-precision headroom --
    minimizing star products, the dominant per-solve cost."""
    n = max(1.0, k0h_max * math.sqrt(q2_max) / target)
    return int(2 ** math.ceil(math.log2(n)))


def q2_upper_bound(orders, grating_period, lateral_period, wavelength,
                   eps_max: float) -> float:
    """Cheap upper bound on the spectral radius of FG (normalized q^2)."""
    orders = np.asarray(orders)
    kx = orders[:, 0] * wavelength / grating_period
    ky = orders[:, 1] * wavelength / lateral_period
    kmax2 = float(((np.abs(kx) + 1.0) ** 2 + (np.abs(ky) + 1.0) ** 2).max())
    return kmax2 + eps_max


# Per-slab t*q caps for slab_schedule(target=None), by working precision.
#
# The mechanism limiting slab thickness in f32 is REPRESENTATION HEADROOM,
# not series convergence: the thin-slab transfer matrix carries entries of
# magnitude ~e^{t*q} (cosh growth of evanescent modes) that the S-matrix
# conversion cancels back to O(1), so the recoverable accuracy is
# ~eps_dtype * e^{t*q}.  Measured on the bench cell (round 4, true f32
# with x64 OFF, 1-vs-16-slab self-consistency, error on PROPAGATING
# transmitted orders):
#     t*q    8      10      11      12      13      14      16.2
#     err  7e-6   2.4e-5  4.8e-5  1.7e-4  3.4e-3  1.3e-2  1.6e-2
# The floor from the rest of the f32 pipeline is ~1.5e-4, so cap 11 keeps
# the slab stage below it with ~2x margin.  The round-3 cap of 16.5 shipped
# a ~1.4e-2 f32 amplitude error at the numG=50 production schedule -- its
# "f32 error UNCHANGED up to t*q 21" probe ran under jax_enable_x64, which
# promotes enough intermediates to mask the cancellation (same trap as the
# on-chip t*q~21 cliff recorded in CLAUDE.md).  f64 keeps 16.5: measured
# floor 3e-10 at t*q 16.2, cliff at ~32 (5e-4) / ~42 (diverges).
SLAB_CAP_F64 = 16.5
SLAB_CAP_F32 = 11.0


def slab_cap(dtype=None) -> float:
    """Active per-slab t*q cap.  With ``dtype=None`` the working precision
    is inferred from ``jax_enable_x64`` -- the same rule the engine uses to
    pick its real dtype (engine._default_rdtype)."""
    if dtype is None:
        import jax
        wide = bool(jax.config.jax_enable_x64)
    else:
        wide = np.dtype(dtype).itemsize >= 8
    return SLAB_CAP_F64 if wide else SLAB_CAP_F32


def slab_schedule(k0h_max: float, orders, grating_period, lateral_period,
                  wavelength, eps_max: float, u_max: float = 1.0,
                  target: float | None = None, safety: float = 1.05):
    """(n_slabs, taylor_terms) pairing for the doubling assembly, sized from
    a tight spectral bound.

    Bound: per-order (|G_i| + u_max)^2 + eps_max >= rho(FG) -- joint per
    order instead of :func:`q2_upper_bound`'s separate axis maxima with
    fixed +1 headroom (measured >= rho with >= 6% margin across the TiO2
    pillar design domain; ``safety`` folds in another 5%, and the series
    length is sized so even a ~20% rho excursion stays converged).

    ``target`` caps the per-slab t*q; the series length is then sized from
    the ACTUAL per-slab norm, not the cap.  The doubling solves -- not the
    series matmuls -- dominate per-solve cost, so thicker slabs win as long
    as accuracy holds -- and "holds" is PRECISION-DEPENDENT: see
    :data:`SLAB_CAP_F32` / :data:`SLAB_CAP_F64` and :func:`slab_cap` for
    the measured table.  ``target=None`` (the default) resolves via
    :func:`slab_cap`; bench.py's on-chip accuracy guard probes the active
    cap value every run, so a future cap change that lands past the chip
    cliff fails the benchmark instead of silently corrupting results."""
    if target is None:
        target = slab_cap()
    orders = np.asarray(orders)
    kx = orders[:, 0] * wavelength / grating_period
    ky = orders[:, 1] * wavelength / lateral_period
    kmax = float(np.sqrt(kx ** 2 + ky ** 2).max()) + u_max
    q2 = (kmax * kmax + eps_max) * safety
    n = max(1.0, k0h_max * math.sqrt(q2) / target)
    n_slabs = int(2 ** math.ceil(math.log2(n)))
    # smallest series length with tail < 1e-12 at the actual per-slab
    # ||Y|| (q2 already carries one `safety`; a second covers rho excursion)
    y = (k0h_max * math.sqrt(q2) / n_slabs) ** 2 * safety
    term, k = y, 1
    while term * y / ((2 * k + 1) * (2 * k + 2)) > 1e-12 or k < 3:
        k += 1
        term = term * y / ((2 * k - 1) * (2 * k))
    # round up to a multiple of 4: extra terms only tighten convergence and
    # cost ~sqrt (Paterson-Stockmeyer), while a stable count keeps every
    # member of a design chain on the SAME traced-orders program cache key
    return n_slabs, -(-k // 4) * 4


# The reference basis for representing the intra-layer S-matrix during
# doubling.  Any invertible field<->amplitude map works algebraically (the
# conversions telescope exactly), but a REAL reference medium is nearly
# singular whenever some order grazes (kz ~ 0 gives 1/kz blowup in the basis
# vectors), and that representation noise amplifies ~10^4x through the star
# doublings.  A lossy reference medium (complex eps_ref) bounds |kz| below
# for every real transverse k, keeping every doubling well conditioned; the
# physical air/glass bases appear only once, at the outer faces.
EPS_REF = 1.5 + 1.0j


def layer_smatrix(E: C, Kx, Ky, k0h, n_slabs: int, taylor_terms: int,
                  eps_ref=EPS_REF, branch_eps: float = 1e-9,
                  M_blocks=None, hermitian_eps: bool = True,
                  Einv: C | None = None) -> SMatrix:
    """S-matrix of the patterned layer of normalized thickness ``k0h``,
    expressed in the plane-wave basis of the ``eps_ref`` reference medium on
    both faces (convert with :func:`interface_smatrix` to physical bases).

    ``hermitian_eps=False`` must be passed for absorbing pillar materials
    (complex eps): the Toeplitz matrix is then non-Hermitian, so its
    inverse takes the pivoted full-embedding LU (once per layer build, off
    the per-slab hot path) instead of the unpivoted fast path."""
    if n_slabs & (n_slabs - 1) or n_slabs < 1:
        raise ValueError(f"n_slabs must be a power of two (doubling "
                         f"assembly), got {n_slabs}")
    N = E.shape[0]
    I = cpx.eye(N, E.re.dtype)
    # E Hermitian positive definite for lossless dielectrics: the unpivoted
    # cpx.solve contract holds (HPD leading blocks), and on TPU it routes
    # to the grouped Pallas inverse instead of Cholesky + triangular
    # solves (round-3 chip A/B; the round-2 "cho stays" note predates the
    # grouped kernel).  A caller sweeping many incidence directions over
    # one geometry can pass a precomputed Einv (it is u-independent).
    if Einv is None:
        Einv = (cpx.solve if hermitian_eps else cpx.solve_embed)(E, I)
    F, G = build_FG(E, Einv, Kx, Ky, M_blocks)
    t = k0h / n_slabs
    T = thin_slab_T_blocks(F, G, t, taylor_terms)

    n_ref = cpx.csqrt_posim(cpx.promote(eps_ref))
    Kz_ref = basis.kz_norm(Kx, Ky, eps_ref, branch_eps)
    we = basis.we_blocks(Kx, Ky, Kz_ref, n_ref)
    we_inv = basis.we_inv_blocks(Kx, Ky, Kz_ref, n_ref)

    S = slab_smatrix_in_basis(T, we, we_inv)
    # Plain XLA doubling loop; each star's solve dispatches to the grouped
    # Pallas inverse.  A kernel fusing the WHOLE K-doubling loop in VMEM
    # (solver/pallas_star.py, round 2, git history) measured STRICTLY
    # SLOWER than this: its larger live set caps the interleave group at
    # 4 matrices/grid-step (1 at P=256) vs the inverse kernel's 8 (2),
    # and group interleaving beats matmul fusion (4563 vs 4278 solves/s
    # at numG=50, 1507 vs 1330 at numG=100, on chip).
    for _ in range(int(math.log2(n_slabs))):
        S = redheffer_star_self_symmetric(S)
    return S


def cell_smatrix(orders, xyrra, grating_period, lateral_period, cyl_height,
                 eps_pillar, eps_glass, wavelength, ux, uy,
                 n_slabs: int, taylor_terms: int = 12,
                 branch_eps: float = 1e-9, eps_small_u: bool = False,
                 fff: bool = False, hermitian_eps: bool = True,
                 outputs=FULL_OUTPUTS):
    """Full air / pillar-layer / glass S-matrix for one unit cell at one
    incidence direction and wavelength.  Ports: top = air plane-wave basis,
    bottom = glass plane-wave basis (exactly S4's GetAmplitudes bases).

    All geometric/physical arguments may be traced (vmap/grad); eps may be
    python complex or C scalars.  ``orders``, ``n_slabs``, ``taylor_terms``
    are static.  Returns (S, Kx, Ky).

    ``outputs`` (static) selects which blocks of the returned S-matrix are
    formed (see :func:`star_blockdiag_dense`); unrequested blocks are None
    and their dense matmuls are never emitted.  Values of requested blocks
    are identical to the full computation (same graph, pinned by tests).
    """
    E, M_blocks = build_layer_eps(orders, grating_period, lateral_period,
                                  xyrra, eps_pillar,
                                  eps_small_u=eps_small_u, fff=fff,
                                  hermitian_eps=hermitian_eps)
    return cell_smatrix_with_eps(orders, E, grating_period, lateral_period,
                                 cyl_height, eps_glass, wavelength, ux, uy,
                                 n_slabs=n_slabs, taylor_terms=taylor_terms,
                                 branch_eps=branch_eps, M_blocks=M_blocks,
                                 hermitian_eps=hermitian_eps, outputs=outputs)


def build_layer_eps(orders, grating_period, lateral_period, xyrra,
                    eps_pillar, eps_small_u: bool = False, fff: bool = False,
                    hermitian_eps: bool = True):
    """The shared eps-Toeplitz front end of the cell solves: returns
    (E, M_blocks) -- the Laurent eps matrix plus, with ``fff``, the NV
    factorization blocks (Mxx, Mxy, Myy); one place so the two entry points
    (:func:`cell_smatrix`, :func:`cell_amplitudes`) cannot drift."""
    if fff:
        from .fff import fff_eps_blocks
        E, Mxx, Mxy, Myy = fff_eps_blocks(
            np.asarray(orders), grating_period, lateral_period, xyrra,
            eps_pillar, small_arg_only=eps_small_u,
            hermitian=hermitian_eps)
        return E, (Mxx, Mxy, Myy)
    E = ellipse_layer_toeplitz(np.asarray(orders), grating_period,
                               lateral_period, xyrra, eps_pillar,
                               small_arg_only=eps_small_u)
    return E, None


def _cell_parts(orders, E: C, grating_period, lateral_period,
                cyl_height, eps_glass, wavelength, ux, uy,
                n_slabs: int, taylor_terms: int,
                branch_eps: float, M_blocks, hermitian_eps: bool,
                Einv: C | None = None):
    """Shared front of the cell solve: the doubled layer S-matrix in the
    lossy reference basis plus the two zero-thickness conversion interfaces
    (air | ref at the top face, ref | glass at the bottom; the ref
    representation cancels exactly in the composition)."""
    # orders may be a concrete numpy array OR a traced jnp array (the
    # traced-orders engine programs pass it as an input so one compiled
    # program serves every member of a design chain)
    orders = jnp.asarray(orders)
    rdt = E.re.dtype
    mx = orders[:, 0].astype(rdt)
    my = orders[:, 1].astype(rdt)
    Kx = (ux + mx * (wavelength / grating_period)).astype(rdt)
    Ky = (uy + my * (wavelength / lateral_period)).astype(rdt)

    k0h = TWO_PI * cyl_height / wavelength
    S_layer = layer_smatrix(E, Kx, Ky, k0h, n_slabs, taylor_terms,
                            branch_eps=branch_eps, M_blocks=M_blocks,
                            hermitian_eps=hermitian_eps, Einv=Einv)

    Kz_a = basis.kz_norm(Kx, Ky, 1.0, branch_eps)
    Kz_g = basis.kz_norm(Kx, Ky, eps_glass, branch_eps)
    Kz_r = basis.kz_norm(Kx, Ky, EPS_REF, branch_eps)
    n_a = 1.0
    n_g = cpx.csqrt_posim(cpx.promote(eps_glass))
    n_r = cpx.csqrt_posim(cpx.promote(EPS_REF))
    we_a = basis.we_blocks(Kx, Ky, Kz_a, n_a)
    wei_a = basis.we_inv_blocks(Kx, Ky, Kz_a, n_a)
    we_g = basis.we_blocks(Kx, Ky, Kz_g, n_g)
    wei_g = basis.we_inv_blocks(Kx, Ky, Kz_g, n_g)
    we_r = basis.we_blocks(Kx, Ky, Kz_r, n_r)
    wei_r = basis.we_inv_blocks(Kx, Ky, Kz_r, n_r)
    S_air_ref = interface_smatrix_blocks(we_a, wei_a, we_r, wei_r)
    S_ref_glass = interface_smatrix_blocks(we_r, wei_r, we_g, wei_g)
    return S_layer, S_air_ref, S_ref_glass, Kx, Ky


def cell_smatrix_with_eps(orders, E: C, grating_period, lateral_period,
                          cyl_height, eps_glass, wavelength, ux, uy,
                          n_slabs: int, taylor_terms: int = 12,
                          branch_eps: float = 1e-9, M_blocks=None,
                          hermitian_eps: bool = True, outputs=FULL_OUTPUTS):
    """As :func:`cell_smatrix` but with the layer's Toeplitz eps matrix given
    directly (any pattern: ellipses, rectangles, uniform media)."""
    S_layer, S_air_ref, S_ref_glass, Kx, Ky = _cell_parts(
        orders, E, grating_period, lateral_period, cyl_height, eps_glass,
        wavelength, ux, uy, n_slabs, taylor_terms, branch_eps, M_blocks,
        hermitian_eps)
    # the outer star's block-by-block dependencies on the inner result:
    # X0 <- s21 (always); s11 <- s11; s21 <- s21; s12 <- s11, s12, s22
    # (s12' = B.s12 + B.s11 @ X0 A.s12 B.s22); s22 <- s21, s22
    inner = {"s21"}
    if "s11" in outputs or "s12" in outputs:
        inner.add("s11")
    if "s12" in outputs or "s22" in outputs:
        inner.add("s22")
    if "s12" in outputs:
        inner.add("s12")
    S = star_blockdiag_dense(
        S_air_ref,
        star_dense_blockdiag(S_layer, S_ref_glass,
                             outputs=tuple(sorted(inner))),
        outputs=outputs)
    return S, Kx, Ky


def cell_amplitudes_with_eps(orders, E: C, grating_period, lateral_period,
                             cyl_height, eps_glass, wavelength, ux, uy,
                             c_inc, n_slabs: int, taylor_terms: int = 12,
                             branch_eps: float = 1e-9, M_blocks=None,
                             hermitian_eps: bool = True,
                             want_reflection: bool = True,
                             Einv: C | None = None):
    """Scattered amplitudes ``(s11 @ c_inc, s21 @ c_inc)`` for a fixed
    incident vector, without materializing the composite S-matrix.

    Algebraically identical to ``scatter_amplitudes(cell_smatrix(...))``
    (pinned by tests), but because the outer conversion star's result is
    only ever APPLIED to ``c_inc`` (in practice a 2-sparse zeroth-order
    incidence, width <= 2), its two remaining dense 2Nx2N matmuls
    (``B.s11 @ XA11`` and ``B.s21 @ XA11``) collapse to thin
    matrix-vector products:

        ampf = inner.s11 @ (X0 @ (A.s11 . c)),
        ampr = A.s21 . c + A.s22 . (inner.s21 @ (X0 @ (A.s11 . c))),

    with ``.`` the per-order diag-block scaling and X0 the outer star's
    inverse.  ``want_reflection=False`` (the FOM path) skips ampr.
    Returns (ampf, ampr_or_None, Kx, Ky)."""
    S_layer, A, S_ref_glass, Kx, Ky = _cell_parts(
        orders, E, grating_period, lateral_period, cyl_height, eps_glass,
        wavelength, ux, uy, n_slabs, taylor_terms, branch_eps, M_blocks,
        hermitian_eps, Einv=Einv)
    inner = star_dense_blockdiag(S_layer, S_ref_glass,
                                 outputs=("s11", "s21"))
    n2 = inner.s11.shape[0]
    I = cpx.eye(n2, inner.s11.re.dtype)
    X0 = cpx.solve(I - _left_bmul(A.s12, inner.s21), I)
    c = cpx.promote(c_inc)
    vec_in = c.ndim == 1
    if vec_in:
        # _left_bmul's per-order diag scaling needs a column; a 1-D vector
        # would broadcast into an (N, N) outer product silently
        c = c.reshape(-1, 1)
    v = X0 @ _left_bmul(A.s11, c)
    ampf = inner.s11 @ v
    if vec_in:
        ampf = ampf.reshape(-1)
    if not want_reflection:
        return ampf, None, Kx, Ky
    ampr = _left_bmul(A.s21, c) + _left_bmul(A.s22, inner.s21 @ v)
    if vec_in:
        ampr = ampr.reshape(-1)
    return ampf, ampr, Kx, Ky


def cell_amplitudes(orders, xyrra, grating_period, lateral_period,
                    cyl_height, eps_pillar, eps_glass, wavelength, ux, uy,
                    c_inc, n_slabs: int, taylor_terms: int = 12,
                    branch_eps: float = 1e-9, eps_small_u: bool = False,
                    fff: bool = False, hermitian_eps: bool = True,
                    want_reflection: bool = True):
    """:func:`cell_amplitudes_with_eps` with the eps Toeplitz built from the
    ellipse list (the :func:`cell_smatrix` front end)."""
    E, M_blocks = build_layer_eps(orders, grating_period, lateral_period,
                                  xyrra, eps_pillar,
                                  eps_small_u=eps_small_u, fff=fff,
                                  hermitian_eps=hermitian_eps)
    return cell_amplitudes_with_eps(
        orders, E, grating_period, lateral_period, cyl_height, eps_glass,
        wavelength, ux, uy, c_inc, n_slabs=n_slabs,
        taylor_terms=taylor_terms, branch_eps=branch_eps,
        M_blocks=M_blocks, hermitian_eps=hermitian_eps,
        want_reflection=want_reflection)


def scatter_amplitudes(S: SMatrix, c_inc):
    """Transmitted (into glass, forward) and reflected (into air, backward)
    amplitude vectors for incident amplitudes c_inc (top, forward).  Layouts
    match S4 GetAmplitudes: [y-block; x-block]."""
    c = cpx.promote(c_inc)
    return S.s11 @ c, S.s21 @ c
