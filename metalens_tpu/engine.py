"""Engine: jitted, cached device programs behind the scene-object API.

This layer replaces the reference's entire process/IPC machinery (temp dirs,
setup files, ``subprocess.Popen(['S4','grating.lua'])``, stdout parsing --
reference ``grating.py:37-86, 203-317``): a "job" here is a cached jitted
function plus concrete array arguments, and "running many in parallel" is a
batch dimension.

The central object is the *FOM program*: one jitted function computing the
full multi-wavelength figure of merit of a cell from its geometry.  Both
polarizations are extracted from a single S-matrix per wavelength (the
reference runs two full RCWA solves, ``grating.lua:320-323``), and because
the program is differentiable end-to-end it also supplies exact gradients to
the gradient optimizer -- the capability the reference's derivative-free
loops lack (``grating.py:685-795``).

All device complex arithmetic is the :mod:`metalens_tpu.solver.cpx`
real-pair representation (the TPU backend has no complex dtypes); results
cross back to host numpy complex here, at the API boundary.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .materials import resolve_indices
from .solver import basis, cpx, orders as ordmod, rcwa
from .solver.cpx import C
from .solver.epsilon import toeplitz_from_structure
from .solver.fom import FomTerm, DEFAULT_FOM_TERMS, term_score
from .units import nm, pi


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    """Opt in to JAX's persistent compilation cache (best effort).

    The traced-orders refactor already collapses a design chain onto a few
    program signatures per process; the persistent cache removes the
    remaining per-PROCESS compile tax -- a resumed/re-run pipeline (e.g.
    ``benchmarks/northstar2.py``'s staged design) reloads executables
    instead of recompiling for ~20-60 s each over the remote-tunnel dev
    setup.  Returns the cache dir, or None if the backend/config rejected
    it (some PJRT plugins do not support executable serialization; the
    failure is harmless, compiles just stay in-memory).
    """
    if cache_dir is None:
        cache_dir = os.environ.get(
            "METALENS_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "metalens_jax"))
    if not cache_dir:
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return None
    return cache_dir


def _diff_g_max(g, orders) -> float:
    """Largest |G'| over the difference-order set (twice the max |G| of the
    truncation) -- the Bessel argument is u = |G'| * r."""
    orders = np.asarray(orders)
    gx = orders[:, 0] * (2 * pi / g.grating_period)
    gy = orders[:, 1] * (2 * pi / g.lateral_period)
    return 2.0 * float(np.sqrt(gx ** 2 + gy ** 2).max())


def small_u_ok(g, orders, xyrra=None) -> bool:
    """True when every Bessel argument u = |G'| r stays safely below the
    J1 rational-fit range (|u| < 8) for this cell's concrete geometry, so
    the asymptotic branch can be compiled out (30% headroom for geometry
    drift during optimization).  ``xyrra`` overrides the grating's own
    geometry (judge the radii actually being evaluated)."""
    xy = np.asarray(xyrra if xyrra is not None else g.xyrra_list)
    r_max = float(np.abs(xy[..., 2:4]).max())
    return _diff_g_max(g, orders) * 1.3 * r_max < 7.5


def _small_u_now(small_u0: bool, g_max: float, xyrra) -> bool:
    """Per-dispatch refinement of the build-time small_u decision: the
    optimizer closures cache one program from the START geometry, but
    accepted steps can grow a radius past the 30% headroom -- then the
    compiled-out asymptotic branch would silently evaluate the |u| < 8 fit
    out of range.  Checking the CONCRETE candidate radii here routes such
    calls to the full-J1 program instead (one extra cached compile, exact
    everywhere; both programs agree identically while u < 8)."""
    if not small_u0:
        return False
    try:
        r_max = float(np.abs(np.asarray(xyrra)[..., 2:4]).max())
    except Exception:       # traced/abstract values: keep the build decision
        return small_u0
    return g_max * r_max < 7.5


def _default_rdtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def static_solve_config(g, wavelengths, numG):
    """Everything that must be concrete at trace time: the truncated order
    set, the slab count for the thin-slab exponential, and whether the
    pillar material is lossless (Hermitian Toeplitz -> Cholesky inverse)."""
    orders = ordmod.select_orders(g.grating_period, g.lateral_period, numG)
    lam_min = min(wavelengths)
    eps_max = 0.0
    hermitian = True
    for lam in wavelengths:
        ng, nt = resolve_indices(g.n_glass, g.n_tio2, lam)
        eps_max = max(eps_max, abs(nt) ** 2, abs(ng) ** 2)
        if abs(complex(nt).imag) > 0:
            hermitian = False
    k0h = 2 * pi * g.cyl_height / lam_min
    n_slabs, taylor = rcwa.slab_schedule(k0h, orders, g.grating_period,
                                         g.lateral_period, lam_min, eps_max)
    return orders, n_slabs, taylor, hermitian


# --------------------------------------------------------------------------
# the FOM program
# --------------------------------------------------------------------------

def _fom_eval(xyrra, mx, my, i0, tgt, Lx, Ly, h, eps_p, eps_g, lam, ux,
              ng_now, cos_theta, weights, *, N, Dx, Dy, n_slabs,
              taylor_terms, inphase, small_u, fff, hermitian_eps):
    """The FOM of ONE cell geometry as a pure traceable function (the body
    of every FOM program; also composed into larger device programs, e.g.
    the fused on-device design sweep in :mod:`metalens_tpu.optimize_fused`).
    Static configuration comes in as keyword arguments; everything
    positional is traced."""
    from .solver.epsilon import ellipse_structure_toeplitz_traced
    T = len(inphase)
    total = 0.0
    wsum = 0.0
    orders_j = jnp.stack([mx, my], axis=1)
    S_struct, at_zero = ellipse_structure_toeplitz_traced(
        mx, my, Dx, Dy, Lx, Ly, xyrra, small_arg_only=small_u)
    if fff:
        from .solver.fff import normal_projector_toeplitz_traced, \
            nv_blocks_from_structure
        P_blocks = normal_projector_toeplitz_traced(mx, my, Dx, Dy,
                                                    Lx, Ly, xyrra)
    for t in range(T):
        E = toeplitz_from_structure(S_struct, at_zero, eps_p[t])
        M_blocks = None
        if fff:
            # shared recipe incl. the HPD-vs-pivoted solve routing;
            # see fff.nv_blocks_from_structure
            _, M_blocks = nv_blocks_from_structure(
                S_struct, at_zero, eps_p[t], P_blocks,
                hermitian=hermitian_eps, E=E)
        cy_s, cx_s = basis.incident_sp_amplitudes(ux[t], 0.0, "s")
        cy_p, cx_p = basis.incident_sp_amplitudes(ux[t], 0.0, "p")
        c = jnp.zeros((2 * N, 2), dtype=xyrra.dtype)
        c = c.at[i0, 0].set(cy_s).at[i0 + N, 0].set(cx_s)
        c = c.at[i0, 1].set(cy_p).at[i0 + N, 1].set(cx_p)
        # the FOM reads transmission only: apply the outer conversion
        # star directly to the 2-column incidence (no dense S blocks)
        ampf, _, Kx, Ky = rcwa.cell_amplitudes_with_eps(
            orders_j, E, Lx, Ly, h, eps_g[t], lam[t],
            ux[t], 0.0, c, n_slabs=n_slabs, taylor_terms=taylor_terms,
            M_blocks=M_blocks, hermitian_eps=hermitian_eps,
            want_reflection=False)             # C of shape (2N, 2)
        idx = tgt[t]
        score = term_score(ampf[idx, 0], ampf[idx + N, 1], ng_now[t],
                           cos_theta[t], inphase[t])
        total = total + weights[t] * score
        wsum = wsum + weights[t]
    return total / wsum


@functools.lru_cache(maxsize=256)
def _fom_program(N: int, Dx: int, Dy: int, n_slabs: int, taylor_terms: int,
                 inphase: tuple, with_grad: bool,
                 small_u: bool = False, fff: bool = False,
                 hermitian_eps: bool = True, batched: bool = False):
    """Build (and cache) the jitted FOM program for a static configuration.

    The order set is a TRACED input (mx, my int32 vectors, the (0,0) index
    i0, and the per-term target indices), with only its SIZE and the dense
    difference-grid bounds (Dx, Dy) static -- so one compiled program
    serves every member of a vary_angle/optimize chain (each member's
    period shifts the selected order set, which previously baked a fresh
    ~30s remote compile per member: the dominant cost of the NS2 design
    stage).  Other traced args: xyrra, Lx, Ly, h, and per-term arrays
    eps_p (C), eps_g (C), lam, ux, n_glass_now, cos_theta, weights.  The
    geometry structure matrix (lambda-independent) is computed once and
    shared by all terms.
    """
    run = functools.partial(
        _fom_eval, N=N, Dx=Dx, Dy=Dy, n_slabs=n_slabs,
        taylor_terms=taylor_terms, inphase=inphase, small_u=small_u,
        fff=fff, hermitian_eps=hermitian_eps)

    if with_grad:
        return jax.jit(jax.value_and_grad(run))
    if batched:
        # candidate-geometry batch (derivative-free optimizer probes): vmap
        # over xyrra only, everything else shared
        return jax.jit(jax.vmap(run, in_axes=(0,) + (None,) * 14))
    return jax.jit(run)


def _order_bounds(orders):
    """Quantized static bounds (Dx, Dy) on the order-difference ranges,
    rounded up so neighbouring members of a design chain land on the SAME
    program cache key."""
    o = np.asarray(orders)
    dx = int(o[:, 0].max() - o[:, 0].min())
    dy = int(o[:, 1].max() - o[:, 1].min())
    Dx = int(math.ceil((dx + 1) / 16.0) * 16)
    Dy = int(math.ceil((dy + 1) / 4.0) * 4)
    return Dx, Dy


def _traced_order_args(orders):
    o = np.asarray(orders)
    return (jnp.asarray(o[:, 0], jnp.int32), jnp.asarray(o[:, 1], jnp.int32),
            jnp.asarray(ordmod.order_index(o, 0, 0), jnp.int32))


def apply_static_override(static_override, Dx, Dy, n_slabs, taylor):
    """Validate and apply a ``(Dx, Dy, n_slabs, taylor_terms)`` envelope
    (see :func:`static_envelope`): every component must cover the
    member's own requirement, because a too-small dense grid would drop
    ellipse Fourier content and a too-short series would truncate the
    slab exponential."""
    if static_override is None:
        return Dx, Dy, n_slabs, taylor
    eDx, eDy, ens, ett = static_override
    if not (eDx >= Dx and eDy >= Dy and ens >= n_slabs and ett >= taylor):
        raise ValueError(
            f"static_override {static_override} does not cover this "
            f"member's config (Dx={Dx}, Dy={Dy}, n_slabs={n_slabs}, "
            f"taylor_terms={taylor})")
    return int(eDx), int(eDy), int(ens), int(ett)


def static_envelope(g, period_pairs, wavelengths, numG):
    """Elementwise-max static solve config over explicit
    ``(grating_period, lateral_period)`` pairs: the ``(Dx, Dy, n_slabs,
    taylor_terms)`` tuple that COVERS every listed cell, for
    :mod:`metalens_tpu.optimize_fused`'s ``static_override``.

    Oversizing each component is strictly accuracy-safe: a larger
    (Dx, Dy) dense difference grid is a superset the traced index map
    gathers from; more slabs LOWER the per-slab ``t*q`` (the f32 slab-cap
    cliff moves away, see ``rcwa.slab_cap``); and the max'd series length
    was sized for the per-slab norm of the member that needed it most,
    which bounds every other member's norm once its slab count is also
    raised (``taylor_terms(y)`` is increasing in ``y`` and
    ``y = (k0h*q/n_slabs)^2`` only shrinks under a larger ``n_slabs``).
    The material/height configuration is read from ``g``; only the two
    periods vary across a ``vary_angle`` continuation
    (reference role: the per-member S4 re-setup, ``grating.lua:115``).
    """
    lam_min = min(wavelengths)
    eps_max = 0.0
    for lam in wavelengths:
        ng, nt = resolve_indices(g.n_glass, g.n_tio2, lam)
        eps_max = max(eps_max, abs(complex(nt)) ** 2,
                      abs(complex(ng)) ** 2)
    k0h = 2 * pi * g.cyl_height / lam_min
    Dx = Dy = ns = tt = 0
    for gp, lp in period_pairs:
        orders = ordmod.select_orders(gp, lp, numG)
        dx, dy = _order_bounds(orders)
        n_slabs, taylor = rcwa.slab_schedule(k0h, orders, gp, lp,
                                             lam_min, eps_max)
        Dx, Dy = max(Dx, dx), max(Dy, dy)
        ns, tt = max(ns, n_slabs), max(tt, taylor)
    return Dx, Dy, ns, tt


def _fom_inputs(g, target_wavelength, numG, terms, rdtype):
    terms = tuple(terms) if terms is not None else DEFAULT_FOM_TERMS
    orders, n_slabs, taylor, hermitian = static_solve_config(
        g, [t.wavelength for t in terms], numG)
    angle_in_air = (g.get_angle_in_air(target_wavelength)
                    if target_wavelength is not None else None)
    tgt_idx, inph, eps_p, eps_g, lam, ux, ngs, cth, w = ([] for _ in range(9))
    for t in terms:
        ng, nt = resolve_indices(g.n_glass, g.n_tio2, t.wavelength)
        if t.target_order != 0:
            if angle_in_air is None:
                raise ValueError(
                    "target_wavelength required for deflection FOM terms")
            theta = angle_in_air
        else:
            theta = 0.0
        try:
            tgt_idx.append(ordmod.order_index(orders, t.target_order, 0))
        except ValueError:
            raise ValueError(
                f"target order ({t.target_order},0) outside the numG={numG} "
                f"truncation; increase numG")
        inph.append(bool(t.inphase))
        eps_p.append(complex(nt) ** 2)
        eps_g.append(complex(ng) ** 2)
        lam.append(t.wavelength)
        ux.append(math.sin(theta))
        ngs.append(float(np.real(ng)))
        cth.append(math.cos(theta))
        w.append(t.weight)
    arrays = (cpx.from_np(np.asarray(eps_p)).astype(rdtype),
              cpx.from_np(np.asarray(eps_g)).astype(rdtype),
              jnp.asarray(lam, rdtype), jnp.asarray(ux, rdtype),
              jnp.asarray(ngs, rdtype), jnp.asarray(cth, rdtype),
              jnp.asarray(w, rdtype))
    return (orders, n_slabs, taylor, hermitian, tuple(tgt_idx), tuple(inph),
            arrays)


def fom_of_grating(g, target_wavelength=None, numG: int = 50,
                   terms: Sequence[FomTerm] | None = None,
                   taylor_terms: int | None = None, rdtype=None, xyrra=None,
                   fff: bool = True) -> float:
    """Figure of merit of one Grating (the ``run_lua`` replacement,
    reference stack ``grating.py:283-317`` + ``grating.lua:290-332``).

    The normal-vector Fourier factorization is ON by default -- the
    accuracy class S4 runs every production solve with
    (UsePolarizationDecomposition + UseNormalVectorBasis, reference
    ``grating.lua:180-181``): markedly faster numG convergence, energy-
    exact (fff.nv_blocks symmetrization), measured ~6% extra cost per
    solve on chip.  ``fff=False`` selects the plain Laurent rule."""
    rdtype = rdtype or _default_rdtype()
    orders, n_slabs, taylor, hermitian, tgt, inph, arrays = _fom_inputs(
        g, target_wavelength, numG, terms, rdtype)
    Dx, Dy = _order_bounds(orders)
    fn = _fom_program(len(orders), Dx, Dy, n_slabs,
                      taylor_terms or taylor, inph,
                      False, small_u_ok(g, orders, xyrra=xyrra), fff,
                      hermitian)
    xy = jnp.asarray(xyrra if xyrra is not None else g.xyrra_list,
                     dtype=rdtype)
    omx, omy, i0 = _traced_order_args(orders)
    val = fn(xy, omx, omy, i0, jnp.asarray(tgt, jnp.int32),
             g.grating_period, g.lateral_period, g.cyl_height, *arrays)
    return float(val)


def fom_value_and_grad(g, target_wavelength=None, numG: int = 50,
                       terms=None, taylor_terms: int | None = None,
                       rdtype=None, fff: bool = True):
    """Return a function xyrra -> (fom, d fom / d xyrra), jitted & cached.
    Exact shape derivatives through the whole solve, including the NV
    factorization correction (its geometric term is ~10% of the gradient
    for radius moves; pinned vs finite differences in test_parallel)."""
    rdtype = rdtype or _default_rdtype()
    orders, n_slabs, taylor, hermitian, tgt, inph, arrays = _fom_inputs(
        g, target_wavelength, numG, terms, rdtype)
    Dx, Dy = _order_bounds(orders)
    small_u0 = small_u_ok(g, orders)
    g_max = _diff_g_max(g, orders)
    omx, omy, i0 = _traced_order_args(orders)
    tgt_j = jnp.asarray(tgt, jnp.int32)

    def vg(xyrra):
        fn = _fom_program(len(orders), Dx, Dy, n_slabs,
                          taylor_terms or taylor, inph, True,
                          _small_u_now(small_u0, g_max, xyrra), fff,
                          hermitian)
        return fn(jnp.asarray(xyrra, dtype=rdtype), omx, omy, i0, tgt_j,
                  g.grating_period, g.lateral_period, g.cyl_height, *arrays)
    return vg


def fom_batch_fn(g, target_wavelength=None, numG: int = 50, terms=None,
                 taylor_terms: int | None = None, rdtype=None,
                 fff: bool = True, static_override=None):
    """Return a function ``xyrra_batch (B, nE, 5) -> fom values (B,)``:
    the FOM of B candidate geometries of the same cell in ONE device
    program (vmapped over xyrra, static config shared).

    This is what the derivative-free optimizers dispatch their probes
    through: a serial coordinate sweep is 2*nE*5 candidate geometries, and
    over the remote TPU tunnel each separate dispatch+fetch costs orders of
    magnitude more than the batched solve itself.  Program is cached per
    (static config, B); callers should keep B fixed across calls (pad) so
    an optimize run compiles exactly one signature.

    ``static_override``: optional ``(Dx, Dy, n_slabs, taylor_terms)``
    envelope (:func:`static_envelope`) so every member of a design
    continuation shares one compiled program despite the per-member
    period rescale drifting the exact config."""
    rdtype = rdtype or _default_rdtype()
    orders, n_slabs, taylor, hermitian, tgt, inph, arrays = _fom_inputs(
        g, target_wavelength, numG, terms, rdtype)
    Dx, Dy = _order_bounds(orders)
    Dx, Dy, n_slabs, taylor = apply_static_override(
        static_override, Dx, Dy, n_slabs, taylor)
    small_u0 = small_u_ok(g, orders)
    g_max = _diff_g_max(g, orders)
    omx, omy, i0 = _traced_order_args(orders)
    tgt_j = jnp.asarray(tgt, jnp.int32)
    Lx, Ly, h = g.grating_period, g.lateral_period, g.cyl_height

    def run(xyrra_batch):
        fn = _fom_program(len(orders), Dx, Dy, n_slabs,
                          taylor_terms or taylor, inph, False,
                          _small_u_now(small_u0, g_max, xyrra_batch), fff,
                          hermitian, batched=True)
        return fn(jnp.asarray(xyrra_batch, dtype=rdtype), omx, omy, i0,
                  tgt_j, Lx, Ly, h, *arrays)
    return run


def fom_of_gratings(gratings, target_wavelength=None, numG: int = 100,
                    terms=None) -> list:
    """FOM of a list of Gratings (the reference spawns one OS process per
    grating, ``grating.py:1062-1072``; here the cached jitted program makes
    this a cheap loop, members may differ in period)."""
    return [fom_of_grating(g, target_wavelength=target_wavelength, numG=numG,
                           terms=terms) for g in gratings]


# --------------------------------------------------------------------------
# characterize (the mode-2 / stdout-parsing replacement)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _characterize_program(N: int, Dx: int, Dy: int, n_slabs: int,
                          taylor_terms: int, small_u: bool = False,
                          fff: bool = False, hermitian_eps: bool = True,
                          n_dir: int = 1):
    """Jitted sweep kernel over the joint (wavelength x direction) batch:
    (xyrra, mx, my, i0, Lx, Ly, h, eps_p_u (C[n_lam]), eps_g (C[B]),
    lam[B], ux[B], uy[B]) -> (ampf C[B,2,2N], ampr C[B,2,2N]); pol axis
    0='y', 1='x' incidence; B = n_lam * n_dir, wavelength-major.

    The order set is TRACED (mx, my, i0; see _fom_program) so one compiled
    program characterizes every member of a collection -- previously each
    member's order set baked a fresh ~30s remote compile, the bulk of a
    collection characterize over the dev tunnel.

    The eps Toeplitz / NV-projector build and the E inverse depend only on
    (geometry, wavelength) -- NOT on the incidence direction -- so they are
    built once per wavelength (``eps_p_u`` holds the n_lam = B/n_dir unique
    pillar permittivities) and broadcast across the ``n_dir`` directions.
    For the u_steps=5 grid that removes ~24/25 of the eps-stage cost,
    which the round-3 epsonly stage ledger measured at 47 ms of a 260 ms
    numG=100 batch."""
    from .solver.epsilon import ellipse_structure_toeplitz_traced, \
        toeplitz_from_structure

    def build_eps(xyrra, mx, my, Lx, Ly, eps_p):
        S_struct, at_zero = ellipse_structure_toeplitz_traced(
            mx, my, Dx, Dy, Lx, Ly, xyrra, small_arg_only=small_u)
        E = toeplitz_from_structure(S_struct, at_zero, eps_p)
        if fff:
            from .solver.fff import normal_projector_toeplitz_traced, \
                nv_blocks_from_structure
            P_blocks = normal_projector_toeplitz_traced(
                mx, my, Dx, Dy, Lx, Ly, xyrra)
            # shared recipe incl. the HPD-vs-pivoted solve routing; see
            # fff.nv_blocks_from_structure
            _, M_blocks = nv_blocks_from_structure(
                S_struct, at_zero, eps_p, P_blocks,
                hermitian=hermitian_eps, E=E)
        else:
            M_blocks = ()
        # same routing as layer_smatrix: HPD fast path for lossless eps,
        # pivoted embedding for absorbing
        solve_e = cpx.solve if hermitian_eps else cpx.solve_embed
        Einv = solve_e(E, cpx.eye(N, E.re.dtype))
        return E, Einv, M_blocks

    def run_one(xyrra, orders_j, i0, Lx, Ly, h, E, Einv, M_blocks, eps_g,
                lam, ux, uy):
        c = jnp.zeros((2 * N, 2), dtype=xyrra.dtype)
        c = c.at[i0, 0].set(1.0).at[i0 + N, 1].set(1.0)
        # forward + reflection responses to the 2-column incidence,
        # without materializing the composite S-matrix
        ampf, ampr, Kx, Ky = rcwa.cell_amplitudes_with_eps(
            orders_j, E, Lx, Ly, h, eps_g, lam, ux, uy, c,
            n_slabs=n_slabs, taylor_terms=taylor_terms,
            M_blocks=M_blocks or None, hermitian_eps=hermitian_eps,
            Einv=Einv)
        return ampf.T, ampr.T                       # C (2, 2N)

    def batched(xyrra, mx, my, i0, Lx, Ly, h, eps_p_u, eps_g, lam, ux, uy):
        eps_u = jax.vmap(build_eps,
                         in_axes=(None, None, None, None, None,
                                  0))(xyrra, mx, my, Lx, Ly, eps_p_u)
        # wavelength-major flat batch: repeat each wavelength's eps blocks
        # across its n_dir directions
        eps_flat = jax.tree.map(lambda a: jnp.repeat(a, n_dir, axis=0),
                                eps_u)
        E, Einv, M_blocks = eps_flat
        orders_j = jnp.stack([mx, my], axis=1)
        return jax.vmap(run_one,
                        in_axes=(None, None, None, None, None, None, 0, 0,
                                 0, 0, 0, 0, 0))(xyrra, orders_j, i0, Lx,
                                                 Ly, h, E, Einv, M_blocks,
                                                 eps_g, lam, ux, uy)

    return jax.jit(batched)


def characterize_grating(g, ux_min, ux_max, uy_min, uy_max, u_steps: int,
                         wavelength, numG: int, just_normal: bool = False,
                         convert_to_xy: bool = True, include_tir: bool = False,
                         taylor_terms: int | None = None, rdtype=None,
                         max_scan_order: int = 5, fff: bool = True):
    """Amplitude database sweep for one grating: returns the reference's
    list-of-dicts schema (``grating.py:408-478``), computed as one batched
    on-device solve over the (ux, uy) grid with both incident polarizations
    extracted from a single S-matrix per direction.

    Responses are natively for incident 'x'/'y' polarization (unit amplitude
    in the smooth S4 x/y basis) -- mathematically identical to the
    reference's s/p solve + linear recombination (``grating.py:424-463``).
    Orders kept: |k_in + G| < k_cutoff with k_cutoff = kvac (or n_glass kvac
    with ``include_tir``), scanning |ox|,|oy| <= max_scan_order
    (``grating.lua:406-423``).
    """
    assert convert_to_xy, "raw s/p output retired; x/y is the native basis"
    rdtype = rdtype or _default_rdtype()
    wavelengths = ([float(wavelength)] if np.ndim(wavelength) == 0
                   else list(wavelength))
    orders, n_slabs, taylor, hermitian = static_solve_config(
        g, wavelengths, numG)
    N = orders.shape[0]

    if u_steps == 1:
        ux_list = np.array([(ux_min + ux_max) / 2.0])
        uy_list = np.array([(uy_min + uy_max) / 2.0])
    else:
        ux_list = np.linspace(ux_min, ux_max, u_steps)
        uy_list = np.linspace(uy_min, uy_max, u_steps)
    UX, UY = np.meshgrid(ux_list, uy_list, indexing="ij")
    ux_grid, uy_grid = UX.ravel(), UY.ravel()
    inside = ux_grid ** 2 + uy_grid ** 2 < 1.0
    ux_grid, uy_grid = ux_grid[inside], uy_grid[inside]

    # joint (wavelength x direction) batch, wavelength-major: one device
    # sweep fills an RGB database; eps_p is passed per UNIQUE wavelength
    # (the program builds the u-independent eps blocks once per wavelength)
    n_dir = len(ux_grid)
    Dx, Dy = _order_bounds(orders)
    fn = _characterize_program(N, Dx, Dy, n_slabs,
                               taylor_terms or taylor,
                               small_u_ok(g, orders), fff, hermitian,
                               n_dir)
    omx, omy, i0 = _traced_order_args(orders)
    lam_flat, ux_flat, uy_flat, epsp_u, epsg_flat, ng_flat = \
        [], [], [], [], [], []
    for lam in wavelengths:
        ng, nt = resolve_indices(g.n_glass, g.n_tio2, lam)
        epsp_u.append(complex(nt) ** 2)
        for b in range(n_dir):
            lam_flat.append(lam)
            ux_flat.append(ux_grid[b])
            uy_flat.append(uy_grid[b])
            epsg_flat.append(complex(ng) ** 2)
            ng_flat.append(float(np.real(ng)))
    ux_flat = np.asarray(ux_flat)
    uy_flat = np.asarray(uy_flat)
    lam_flat = np.asarray(lam_flat)

    ampf_c, ampr_c = fn(jnp.asarray(g.xyrra_list, rdtype), omx, omy, i0,
                        g.grating_period,
                        g.lateral_period, g.cyl_height,
                        cpx.from_np(np.asarray(epsp_u)).astype(rdtype),
                        cpx.from_np(np.asarray(epsg_flat)).astype(rdtype),
                        jnp.asarray(lam_flat, rdtype),
                        jnp.asarray(ux_flat, rdtype),
                        jnp.asarray(uy_flat, rdtype))
    ampf = cpx.to_np(ampf_c)   # (B, 2, 2N) host complex
    ampr = cpx.to_np(ampr_c)

    mx = orders[:, 0].astype(float)
    my = orders[:, 1].astype(float)
    data = []
    for b in range(len(ux_flat)):
        lam = lam_flat[b]
        wavelength_in_nm = round(lam / nm)
        cutoff2 = (ng_flat[b] ** 2) if include_tir else 1.0
        Kx = ux_flat[b] + mx * lam / g.grating_period
        Ky = uy_flat[b] + my * lam / g.lateral_period
        prop = (Kx ** 2 + Ky ** 2) < cutoff2
        scan_ok = (np.abs(orders[:, 0]) <= max_scan_order) & \
                  (np.abs(orders[:, 1]) <= max_scan_order)
        for i in np.nonzero(prop & scan_ok)[0]:
            for p, pol_name in enumerate(("y", "x")):
                data.append({
                    "wavelength_in_nm": float(wavelength_in_nm),
                    "x_or_y": pol_name,
                    "ux": float(ux_flat[b]), "uy": float(uy_flat[b]),
                    "ox": int(orders[i, 0]), "oy": int(orders[i, 1]),
                    "ampfy": complex(ampf[b, p, i]),
                    "ampfx": complex(ampf[b, p, i + N]),
                    "ampry": complex(ampr[b, p, i]),
                    "amprx": complex(ampr[b, p, i + N]),
                })
    if just_normal:
        assert all(e["ux"] == 0.001 for e in data)
        assert all(e["uy"] == 0.001 for e in data)
        for entry in list(data):
            for ux_sign, uy_sign in [(-1, 1), (-1, -1), (1, -1)]:
                e2 = dict(entry)
                e2["ux"] *= ux_sign
                e2["uy"] *= uy_sign
                data.append(e2)
    return data
