"""Fused on-device derivative-free optimization (the design loop as ONE
XLA program).

The host-driven optimizers in :mod:`metalens_tpu.optimize` already batch
every FOM probe into single dispatches, but each probe is still one
dispatch+fetch across the runtime boundary, and the accept/reject logic
(plus the exact ``validate()`` geometry check) runs in host numpy between
dispatches.  Measured on the NS2 design workload
(``benchmarks/bench_design_member.py``): one 5-pillar member costs ~505
dispatches whose per-call wall ranges 40 ms .. 1 s over the remote-tunnel
dev setup (the pure batched-solve compute is ~14 ms), plus ~45 s of host
``validate()`` -- i.e. the design stage is ~90% dispatch latency, not
solver time.

This module moves the ENTIRE optimizer loop onto the device:

* :func:`optimize_fused` -- the coordinate-descent ratchet
  (``optimize``'s semantics: screen all 2*nE*5 unit directions, take the
  first feasible non-decreasing one in shuffled order, ratchet-walk it up
  to 10 steps, repeat until a full screen makes no progress) as a
  ``lax.while_loop``; one dispatch runs up to ``max_rounds_per_dispatch``
  accepted moves.
* :func:`optimize2_fused` -- the random simultaneous-perturbation loop
  (``optimize2``'s semantics) as a ``lax.while_loop`` over attempts.
* :func:`feasible_traced` -- an exact jnp twin of
  :func:`metalens_tpu.grating.validate` (same 100-point outlines, same
  periodic metric, same strict thresholds), evaluated on device.

Semantics notes (deliberate, documented differences from the host loops):

* The shuffle / perturbation draws use ``jax.random`` with an explicit
  seed instead of the host RNG, so fused runs are reproducible per seed
  but do NOT replay a host run's draw sequence.  Equal-FOM realizations
  differ anyway (BASELINE.md round 4); tests pin reproducibility and
  improvement, not trajectories.
* Intermediate ``standardize()`` calls are elided: the walk's
  ``start + k*direction`` formulation is exactly equivalent (see
  ``optimize._ratchet_walk``'s proof); the final result is standardized
  and re-validated on the host.
* The FOM program is built with ``small_u=False`` (full J1 branch): on
  device the host cannot re-route candidates whose radii outgrow the
  small-argument headroom mid-loop, so the always-exact branch is used.
* On TPU the geometry feasibility check runs in f32 (the host check is
  f64).  Outline distances are ~1e-7 m with f32 relative error ~6e-8, so
  decisions can flip only within femtometres of the threshold -- either
  outcome is a valid realization.

Reference roles: ``grating.py:685-745`` (optimize), ``:747-795``
(optimize2); this is the TPU-native replacement for its thousands of
per-solve subprocess round trips.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .engine import (_fom_eval, _fom_inputs, _order_bounds,
                     _traced_order_args, _default_rdtype,
                     apply_static_override as _apply_override)
from .grating import validate, min_diameter, min_distance
from .units import nm, degree, pi


# --------------------------------------------------------------------------
# exact on-device validate()
# --------------------------------------------------------------------------

def feasible_traced(xyrra, Lx, Ly, min_r, min_gap, sim=None,
                    how_similar=None, num_points: int = 100,
                    margin: float = 0.0):
    """jnp twin of :func:`metalens_tpu.grating.validate` returning a bool
    scalar: True iff every semi-axis >= ``min_r``, every pillar-pillar and
    pillar-self-replica outline distance >= ``min_gap`` (periodic metric,
    ``num_points`` outline samples -- grating.validate uses 100), and, when
    ``sim`` is given, the trust-region drift bounds hold.  Thresholds are
    the host's exact complements (host rejects on strict ``<`` / ``>``).

    ``margin`` tightens every threshold by that relative amount.  The
    fused optimizers pass 1e-5: the 1-nm / 0.3-deg steps are sometimes
    exactly commensurate with a bound (e.g. 24 x 0.3 deg == the 2% x 360
    deg trust radius), and there a device-f32 accept can flip against the
    host's final f64 ``validate()``.  A 1e-5 relative margin is ~100x the
    f32 evaluation error, so device accepts always re-validate on the
    host, while only a measure-~1e-5 sliver at the exact boundary is
    excluded (for quantized steps: at most the single boundary-exact
    step)."""
    xyrra = jnp.asarray(xyrra)
    nE = xyrra.shape[0]
    lo = 1.0 + margin       # floors rise
    hi = 1.0 - margin       # drift ceilings shrink
    ok = jnp.min(xyrra[:, 2:4]) >= min_r * lo

    theta = jnp.linspace(0.0, 2 * pi, num_points, endpoint=False,
                         dtype=xyrra.dtype)
    dx0 = xyrra[:, 2, None] * jnp.cos(theta)
    dy0 = xyrra[:, 3, None] * jnp.sin(theta)
    ca = jnp.cos(xyrra[:, 4])[:, None]
    sa = jnp.sin(xyrra[:, 4])[:, None]
    px = xyrra[:, 0, None] + dx0 * ca - dy0 * sa      # (nE, P)
    py = xyrra[:, 1, None] + dx0 * sa + dy0 * ca

    # pillar vs its own y-replica: direct (non-modular) metric, matching
    # geometry.min_pairwise_outline_distance
    d2s = ((px[:, :, None] - px[:, None, :]) ** 2
           + (py[:, :, None] - (py[:, None, :] + Ly)) ** 2)
    ok &= jnp.sqrt(jnp.min(d2s)) >= min_gap * lo

    if nE >= 2:
        fx = px.reshape(-1)
        fy = py.reshape(-1)
        dx = jnp.mod(fx[:, None] - fx[None, :], Lx)
        dx = jnp.minimum(dx, Lx - dx)
        dy = jnp.mod(fy[:, None] - fy[None, :], Ly)
        dy = jnp.minimum(dy, Ly - dy)
        d2 = dx * dx + dy * dy
        eid = jnp.repeat(jnp.arange(nE), num_points)
        same = eid[:, None] == eid[None, :]
        d2 = jnp.where(same, jnp.inf, d2)
        ok &= jnp.sqrt(jnp.min(d2)) >= min_gap * lo

    if sim is not None:
        sim = jnp.asarray(sim, xyrra.dtype)
        rel_r = jnp.abs(xyrra[:, 2:4] - sim[:, 2:4]) / sim[:, 2:4]
        ok &= jnp.max(rel_r) <= how_similar * hi
        for col, period in ((0, Lx), (1, Ly), (4, 2 * pi)):
            d = jnp.mod(xyrra[:, col] - sim[:, col], period)
            d = jnp.minimum(d, period - d)
            ok &= jnp.max(d) <= how_similar * period * hi
    return ok


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def _unit_directions(nE, dtype):
    """(2*nE*5, nE, 5) signed unit steps: coordinate (e, p) -> indices
    (e*5+p)*2 (minus) and (e*5+p)*2+1 (plus), the host loop's visit order
    within a coordinate (``for signed in (-size, size)``)."""
    steps = np.zeros((nE * 5 * 2, nE, 5))
    for e in range(nE):
        for p in range(5):
            size = 0.3 * degree if p == 4 else 1 * nm
            steps[(e * 5 + p) * 2, e, p] = -size
            steps[(e * 5 + p) * 2 + 1, e, p] = size
    return jnp.asarray(steps, dtype)


def _ratchet_scan(f1, wfoms, wfeas):
    """Ratchet acceptance over walk steps 2..max (step 1 pre-accepted at
    FOM ``f1``): each step sticks iff all previous stuck, the step is
    feasible (host builds candidates only up to the first infeasible one)
    and its FOM does not drop.  Returns (final fom, steps kept >= 1)."""
    feas_prefix = jnp.cumprod(wfeas.astype(jnp.int32)).astype(bool)

    def step(carry, inp):
        fom_c, alive = carry
        f_k, ok_k = inp
        acc = alive & ok_k & (f_k >= fom_c)
        return (jnp.where(acc, f_k, fom_c), acc), acc

    (fom_out, _), accs = lax.scan(step, (f1, jnp.bool_(True)),
                                  (wfoms, feas_prefix))
    return fom_out, 1 + jnp.sum(accs.astype(jnp.int32))


# --------------------------------------------------------------------------
# fused coordinate descent
# --------------------------------------------------------------------------

# Every FOM evaluation site inside the fused programs is padded to ONE
# fixed vmap batch.  The RCWA FOM dispatches Pallas kernels through a
# custom-vmap rule whose kernel GRID is a function of the batch size, and
# a new (kernel, grid) signature costs ~2-4 min of remote Mosaic compile
# on the tunnel dev setup -- the measured 1670s cold compile of a fused
# program vs ~40s for the host batch-50 FOM program (CPU XLA-only ratio is
# just 2.6x) was three batch sizes (screen nD, walk 9, fom0 1) times the
# kernel set.  Padding screen/walk/fom0 to the same batch collapses that
# to ONE kernel signature set, shared by BOTH fused programs and every
# bracket of a design run (nD = 10*nE varies; the batch does not).  The
# padding rows recompute the current geometry's FOM and are discarded --
# at ~14 ms per batched solve the waste is noise next to one saved
# compile.
FUSED_PROBE_BATCH = 50


def _fom_batch(fom_of, rows, x, batch):
    """vmap ``fom_of`` over ``rows`` padded to ``batch`` with copies of
    ``x``; returns the first ``len(rows)`` results."""
    n = rows.shape[0]
    if n < batch:
        pad = jnp.broadcast_to(x, (batch - n,) + x.shape)
        rows = jnp.concatenate([rows, pad], axis=0)
    return jax.vmap(fom_of)(rows)[:n]


def _cd_run(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
            hermitian_eps, nE, max_rounds, max_steps):
    """The coordinate-descent dispatch body as a pure traceable function
    (jitted by :func:`_cd_program`; composed un-jitted into the sharded
    members-over-mesh program in :mod:`metalens_tpu.parallel.design`)."""
    # NOTE: `sim` is ALWAYS an array input (the unconstrained case passes
    # the start geometry with how_similar=inf, which the trust-region
    # comparisons vacuously satisfy) so seed members and trust-region
    # continuation members share ONE compiled program per (nE, config) --
    # a separate has_sim signature doubled the remote-compile tax of a
    # cold NS2 design run for a branch that costs a handful of VPU ops.
    fom1 = functools.partial(
        _fom_eval, N=N, Dx=Dx, Dy=Dy, n_slabs=n_slabs,
        taylor_terms=taylor_terms, inphase=inphase, small_u=False,
        fff=fff, hermitian_eps=hermitian_eps)
    nD = nE * 5 * 2
    nC = nE * 5
    B = max(FUSED_PROBE_BATCH, nD)

    def run(xyrra, sim, how_similar, min_r, min_gap, key,
            mx, my, i0, tgt, Lx, Ly, h, *arrays):
        dirs = _unit_directions(nE, xyrra.dtype)

        def fom_of(x):
            return fom1(x, mx, my, i0, tgt, Lx, Ly, h, *arrays)

        def feas_of(x):
            return feasible_traced(x, Lx, Ly, min_r, min_gap,
                                   sim=sim, how_similar=how_similar,
                                   margin=1e-5)

        fom0 = _fom_batch(fom_of, xyrra[None], xyrra, B)[0]

        def cond(state):
            _, _, _, stalled, rounds = state
            return (~stalled) & (rounds < max_rounds)

        def body(state):
            x, fom_now, key, _, rounds = state
            key, k1 = jax.random.split(key)
            perm = jax.random.permutation(k1, nC)
            visit = (perm[:, None] * 2 + jnp.arange(2)).reshape(-1)

            cands = x[None] + dirs                       # (nD, nE, 5)
            foms = _fom_batch(fom_of, cands, x, B)       # (nD,)
            feas = jax.vmap(feas_of)(cands)              # (nD,)
            ok = feas & (foms >= fom_now)
            ok_v = ok[visit]
            any_ok = jnp.any(ok_v)
            d_idx = visit[jnp.argmax(ok_v)]
            direction = dirs[d_idx]
            f1 = foms[d_idx]

            ks = jnp.arange(2, max_steps + 1, dtype=x.dtype)
            walk = x[None] + ks[:, None, None] * direction
            wfoms = _fom_batch(fom_of, walk, x, B)
            wfeas = jax.vmap(feas_of)(walk)
            fom_w, kept = _ratchet_scan(f1, wfoms, wfeas)

            x_new = x + kept.astype(x.dtype) * direction
            x = jnp.where(any_ok, x_new, x)
            fom_now = jnp.where(any_ok, fom_w, fom_now)
            return (x, fom_now, key, ~any_ok, rounds + 1)

        state = (xyrra, fom0, key, jnp.bool_(False), jnp.int32(0))
        x, fom_now, key, stalled, rounds = lax.while_loop(cond, body, state)
        return x, fom_now, stalled, rounds, key

    return run


@functools.lru_cache(maxsize=64)
def _cd_program(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
                hermitian_eps, nE, max_rounds, max_steps):
    return jax.jit(_cd_run(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
                           hermitian_eps, nE, max_rounds, max_steps))


def optimize_fused(mygrating_start, target_wavelength=None, similar_to=None,
                   how_similar=None, numG=50, terms=None, seed=0,
                   max_rounds_per_dispatch=64, verbose=True, rdtype=None,
                   static_override=None, min_gap=None):
    """Coordinate-descent ratchet with the WHOLE loop on device (see
    module docstring).  Same acceptance semantics as
    :func:`metalens_tpu.optimize.optimize`; the shuffle comes from
    ``jax.random`` seeded by ``seed``.  Returns an optimized copy.

    ``static_override``: optional ``(Dx, Dy, n_slabs, taylor_terms)``
    envelope (:func:`metalens_tpu.engine.static_envelope`) that must
    cover this member's own config; a whole design continuation then
    shares ONE compiled program per pillar count instead of paying a
    fresh ~10-min remote compile each time the 5%-per-member period
    rescale drifts the quantized bounds or slab schedule (the dominant
    cost of the round-5 cold fused NS2 design: 16 compiled programs,
    ~6700s of the 12018s wall).

    ``min_gap``: optional inflated pillar-clearance floor (metres;
    default the fabrication ``min_distance``).  It is a TRACED input --
    no new program signature -- and exists for continuation headroom:
    the ratchet packs clearances down to whatever floor it is given, and
    a member packed to exactly ``min_distance`` can be geometrically
    impossible to re-seed at the next 5% period shrink (total removable
    slack < the shrink; measured on the bracket-1 best-of-8 member,
    ``benchmarks/multistart_continuation.py``).  Passing
    ``min_distance + delta`` keeps every accepted member re-seedable.
    If the START violates the inflated floor the loop simply cannot
    accept moves until probes re-enter the inflated-feasible set; the
    result is always at least ``min_distance``-feasible."""
    assert validate(mygrating_start, print_details=True,
                    similar_to=similar_to, how_similar=how_similar)
    g = mygrating_start.copy()
    rdtype = rdtype or _default_rdtype()
    orders, n_slabs, taylor, hermitian, tgt, inph, arrays = _fom_inputs(
        g, target_wavelength, numG, terms, rdtype)
    Dx, Dy = _order_bounds(orders)
    Dx, Dy, n_slabs, taylor = _apply_override(
        static_override, Dx, Dy, n_slabs, taylor)
    omx, omy, i0 = _traced_order_args(orders)
    tgt_j = jnp.asarray(tgt, jnp.int32)
    has_sim = similar_to is not None
    prog = _cd_program(len(orders), Dx, Dy, n_slabs, taylor, inph, True,
                       hermitian, g.xyrra_list.shape[0],
                       int(max_rounds_per_dispatch), 10)
    sim = jnp.asarray(similar_to if has_sim else g.xyrra_list, rdtype)
    hs = jnp.asarray(how_similar if has_sim else np.inf, rdtype)
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(g.xyrra_list, rdtype)
    total_rounds = 0
    while True:
        x, fom_now, stalled, rounds, key = prog(
            x, sim, hs, jnp.asarray(min_diameter / 2, rdtype),
            jnp.asarray(min_distance if min_gap is None else min_gap,
                        rdtype), key,
            omx, omy, i0, tgt_j, g.grating_period, g.lateral_period,
            g.cyl_height, *arrays)
        total_rounds += int(rounds)
        if bool(stalled):
            break
    g.xyrra_list = np.asarray(x, np.float64).copy()
    g.standardize()
    assert validate(g, similar_to=similar_to, how_similar=how_similar)
    if verbose:
        print(f"#optimize_fused: fom={float(np.real(fom_now)):.6f} "
              f"after {total_rounds} accepted moves")
        print("mygrating=" + repr(g), flush=True)
    return g


# --------------------------------------------------------------------------
# fused random perturbation
# --------------------------------------------------------------------------

def _rp_run(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
            hermitian_eps, nE, max_steps):
    """Random-perturbation loop body as a pure traceable function (see
    :func:`_cd_run`)."""
    # `sim` always an array input, how_similar=inf when unconstrained --
    # one program per (nE, config); see _cd_program's note.
    fom1 = functools.partial(
        _fom_eval, N=N, Dx=Dx, Dy=Dy, n_slabs=n_slabs,
        taylor_terms=taylor_terms, inphase=inphase, small_u=False,
        fff=fff, hermitian_eps=hermitian_eps)

    def run(xyrra, sim, how_similar, min_r, min_gap, key, attempts,
            step_ceiling, mx, my, i0, tgt, Lx, Ly, h, *arrays):
        B = max(FUSED_PROBE_BATCH, max_steps)

        def fom_of(x):
            return fom1(x, mx, my, i0, tgt, Lx, Ly, h, *arrays)

        def feas_of(x):
            return feasible_traced(x, Lx, Ly, min_r, min_gap,
                                   sim=sim, how_similar=how_similar,
                                   margin=1e-5)

        fom0 = _fom_batch(fom_of, xyrra[None], xyrra, B)[0]

        def cond(state):
            _, _, _, tried = state
            return tried < attempts

        def body(state):
            x, fom_now, key, tried = state
            key, k1 = jax.random.split(key)
            draw = jax.random.uniform(k1, x.shape, x.dtype, -1.0, 1.0)
            direction = step_ceiling * draw
            # step 1 (the proposal) and the ratchet walk's steps 2..max in
            # ONE padded batch: same values as the separate f1 evaluation,
            # one fewer FOM instantiation / kernel signature
            ks = jnp.arange(1, max_steps + 1, dtype=x.dtype)
            walk = x[None] + ks[:, None, None] * direction
            afoms = _fom_batch(fom_of, walk, x, B)
            f1 = afoms[0]
            ok1 = feas_of(walk[0]) & (f1 >= fom_now)

            wfeas = jax.vmap(feas_of)(walk[1:])
            fom_w, kept = _ratchet_scan(f1, afoms[1:], wfeas)

            x = jnp.where(ok1, x + kept.astype(x.dtype) * direction, x)
            fom_now = jnp.where(ok1, fom_w, fom_now)
            return (x, fom_now, key, tried + 1)

        state = (xyrra, fom0, key, jnp.int32(0))
        x, fom_now, key, tried = lax.while_loop(cond, body, state)
        return x, fom_now, tried

    return run


@functools.lru_cache(maxsize=64)
def _rp_program(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
                hermitian_eps, nE, max_steps):
    return jax.jit(_rp_run(N, Dx, Dy, n_slabs, taylor_terms, inphase, fff,
                           hermitian_eps, nE, max_steps))


def optimize2_fused(mygrating_start, target_wavelength=None, attempts=200,
                    similar_to=None, how_similar=None, numG=50, terms=None,
                    seed=0, verbose=True, rdtype=None,
                    static_override=None, min_gap=None):
    """Random simultaneous perturbation with the attempt loop on device
    (semantics of :func:`metalens_tpu.optimize.optimize2`; draws from
    ``jax.random`` seeded by ``seed``).  ``static_override`` and
    ``min_gap``: see :func:`optimize_fused`."""
    assert validate(mygrating_start, print_details=True,
                    similar_to=similar_to, how_similar=how_similar)
    g = mygrating_start.copy()
    rdtype = rdtype or _default_rdtype()
    orders, n_slabs, taylor, hermitian, tgt, inph, arrays = _fom_inputs(
        g, target_wavelength, numG, terms, rdtype)
    Dx, Dy = _order_bounds(orders)
    Dx, Dy, n_slabs, taylor = _apply_override(
        static_override, Dx, Dy, n_slabs, taylor)
    omx, omy, i0 = _traced_order_args(orders)
    tgt_j = jnp.asarray(tgt, jnp.int32)
    has_sim = similar_to is not None
    nE = g.xyrra_list.shape[0]
    prog = _rp_program(len(orders), Dx, Dy, n_slabs, taylor, inph, True,
                       hermitian, nE, 10)
    step_ceiling = np.empty_like(g.xyrra_list)
    step_ceiling[:, 0:4] = 1 * nm
    step_ceiling[:, 4] = 0.1 * degree
    step_ceiling /= g.xyrra_list.size
    sim = jnp.asarray(similar_to if has_sim else g.xyrra_list, rdtype)
    hs = jnp.asarray(how_similar if has_sim else np.inf, rdtype)
    x, fom_now, tried = prog(
        jnp.asarray(g.xyrra_list, rdtype), sim, hs,
        jnp.asarray(min_diameter / 2, rdtype),
        jnp.asarray(min_distance if min_gap is None else min_gap,
                    rdtype), jax.random.PRNGKey(seed),
        jnp.int32(attempts), jnp.asarray(step_ceiling, rdtype),
        omx, omy, i0, tgt_j, g.grating_period, g.lateral_period,
        g.cyl_height, *arrays)
    g.xyrra_list = np.asarray(x, np.float64).copy()
    g.standardize()
    assert validate(g, similar_to=similar_to, how_similar=how_similar)
    if verbose:
        print(f"#optimize2_fused: fom={float(np.real(fom_now)):.6f} "
              f"after {int(tried)} attempts")
        print("mygrating=" + repr(g), flush=True)
    return g


# --------------------------------------------------------------------------
# best-of-k seeded restarts
# --------------------------------------------------------------------------

def optimize_multistart(mygrating_start, k=8, target_wavelength=None,
                        similar_to=None, how_similar=None, numG=50,
                        terms=None, seed=0, attempts=200, verbose=True,
                        rdtype=None, static_override=None, accept=None,
                        min_gap=None):
    """Best-of-``k`` seeded restarts of the fused optimize -> optimize2
    chain from the same start; returns ``(best_grating, foms)`` with
    ``foms`` the k restart scores in seed order.

    Restart spread is real and worth harvesting (it is heavy-tailed, so
    the harvest varies): measured k=8 at all four NS2 bracket seeds on
    chip (``benchmarks/MULTISTART.json``), best-of-8 beat the median
    draw by +0.01 / +0.05 / +0.05 / +0.03 FOM per bracket and set a new
    record over every previously observed single draw in three of the
    four brackets (``QUALITY_AB.json`` k=5 x 2 paths being the prior
    sample; bracket 0's one lucky 0.541 draw there shows the tail this
    is harvesting).  And on a warm program a restart is nearly free: all
    k chains share the ONE compiled (nE, config) program pair -- only
    the ``jax.random`` seed differs -- and a warm fused member costs
    seconds (5.4-9.2 s on chip at the production design config vs
    44-520 s per host-loop member, ``QUALITY_AB.json``), so best-of-8
    costs less than one host-loop restart.  The
    mesh-parallel variant of the same idea is
    :func:`metalens_tpu.parallel.design.sharded_member_optimize` (one
    restart per device, identical member programs).

    Each restart's score is re-computed once through the engine's cached
    FOM program (``Grating.fom``) so all k values come from the identical
    computation rather than each chain's internal running value.

    ``accept``: optional predicate ``grating -> bool``; restarts failing
    it still appear in ``foms`` but are excluded from best selection.
    The motivating gate is continuation feasibility: an aggressively
    optimized unconstrained member can sit ON the ``min_distance``
    boundary, where ``vary_angle``'s 5% period rescale pushes it
    infeasible and ``resize`` refuses it (measured: bracket 1's 0.4209
    record member, ``benchmarks/multistart_continuation.py``).  Raises
    ``ValueError`` if no restart is accepted.

    Reference role: the reference harvested realization spread by
    re-running its design script by hand (``/root/reference/README.md:
    52-94`` workflow); here a restart is a warm dispatch, so best-of-k
    is an API call.
    """
    assert k >= 1
    best_f, best_g, foms = -np.inf, None, []
    for i in range(int(k)):
        g = optimize_fused(mygrating_start,
                           target_wavelength=target_wavelength,
                           similar_to=similar_to, how_similar=how_similar,
                           numG=numG, terms=terms, seed=seed + 2 * i,
                           verbose=verbose, rdtype=rdtype,
                           static_override=static_override,
                           min_gap=min_gap)
        g = optimize2_fused(g, target_wavelength=target_wavelength,
                            attempts=attempts, similar_to=similar_to,
                            how_similar=how_similar, numG=numG,
                            terms=terms, seed=seed + 2 * i + 1,
                            verbose=verbose, rdtype=rdtype,
                            static_override=static_override,
                            min_gap=min_gap)
        f = float(np.real(g.fom(target_wavelength=target_wavelength,
                                numG=numG, terms=terms)))
        foms.append(f)
        if f > best_f and (accept is None or accept(g)):
            best_f, best_g = f, g
    if best_g is None:
        raise ValueError(f"no restart of k={k} passed the accept gate")
    if verbose:
        print(f"#optimize_multistart: best fom={best_f:.6f} of k={k} "
              f"(spread {min(foms):.4f}-{max(foms):.4f})", flush=True)
    return best_g, foms
