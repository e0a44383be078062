"""Unit-cell optimizers.

Three optimizers over the same differentiable FOM:

* :func:`optimize`  -- cyclic coordinate descent, exact parity with the
  reference (``grating.py:685-745``): shuffled (ellipse, param) sweep, +-1nm
  (+-0.3 deg) steps, repeat a winning step up to 10x, stop after a full pass
  with no improvement.  Kept for parity testing and as a derivative-free
  fallback.
* :func:`optimize2` -- random simultaneous perturbation, parity with
  ``grating.py:747-795``.
* :func:`optimize_gradient` -- NEW: projected Adam through the solver's
  exact shape derivatives, with the validate() constraints expressed as
  differentiable penalties.  This is the TPU-native path: tens of FOM+grad
  evaluations replace the reference's thousands of solves.

All three honour the ``similar_to`` / ``how_similar`` trust region and print
new records as spec-roundtrip ``repr`` strings (the reference's persistence
mechanism, ``grating.py:739-741``).
"""

from __future__ import annotations

import math
import random

import numpy as np
import jax
import jax.numpy as jnp

from .grating import Grating, GratingCollection, validate, resize
from .engine import fom_of_grating, fom_batch_fn, fom_value_and_grad
from .units import nm, degree, pi, inf


# --------------------------------------------------------------------------
# parity optimizers (derivative-free)
# --------------------------------------------------------------------------

class _BatchedProbe:
    """All candidate-geometry FOM probes of a derivative-free optimize run
    through ONE cached vmapped device program of FIXED batch size.

    A serial coordinate sweep is 2*nE*5 probe dispatches and each ratchet
    walk up to 10 more; over the remote TPU tunnel every dispatch+fetch
    round trip costs orders of magnitude more than the batched solves
    themselves (CLAUDE.md perf model), so the optimizers below gather their
    candidates and evaluate them in single dispatches.  Short candidate
    lists are padded by repetition so every call hits the same compiled
    signature."""

    def __init__(self, g, target_wavelength, numG, terms, B,
                 static_override=None):
        self.B = B
        self._fn = fom_batch_fn(g, target_wavelength=target_wavelength,
                                numG=numG, terms=terms,
                                static_override=static_override)

    def __call__(self, candidates):
        candidates = list(candidates)
        assert candidates
        out = []
        for i in range(0, len(candidates), self.B):
            chunk = candidates[i:i + self.B]
            batch = np.stack(chunk + [chunk[-1]] * (self.B - len(chunk)))
            out.append(np.asarray(self._fn(batch))[:len(chunk)])
        return np.concatenate(out)


def _ratchet_walk(g, direction, fom_now, probe, similar_to, how_similar,
                  verbose, loud_validate=False, max_steps=10):
    """Walk ``g.xyrra_list`` along a fixed ``direction`` (full xyrra-shaped
    step), keeping each step only if the geometry stays feasible and the
    FOM does not drop (ties advance -- the reference's acceptance rule).
    The first rejected step ends the walk; at most ``max_steps`` steps
    stick.  Every kept step is standardized and, when ``verbose``,
    announced as a new record in the reference's spec-roundtrip format.
    Returns (fom after the walk, whether any step stuck).

    All candidate FOMs of the walk are evaluated in ONE batched dispatch
    up front; the acceptance ratchet then runs on the host against the
    precomputed values.  This is exact because standardize() only wraps
    pillars into the canonical periodic replica, which changes neither the
    FOM (periodic structure) nor validate() (modular distances) -- so
    ``start + k*direction`` sees the same physics the serial
    step/standardize/step path did."""
    start = g.xyrra_list.copy()
    scratch = g.copy()
    cands = []
    for k in range(1, max_steps + 1):
        scratch.xyrra_list = start + k * direction
        if not validate(scratch, similar_to=similar_to,
                        how_similar=how_similar):
            break
        cands.append(start + k * direction)
    if not cands:
        return fom_now, False
    foms = probe(cands)
    kept = 0
    for k, fom_stepped in enumerate(foms, start=1):
        if fom_stepped < fom_now:
            break
        fom_now = fom_stepped
        kept = k
    for k in range(1, kept + 1):
        g.xyrra_list[...] = start + k * direction
        g.standardize()
        assert validate(g, similar_to=similar_to, how_similar=how_similar,
                        print_details=loud_validate)
        if verbose:
            print("#New record! ", foms[k - 1])
            print("mygrating=" + repr(g), flush=True)
            print("", flush=True)
    return fom_now, kept > 0


def _probe_batch_size(g):
    """One signature serves optimize()'s direction cache (2*nE*5), the
    ratchet walks (10), and optimize2's attempt chunks."""
    return max(16, 2 * g.xyrra_list.size)


def optimize(mygrating_start, target_wavelength, similar_to=None,
             how_similar=None, subfolder=None, numG=50, terms=None,
             verbose=True, rng=None, static_override=None):
    """Cyclic coordinate descent: shuffled sweeps over every (ellipse,
    parameter) coordinate, ratcheting each one by +-1 nm (+-0.3 deg for the
    rotation column) while the FOM holds or improves, until a full sweep
    makes no progress.  Behavioral parity with the reference's
    derivative-free optimizer (``grating.py:685-745``): same step sizes,
    acceptance rule, per-direction step cap, and stopping criterion.
    ``subfolder`` is accepted for API parity and ignored (no temp dirs).

    Probe batching: the first steps of ALL 2*nE*5 directions are evaluated
    in one device dispatch per geometry change, and each winning walk in
    one more -- a full no-progress sweep (every run's last pass) costs one
    dispatch instead of 2*nE*5.

    ``rng``: optional numpy Generator controlling the sweep shuffle; None
    keeps the stdlib global RNG (historical behavior).  Design
    realizations with equal FOMs were measured to differ 2x in raw
    off-design transmission (BASELINE.md round 4), so reproducible runs
    should seed this."""
    assert validate(mygrating_start, print_details=True,
                    similar_to=similar_to, how_similar=how_similar)
    g = mygrating_start.copy()
    probe = _BatchedProbe(g, target_wavelength, numG, terms,
                          _probe_batch_size(g),
                          static_override=static_override)

    fom_now = probe([g.xyrra_list])[0]
    if verbose:
        print("fom now...", fom_now, flush=True)
    n_ell, n_par = g.xyrra_list.shape
    coords = [(e, p) for e in range(n_ell) for p in range(n_par)]

    def all_directions():
        dirs = {}
        for e, p in coords:
            size = 0.3 * degree if p == 4 else 1 * nm
            for signed in (-size, size):
                d = np.zeros_like(g.xyrra_list)
                d[e, p] = signed
                dirs[(e, p, signed > 0)] = d
        return dirs

    scratch = g.copy()
    stalled = False
    first_step_fom = None   # invalidated whenever the geometry moves
    while not stalled:
        if rng is None:
            random.shuffle(coords)
        else:
            rng.shuffle(coords)
        stalled = True
        for e, p in coords:
            size = 0.3 * degree if p == 4 else 1 * nm
            for signed in (-size, size):
                if first_step_fom is None:
                    dirs = all_directions()
                    keys = list(dirs)
                    vals = probe([g.xyrra_list + dirs[k] for k in keys])
                    first_step_fom = dict(zip(keys, vals))
                direction = dirs[(e, p, signed > 0)]
                # screen against the cache: same validate-then-fom
                # acceptance the serial loop applied to the walk's first
                # step, without a dispatch
                scratch.xyrra_list = g.xyrra_list + direction
                if not validate(scratch, similar_to=similar_to,
                                how_similar=how_similar):
                    continue
                if first_step_fom[(e, p, signed > 0)] < fom_now:
                    continue
                fom_now, moved = _ratchet_walk(
                    g, direction, fom_now, probe, similar_to,
                    how_similar, verbose)
                if moved:
                    stalled = False
                    first_step_fom = None
                    break    # this direction won; don't probe its opposite
    return g


def optimize2(mygrating_start, target_wavelength, attempts=inf,
              similar_to=None, how_similar=None, subfolder=None, numG=50,
              terms=None, verbose=True, rng=None, static_override=None):
    """Random simultaneous perturbation: each attempt draws one uniform
    step for ALL coordinates at once (per-coordinate ceiling 1 nm / 0.1 deg,
    divided by the coordinate count) and ratchets along it.  Behavioral
    parity with reference ``grating.py:747-795``.

    Probe batching: attempt directions are drawn in chunks (same draw
    sequence as the serial loop -- attempt i consumes the i-th draw either
    way) and their first steps screened in one dispatch; only accepted
    attempts pay a walk dispatch, and a chunk whose geometry went stale
    after a win is re-screened in one more."""
    assert validate(mygrating_start, print_details=True,
                    similar_to=similar_to, how_similar=how_similar)
    rng = rng or np.random
    g = mygrating_start.copy()
    probe = _BatchedProbe(g, target_wavelength, numG, terms,
                          _probe_batch_size(g),
                          static_override=static_override)

    fom_now = probe([g.xyrra_list])[0]
    if verbose:
        print("fom now...", fom_now, flush=True)
    step_ceiling = np.empty_like(g.xyrra_list)
    step_ceiling[:, 0:4] = 1 * nm
    step_ceiling[:, 4] = 0.1 * degree
    step_ceiling /= g.xyrra_list.size

    scratch = g.copy()
    tried = 0
    pending = []          # drawn-ahead directions, consumed in draw order
    pending_fom = []      # their first-step FOMs from the current geometry
    while tried < attempts:
        if not pending:
            n_draw = probe.B
            if attempts != inf:
                n_draw = min(n_draw, int(attempts) - tried)
            pending = [step_ceiling
                       * (2 * rng.random(size=step_ceiling.shape) - 1)
                       for _ in range(n_draw)]
            pending_fom = []
        if not pending_fom:
            pending_fom = list(probe([g.xyrra_list + d for d in pending]))
        direction = pending.pop(0)
        first_fom = pending_fom.pop(0)
        tried += 1
        scratch.xyrra_list = g.xyrra_list + direction
        if not validate(scratch, similar_to=similar_to,
                        how_similar=how_similar):
            continue
        if first_fom < fom_now:
            continue
        fom_now, moved = _ratchet_walk(g, direction, fom_now, probe,
                                       similar_to, how_similar, verbose,
                                       loud_validate=True)
        if moved:
            pending_fom = []     # geometry moved: re-screen the chunk
    return g


# --------------------------------------------------------------------------
# differentiable constraints + gradient optimizer
# --------------------------------------------------------------------------

def constraint_penalty(xyrra, grating_period, lateral_period,
                       min_radius, min_gap, similar_to=None,
                       how_similar=None, num_points: int = 48,
                       sharpness: float = 4.0):
    """Smooth penalty version of :func:`metalens_tpu.grating.validate`:
    zero on (strictly) feasible geometry, growing quadratically outside.
    Pure jnp, differentiable."""
    x0, y0 = xyrra[:, 0], xyrra[:, 1]
    rx, ry, ang = xyrra[:, 2], xyrra[:, 3], xyrra[:, 4]
    pen = (jax.nn.relu(min_radius - rx) ** 2
           + jax.nn.relu(min_radius - ry) ** 2).sum() / min_radius ** 2

    theta = jnp.linspace(0.0, 2 * pi, num_points, endpoint=False)
    dx0 = rx[:, None] * jnp.cos(theta)
    dy0 = ry[:, None] * jnp.sin(theta)
    ca, sa = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    px = x0[:, None] + dx0 * ca - dy0 * sa        # (nE, P)
    py = y0[:, None] + dx0 * sa + dy0 * ca

    nE = xyrra.shape[0]
    fx = px.reshape(-1)
    fy = py.reshape(-1)
    dx = jnp.mod(fx[:, None] - fx[None, :], grating_period)
    dx = jnp.minimum(dx, grating_period - dx)
    dy = jnp.mod(fy[:, None] - fy[None, :], lateral_period)
    dy = jnp.minimum(dy, lateral_period - dy)
    d2 = dx * dx + dy * dy
    eid = jnp.repeat(jnp.arange(nE), num_points)
    same = eid[:, None] == eid[None, :]
    d2 = jnp.where(same, jnp.inf, d2)
    viol = jax.nn.relu(min_gap - jnp.sqrt(d2 + 1e-30))
    pen = pen + (viol ** 2).sum() / min_gap ** 2

    # self vs own y-replica
    d2s = (px[:, :, None] - px[:, None, :]) ** 2 + \
          (py[:, :, None] - (py[:, None, :] + lateral_period)) ** 2
    viol_s = jax.nn.relu(min_gap - jnp.sqrt(d2s + 1e-30))
    pen = pen + (viol_s ** 2).sum() / min_gap ** 2

    if similar_to is not None:
        sim = jnp.asarray(similar_to)
        rel_r = jnp.abs(xyrra[:, 2:4] - sim[:, 2:4]) / sim[:, 2:4]
        pen = pen + (jax.nn.relu(rel_r - how_similar) ** 2).sum() / how_similar ** 2
        for col, period in ((0, grating_period), (1, lateral_period),
                            (4, 2 * pi)):
            d = jnp.mod(xyrra[:, col] - sim[:, col], period)
            d = jnp.minimum(d, period - d)
            pen = pen + (jax.nn.relu(d / period - how_similar) ** 2).sum() / how_similar ** 2
    return sharpness * pen


def optimize_gradient(mygrating_start, target_wavelength, steps: int = 120,
                      learning_rate=None, similar_to=None, how_similar=None,
                      numG=50, terms=None, penalty_weight: float = 30.0,
                      verbose=True, seed: int = 0):
    """Gradient-ascent optimization of the FOM via autodiff through the
    solver (Adam + differentiable constraint penalties + trust region).

    Returns the best *validate()-feasible* iterate encountered.  Typically
    reaches a better optimum than :func:`optimize` in ~100 FOM+grad
    evaluations instead of thousands of FOM evaluations.
    """
    import optax
    from .grating import min_diameter, min_distance

    assert validate(mygrating_start, print_details=True,
                    similar_to=similar_to, how_similar=how_similar)
    g = mygrating_start.copy()
    vg = fom_value_and_grad(g, target_wavelength=target_wavelength,
                            numG=numG, terms=terms)
    Lx, Ly = g.grating_period, g.lateral_period

    def loss_and_grad(xyrra):
        fom, dfom = vg(xyrra)
        pen, dpen = jax.value_and_grad(constraint_penalty)(
            xyrra, Lx, Ly, min_diameter / 2, min_distance,
            similar_to, how_similar)
        return fom, pen, dfom - penalty_weight * dpen  # ascend fom, descend pen

    if learning_rate is None:
        # Adam's per-parameter RMS normalization makes the step size the unit
        # of motion: ~0.5 nm per step for lengths.  The rotation column rides
        # the same normalized step (0.5e-9 rad would be uselessly small, so
        # scale it up to ~0.03 deg equivalent).
        learning_rate = 0.5 * nm
    opt = optax.adam(learning_rate)
    x = jnp.asarray(g.xyrra_list)
    scale = jnp.ones_like(x).at[:, 4].set((0.03 * degree) / (0.5 * nm))
    state = opt.init(x)

    best_fom = fom_of_grating(g, target_wavelength=target_wavelength,
                              numG=numG, terms=terms)
    best_xyrra = np.array(g.xyrra_list, copy=True)

    def consider(xyrra, fom_at_x, pen, step):
        # feasibility bookkeeping on the host: keep the best iterate that
        # passes the exact (non-smoothed) validate()
        nonlocal best_fom, best_xyrra
        g.xyrra_list = np.asarray(xyrra).copy()
        if validate(g, similar_to=similar_to, how_similar=how_similar):
            f_new = float(np.real(fom_at_x))
            if f_new > best_fom:
                best_fom = f_new
                best_xyrra = np.asarray(xyrra).copy()
                if verbose:
                    print(f"#step {step}: fom={best_fom:.6f} "
                          f"pen={float(pen):.3g}")

    for step in range(steps):
        # one value_and_grad dispatch per iterate: this evaluation both
        # scores the PREVIOUS update's iterate and drives the next update
        # (re-probing the fresh iterate after the update would double the
        # dominant cost of the gradient path)
        fom, pen, grad_total = loss_and_grad(x)
        if step > 0:     # step 0 is the start geometry, already in best
            consider(x, fom, pen, step)
        updates, state = opt.update(-grad_total, state)
        x = optax.apply_updates(x, updates * scale)
    # the final update's iterate has not been scored yet
    consider(x, vg(x)[0], 0.0, steps)
    g.xyrra_list = best_xyrra
    g.standardize()
    assert validate(g, similar_to=similar_to, how_similar=how_similar)
    if verbose:
        print("best fom:", best_fom)
        print("mygrating=" + repr(g), flush=True)
    return g


# --------------------------------------------------------------------------
# continuation over deflection angle
# --------------------------------------------------------------------------

def _continuation_ladder(all_gratings, end_angle, change_each_step):
    """The ``(grating_period, lateral_period)`` of every member a
    :func:`vary_angle` continuation will visit, starting from the newest
    member, WITHOUT optimizing anything -- the same ``get_one`` period
    arithmetic the real loop steps through (periods are a deterministic
    geometric ladder; only the xyrra content depends on the optimizer)."""
    cyl = all_gratings.lens_type == "cyl"
    prev = all_gratings.grating_list[-1 if cyl else 0]
    pairs = [(prev.grating_period, prev.lateral_period)]
    lam = all_gratings.target_wavelength
    gp, lp = prev.grating_period, prev.lateral_period
    while True:
        if cyl:
            g = all_gratings.get_one(grating_period=gp * change_each_step)
        else:
            g = all_gratings.get_one(lateral_period=lp * change_each_step)
        a = g.get_angle_in_air(target_wavelength=lam)
        if (cyl and a < end_angle) or (not cyl and a > end_angle):
            break
        pairs.append((g.grating_period, g.lateral_period))
        gp, lp = g.grating_period, g.lateral_period
    return pairs


def continuation_static_envelope(start_grating, end_angle, lens_type,
                                 target_wavelength, numG=50, terms=None,
                                 change_each_step=1.01):
    """The ``(Dx, Dy, n_slabs, taylor_terms)`` envelope covering EVERY
    member of a :func:`vary_angle` continuation (including the start
    grating itself), for the fused optimizers' ``static_override`` -- one
    compiled program per pillar count for a whole design bracket instead
    of a fresh remote compile each time the per-member period rescale
    drifts the static solve config.  Compute it from the continuation's
    seed BEFORE optimizing the seed, and pass the same tuple to the seed's
    fused calls and to ``vary_angle(static_override=...)``."""
    from .engine import static_envelope, DEFAULT_FOM_TERMS
    gc = _init_collection(start_grating, lens_type, target_wavelength)
    pairs = _continuation_ladder(gc, end_angle, change_each_step)
    tt = tuple(terms) if terms is not None else DEFAULT_FOM_TERMS
    return static_envelope(start_grating, pairs,
                           [t.wavelength for t in tt], numG)


def _init_collection(start_grating, lens_type, target_wavelength):
    if lens_type == "cyl":
        return GratingCollection(
            target_wavelength=target_wavelength,
            lateral_period=start_grating.lateral_period,
            grating_list=[start_grating], lens_type="cyl")
    assert lens_type == "round"
    angle_in_air = start_grating.get_angle_in_air(
        target_wavelength=target_wavelength)
    lateral_period = start_grating.lateral_period / math.tan(angle_in_air)
    return GratingCollection(
        target_wavelength=target_wavelength,
        lateral_period=lateral_period,
        grating_list=[start_grating], lens_type="round")


def vary_angle(start_grating=None, end_angle=None, lens_type=None,
               target_wavelength=None, start_grating_collection=None,
               subfolder=None, numG=50, terms=None, use_gradient=False,
               optimize2_attempts=200, gradient_steps=120, verbose=True,
               change_each_step=1.01, similarity_each_step=0.03, rng=None,
               use_fused=False, static_override=None, min_gap=None):
    """Geometric continuation building a GratingCollection (reference
    ``grating.py:820-918``): step the period by 1% per iteration, re-seed
    from the previous solution via :func:`resize`, re-optimize under a 3%
    trust region, until ``end_angle`` is crossed.

    ``use_gradient=True`` swaps the inner loop for
    :func:`optimize_gradient` (plus a short optimize2 polish).

    The derivative-free default is a MEASURED choice, not inertia: on a
    config-3-style continuation (1 pillar, numG=20, 4 members, CPU) the
    ratchet loop was both faster (1.8 s vs 49 s -- the cached jitted FOM
    program makes each probe ~ms, while the gradient path pays
    value_and_grad + feasibility round trips per step) and better (mean
    member FOM 0.327 vs 0.304; Adam's fixed-step walk stalls inside the 3%
    trust region where the ratchet keeps climbing).  The gradient path
    wins for many-pillar cells and large numG where one solve is
    expensive -- choose per workload.

    ``change_each_step`` / ``similarity_each_step`` control the
    continuation density (reference hardwires 1.01 / 0.03,
    ``grating.py:838-841``; defaults unchanged).  A full high-NA
    continuation (8 deg -> 60 deg) is ~184 members at 1% steps; each member
    is a fresh XLA program signature, so coarser steps (e.g. 1.05 with a
    proportionally wider 0.15 trust region, ~37 members) trade interpolation
    density in the collection for a much cheaper design stage --
    GratingCollection.get_one blends between members either way.

    ``rng``: optional numpy Generator threaded into every inner
    optimize/optimize2 call for reproducible continuations (None = the
    historical global-RNG behavior).

    ``use_fused=True`` routes each member through
    :func:`metalens_tpu.optimize_fused.optimize_fused` /
    ``optimize2_fused`` — the same acceptance semantics with the whole
    ratchet loop on device (one dispatch per ~max_rounds accepted moves
    instead of one per probe).  Member seeds are drawn from ``rng`` so a
    seeded continuation stays reproducible; exclusive of
    ``use_gradient``.

    ``min_gap`` (fused path only): inflated pillar-clearance floor
    passed to the fused member optimizers so every accepted member keeps
    enough slack to survive the NEXT period rescale — a member ratcheted
    to exactly ``min_distance`` can make :func:`resize` geometrically
    impossible at the following rung (see
    ``optimize_fused.optimize_fused``'s docstring for the measured
    case).  A traced input, so it costs no extra compile.
    """
    if use_fused and use_gradient:
        raise ValueError("use_fused and use_gradient are exclusive")
    if start_grating_collection is None:
        if start_grating is None or target_wavelength is None:
            raise ValueError(
                "provide BOTH start_grating and target_wavelength, or a "
                "start_grating_collection")
    elif start_grating is not None or target_wavelength is not None:
        raise ValueError(
            "start_grating_collection is exclusive of start_grating/"
            "target_wavelength (the collection carries its own)")

    if start_grating_collection is not None:
        all_gratings = start_grating_collection
    else:
        all_gratings = _init_collection(start_grating, lens_type,
                                        target_wavelength)

    assert change_each_step > 1 and similarity_each_step > 0

    if use_fused and static_override is None:
        # one compiled program (pair) for the whole continuation: cover
        # every ladder member's static solve config up front
        from .engine import static_envelope, DEFAULT_FOM_TERMS
        pairs = _continuation_ladder(all_gratings, end_angle,
                                     change_each_step)
        tt = tuple(terms) if terms is not None else DEFAULT_FOM_TERMS
        static_override = static_envelope(
            all_gratings.grating_list[0], pairs,
            [t.wavelength for t in tt], numG)

    while True:
        if verbose:
            print("grating collection so far:")
            print(repr(all_gratings))

        if all_gratings.lens_type == "cyl":
            grating_prev = all_gratings.grating_list[-1]
            grating_new_start = all_gratings.get_one(
                grating_period=grating_prev.grating_period * change_each_step)
        else:
            grating_prev = all_gratings.grating_list[0]
            grating_new_start = all_gratings.get_one(
                lateral_period=grating_prev.lateral_period * change_each_step)
        angle_in_air = grating_new_start.get_angle_in_air(
            target_wavelength=all_gratings.target_wavelength)
        if angle_in_air < end_angle and all_gratings.lens_type == "cyl":
            break
        if angle_in_air > end_angle and all_gratings.lens_type == "round":
            break

        if verbose:
            print("Optimizing for angle_in_air = ", angle_in_air / degree,
                  "degree")
        grating_new_start = resize(grating_prev, grating_new_start)

        if use_fused:
            from .optimize_fused import optimize_fused, optimize2_fused
            seeds = ([int(rng.integers(2 ** 31)) for _ in range(2)]
                     if rng is not None
                     else [random.randrange(2 ** 31) for _ in range(2)])
            grating_new = optimize_fused(
                grating_new_start,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                verbose=verbose, seed=seeds[0],
                static_override=static_override, min_gap=min_gap)
            grating_new = optimize2_fused(
                grating_new, attempts=optimize2_attempts,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                verbose=verbose, seed=seeds[1],
                static_override=static_override, min_gap=min_gap)
        elif use_gradient:
            grating_new = optimize_gradient(
                grating_new_start,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                steps=gradient_steps, verbose=verbose)
            grating_new = optimize2(
                grating_new, attempts=optimize2_attempts,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                verbose=verbose, rng=rng)
        else:
            grating_new = optimize(
                grating_new_start,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                verbose=verbose, rng=rng,
                static_override=static_override)
            grating_new = optimize2(
                grating_new, attempts=optimize2_attempts,
                target_wavelength=all_gratings.target_wavelength,
                similar_to=grating_new_start.xyrra_list,
                how_similar=similarity_each_step, numG=numG, terms=terms,
                verbose=verbose, rng=rng,
                static_override=static_override)

        all_gratings.add_one(grating_new)

    return all_gratings
