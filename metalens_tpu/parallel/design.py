"""Sharded design: independent fused-optimizer members over the device mesh.

The NS2 v5e-8 design split rests on design members being independent work
items (the reference fanned them out as OS processes,
``/root/reference/grating.py:1062-1072``).  This module makes that split
EXECUTABLE for the fused on-device optimizers: N member optimizations --
each the full coordinate-descent ratchet + random-perturbation loop of
:mod:`metalens_tpu.optimize_fused` -- run concurrently, one member per
device, via ``shard_map`` over the mesh's ``cells`` axis.

Each shard runs the IDENTICAL single-member program the one-chip path
compiles (same ``FUSED_PROBE_BATCH`` padding, hence the same Pallas kernel
signature set on TPU backends); no collectives are needed because members
never communicate.  Members must share the static solve configuration
(same pillar count, same order count -- i.e. one vary_angle bracket /
seed-restart family); ``n_slabs``/``taylor_terms`` are maxed across
members, which is conservative-exact (more slabs shrink each slab's
Taylor argument).

Two production uses:

* **seed restarts**: equal-FOM design realizations measured ~2x apart in
  off-design behavior (BASELINE.md round 4) -- run K seeds of the same
  member concurrently and keep the best;
* **bracket seeds**: the per-bracket seed optimizations of a multi-bracket
  design (northstar2 stage_design) run concurrently before the sequential
  vary_angle continuations.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..engine import (_fom_inputs, _order_bounds, _traced_order_args,
                      _default_rdtype)
from ..grating import validate, min_diameter, min_distance
from ..optimize_fused import _cd_run, _rp_run, FUSED_PROBE_BATCH
from ..units import nm, degree


def _stack_member_inputs(gratings, target_wavelength, numG, terms, rdtype,
                         similar_to=None, how_similar=None):
    """Per-member traced inputs stacked on a leading member axis, plus the
    shared static configuration (asserted equal / maxed across members)."""
    per = [_fom_inputs(g, target_wavelength, numG, terms, rdtype)
           for g in gratings]
    N = {len(p[0]) for p in per}
    assert len(N) == 1, f"members disagree on order count: {N}"
    N = N.pop()
    herm = {p[3] for p in per}
    assert len(herm) == 1
    inph = {p[5] for p in per}
    assert len(inph) == 1
    n_slabs = max(p[1] for p in per)
    taylor = max(p[2] for p in per)
    Dxy = [_order_bounds(p[0]) for p in per]
    Dx = max(d for d, _ in Dxy)
    Dy = max(d for _, d in Dxy)

    sims = (similar_to if similar_to is not None
            else [g.xyrra_list for g in gratings])
    hs = (np.asarray(how_similar, float) * np.ones(len(gratings))
          if how_similar is not None else np.full(len(gratings), np.inf))

    def one(i):
        g = gratings[i]
        omx, omy, i0 = _traced_order_args(per[i][0])
        return ((jnp.asarray(g.xyrra_list, rdtype),
                 jnp.asarray(sims[i], rdtype),
                 jnp.asarray(hs[i], rdtype),
                 jnp.asarray(min_diameter / 2, rdtype),
                 jnp.asarray(min_distance, rdtype)),
                (omx, omy, i0, jnp.asarray(per[i][4], jnp.int32),
                 jnp.asarray(g.grating_period, rdtype),
                 jnp.asarray(g.lateral_period, rdtype),
                 jnp.asarray(g.cyl_height, rdtype)) + per[i][6])

    members = [one(i) for i in range(len(gratings))]
    geo = jax.tree.map(lambda *xs: jnp.stack(xs), *[m[0] for m in members])
    fom_args = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[m[1] for m in members])
    static = dict(N=N, Dx=Dx, Dy=Dy, n_slabs=n_slabs, taylor_terms=taylor,
                  inphase=inph.pop(), fff=True, hermitian_eps=herm.pop(),
                  nE=gratings[0].xyrra_list.shape[0])
    return geo, fom_args, static


def _sharded(mesh, fn, axis="cells"):
    """shard_map ``fn`` over the mesh's first axis: every input and output
    carries the member axis at dim 0, one member per device; inside the
    shard the leading length-1 axis is squeezed away so each device traces
    the exact single-member program."""
    spec = P(axis)

    def shard_fn(*stacked):
        one = jax.tree.map(lambda x: x[0], stacked)
        out = fn(*one)
        return jax.tree.map(lambda x: jnp.asarray(x)[None], out)

    # check_vma off: the optimizer while_loop carries mix per-member
    # (varying) state with freshly created loop constants, which the
    # varying-manual-axes checker rejects; there are no collectives here
    # (members are independent), so the check buys nothing.
    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=spec, out_specs=spec,
        check_vma=False))


def sharded_member_optimize(mesh, gratings, target_wavelength=None,
                            numG=50, terms=None, seeds=None, attempts=200,
                            similar_to=None, how_similar=None,
                            max_rounds_per_dispatch=256, max_dispatches=32,
                            rdtype=None, verbose=True, axis="cells"):
    """Run ``optimize_fused`` + ``optimize2_fused`` on every member of
    ``gratings`` concurrently, one member per device of ``mesh``.

    Members must share pillar count and order count (one bracket /
    seed-restart family); the member list is padded to the mesh size by
    repeating the last member (pad results are discarded).  ``seeds``
    (default ``range(len(gratings))``) feed ``jax.random`` exactly as the
    single-device fused path does.  Returns ``(optimized_gratings, foms)``.

    Reference role: the per-member OS-process fan-out this replaces,
    ``/root/reference/grating.py:1062-1072``.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    M = len(gratings)
    assert 1 <= M <= n_dev, (M, n_dev)
    for i, g in enumerate(gratings):
        assert validate(g, print_details=True,
                        similar_to=None if similar_to is None
                        else similar_to[i],
                        how_similar=how_similar)
    rdtype = rdtype or _default_rdtype()
    seeds = list(seeds) if seeds is not None else list(range(M))
    assert len(seeds) == M

    padded = list(gratings) + [gratings[-1]] * (n_dev - M)
    seeds = seeds + [seeds[-1] + 7919 * (i + 1) for i in range(n_dev - M)]
    sims = (list(similar_to) + [similar_to[-1]] * (n_dev - M)
            if similar_to is not None else None)
    geo, fom_args, st = _stack_member_inputs(
        padded, target_wavelength, numG, terms, rdtype,
        similar_to=sims, how_similar=how_similar)

    cd = _cd_run(max_rounds=max_rounds_per_dispatch, max_steps=10, **st)
    rp = _rp_run(max_steps=10, **st)
    cd_sh = _sharded(mesh, cd, axis)
    rp_sh = _sharded(mesh, rp, axis)

    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    x, sim_a, hs_a, min_r, min_gap = geo

    for _ in range(max_dispatches):
        x, fom_now, stalled, rounds, keys = cd_sh(
            x, sim_a, hs_a, min_r, min_gap, keys, *fom_args)
        if bool(np.all(np.asarray(stalled))):
            break

    step_ceiling = np.empty_like(padded[0].xyrra_list)
    step_ceiling[:, 0:4] = 1 * nm
    step_ceiling[:, 4] = 0.1 * degree
    step_ceiling /= padded[0].xyrra_list.size
    sc = jnp.broadcast_to(jnp.asarray(step_ceiling, rdtype),
                          (n_dev,) + step_ceiling.shape)
    keys2 = jnp.stack([jax.random.PRNGKey(s + 1) for s in seeds])
    att = jnp.full(n_dev, attempts, jnp.int32)
    x, fom_now, _ = rp_sh(x, sim_a, hs_a, min_r, min_gap, keys2, att, sc,
                          *fom_args)

    out, foms = [], []
    x_np = np.asarray(x, np.float64)
    for i in range(M):
        g = gratings[i].copy()
        g.xyrra_list = x_np[i].copy()
        g.standardize()
        assert validate(g, similar_to=None if sims is None else sims[i],
                        how_similar=how_similar)
        out.append(g)
        foms.append(float(np.real(np.asarray(fom_now)[i])))
    if verbose:
        print(f"#sharded_member_optimize: {M} members over {n_dev} devices,"
              f" foms={['%.4f' % f for f in foms]}", flush=True)
    return out, foms
