#!/usr/bin/env python3
"""Where does a design-stage member's wall-clock go?

NS2's from-scratch design stage (benchmarks/NS2_LEDGER.json, round 4)
costs 4407.6 s, of which the 5- and 4-pillar brackets are 2281/1475 s of
optimizer work -- ~253 s per 5-pillar member.  Every FOM probe already
runs through ONE batched dispatch (`optimize._BatchedProbe`), so the
remaining question is the split between

  * device compute (batched numG=50 RGB solves),
  * tunnel round-trip latency (dispatch + tiny fetch per probe call),
  * host-side work (validate() geometry checks, bookkeeping).

This probe reproduces ONE bracket-0 member flow (seed -> optimize ->
optimize2(40)) with `_BatchedProbe.__call__` wrapped to count calls and
accumulate wall time, then reports the ledger.  Run on chip (default) or
--cpu.  The answer directs the next NS2-design lever: if probe wall
dominates and per-call wall >> batched-solve compute, the lever is fewer
/ fatter dispatches (e.g. a device-side ratchet); if host wall dominates,
it is vectorizing validate(); if probe wall ~= solve compute, the design
stage is already compute-bound and only a faster solver helps.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pillars", type=int, default=5)
    ap.add_argument("--angle", type=float, default=19.7)
    ap.add_argument("--attempts", type=int, default=40)
    ap.add_argument("--numG", type=int, default=None,
                    help="override the production numG=50 (CPU smoke runs)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from northstar2 import _seed_grating, _rgb_terms, DESIGN_NUMG
    numG = args.numG or DESIGN_NUMG
    from metalens_tpu import optimize as opt_mod
    from metalens_tpu.units import nm

    stats = {"calls": 0, "cands": 0, "probe_wall_s": 0.0}
    orig_call = opt_mod._BatchedProbe.__call__

    def timed_call(self, candidates):
        t0 = time.perf_counter()
        out = orig_call(self, candidates)
        stats["probe_wall_s"] += time.perf_counter() - t0
        stats["calls"] += 1
        stats["cands"] += len(candidates)
        return out

    opt_mod._BatchedProbe.__call__ = timed_call

    rng = np.random.default_rng(1000)
    g = _seed_grating(args.angle, args.pillars)
    terms = _rgb_terms()

    t0 = time.perf_counter()
    g = opt_mod.optimize(g, target_wavelength=580 * nm, numG=numG,
                         terms=terms, verbose=False, rng=rng)
    t_opt = time.perf_counter() - t0
    snap_opt = dict(stats)

    t1 = time.perf_counter()
    g = opt_mod.optimize2(g, target_wavelength=580 * nm,
                          attempts=args.attempts, numG=numG,
                          terms=terms, verbose=False, rng=rng)
    t_opt2 = time.perf_counter() - t1

    total = time.perf_counter() - t0
    print(json.dumps({
        "pillars": args.pillars, "angle_deg": args.angle,
        "numG": numG, "batch_B": opt_mod._probe_batch_size(g),
        "optimize_wall_s": round(t_opt, 1),
        "optimize2_wall_s": round(t_opt2, 1),
        "total_wall_s": round(total, 1),
        "optimize_probe_calls": snap_opt["calls"],
        "optimize_probe_wall_s": round(snap_opt["probe_wall_s"], 1),
        "probe_calls": stats["calls"],
        "probe_candidates": stats["cands"],
        "probe_wall_s": round(stats["probe_wall_s"], 1),
        "probe_wall_per_call_ms": round(
            1e3 * stats["probe_wall_s"] / max(stats["calls"], 1), 1),
        "host_wall_s": round(total - stats["probe_wall_s"], 1),
        "fom_final": round(float(np.real(
            g.fom(target_wavelength=580 * nm, numG=numG,
                  terms=terms))), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
