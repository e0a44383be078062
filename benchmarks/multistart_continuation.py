#!/usr/bin/env python3
"""Does a best-of-k seed propagate through a design continuation?

MULTISTART.json records member-level best-of-8 records at the NS2
bracket seeds; the lens is built from whole vary_angle continuations, so
the question that matters is whether the better seed survives the
trust-region ladder.  This runs ONE full bracket exactly as
northstar2's design stage does (same ladder density, attempts, fused
member semantics, static envelope) but seeded from the best-of-8 member
instead of a single draw, and records every member FOM for comparison
against the ledger bracket (NS2_LEDGER.json design.brackets).

    python benchmarks/multistart_continuation.py [--bracket 1] [--k 8]
    -> benchmarks/MULTISTART_CONTINUATION.json

Reference role: the design workflow, /root/reference/README.md:52-94
(one continuation per pillar family, grating.py:820-918).
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bracket", type=int, default=1)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--out",
                    default=os.path.join(HERE,
                                         "MULTISTART_CONTINUATION.json"))
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from metalens_tpu.engine import enable_compilation_cache
    enable_compilation_cache()
    from northstar2 import (_seed_grating, _rgb_terms, BRACKETS,
                            DESIGN_NUMG, CHANGE_EACH_STEP, SIMILARITY)
    from metalens_tpu.optimize import vary_angle
    from metalens_tpu.units import nm, degree

    bi = args.bracket
    lo, hi, npil = BRACKETS[bi]
    terms = _rgb_terms()
    t0 = time.perf_counter()

    # same seeds as multistart_bench.py -> same (warm) programs, the
    # recorded restarts reproduce deterministically; kept individually so
    # the continuation-feasibility gate below can fall back down the
    # ranking
    from metalens_tpu.optimize_fused import optimize_fused, optimize2_fused
    from metalens_tpu.optimize import _init_collection
    from metalens_tpu.grating import resize

    # forward headroom: the fused ratchet packs clearances to whatever
    # floor it is given, and a member packed to exactly min_distance can
    # be impossible to re-seed at the next 5% period shrink (the first
    # probe run measured exactly that: the rung-1 member crashed rung
    # 2's resize).  Give every member the next rung's shrink as slack.
    from metalens_tpu.grating import min_distance
    g_probe = _seed_grating(lo - 0.3, npil)
    gc_probe = _init_collection(g_probe, "round", 580 * nm)
    nxt_probe = gc_probe.get_one(
        lateral_period=g_probe.lateral_period * CHANGE_EACH_STEP)
    delta = g_probe.grating_period - nxt_probe.grating_period
    mg = min_distance + max(delta, 0.0)

    def one_restart(i):
        s = 4242 + 100 * bi
        g = optimize_fused(_seed_grating(lo - 0.3, npil),
                           target_wavelength=580 * nm, numG=DESIGN_NUMG,
                           terms=terms, seed=s + 2 * i, verbose=False,
                           min_gap=mg)
        g = optimize2_fused(g, target_wavelength=580 * nm, attempts=40,
                            numG=DESIGN_NUMG, terms=terms,
                            seed=s + 2 * i + 1, verbose=False, min_gap=mg)
        return g, float(np.real(g.fom(target_wavelength=580 * nm,
                                      numG=DESIGN_NUMG, terms=terms)))

    def continuable(g):
        """Exactly vary_angle's first step: does the 1.05-rescaled re-seed
        of this member pass resize's validity assert?  An aggressively
        optimized unconstrained member can sit ON the min_distance
        boundary, where the period rescale pushes it infeasible (measured:
        bracket 1's 0.4209 record member fails here)."""
        gc = _init_collection(g, "round", 580 * nm)
        prev = gc.grating_list[0]
        nxt = gc.get_one(
            lateral_period=prev.lateral_period * CHANGE_EACH_STEP)
        try:
            resize(prev, nxt)
            return True
        except AssertionError:
            return False

    restarts = [one_restart(i) for i in range(args.k)]
    foms = [f for _, f in restarts]
    ranked = sorted(range(args.k), key=lambda i: -foms[i])
    best, skipped = None, []
    for i in ranked:
        if continuable(restarts[i][0]):
            best = restarts[i][0]
            used = i
            break
        skipped.append({"restart": i, "fom": round(foms[i], 4)})
    assert best is not None, "no restart is continuation-feasible"
    t_seed = round(time.perf_counter() - t0, 1)
    print(json.dumps({"stage": "seed", "best": round(max(foms), 4),
                      "used_fom": round(foms[used], 4),
                      "skipped_infeasible": skipped,
                      "wall_s": t_seed}), flush=True)

    end = math.atan(CHANGE_EACH_STEP * math.tan(hi * degree))
    t1 = time.perf_counter()
    gc = vary_angle(start_grating=best, end_angle=end, lens_type="round",
                    target_wavelength=580 * nm, numG=DESIGN_NUMG,
                    terms=terms, optimize2_attempts=15, verbose=False,
                    change_each_step=CHANGE_EACH_STEP,
                    similarity_each_step=SIMILARITY,
                    rng=np.random.default_rng(1000 + bi), use_fused=True,
                    min_gap=mg)
    t_cont = round(time.perf_counter() - t1, 1)

    member_foms = [round(float(np.real(
        g.fom(target_wavelength=580 * nm, numG=DESIGN_NUMG, terms=terms))),
        4) for g in gc.grating_list]
    angles = [round(g.get_angle_in_air(target_wavelength=580 * nm)
                    / degree, 2) for g in gc.grating_list]

    ledger = {}
    lp = os.path.join(HERE, "NS2_LEDGER.json")
    if os.path.exists(lp):
        with open(lp) as f:
            led = json.load(f)
        for b in led.get("design", {}).get("brackets", []):
            if b.get("bracket_deg") == [lo, hi]:
                ledger = {k: b[k] for k in ("fom_mean", "fom_min",
                                            "members") if k in b}

    out = {"bracket": bi, "pillars": npil, "bracket_deg": [lo, hi],
           "k": args.k, "numG": DESIGN_NUMG,
           "min_gap_nm": round(mg / nm, 2),
           "rung_shrink_nm": round(delta / nm, 2),
           "seed_foms": [round(f, 4) for f in foms],
           "seed_best": round(max(foms), 4),
           "seed_used": {"restart": used, "fom": round(foms[used], 4)},
           "seed_skipped_infeasible": skipped,
           "seed_wall_s": t_seed,
           "members": len(gc.grating_list),
           "member_angles_deg": angles,
           "member_foms": member_foms,
           "fom_mean": round(float(np.mean(member_foms)), 4),
           "fom_min": round(float(np.min(member_foms)), 4),
           "continuation_wall_s": t_cont,
           "ledger_single_draw_host": ledger}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
