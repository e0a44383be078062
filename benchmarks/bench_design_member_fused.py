#!/usr/bin/env python3
"""One NS2 design-stage member through the FUSED on-device optimizers.

Companion to bench_design_member.py (the host-loop ledger): same bracket-0
flow (seed -> optimize -> optimize2(40) at the production RGB numG=50
config) but through optimize_fused / optimize2_fused, where the whole
ratchet runs inside one lax.while_loop program and a member costs ~a dozen
dispatches instead of ~505.  Host baseline (design_member5*.log, round 4):
297 s on a healthy tunnel / 521-579 s degraded, fom_final 0.2949.

Reports wall split (compile-dominated first call vs a second warm member at
a nearby angle reusing the same program signature) because the fused
program compiles once per (nE, config) class and NS2's brackets reuse it
across all members.
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
    ap.add_argument("--numG", type=int, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from northstar2 import _seed_grating, _rgb_terms, DESIGN_NUMG
    numG = args.numG or DESIGN_NUMG
    from metalens_tpu.optimize_fused import optimize_fused, optimize2_fused
    from metalens_tpu.units import nm

    terms = _rgb_terms()
    out = {"pillars": args.pillars, "numG": numG}

    def member(angle, seed, tag):
        g = _seed_grating(angle, args.pillars)
        t0 = time.perf_counter()
        g = optimize_fused(g, target_wavelength=580 * nm, numG=numG,
                           terms=terms, verbose=False, seed=seed)
        t_opt = time.perf_counter() - t0
        t1 = time.perf_counter()
        g = optimize2_fused(g, target_wavelength=580 * nm,
                            attempts=args.attempts, numG=numG, terms=terms,
                            verbose=False, seed=seed + 1)
        t_opt2 = time.perf_counter() - t1
        out[f"{tag}_optimize_wall_s"] = round(t_opt, 1)
        out[f"{tag}_optimize2_wall_s"] = round(t_opt2, 1)
        out[f"{tag}_total_wall_s"] = round(t_opt + t_opt2, 1)
        out[f"{tag}_fom_final"] = round(float(np.real(
            g.fom(target_wavelength=580 * nm, numG=numG, terms=terms))), 4)

    member(args.angle, 1000, "cold")         # pays the program compiles
    member(args.angle + 0.4, 2000, "warm")   # same signatures, warm cache
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
