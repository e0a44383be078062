#!/usr/bin/env python3
"""Measure optimize_multistart (best-of-k fused restarts) at the NS2
bracket seeds.

QUALITY_AB.json established the restart spread (fused k=5 per bracket:
0.2994-0.541 at bracket 0) and the warm-member cost (5.4-9.2 s/restart
on chip).  This measures the API that harvests it: one
``optimize_multistart(k=8)`` call per bracket seed at the production
design config, recording the k scores, the best, and the TOTAL wall --
i.e. what a design stage pays to replace a single-draw seed member with
the best of eight.

    python benchmarks/multistart_bench.py [--k 8] [--brackets 0,1,2,3]
    -> benchmarks/MULTISTART.json

Reference role: the reference harvested realization spread by re-running
its design script by hand (/root/reference/README.md:52-94); here it is
an API call whose marginal restart is a warm dispatch.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--attempts", type=int, default=40)
    ap.add_argument("--brackets", default="0,1,2,3")
    ap.add_argument("--out", default=os.path.join(HERE, "MULTISTART.json"))
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from metalens_tpu.engine import enable_compilation_cache
    enable_compilation_cache()
    from northstar2 import _seed_grating, _rgb_terms, BRACKETS, DESIGN_NUMG
    from metalens_tpu.optimize_fused import optimize_multistart
    from metalens_tpu.units import nm

    terms = _rgb_terms()
    out = {"k": args.k, "numG": DESIGN_NUMG, "attempts": args.attempts,
           "brackets": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if (prev.get("k"), prev.get("attempts")) == (args.k, args.attempts):
            out = prev

    for bi in [int(b) for b in args.brackets.split(",")]:
        if str(bi) in out["brackets"]:
            print(f"# bracket {bi}: resumed", flush=True)
            continue
        lo, hi, npil = BRACKETS[bi]
        g = _seed_grating(lo - 0.3, npil)
        t0 = time.perf_counter()
        best, foms = optimize_multistart(
            g, k=args.k, target_wavelength=580 * nm, numG=DESIGN_NUMG,
            terms=terms, attempts=args.attempts, seed=4242 + 100 * bi,
            verbose=False)
        wall = round(time.perf_counter() - t0, 1)
        rec = {"pillars": npil, "angle_deg": lo - 0.3,
               "foms": [round(f, 4) for f in foms],
               "best": round(max(foms), 4),
               "median": round(float(np.median(foms)), 4),
               "wall_s_total": wall,
               "wall_s_per_restart": round(wall / args.k, 1)}
        out["brackets"][str(bi)] = rec
        print(json.dumps({"bracket": bi, **rec}), flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
