#!/usr/bin/env python3
"""Fused-vs-host design QUALITY with N>1 realizations per bracket.

The round-4 NS2 ledger compared fused and host design quality with ONE
realization per bracket, each under a different RNG -- inconclusive given
the measured realization variance (equal-FOM designs differ ~2x in raw
off-design transmission, BASELINE.md).  This script settles it: for each
NS2 bracket class (nE = 5, 4, 3, 2 pillars at its bracket's seed angle),
run K seeded members through optimize_fused+optimize2_fused and K through
the host optimize+optimize2 at the production design config (numG=50, RGB
terms), and record the two FOM distributions.

Run AFTER a fused NS2 design has warmed the persistent compile cache: the
fused members then reuse the cached (nE, config) programs (~8.5 s each,
DESIGN_MEMBER_FUSED.json) and the wall is dominated by the host loop's
dispatch latency.

    python benchmarks/quality_ab.py [--k 5] [--attempts 40] [--cpu]
    -> benchmarks/QUALITY_AB.json

Reference role: optimizer semantics, /root/reference/grating.py:685-795.
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
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--attempts", type=int, default=40)
    ap.add_argument("--numG", type=int, default=None)
    ap.add_argument("--brackets", default="0,1,2,3",
                    help="comma list of NS2 bracket indices to run")
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--out", default=os.path.join(HERE, "QUALITY_AB.json"))
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from metalens_tpu.engine import enable_compilation_cache
    enable_compilation_cache()
    from northstar2 import (_seed_grating, _rgb_terms, BRACKETS,
                            DESIGN_NUMG)
    from metalens_tpu.optimize import optimize, optimize2
    from metalens_tpu.optimize_fused import optimize_fused, optimize2_fused
    from metalens_tpu.units import nm

    numG = args.numG or DESIGN_NUMG
    terms = _rgb_terms()
    which = [int(b) for b in args.brackets.split(",")]

    out = {"k": args.k, "numG": numG, "attempts": args.attempts,
           "brackets": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if (prev.get("k"), prev.get("numG"), prev.get("attempts")) == \
                (args.k, numG, args.attempts):
            out = prev   # resume: keep finished brackets

    def fom_of(g):
        return float(np.real(g.fom(target_wavelength=580 * nm, numG=numG,
                                   terms=terms)))

    for bi in which:
        lo, hi, npil = BRACKETS[bi]
        key = str(bi)
        entry = out["brackets"].get(key, {"pillars": npil,
                                          "angle_deg": lo - 0.3})
        for path in ("fused",) + (() if args.skip_host else ("host",)):
            if f"{path}_foms" in entry:
                print(f"# bracket {bi} {path}: resumed", flush=True)
                continue
            foms, walls = [], []
            for k in range(args.k):
                g = _seed_grating(lo - 0.3, npil)
                t0 = time.perf_counter()
                if path == "fused":
                    g = optimize_fused(g, target_wavelength=580 * nm,
                                       numG=numG, terms=terms,
                                       verbose=False, seed=10_000 * bi + k)
                    g = optimize2_fused(g, target_wavelength=580 * nm,
                                        attempts=args.attempts, numG=numG,
                                        terms=terms, verbose=False,
                                        seed=10_000 * bi + k + 1)
                else:
                    rng = np.random.default_rng(10_000 * bi + k)
                    g = optimize(g, target_wavelength=580 * nm, numG=numG,
                                 terms=terms, verbose=False, rng=rng)
                    g = optimize2(g, target_wavelength=580 * nm,
                                  attempts=args.attempts, numG=numG,
                                  terms=terms, verbose=False, rng=rng)
                walls.append(round(time.perf_counter() - t0, 1))
                foms.append(round(fom_of(g), 4))
                print(json.dumps({"bracket": bi, "path": path, "seed": k,
                                  "fom": foms[-1], "wall_s": walls[-1]}),
                      flush=True)
            entry[f"{path}_foms"] = foms
            entry[f"{path}_wall_s"] = walls
            entry[f"{path}_mean"] = round(float(np.mean(foms)), 4)
            entry[f"{path}_min"] = round(float(np.min(foms)), 4)
            entry[f"{path}_max"] = round(float(np.max(foms)), 4)
            out["brackets"][key] = entry
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
