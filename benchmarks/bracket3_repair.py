#!/usr/bin/env python3
"""Round-4 verdict item 6: isolate the coarse-continuation cost on the
NS2 design's weak bracket 3 (37-48 deg, 3 pillars) and repair it.

The production NS2 design runs vary_angle at CHANGE_EACH_STEP=1.05 /
SIMILARITY=0.15 (budget-motivated coarsening of the reference's 1.01 /
0.03, /root/reference/grating.py:838-841).  Bracket 3 is visibly weaker
than its neighbours in both the round-3 and the round-4 from-scratch
ledgers (fom_mean 0.23-0.30, fom_min 0.15-0.17 vs 0.31-0.43 elsewhere).
Hypothesis: the 1.05 continuation steps out of the trust region for the
3-pillar family specifically.

This script re-runs ONLY that bracket at a denser continuation
(default 1.02 / 0.06), reports per-member FOMs side by side with the
production gc2.npz, then (--stage stitch) characterizes the dense
collection and re-stitches the 580 nm aperture with bracket 3 swapped in
to measure the LENS-level transmission delta.  Results accumulate in
benchmarks/BRACKET3_REPAIR.json.

Usage:
    python benchmarks/bracket3_repair.py --stage design
    python benchmarks/bracket3_repair.py --stage characterize
    python benchmarks/bracket3_repair.py --stage stitch
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(HERE, "BRACKET3_REPAIR.json")

BRACKET = (37.0, 48.0, 3)      # northstar2.BRACKETS[2]
DENSE_STEP = 1.02
DENSE_SIMILARITY = 0.06


def _update(key, entry):
    out = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out = json.load(f)
    out[key] = entry
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({key: entry}), flush=True)


def _member_foms(gc, terms, numG):
    from metalens_tpu.units import nm
    recs = []
    for g in gc.grating_list:
        recs.append({
            "angle_deg": round(math.degrees(
                g.get_angle_in_air(gc.target_wavelength)), 2),
            "fom": round(float(g.fom(target_wavelength=580 * nm, numG=numG,
                                     terms=terms)), 4)})
    return recs


def stage_design(art):
    from northstar2 import DESIGN_NUMG, _rgb_terms, _seed_grating
    from metalens_tpu.optimize import optimize, optimize2, vary_angle
    from metalens_tpu.serialization import load, save
    from metalens_tpu.units import nm, degree
    lo, hi, npil = BRACKET
    terms = _rgb_terms()

    path = os.path.join(art, "gc2_dense.npz")
    t0 = time.perf_counter()
    if os.path.exists(path):
        gc = load(path)
        print(f"# dense bracket resumed from {path}", flush=True)
    else:
        rng = np.random.default_rng(3002)   # reproducible (round 4)
        g0 = _seed_grating(lo - 0.3, npil)
        g0 = optimize(g0, target_wavelength=580 * nm, numG=DESIGN_NUMG,
                      terms=terms, verbose=False, rng=rng)
        g0 = optimize2(g0, target_wavelength=580 * nm, attempts=40,
                       numG=DESIGN_NUMG, terms=terms, verbose=False,
                       rng=rng)
        end = math.atan(DENSE_STEP * math.tan(hi * degree))
        gc = vary_angle(start_grating=g0, end_angle=end,
                        lens_type="round", target_wavelength=580 * nm,
                        numG=DESIGN_NUMG, terms=terms, use_gradient=False,
                        optimize2_attempts=15, verbose=False,
                        change_each_step=DENSE_STEP,
                        similarity_each_step=DENSE_SIMILARITY, rng=rng)
        save(gc, path)
    wall = time.perf_counter() - t0

    dense = _member_foms(gc, terms, DESIGN_NUMG)
    entry = {"step": DENSE_STEP, "similarity": DENSE_SIMILARITY,
             "members": len(dense), "wall_s": round(wall, 1),
             "fom_mean": round(float(np.mean([r["fom"] for r in dense])), 4),
             "fom_min": round(float(np.min([r["fom"] for r in dense])), 4),
             "per_member": dense}

    coarse_path = os.path.join(art, "gc2.npz")
    if os.path.exists(coarse_path):
        gc_c = load(coarse_path)
        coarse = _member_foms(gc_c, terms, DESIGN_NUMG)
        entry["coarse_1p05"] = {
            "members": len(coarse),
            "fom_mean": round(float(np.mean([r["fom"] for r in coarse])), 4),
            "fom_min": round(float(np.min([r["fom"] for r in coarse])), 4),
            "per_member": coarse}
    _update("design", entry)


def stage_characterize(art):
    from northstar2 import CHAR_NUMG, LAMS_NM, _with_tunnel_retry
    from metalens_tpu.serialization import load, save
    from metalens_tpu.units import nm
    path = os.path.join(art, "gc2_dense_char.npz")
    t0 = time.perf_counter()
    if os.path.exists(path):
        print(f"# resumed from {path}", flush=True)
    else:
        gc = load(os.path.join(art, "gc2_dense.npz"))
        lams = [l * nm for l in LAMS_NM]
        _with_tunnel_retry(
            lambda: gc.characterize(lams, numG=CHAR_NUMG, u_steps=5))
        save(gc, path)
    _update("characterize", {"wall_s": round(time.perf_counter() - t0, 1),
                             "numG": CHAR_NUMG})


def _stitch_580(art, dense):
    from northstar2 import (BRACKETS, SOURCE_DISTANCE_UM, RADIUS_UM,
                            _load_design)
    from metalens_tpu.assembly import make_design
    from metalens_tpu.farfield import farfield, focal_metrics
    from metalens_tpu.geometry import good_fft_number
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.serialization import load
    from metalens_tpu.units import nm, um, degree
    gcs, hgs = _load_design(art)
    if dense:
        gcs[2] = load(os.path.join(art, "gc2_dense_char.npz"))
        gcs[2].build_interpolators()
    d = SOURCE_DISTANCE_UM * um
    radius = RADIUS_UM * um
    colls = [[(lo * degree, hi * degree), gc]
             for (lo, hi, _), gc in zip(BRACKETS, gcs)]
    lps, lcs, r_switch = make_design(colls, d, radius, hgs)
    lam = 580 * nm
    half = radius * 1.02
    n_pts = good_fft_number(2 * half / (lam / 2.2))
    x_pts = np.linspace(-half, half, n_pts)
    Ex, Ey, Hx, Hy, xs, ys, P_lens, ng = build_nearfield(
        0.0, 0.0, -d, "x", lam, lps, lcs, hgs, x_pts, x_pts,
        dipole_moment=1e-30)
    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys, lam, ng)
    m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                      spot_radius_u=0.1)
    return {"transmission": round(m["transmission"], 4),
            "spot_fraction_0p1": round(m["spot_fraction_of_total"], 4),
            "peak_u": [round(m["peak_ux"], 4), round(m["peak_uy"], 4)]}


def stage_stitch(art):
    t0 = time.perf_counter()
    base = _stitch_580(art, dense=False)
    repaired = _stitch_580(art, dense=True)
    _update("stitch_580", {
        "wall_s": round(time.perf_counter() - t0, 1),
        "coarse_bracket3": base, "dense_bracket3": repaired,
        "transmission_delta": round(repaired["transmission"]
                                    - base["transmission"], 4)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "design", "characterize", "stitch"])
    ap.add_argument("--artifacts",
                    default=os.path.join(HERE, "ns2_artifacts"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from metalens_tpu.engine import enable_compilation_cache
    print(f"# compilation cache: {enable_compilation_cache()}", flush=True)
    if args.stage in ("all", "design"):
        stage_design(args.artifacts)
    if args.stage in ("all", "characterize"):
        stage_characterize(args.artifacts)
    if args.stage in ("all", "stitch"):
        stage_stitch(args.artifacts)


if __name__ == "__main__":
    main()
