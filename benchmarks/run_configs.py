#!/usr/bin/env python3
"""The five BASELINE.json benchmark configurations, runnable end to end.

Each config prints one JSON line with its wall time and headline quantity.
``--scale small`` (default) runs reduced problem sizes suitable for smoke
timing; ``--scale full`` runs enlarged sizes (config 1: numG=100; configs
2-3: production numG=50 optimizer settings; configs 4-5: a 20 um-radius
single-wavelength lens -- an order-of-magnitude pipeline check, NOT the
production scale).  The actual production-scale run -- 0.5 mm aperture,
RGB database at numG=100, per-stage wall-clock ledger against the
1-hour north-star budget -- is ``benchmarks/northstar2.py``.

    python benchmarks/run_configs.py                  # all, small
    python benchmarks/run_configs.py --config 3
    python benchmarks/run_configs.py --scale full --config 5
"""

import argparse
import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _common():
    from metalens_tpu.units import nm, um, degree
    return nm, um, degree


def config1_hex_phase_sweep(scale):
    """HexGridSet pillar-diameter phase sweep (580nm, normal incidence)."""
    from metalens_tpu.hexgrid import HexGridSet
    nm, um, degree = _common()
    num_entries = 20 if scale == "full" else 8
    numG = 100 if scale == "full" else 30
    t0 = time.perf_counter()
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm,
                     num_entries=num_entries)
    hgs.characterize(wavelength=580 * nm, numG=numG, just_normal=True)
    dt = time.perf_counter() - t0
    phases = np.unwrap(np.angle(hgs.x_amp_list))
    return {"config": "hexgridset_phase_sweep", "wall_s": round(dt, 3),
            "cells": num_entries, "numG": numG,
            "phase_span_rad": round(float(abs(phases[-1] - phases[0])), 3)}


def config2_optimize_rgb(scale):
    """Single-grating optimize at fixed deflection angle, RGB terms."""
    from metalens_tpu import Grating
    from metalens_tpu.optimize import optimize_gradient, optimize2
    from metalens_tpu.solver.fom import FomTerm
    nm, um, degree = _common()
    numG = 50 if scale == "full" else 25
    steps = 120 if scale == "full" else 25
    terms = [FomTerm(650 * nm, 1.0, -1, False),
             FomTerm(580 * nm, 1.0, -1, True),
             FomTerm(500 * nm, 1.0, -1, False)]
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.],
                                               [500., 10., 80., 110., 5.]]))
    f0 = g.fom(target_wavelength=580 * nm, numG=numG, terms=terms)
    t0 = time.perf_counter()
    g_opt = optimize_gradient(g, target_wavelength=580 * nm, numG=numG,
                              terms=terms, steps=steps, verbose=False)
    g_opt = optimize2(g_opt, target_wavelength=580 * nm, attempts=5,
                      numG=numG, terms=terms, verbose=False)
    dt = time.perf_counter() - t0
    f1 = g_opt.fom(target_wavelength=580 * nm, numG=numG, terms=terms)
    return {"config": "optimize_rgb_deflector", "wall_s": round(dt, 3),
            "numG": numG, "steps": steps,
            "fom_start": round(f0, 4), "fom_end": round(f1, 4)}


def config3_vary_angle_characterize(scale):
    """vary_angle continuation + characterize amplitude database."""
    from metalens_tpu import Grating
    from metalens_tpu.optimize import vary_angle
    from metalens_tpu.solver.fom import FomTerm
    nm, um, degree = _common()
    numG = 50 if scale == "full" else 20
    end = 28 * degree if scale == "full" else 29.4 * degree
    terms = [FomTerm(580 * nm, 1.0, -1, True)]
    g0 = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                 target_wavelength=580 * nm, angle_in_air=30 * degree,
                 xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))
    t0 = time.perf_counter()
    gc = vary_angle(start_grating=g0, end_angle=end, lens_type="cyl",
                    target_wavelength=580 * nm, numG=numG, terms=terms,
                    use_gradient=True,
                    gradient_steps=60 if scale == "full" else 8,
                    optimize2_attempts=20 if scale == "full" else 2,
                    verbose=False)
    t_vary = time.perf_counter() - t0
    t0 = time.perf_counter()
    gc.characterize(580 * nm, numG=2 * numG, u_steps=5)
    gc.build_interpolators()
    t_char = time.perf_counter() - t0
    return {"config": "vary_angle_characterize",
            "wall_s_vary": round(t_vary, 3),
            "wall_s_characterize": round(t_char, 3),
            "members": len(gc.grating_list),
            "db_entries": sum(len(g.data) for g in gc.grating_list)}


def config4_assembly_nearfield(scale):
    """Full-lens assembly + stitched near-field."""
    nm, um, degree = _common()
    sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/../tests")
    from test_full_lens import make_round_collection
    from metalens_tpu.hexgrid import HexGridSet
    from metalens_tpu.assembly import make_design
    from metalens_tpu.nearfield import build_nearfield

    d = 25 * um
    radius = 20 * um if scale == "full" else 7.5 * um
    numG = 50 if scale == "full" else 20
    gc = make_round_collection(8.0, math.degrees(math.atan(radius / d)) + 1)
    gc.characterize(wavelength=580 * nm, numG=numG, u_steps=3)
    gc.build_interpolators()
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=5)
    hgs.characterize(wavelength=580 * nm, numG=numG, just_normal=False,
                     u_steps=3)
    hgs.build_interpolators()
    t0 = time.perf_counter()
    lps, lcs, r_switch, xyrra = make_design(
        [[(8.0 * degree, math.atan(radius / d) + 1 * degree), gc]],
        d, radius, hgs, make_xyrra_list=True)
    t_design = time.perf_counter() - t0
    half = radius * 1.05
    from metalens_tpu.geometry import good_fft_number
    n_pts = good_fft_number(2 * half / (580 * nm / 2.2))
    x_pts = np.linspace(-half, half, n_pts)
    t0 = time.perf_counter()
    out = build_nearfield(0.0, 0.0, -d, "x", 580 * nm, lps, lcs, hgs,
                          x_pts, x_pts, dipole_moment=1e-30)
    np.asarray(out[0].re)
    t_nf = time.perf_counter() - t0
    return {"config": "assembly_nearfield", "pillars": int(xyrra.shape[0]),
            "aperture_pts": n_pts * n_pts,
            "wall_s_design": round(t_design, 3),
            "wall_s_nearfield": round(t_nf, 3), "_out": out}


def config5_farfield(scale):
    """Near-to-far-field transform of the stitched aperture."""
    nm, um, degree = _common()
    from metalens_tpu.farfield import farfield, focal_metrics
    res = config4_assembly_nearfield(scale)
    Ex, Ey, Hx, Hy, xs, ys, P_lens, ng = res.pop("_out")
    t0 = time.perf_counter()
    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys,
                                            580 * nm, ng)
    m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                      spot_radius_u=0.15)
    dt = time.perf_counter() - t0
    return {"config": "near_to_far_field", "wall_s": round(dt, 3),
            "aperture_pts": res["aperture_pts"],
            "transmission": round(m["transmission"], 4),
            "spot_fraction": round(m["spot_fraction_of_total"], 4)}


CONFIGS = {1: config1_hex_phase_sweep, 2: config2_optimize_rgb,
           3: config3_vary_angle_characterize,
           4: config4_assembly_nearfield, 5: config5_farfield}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=None)
    ap.add_argument("--scale", choices=["small", "full"], default="small")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    which = [args.config] if args.config else sorted(CONFIGS)
    for i in which:
        out = CONFIGS[i](args.scale)
        out.pop("_out", None)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
