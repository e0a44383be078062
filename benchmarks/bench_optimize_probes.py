#!/usr/bin/env python3
"""A/B the batched derivative-free optimizer probes (VERDICT r2 #3).

Runs the same seeded optimize() + optimize2() workload twice: once with
the production batched probe (one dispatch per geometry change / walk /
attempt chunk) and once with the batch size forced to 1, which reproduces
the round-2 serial behavior of one device round trip per candidate.  Both
paths run the identical jitted FOM program and acceptance logic, so the
measured difference is pure dispatch/fetch overhead -- the quantity the
remote TPU tunnel amplifies.

    python benchmarks/bench_optimize_probes.py [--numG 25] [--cpu]
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(numG, serial):
    from metalens_tpu import Grating
    from metalens_tpu import optimize as opt
    from metalens_tpu.solver.fom import FomTerm
    from metalens_tpu.units import nm, degree

    LAM = 580 * nm
    terms = [FomTerm(LAM, 1.0, -1, True)]
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=LAM, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.],
                                               [580., 0., 80., 100., 0.]]))
    sim = g.xyrra_list.copy()

    orig = opt._probe_batch_size
    if serial:
        opt._probe_batch_size = lambda g: 1
    try:
        random.seed(0)
        t0 = time.perf_counter()
        g1 = opt.optimize(g, target_wavelength=LAM, numG=numG, terms=terms,
                          similar_to=sim, how_similar=0.02, verbose=False)
        t_opt = time.perf_counter() - t0
        rng = np.random.default_rng(3)
        t0 = time.perf_counter()
        g2 = opt.optimize2(g1, target_wavelength=LAM, attempts=40,
                           numG=numG, terms=terms, similar_to=sim,
                           how_similar=0.02, verbose=False, rng=rng)
        t_opt2 = time.perf_counter() - t0
        fom = g2.fom(target_wavelength=LAM, numG=numG, terms=terms)
    finally:
        opt._probe_batch_size = orig
    return t_opt, t_opt2, fom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--numG", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # batched first (also warms the shared per-config solve cache pieces),
    # then the serial emulation; report both orders of magnitude honestly
    tb_opt, tb_opt2, fom_b = run_once(args.numG, serial=False)
    ts_opt, ts_opt2, fom_s = run_once(args.numG, serial=True)
    print(json.dumps({
        "numG": args.numG,
        "batched_s": {"optimize": round(tb_opt, 2),
                      "optimize2": round(tb_opt2, 2)},
        "serial_s": {"optimize": round(ts_opt, 2),
                     "optimize2": round(ts_opt2, 2)},
        "speedup_optimize": round(ts_opt / tb_opt, 2),
        "speedup_optimize2": round(ts_opt2 / tb_opt2, 2),
        "fom_batched": round(float(fom_b), 5),
        "fom_serial": round(float(fom_s), 5)}))


if __name__ == "__main__":
    main()
