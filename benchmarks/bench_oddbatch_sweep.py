"""A/B the odd-batch characterize sweep on chip.

A 25-direction (u_steps=5) single-wavelength characterize at numG=100 hits
the solve kernel with batch sizes that are NOT multiples of the interleave
group.  The old divisibility rule in ``solver/pallas_inv.py`` fell to G=1
there; the vmap rule now identity-pads the batch up to the group instead.
This script measures the warm whole-sweep wall clock either way:

    python benchmarks/bench_oddbatch_sweep.py            # padded (default)
    python benchmarks/bench_oddbatch_sweep.py --group 1  # old G=1 floor

Run each arm in its own process (the engine caches compiled programs).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=None,
                    help="force matrices-per-grid-step (1 = old odd-batch "
                         "behavior); default = the padded production rule")
    ap.add_argument("--numG", type=int, default=100)
    ap.add_argument("--u-steps", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from metalens_tpu.solver import pallas_inv
    if args.group is not None:
        pallas_inv._GROUP_OVERRIDE = args.group

    from metalens_tpu.engine import characterize_grating
    from metalens_tpu.grating import Grating
    from metalens_tpu.units import nm, degree

    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.],
                                               [500., 10., 80., 110., 5.]]))

    def sweep():
        return characterize_grating(
            g, -0.08, 0.08, -0.08, 0.08, args.u_steps,
            wavelength=580 * nm, numG=args.numG)

    t0 = time.time()
    data = sweep()                      # compile + run
    t_first = time.time() - t0
    n_dir = len(data)
    print(f"first call (compile): {t_first:.1f}s, {n_dir} directions")

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        sweep()
        times.append(time.time() - t0)
    best = min(times)
    print(f"warm sweep best of {args.reps}: {best * 1e3:.1f} ms "
          f"({n_dir / best:.1f} dir/s)  group={args.group or 'auto'} "
          f"numG={args.numG}")


if __name__ == "__main__":
    main()
