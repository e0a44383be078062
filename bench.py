#!/usr/bin/env python3
"""Headline benchmark: RCWA unit-cell solves/sec on one chip.

One "solve" = one full unit-cell S-matrix solve (air / patterned pillar
layer / glass) at numG=50 in the PRODUCTION configuration -- the
normal-vector factorization on, exactly the accuracy class the reference
runs every S4 solve with (``grating.lua:180-181``), at the reference's
optimization-loop numG (``grating.py:205``).  Both incident polarizations
come out of each solve.  The BASELINE.md north-star target is >= 10^3
solves/sec/chip; ``vs_baseline`` is value / 1000.

Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--numG", type=int, default=50)
    ap.add_argument("--iters", type=int, default=4,
                    help="timed solves per window")
    ap.add_argument("--windows", type=int, default=4,
                    help="timing windows; the best is reported (the remote "
                         "chip tunnel has ~20% run-to-run noise)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (debug); default uses the configured "
                         "JAX platform (TPU under the driver)")
    ap.add_argument("--fff", dest="fff", action="store_true", default=True,
                    help="solve with the normal-vector factorization "
                         "(default: it is the engine default, matching "
                         "S4's always-on accuracy class; measured ~3%% "
                         "cost at numG=50)")
    ap.add_argument("--laurent", dest="fff", action="store_false",
                    help="plain Laurent factorization (the raw solver "
                         "kernel without the NV correction)")
    ap.add_argument("--no-inv-kernel", action="store_true",
                    help="disable the fused Pallas inverse kernel (A/B)")
    ap.add_argument("--gj-base", type=int, default=0,
                    help="override the Pallas Gauss-Jordan base size (A/B)")
    ap.add_argument("--full-smatrix", action="store_true",
                    help="form all four S blocks instead of the engine "
                         "programs' s11+s21 subset (A/B of the partial-"
                         "outputs conversion stars)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: harmless if the backend can't serialize
    # executables (JAX degrades to in-memory); saves the multi-minute
    # remote-tunnel compile on repeat runs
    from metalens_tpu.engine import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from metalens_tpu.solver import cpx, orders as ordmod, rcwa

    if args.no_inv_kernel:
        cpx.USE_PALLAS_SOLVE = False
    if args.gj_base:
        from metalens_tpu.solver import pallas_inv
        pallas_inv._GJ_BASE = args.gj_base
    from metalens_tpu.units import nm

    LX, LY = 1200 * nm, 320 * nm
    LAM = 580 * nm
    H = 550 * nm
    NT, NG = 2.372, 1.459
    numG = args.numG
    B = args.batch

    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    n_slabs, taylor = rcwa.slab_schedule(2 * np.pi * H / LAM, orders,
                                         LX, LY, LAM, NT ** 2)

    rng = np.random.default_rng(0)
    base = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                     [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])
    xyrra = np.stack([base + rng.normal(scale=2 * nm, size=base.shape)
                      for _ in range(B)]).astype(np.float32)
    ux = np.linspace(0.35, 0.55, B).astype(np.float32)
    uy = np.zeros(B, dtype=np.float32)

    def solve_one(xy, ux1, uy1):
        c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
        c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
        if args.full_smatrix:
            S, Kx, Ky = rcwa.cell_smatrix(
                orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ux1, uy1,
                n_slabs=n_slabs, taylor_terms=taylor, fff=args.fff)
            return S.s11 @ c, S.s21 @ c
        # the production route: amplitude responses without materializing
        # the composite S-matrix (exactly what the engine programs run)
        ampf, ampr, _, _ = rcwa.cell_amplitudes(
            orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ux1, uy1, c,
            n_slabs=n_slabs, taylor_terms=taylor, fff=args.fff)
        return ampf, ampr

    fn = jax.jit(jax.vmap(solve_one))

    xyrra_d = jnp.asarray(xyrra)
    ux_d = jnp.asarray(ux)
    uy_d = jnp.asarray(uy)

    # warmup/compile; materialize to host (on this backend runtime errors
    # surface only at fetch, and block_until_ready alone can lie)
    out = fn(xyrra_d, ux_d, uy_d)
    sink = np.asarray(out[0].re)
    assert np.isfinite(sink).all()

    best_dt = float("inf")
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(xyrra_d, ux_d, uy_d)
            np.asarray(out[0].re)
        best_dt = min(best_dt, time.perf_counter() - t0)

    solves_per_sec = B * args.iters / best_dt
    print(json.dumps({
        "metric": ("rcwa_unit_cell_solves_per_sec_per_chip_numG"
                   f"{numG}{'' if args.fff else '_laurent'}"),
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
