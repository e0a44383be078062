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
                         "chip tunnel has ~20%% run-to-run noise)")
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
    ap.add_argument("--taylor-kernel", action="store_true",
                    help="force the fused Pallas Taylor kernel on "
                         "(default since round 4; solver/pallas_taylor.py)")
    ap.add_argument("--no-taylor-kernel", action="store_true",
                    help="route the slab Taylor series through plain XLA "
                         "matmuls instead of the fused kernel (A/B)")
    ap.add_argument("--full-smatrix", action="store_true",
                    help="form all four S blocks instead of the engine "
                         "programs' s11+s21 subset (A/B of the partial-"
                         "outputs conversion stars)")
    ap.add_argument("--no-accuracy", action="store_true",
                    help="skip the post-timing accuracy guard (timing A/Bs)")
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
    if args.taylor_kernel or args.no_taylor_kernel:
        from metalens_tpu.solver import pallas_taylor
        pallas_taylor.USE_PALLAS_TAYLOR = not args.no_taylor_kernel
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

    # ---- on-chip accuracy guard (round-4 VERDICT item 5) ------------------
    # The chip-f32 slab-cap cliff (per-slab t*q ~ 21 returns amplitudes of
    # magnitude ~12 / NaN; round-3 on-chip probes) is invisible to the CPU
    # test suite (x64 promotion masks the cancellation), and before round 4
    # bench.py's only on-chip check was isfinite.  Three checks, recorded in
    # the SAME JSON line the driver captures:
    #   operating_point  bench cell at the production schedule vs committed
    #                    CPU-f64 truth (benchmarks/bench_truth.npz) -- fatal
    #   at_cap           a cell whose per-slab t*q sits AT slab_schedule's
    #                    CURRENT default cap (introspected, so raising the
    #                    cap automatically probes the new value on chip),
    #                    1 slab vs 16 slabs in the run dtype -- fatal
    #   cliff_sentinel   1 slab at t*q = 20.9 with 40 terms (the round-3
    #                    probe config): EXPECTED garbage on chip f32.  If it
    #                    comes back clean the harness flags it (the
    #                    comparison would then prove nothing) -- recorded,
    #                    non-fatal.
    # Drift exits nonzero; infrastructure errors are recorded but keep rc=0
    # (a tunnel hiccup must not read as an accuracy regression).
    acc = None
    drift = False
    if not args.no_accuracy:
        import math
        import os
        TOL = 2e-3   # measured chip-f32 vs f64 whole-program error is
        # ~1e-4 (BASELINE.md); the failure modes this guards against are
        # 5e-4 (cliff onset) to O(10) (past the cliff)
        cap = rcwa.slab_cap()   # the ACTIVE cap (dtype-aware, round 4)
        ok = np.asarray(orders)
        kx = ok[:, 0] * LAM / LX
        ky = ok[:, 1] * LAM / LY
        kmax = float(np.sqrt(kx ** 2 + ky ** 2).max()) + 1.0
        q = math.sqrt((kmax * kmax + NT ** 2) * 1.05)  # slab_schedule bound
        xy1 = jnp.asarray(base[None].astype(np.float32))
        ux1 = jnp.asarray(np.array([0.45], np.float32))
        uy1 = jnp.zeros(1, jnp.float32)

        def amps_at(H, ns, terms):
            def f(xy, ua, ub):
                c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
                c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
                af, ar, _, _ = rcwa.cell_amplitudes(
                    orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ua, ub,
                    c, n_slabs=ns, taylor_terms=terms, fff=args.fff)
                return af, ar
            af, ar = jax.jit(jax.vmap(f))(xy1, ux1, uy1)
            return np.stack([np.asarray(af.re), np.asarray(af.im),
                             np.asarray(ar.re), np.asarray(ar.im)])

        def maxdiff(a, b):
            d = np.abs(a - b)
            return float(d.max()) if np.isfinite(d).all() else float("nan")

        acc = {"tol": TOL, "cap": cap, "ok": True}
        try:
            # operating point vs committed f64 truth
            truth_path = os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "benchmarks", "bench_truth.npz")
            key = f"ampfr_numG{numG}"
            if os.path.exists(truth_path) and key in np.load(truth_path):
                truth = np.load(truth_path)[key]
                got = amps_at(H, n_slabs, taylor)
                acc["operating_point_err"] = maxdiff(got, truth)
                if not acc["operating_point_err"] <= TOL:   # NaN-safe
                    acc["ok"] = False
            else:
                acc["operating_point_err"] = None   # regenerate with
                # benchmarks/gen_bench_truth.py and commit
            # per-slab t*q exactly at the current cap: 1 slab vs 16 slabs
            k0h_cap = cap / q
            H_cap = k0h_cap * LAM / (2 * np.pi)
            _, t1 = rcwa.slab_schedule(k0h_cap, orders, LX, LY, LAM,
                                       NT ** 2, target=cap * 1.0001)
            _, t16 = rcwa.slab_schedule(k0h_cap, orders, LX, LY, LAM,
                                        NT ** 2, target=cap / 15.99)
            ref16 = amps_at(H_cap, 16, t16)
            acc["at_cap_err"] = maxdiff(amps_at(H_cap, 1, t1), ref16)
            if not acc["at_cap_err"] <= TOL:
                acc["ok"] = False
            # cliff sentinel: the round-3 probe config, expected BAD on chip
            H_cl = 20.9 / q * LAM / (2 * np.pi)
            _, t16c = rcwa.slab_schedule(2 * np.pi * H_cl / LAM, orders,
                                         LX, LY, LAM, NT ** 2,
                                         target=20.9 / 15.99)
            err_cl = maxdiff(amps_at(H_cl, 1, 40), amps_at(H_cl, 16, t16c))
            acc["cliff_sentinel_err"] = err_cl
            acc["cliff_sentinel_bad_as_expected"] = not (err_cl <= 0.01)
            drift = not acc["ok"]
        except Exception as e:   # tunnel/compile failure, not drift
            acc["ok"] = False
            acc["error"] = f"{type(e).__name__}: {e}"[:300]

    line = {
        "metric": ("rcwa_unit_cell_solves_per_sec_per_chip_numG"
                   f"{numG}{'' if args.fff else '_laurent'}"),
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 1000.0, 4),
    }
    if acc is not None:
        line["accuracy"] = acc
    print(json.dumps(line))
    if drift:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
