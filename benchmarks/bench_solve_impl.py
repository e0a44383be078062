#!/usr/bin/env python3
"""A/B the hot-path complex-solve implementation on chip, whole-program.

Variants (pick with --impl, or 'all'):
  schur    -- cpx.solve_schur: 2 real LUs + triangular solves (current)
  matmul   -- cpx.solve_matmul: unpivoted block-recursive explicit inverse,
              every flop a Karatsuba matmul (MXU rate, no substitution)
  embed    -- cpx.solve_embed: (2n)^3 LU reference

Methodology per CLAUDE.md: whole-program timing only (the bench.py batched
cell-solve workload), outputs materialized with np.asarray, best of
windows.  Usage: python benchmarks/bench_solve_impl.py --numG 100
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(impl, numG, B, iters, windows, fff):
    import jax
    import jax.numpy as jnp
    from metalens_tpu.solver import cpx, orders as ordmod, rcwa
    from metalens_tpu.units import nm

    if impl.endswith("+f32all"):   # whole-program f32 matmul precision
        impl = impl[:-7]
        jax.config.update("jax_default_matmul_precision", "float32")
    else:
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    if impl.endswith("+hmm"):      # also swap the Hermitian (Einv) solve
        impl = impl[:-4]
        cpx.cho_solve_hermitian = cpx.cho_solve_hermitian_matmul
    if ":" in impl:
        impl, cpx.SOLVE_PRECISION = impl.split(":")
    from metalens_tpu.solver.pallas_inv import solve_pallas
    base = {"schur": cpx.solve_schur, "matmul": cpx.solve_matmul,
            "embed": cpx.solve_embed, "pallas": solve_pallas}[impl]
    cpx.solve = base   # rebinding the module attr retargets rcwa's calls

    LX, LY = 1200 * nm, 320 * nm
    LAM, H = 580 * nm, 550 * nm
    NT, NG = 2.372, 1.459
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    n_slabs, taylor = rcwa.slab_schedule(2 * np.pi * H / LAM, orders,
                                         LX, LY, LAM, NT ** 2)
    rng = np.random.default_rng(0)
    bcell = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                      [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])
    xyrra = np.stack([bcell + rng.normal(scale=2 * nm, size=bcell.shape)
                      for _ in range(B)]).astype(np.float32)
    ux = np.linspace(0.35, 0.55, B).astype(np.float32)
    uy = np.zeros(B, dtype=np.float32)

    def solve_one(xy, ux1, uy1):
        S, _, _ = rcwa.cell_smatrix(
            orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ux1, uy1,
            n_slabs=n_slabs, taylor_terms=taylor, fff=fff)
        c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
        c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
        return S.s11 @ c, S.s21 @ c

    fn = jax.jit(jax.vmap(solve_one))
    args = (jnp.asarray(xyrra), jnp.asarray(ux), jnp.asarray(uy))
    out = fn(*args)
    sink = np.asarray(out[0].re)
    assert np.isfinite(sink).all(), f"{impl}: non-finite output"

    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(out[0].re)
        best = min(best, time.perf_counter() - t0)
    return B * iters / best, sink


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="all")
    ap.add_argument("--numG", type=int, default=100)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--fff", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    impls = (["schur", "matmul"] if args.impl == "all"
             else args.impl.split(","))
    ref_sink = None
    for impl in impls:
        sps, sink = run_variant(impl, args.numG, args.batch, args.iters,
                                args.windows, args.fff)
        if ref_sink is None:
            ref_sink = sink
            agree = 0.0
        else:
            agree = float(np.abs(sink - ref_sink).max())
        print(json.dumps({"impl": impl, "numG": args.numG,
                          "batch": args.batch, "fff": args.fff,
                          "solves_per_sec": round(sps, 1),
                          "max_abs_diff_vs_first": agree}))


if __name__ == "__main__":
    main()
