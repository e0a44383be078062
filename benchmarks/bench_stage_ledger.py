#!/usr/bin/env python3
"""Whole-program stage ledger: time the production cell solve with one
stage ablated at a time, on the same batch.  Per CLAUDE.md's measured
finding, isolated per-stage microbenches over the remote tunnel are
fetch-dominated garbage -- the only trustworthy decomposition is
whole-program differences, which this prints as a ledger.

Variants (each a separate jit signature; first run per process pays the
remote compile):
    full        the production program (bench.py equivalent)
    k0          n_slabs=1 -> no star doublings (K=0)
    taylor2     2-term Taylor series (ablates the power-series matmuls)
    laurent     fff=False (ablates the NV projector assembly)
    noconv      stop after the layer S-matrix (ablates BOTH conversion
                interface stars; output basis is the lossy reference
                medium -- wrong physics, same array shapes)

Usage: python benchmarks/bench_stage_ledger.py [--numG 50] [--batch 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--numG", type=int, default=50)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants",
                    default="full,fullsmat,k0,taylor2,laurent,noconv")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from metalens_tpu.solver import cpx, orders as ordmod, rcwa
    from metalens_tpu.units import nm

    LX, LY = 1200 * nm, 320 * nm
    LAM = 580 * nm
    H = 550 * nm
    NT, NG = 2.372, 1.459
    numG, B = args.numG, args.batch

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

    def make_eps_fn():
        """Leaf variant: ONLY the fff eps-block build (Toeplitz + NV
        projector), with a thin product fetched so nothing is DCE'd."""
        from metalens_tpu.solver.fff import fff_eps_blocks

        def eps_one(xy, ux1, uy1):
            E, Mxx, Mxy, Myy = fff_eps_blocks(
                np.asarray(orders), LX, LY, xy, NT ** 2)
            v = jnp.zeros((numG, 2), dtype=xy.dtype).at[i0, 0].set(1.0)
            v = v.at[(i0 + 1) % numG, 1].set(ux1 * 0 + 1.0)
            return E @ v + Mxx @ v + Mxy @ v + Myy @ v
        return jax.jit(jax.vmap(eps_one))

    def make_fn(ns, tay, fff, conv, full_smat=False):
        def solve_one(xy, ux1, uy1):
            if conv and not full_smat:
                # production route: thin amplitude responses
                c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
                c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
                ampf, ampr, _, _ = rcwa.cell_amplitudes(
                    orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ux1, uy1,
                    c, n_slabs=ns, taylor_terms=tay, fff=fff)
                return ampf
            if conv:
                S, _, _ = rcwa.cell_smatrix(
                    orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ux1, uy1,
                    n_slabs=ns, taylor_terms=tay, fff=fff)
                s11 = S.s11
            else:
                # layer S-matrix only (stop before the conversion stars)
                from metalens_tpu.solver.epsilon import ellipse_layer_toeplitz
                E = ellipse_layer_toeplitz(np.asarray(orders), LX, LY, xy,
                                           NT ** 2)
                rdt = E.re.dtype
                mx = jnp.asarray(np.asarray(orders)[:, 0], rdt)
                my = jnp.asarray(np.asarray(orders)[:, 1], rdt)
                Kx = (ux1 + mx * (LAM / LX)).astype(rdt)
                Ky = (uy1 + my * (LAM / LY)).astype(rdt)
                S = rcwa.layer_smatrix(E, Kx, Ky, 2 * np.pi * H / LAM,
                                       ns, tay)
                s11 = S.s11
            c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
            c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
            return s11 @ c
        return jax.jit(jax.vmap(solve_one))

    variants = {
        "full": make_fn(n_slabs, taylor, True, True),
        "fullsmat": make_fn(n_slabs, taylor, True, True, full_smat=True),
        "k0": make_fn(1, taylor, True, True),
        "taylor2": make_fn(n_slabs, 2, True, True),
        "laurent": make_fn(n_slabs, taylor, False, True),
        "noconv": make_fn(n_slabs, taylor, False, False),
        "epsonly": make_eps_fn(),
    }

    xyrra_d, ux_d, uy_d = map(jnp.asarray, (xyrra, ux, uy))
    ledger = {}
    for name in args.variants.split(","):
        fn = variants[name]
        out = fn(xyrra_d, ux_d, uy_d)
        np.asarray(out.re)                      # materialize (compile+warm)
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                np.asarray(fn(xyrra_d, ux_d, uy_d).re)
            best = min(best, time.perf_counter() - t0)
        per_batch = best / args.iters
        ledger[name] = round(per_batch * 1e3, 2)
        print(json.dumps({"variant": name, "ms_per_batch": ledger[name],
                          "solves_per_sec": round(B / per_batch, 1)}))

    if "full" in ledger:
        full = ledger["full"]
        for name, ms in ledger.items():
            if name != "full":
                print(f"# {name}: ablated share = "
                      f"{(full - ms) / full * 100:.1f}% of full")


if __name__ == "__main__":
    main()
