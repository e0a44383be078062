#!/usr/bin/env python3
"""Per-instance cost of the fused Pallas inverse kernel.

Chains ``depth`` inverse applications inside ONE jit program over a batch
(inverting twice returns the original matrix, so conditioning is stable
along the chain) and fetches a tiny slice -- the only reliable way to
time a single op over the remote tunnel (CLAUDE.md: isolated microbenches
are fetch-dominated).

Usage: python benchmarks/bench_inv_kernel.py [--n 100] [--batch 512]
       [--depth 16] [--gj-base 32] [--xla]
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
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--gj-base", type=int, default=0)
    ap.add_argument("--group", type=int, default=0,
                    help="override matrices per kernel instance")
    ap.add_argument("--passes", choices=["highest", "high", "default"],
                    default="highest",
                    help="in-kernel matmul precision (6/3/1 bf16 passes)")
    ap.add_argument("--xla", action="store_true",
                    help="time the XLA block recursion instead")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from metalens_tpu.solver import cpx
    from metalens_tpu.solver import pallas_inv

    if args.gj_base:
        pallas_inv._GJ_BASE = args.gj_base
    if args.group:
        pallas_inv._GROUP_OVERRIDE = args.group
    pallas_inv._HIGH = {"highest": jax.lax.Precision.HIGHEST,
                        "high": jax.lax.Precision.HIGH,
                        "default": jax.lax.Precision.DEFAULT}[args.passes]

    n, B = args.n, args.batch
    rng = np.random.default_rng(0)
    A = (np.eye(n) + 0.4 * (rng.normal(size=(B, n, n))
         + 1j * rng.normal(size=(B, n, n))) / np.sqrt(n)).astype(np.complex64)

    def chain(M):
        # fori_loop so the kernel appears ONCE in the program (a 16-deep
        # inline chain of unrolled Pallas kernels explodes compile time)
        def body(_, M):
            if args.xla:
                return jax.vmap(cpx.inv_blockrec)(M)
            return pallas_inv.inv_pallas(M, args.cpu)  # interpret on CPU
        return jax.lax.fori_loop(0, args.depth, body, M)

    fn = jax.jit(chain)
    Ad = cpx.from_np(A)
    out = fn(Ad)
    np.asarray(out.re[0, :2, :2])            # materialize

    best = float("inf")
    for _ in range(args.windows):
        t0 = time.perf_counter()
        np.asarray(fn(Ad).re[0, :2, :2])
        best = min(best, time.perf_counter() - t0)

    # accuracy alongside: residual ||W A - I||_max on one matrix
    W1 = (jax.vmap(cpx.inv_blockrec)(Ad[:1]) if args.xla
          else pallas_inv.inv_pallas(Ad[:1], args.cpu))
    R = cpx.matmul(W1, Ad[:1])
    resid = float(np.abs(np.asarray(R.re[0]) - np.eye(n)).max()
                  + np.abs(np.asarray(R.im[0])).max())

    per_inst_us = best / (B * args.depth) * 1e6
    print(json.dumps({
        "residual_WA_minus_I": round(resid, 9),
        "impl": ("xla" if args.xla
                 else f"pallas(P{pallas_inv.pad_size(n)},"
                      f"gj{pallas_inv._GJ_BASE},G{args.group or 'auto'})"),
        "n": n, "batch": B, "depth": args.depth,
        "us_per_inverse": round(per_inst_us, 2),
        "batch_ms": round(best * 1e3, 2)}))


if __name__ == "__main__":
    main()
