#!/usr/bin/env python3
"""Regenerate benchmarks/bench_truth.npz: CPU-f64 amplitude truth for
bench.py's on-chip accuracy guard.

The guard cell is the DETERMINISTIC version of bench.py's geometry (the
un-noised 2-pillar base xyrra, ux=0.45) solved at the production
slab_schedule, with the engine default fff=True.  Stored per numG as
``ampfr_numG{N}`` with layout [re(ampf), im(ampf), re(ampr), im(ampr)]
stacked on axis 0 -- exactly what bench.py's guard computes on chip.

Re-run and commit the npz whenever bench.py's guard geometry or the
amplitude conventions change (a stale truth shows up as an
operating_point_err far above the chip's measured ~1e-4 f32-vs-f64
difference, not as a subtle drift).
"""

import os

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from metalens_tpu.solver import orders as ordmod, rcwa
    from metalens_tpu.units import nm

    LX, LY = 1200 * nm, 320 * nm
    LAM = 580 * nm
    H = 550 * nm
    NT, NG = 2.372, 1.459
    base = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                     [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]],
                    dtype=np.float64)

    out = {}
    for numG in (50, 100):
        orders = ordmod.select_orders(LX, LY, numG)
        i0 = ordmod.order_index(orders, 0, 0)
        n_slabs, taylor = rcwa.slab_schedule(2 * np.pi * H / LAM, orders,
                                             LX, LY, LAM, NT ** 2)

        def f(xy, ua, ub):
            c = jnp.zeros((2 * numG, 2), dtype=xy.dtype)
            c = c.at[i0, 0].set(1.0).at[i0 + numG, 1].set(1.0)
            af, ar, _, _ = rcwa.cell_amplitudes(
                orders, xy, LX, LY, H, NT ** 2, NG ** 2, LAM, ua, ub, c,
                n_slabs=n_slabs, taylor_terms=taylor, fff=True)
            return af, ar

        af, ar = jax.jit(jax.vmap(f))(
            jnp.asarray(base[None]), jnp.asarray(np.array([0.45])),
            jnp.zeros(1))
        out[f"ampfr_numG{numG}"] = np.stack(
            [np.asarray(af.re), np.asarray(af.im),
             np.asarray(ar.re), np.asarray(ar.im)])
        print(f"numG={numG}: schedule=({n_slabs},{taylor}), "
              f"|ampf|max={np.abs(out[f'ampfr_numG{numG}'][:2]).max():.6f}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_truth.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
