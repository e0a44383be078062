#!/usr/bin/env python3
"""End-to-end demo: design a miniature round collimator and compute its
focal performance.  Mirrors the reference README workflow
(grating -> optimize -> vary_angle -> characterize -> hex center ->
make_design -> near-field -> far-field -> DXF/SVG/GDSII export).  ~25 min on CPU
(--cpu); a typical result: 75-member collection, 3 periphery rings + hex
center (~1700 pillars), 84% transmission with a collimated on-axis beam.

    python examples/collimator_demo.py [--cpu] [--outdir DIR] [--rgb]

``--rgb`` additionally characterizes every cell at 450/650 nm (one joint
(lambda x direction) sweep per member) and reports the 580-designed lens's
chromatic behavior: per-wavelength transmission, far-field peak, and
0.1-cone power fraction.  Typical: 0.725 / 0.843 / 0.884 transmission at
450 / 580 / 650 nm, collimated on-axis at all three, best cone fraction
at the design wavelength.
"""

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--numG", type=int, default=25)
    ap.add_argument("--rgb", action="store_true",
                    help="also characterize at 450/650 nm (one joint sweep "
                         "per member) and evaluate the lens chromatically")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from metalens_tpu import Grating, GratingCollection, HexGridSet
    from metalens_tpu.optimize import optimize_gradient, vary_angle
    from metalens_tpu.assembly import make_design
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.farfield import farfield, focal_metrics
    from metalens_tpu.export import make_dxf, make_gds, make_svg
    from metalens_tpu.geometry import good_fft_number
    from metalens_tpu.solver.fom import FomTerm
    from metalens_tpu.units import nm, um, degree

    os.makedirs(args.outdir, exist_ok=True)
    LAM = 580 * nm
    terms = [FomTerm(LAM, 1.0, -1, True)]
    d = 25 * um          # source distance
    radius = 10.9 * um   # lens radius: holds 4 Fresnel-zone periphery rings
    angle_hi = math.atan(radius / d)          # outermost incidence angle

    # --- 1. an optimized deflector cell at the innermost periphery angle
    # (vary_angle for round lenses runs inside -> outside, reference
    # README: start with the *low*-angle grating) ---
    t0 = time.time()
    ang0 = 14 * degree   # innermost periphery ring sits at ~14.6 deg
    lp_over_tan = 320 * nm / math.tan(ang0)
    g0 = Grating(lateral_period=lp_over_tan * math.tan(ang0),
                 cyl_height=550 * nm, target_wavelength=LAM,
                 angle_in_air=ang0,
                 xyrra_list_in_nm_deg=np.array([[-200., 0., 95., 75., 0.],
                                                [300., 0., 75., 85., 0.]]))
    print(f"start fom: {g0.fom(target_wavelength=LAM, numG=args.numG, terms=terms):.4f}")
    g0 = optimize_gradient(g0, target_wavelength=LAM, numG=args.numG,
                           terms=terms, steps=40, verbose=False)
    print(f"optimized fom: {g0.fom(target_wavelength=LAM, numG=args.numG, terms=terms):.4f}"
          f"  ({time.time()-t0:.0f}s)")

    # --- 2. continuation outward: cover every ring *period* down to the
    # outermost ring's (discrete Fresnel zones are narrower than the
    # continuum lambda/sin(theta) at this tiny scale) ---
    t0 = time.time()
    end_angle = 27.7 * degree
    gc = vary_angle(start_grating=g0, end_angle=end_angle,
                    lens_type="round", target_wavelength=LAM,
                    numG=args.numG, terms=terms, use_gradient=True,
                    gradient_steps=15, optimize2_attempts=3, verbose=False)
    print(f"collection: {len(gc.grating_list)} members ({time.time()-t0:.0f}s)")

    # --- 3. amplitude databases ---
    t0 = time.time()
    gc.characterize(LAM, numG=args.numG, u_steps=3)
    gc.build_interpolators()
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=8)
    hgs.characterize(wavelength=LAM, numG=args.numG, just_normal=False,
                     u_steps=3)
    hgs.build_interpolators()
    print(f"characterized ({time.time()-t0:.0f}s)")

    # --- 4. assemble the lens ---
    # bracket start at 12 deg so the innermost Fresnel zero (r ~ 5.4um,
    # 12.2 deg) passes design_periphery's angle threshold
    outer_angle = gc.get_outermost().get_angle_in_air(LAM)
    lps, lcs, r_switch, xyrra = make_design(
        [[(12 * degree, outer_angle + 0.5 * degree), gc]],
        d, radius, hgs, make_xyrra_list=True)
    print(f"lens: {xyrra.shape[0]} pillars, {len(lps['r_center_list'])} rings, "
          f"center r={r_switch/um:.2f}um")
    make_dxf(xyrra, os.path.join(args.outdir, "collimator.dxf"))
    make_svg(xyrra, os.path.join(args.outdir, "collimator.svg"))
    make_gds(xyrra, os.path.join(args.outdir, "collimator.gds"))

    # --- 4b. RGB databases for chromatic evaluation (--rgb): one joint
    # (lambda x direction) sweep per member fills 450 + 650 on top of 580;
    # the design itself stays the 580-optimized geometry ---
    eval_lams = [LAM]
    if args.rgb:
        t0 = time.time()
        gc.characterize([450 * nm, 650 * nm], numG=args.numG, u_steps=3,
                        append=True)
        gc.build_interpolators()
        hgs.characterize(wavelength=[450 * nm, 650 * nm], numG=args.numG,
                         just_normal=False, u_steps=3, append=True)
        hgs.build_interpolators()
        eval_lams = [450 * nm, LAM, 650 * nm]
        print(f"RGB databases ({time.time()-t0:.0f}s)")

    # --- 5. near-field + far-field (per evaluation wavelength) ---
    t0 = time.time()
    half = radius * 1.05
    for lam in eval_lams:
        n_pts = good_fft_number(2 * half / (lam / 2.2))
        x_pts = np.linspace(-half, half, n_pts)
        Ex, Ey, Hx, Hy, xs, ys, P_lens, ng = build_nearfield(
            0.0, 0.0, -d, "x", lam, lps, lcs, hgs, x_pts, x_pts,
            dipole_moment=1e-30)
        P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys,
                                                lam, ng)
        m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                          spot_radius_u=0.1)
        tag = f"{round(lam/nm)}nm"
        print(f"[{tag}] transmission: {m['transmission']:.3f}  "
              f"peak (ux, uy) = ({m['peak_ux']:.3f}, {m['peak_uy']:.3f})  "
              f"0.1-cone fraction: {m['spot_fraction_of_total']:.3f}")
        try:
            from metalens_tpu.viz import _plt
            plt = _plt()
            Pz = np.asarray(P)
            Pz = np.where(np.isfinite(Pz), Pz, 0.0)
            plt.figure(figsize=(5, 4))
            plt.imshow(np.log10(Pz.T + Pz.max() * 1e-8),
                       extent=(ux.min(), ux.max(), uy.min(), uy.max()),
                       origin="lower")
            plt.xlabel("ux"); plt.ylabel("uy")
            plt.title(f"far-field power (log10), {tag}")
            plt.colorbar()
            plt.savefig(os.path.join(args.outdir, f"farfield_{tag}.png"),
                        dpi=120)
            plt.close()
        except Exception as e:
            print("plot skipped:", e)
    print(f"near+far field ({time.time()-t0:.0f}s)")
    print(f"wrote {args.outdir}/farfield_*.png, collimator.dxf, "
          f"collimator.svg")


if __name__ == "__main__":
    main()
