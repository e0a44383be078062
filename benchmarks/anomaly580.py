#!/usr/bin/env python3
"""Decompose the NS2 RGB collimator's 580 nm transmission anomaly.

Round-3 ledger: transmission 0.90 / 0.70 / 0.79 at 450 / 580 / 650 nm --
the DESIGN wavelength loses to both off-design wavelengths.  Hypotheses:

  (H1) the RGB FOM scores 580 nm with the inphase Im-trick (phase
       alignment) while 450/650 score raw magnitude, so the optimizer
       deliberately trades 580 |amp| for cross-member phase coherence;
  (H2) one weak region (e.g. the coarsened bracket 3) drags the lens
       average down at 580 specifically;
  (H3) the hex center's 580 phase library picks low-|amp| entries.

Three measurements, each attributable to one hypothesis:

  members   per periphery member and wavelength: mean transmitted power
            fraction over the characterize DB's (direction, pol) grid
            (H1 if 580 < 450/650 across ALL brackets; H2 if localized)
  center    per hex entry and wavelength: transmitted (0,0)-order power
            at the phase-library pick directions (H3)
  annuli    [chip] stitch each wavelength and integrate the near-field
            Poynting flux per ring-bracket annulus + center disk against
            the source flux through the same annulus (localizes the loss
            on the actual lens, including stitching/interpolation effects)

Usage: python benchmarks/anomaly580.py [--artifacts DIR] [--stage members|
center|annuli|all] [--cpu]
"""

import argparse
import json
import math
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(HERE, "ANOMALY580.json")


def _resolve_ng(g):
    """Per-wavelength glass index for a scene object (0-sentinel aware)."""
    from metalens_tpu.materials import n_glass
    lams = sorted({e["wavelength_in_nm"] for e in g.data})
    return {l: (g.n_glass if g.n_glass != 0 else float(n_glass(l)))
            for l in lams}


def _entry_powers(entries, ng_by_lam):
    """Transmitted power fraction per (wavelength, ux, uy, pol) group of a
    member's data-dict list: sum of per-order z-flux in glass over the
    incident z-flux in air (unit incident amplitude in the x/y basis)."""
    from metalens_tpu.solver import basis
    groups = defaultdict(list)
    for e in entries:
        groups[(e["wavelength_in_nm"], e["ux"], e["uy"], e["x_or_y"])
               ].append(e)
    out = defaultdict(list)   # wavelength -> [T, ...]
    for (lam_nm, ux, uy, pol), es in groups.items():
        n_glass = ng_by_lam[lam_nm]
        Pt = 0.0
        for e in es:
            kx = ux + e["ox"] * e["_lam_over_gp"]
            ky = uy + e["oy"] * e["_lam_over_lp"]
            kz2 = n_glass ** 2 - kx ** 2 - ky ** 2
            if kz2 <= 0:
                continue
            c = np.array([e["ampfy"], e["ampfx"]])   # [c_y; c_x], N=1
            Pt += float(basis.order_powers(
                c, np.array([kx]), np.array([ky]),
                np.array([math.sqrt(kz2)]), n_glass)[0])
        kz_in = math.sqrt(max(1.0 - ux ** 2 - uy ** 2, 1e-12))
        cin = np.array([1.0 + 0j, 0j] if pol == "y" else [0j, 1.0 + 0j])
        Pin = float(basis.order_powers(cin, np.array([ux]), np.array([uy]),
                                       np.array([kz_in]), 1.0)[0])
        out[lam_nm].append(Pt / Pin)
    return {k: (float(np.mean(v)), float(np.min(v))) for k, v in
            sorted(out.items())}


def stage_members(art):
    from metalens_tpu.serialization import load
    report = []
    for bi in range(8):
        path = os.path.join(art, f"gc{bi}_char.npz")
        if not os.path.exists(path):
            break
        gc = load(path)
        for mi, g in enumerate(gc.grating_list):
            for e in g.data:
                lam = e["wavelength_in_nm"] * 1e-9
                e["_lam_over_gp"] = lam / g.grating_period
                e["_lam_over_lp"] = lam / g.lateral_period
            t = _entry_powers(g.data, _resolve_ng(g))
            report.append({"bracket": bi, "member": mi,
                           "angle_deg": round(math.degrees(
                               g.get_angle_in_air(
                                   gc.target_wavelength)), 2),
                           "T_mean_min_by_lam": {str(int(k)): [round(a, 4),
                                                               round(b, 4)]
                                                 for k, (a, b) in t.items()}})
    return report


def stage_center(art):
    from metalens_tpu.serialization import load
    hgs = load(os.path.join(art, "hgs_char.npz"))
    report = []
    for gi, g in enumerate(hgs.grating_list):
        for e in g.data:
            lam = e["wavelength_in_nm"] * 1e-9
            e["_lam_over_gp"] = lam / g.grating_period
            e["_lam_over_lp"] = lam / g.lateral_period
        t = _entry_powers(g.data, _resolve_ng(g))
        zero580 = [e for e in g.data
                   if e["wavelength_in_nm"] == 580 and e["ox"] == 0
                   and e["oy"] == 0 and e["x_or_y"] == "x"
                   and e["ux"] > 0 and e["uy"] > 0]
        amp0 = zero580[0]["ampfx"] if zero580 else 0j
        report.append({"entry": gi,
                       "radius_nm": round(float(g.xyrra_list[0, 2]) / 1e-9,
                                          1),
                       "T_mean_min_by_lam": {str(int(k)): [round(a, 4),
                                                           round(b, 4)]
                                             for k, (a, b) in t.items()},
                       "amp00_580_abs": round(abs(amp0), 4),
                       "amp00_580_phase": round(float(np.angle(amp0)), 4)})
    return report


def stage_annuli(art):
    """[chip] Per-annulus transmission of the stitched lens at each
    wavelength: ring-bracket annuli + the hex center disk."""
    from metalens_tpu.assembly import make_design
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.geometry import good_fft_number
    from metalens_tpu.solver import cpx
    from metalens_tpu.units import nm, um, degree
    from metalens_tpu import units as nu
    from northstar2 import _load_design, BRACKETS, SOURCE_DISTANCE_UM, \
        RADIUS_UM, LAMS_NM

    gcs, hgs = _load_design(art)
    d = SOURCE_DISTANCE_UM * um
    radius = RADIUS_UM * um
    colls = [[(lo * degree, hi * degree), gc]
             for (lo, hi, _), gc in zip(BRACKETS, gcs)]
    lps, lcs, r_switch = make_design(colls, d, radius, hgs)
    gc_idx = lps["gratingcollection_index_here_list"]
    rmin, rmax = lps["r_min_list"], lps["r_max_list"]
    # annulus of each bracket: [min r_min, max r_max] over its rings
    annuli = [("center", 0.0, float(r_switch))]
    for bi in range(len(BRACKETS)):
        sel = gc_idx == bi
        annuli.append((f"bracket{bi}", float(rmin[sel].min()),
                       float(rmax[sel].max())))

    report = {}
    for lam_nm_v in LAMS_NM:
        lam = lam_nm_v * nm
        half = radius * 1.02
        n_pts = good_fft_number(2 * half / (lam / 2.2))
        x_pts = np.linspace(-half, half, n_pts)
        Ex, Ey, Hx, Hy, xs, ys, P_lens, ng = build_nearfield(
            0.0, 0.0, -d, "x", lam, lps, lcs, hgs, x_pts, x_pts,
            dipole_moment=1e-30)
        # near-field z-flux and the source z-flux on the same grid
        Sz = (cpx.to_np(Ex) * np.conj(cpx.to_np(Hy))
              - cpx.to_np(Ey) * np.conj(cpx.to_np(Hx))).real
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        R = np.hypot(X, Y)
        dist = np.sqrt(X ** 2 + Y ** 2 + d ** 2)
        uz = d / dist
        H_coef = nu.c0 * (2 * np.pi / lam) ** 2 * 1e-30 / (4 * np.pi)
        s = H_coef * uz ** 0.5 / dist
        ux_, uy_ = (X / dist), (Y / dist)
        # x-dipole: H = (0,uz,-uy)*s ; E = Z0 * (H x (-u)) z-comp terms
        Hx_s = (uy_ * 0 - uz * 0) * s
        Hy_s = (uz * 1 - ux_ * 0) * s
        Hz_s = (ux_ * 0 - uy_ * 1) * s
        Ex_s = (Hy_s * uz - Hz_s * uy_) * nu.Z0
        Ey_s = (Hz_s * ux_ - Hx_s * uz) * nu.Z0
        Sz_src = Ex_s * Hy_s - Ey_s * Hx_s
        per = {}
        for name, r0, r1 in annuli:
            m = (R >= r0) & (R < r1)
            per[name] = round(float(Sz[m].sum() / max(Sz_src[m].sum(),
                                                      1e-300)), 4)
        report[str(lam_nm_v)] = per
        print(json.dumps({"lam_nm": lam_nm_v, **per}), flush=True)
        del Ex, Ey, Hx, Hy
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default=os.path.join(HERE,
                                                        "ns2_artifacts"))
    ap.add_argument("--stage", default="all",
                    choices=["all", "members", "center", "annuli"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    out = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out = json.load(f)
    if args.stage in ("all", "members"):
        out["members"] = stage_members(args.artifacts)
    if args.stage in ("all", "center"):
        out["center"] = stage_center(args.artifacts)
    if args.stage in ("all", "annuli"):
        out["annuli"] = stage_annuli(args.artifacts)
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
