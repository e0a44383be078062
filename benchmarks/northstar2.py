#!/usr/bin/env python3
"""North star #2: full RGB high-NA collimator, measured end to end.

BASELINE.json target: "full RGB high-NA collimator: design + characterize +
near-to-far-field < 1 hour wall-clock on TPU v5e-8".  This script runs the
whole reference workflow (README.md:52-94) at production scale on ONE chip
and records a per-stage wall-clock ledger:

  design       RGB-FOM periphery collections (vary_angle continuation per
               angle bracket, reference grating.py:820-918 + the RGB FOM
               table grating.lua:295-311)
  characterize 3-wavelength amplitude database at numG=100 (the reference's
               characterize default, grating.py:366) for every periphery
               member + the hex-grid center library
  assemble     ring layout + hex center + explicit pillar list
               (design_collimator.py:186-312 scale: reference production
               was radius=410um, source_distance=150um)
  stitch       full-aperture near-field at each of 450/580/650 nm
  farfield     near-to-far-field + focal metrics at each wavelength

Geometry: radius 250 um (0.5 mm aperture), source distance 150 um ->
outermost incidence angle 59 deg (NA_air = 0.86).  Periphery covers
20..59.5 deg in four pillar-count brackets; the hex center covers the
rest (|u| <= 0.34, inside the hex DB's 0.5 bound).

Stages checkpoint their artifacts under --artifacts (npz via
metalens_tpu.serialization) and can be re-run individually:

    python benchmarks/northstar2.py --stage all
    python benchmarks/northstar2.py --stage design        # then
    python benchmarks/northstar2.py --stage characterize  # etc.

The ledger accumulates in benchmarks/NS2_LEDGER.json; every stage entry
carries wall seconds plus its headline quantities, and the TPU stages
record HBM peak bytes.  Two wall-clock regimes are reported: this
process's measured time (which over the remote-tunnel dev setup is
dominated by per-signature XLA compiles of ~20-60 s; each continuation
member is a fresh program) and the warm re-run (persistent compilation
cache) that represents steady production use.
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER_PATH = os.path.join(HERE, "NS2_LEDGER.json")

# --- production geometry -------------------------------------------------
RADIUS_UM = 250.0          # 0.5 mm aperture (reference production: 410 um)
SOURCE_DISTANCE_UM = 150.0  # reference design_collimator.py:50
LAMS_NM = (450, 580, 650)
DESIGN_NUMG = 50           # reference optimize default (grating.py:205)
CHAR_NUMG = 100            # reference characterize default (grating.py:366)
# (angle_lo_deg, angle_hi_deg, n_pillars): pillar count ~ period / 320nm
BRACKETS = ((20.0, 27.0, 5), (27.0, 37.0, 4), (37.0, 48.0, 3),
            (48.0, 59.5, 2))
CHANGE_EACH_STEP = 1.05    # ~21 members total (1% reference steps would be
SIMILARITY = 0.15          # ~110; get_one interpolates between members)
FUSED_DESIGN = False       # MEASURED round 5: the cold from-scratch fused
#                            design ran 12018s vs the host loop's 4407.6s
#                            (NS2_LEDGER.json) -- the fused programs cost
#                            ~10min of remote compile EACH and the drifting
#                            static config compiled 16 of them; the
#                            static-envelope fix collapses that to 8 but
#                            the remaining compile tax still can't beat
#                            the host loop from cold.  The fused loops win
#                            WARM (8.5s vs 297s per member,
#                            DESIGN_MEMBER_FUSED.json): --fused-design
#                            selects them for warm-cache / resumed runs.


def _ledger_update(stage, entry):
    ledger = {}
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH) as f:
            ledger = json.load(f)
    ledger[stage] = entry
    total = sum(v.get("wall_s", 0) for v in ledger.values()
                if isinstance(v, dict))
    ledger["_total_wall_s"] = round(total, 1)
    ledger["_budget_s"] = 3600
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1)
    print(json.dumps({"stage": stage, **entry}), flush=True)


def _hbm_stats():
    """Device memory stats -- or an explicit 'unavailable' marker: the axon
    backend returns no memory_stats(), and a field that silently reads 0
    is worse than none (round-3 verdict).  The ceiling is established by
    arithmetic + an on-chip edge push instead: benchmarks/hbm_ceiling.py."""
    import jax
    try:
        st = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        st = {}
    peak = int(st.get("peak_bytes_in_use", 0))
    if peak:
        return {"hbm_peak_bytes": peak,
                "hbm_limit_bytes": int(st.get("bytes_limit", 0))}
    return {"hbm_stats": "unavailable (backend reports no memory_stats; "
                         "see benchmarks/hbm_ceiling.py)"}


def _rgb_terms():
    from metalens_tpu.solver.fom import FomTerm
    from metalens_tpu.units import nm
    # reference RGB FOM table (grating.lua:295-311): in-phase scoring at
    # the center wavelength, magnitude at the outer two, equal weights
    return [FomTerm(650 * nm, 1.0, -1, False),
            FomTerm(580 * nm, 1.0, -1, True),
            FomTerm(450 * nm, 1.0, -1, False)]


def _seed_grating(angle_deg, n_pillars):
    """Feasible phase-ramp seed: n pillars across the supercell with ramped
    radii, shrunk until validate() passes."""
    from metalens_tpu import Grating, validate
    from metalens_tpu.units import nm, degree
    lam = 580 * nm
    angle = angle_deg * degree
    period_nm = 580.0 / math.sin(angle)
    xs = [-period_nm / 2 + (i + 0.5) * period_nm / n_pillars
          for i in range(n_pillars)]
    rows = []
    for i, x in enumerate(xs):
        f = i / max(n_pillars - 1, 1)
        rows.append([x, 0.0, 60.0 + 55.0 * f, 68.0 + 42.0 * f, 0.0])
    lateral = 320 * nm
    g = Grating(lateral_period=lateral, cyl_height=550 * nm,
                target_wavelength=lam, angle_in_air=angle,
                xyrra_list_in_nm_deg=np.array(rows))
    for _ in range(30):
        if validate(g):
            return g
        g.xyrra_list[:, 2:4] *= 0.95
    raise RuntimeError(f"no feasible seed at {angle_deg} deg x{n_pillars}")


def stage_design(art):
    """RGB periphery collections: optimize a seed per bracket, then a
    vary_angle continuation across the bracket."""
    from metalens_tpu.optimize import optimize, optimize2, vary_angle
    from metalens_tpu.serialization import save
    from metalens_tpu.units import nm, degree
    terms = _rgb_terms()
    t0 = time.perf_counter()
    info = []
    for bi, (lo, hi, npil) in enumerate(BRACKETS):
        tb = time.perf_counter()
        path = os.path.join(art, f"gc{bi}.npz")
        if os.path.exists(path):
            from metalens_tpu.serialization import load
            gc = load(path)
            print(f"# bracket {bi}: resumed from {path} "
                  f"({len(gc.grating_list)} members)", flush=True)
            foms = [g.fom(target_wavelength=580 * nm, numG=DESIGN_NUMG,
                          terms=terms) for g in gc.grating_list]
            info.append({"bracket_deg": [lo, hi], "pillars": npil,
                         "members": len(gc.grating_list), "resumed": True,
                         "fom_mean": round(float(np.mean(foms)), 4),
                         "fom_min": round(float(np.min(foms)), 4),
                         "wall_s": round(time.perf_counter() - tb, 1)})
            continue
        print(f"# bracket {bi}: {lo}-{hi} deg, {npil} pillars", flush=True)
        # seeded per bracket since round 4: equal-FOM realizations were
        # measured to differ 2x in raw off-design transmission, so the
        # ledger run must be reproducible (BASELINE.md)
        rng = np.random.default_rng(1000 + bi)
        g0 = _seed_grating(lo - 0.3, npil)   # innermost member sits just
        # below the bracket's low edge so boundary rings interpolate
        # inside the member range
        # overshoot the top edge by one continuation step so a member
        # >= hi exists (vary_angle stops at the last candidate <= end)
        end = math.atan(CHANGE_EACH_STEP * math.tan(hi * degree))
        if FUSED_DESIGN:
            from metalens_tpu.optimize_fused import (optimize_fused,
                                                     optimize2_fused)
            from metalens_tpu.optimize import continuation_static_envelope
            # ONE static envelope for the whole bracket: the seed and
            # every continuation member share one compiled program pair
            # (the round-5 cold run measured 16 compiled programs /
            # ~6700s of drift-induced recompiles without this)
            env = continuation_static_envelope(
                g0, end, "round", 580 * nm, numG=DESIGN_NUMG,
                terms=terms, change_each_step=CHANGE_EACH_STEP)
            g0 = optimize_fused(g0, target_wavelength=580 * nm,
                                numG=DESIGN_NUMG, terms=terms,
                                verbose=False,
                                seed=int(rng.integers(2 ** 31)),
                                static_override=env)
            g0 = optimize2_fused(g0, target_wavelength=580 * nm,
                                 attempts=40, numG=DESIGN_NUMG,
                                 terms=terms, verbose=False,
                                 seed=int(rng.integers(2 ** 31)),
                                 static_override=env)
        else:
            g0 = optimize(g0, target_wavelength=580 * nm, numG=DESIGN_NUMG,
                          terms=terms, verbose=False, rng=rng)
            g0 = optimize2(g0, target_wavelength=580 * nm, attempts=40,
                           numG=DESIGN_NUMG, terms=terms, verbose=False,
                           rng=rng)
        gc = vary_angle(start_grating=g0, end_angle=end,
                        lens_type="round", target_wavelength=580 * nm,
                        numG=DESIGN_NUMG, terms=terms, use_gradient=False,
                        optimize2_attempts=15, verbose=False,
                        change_each_step=CHANGE_EACH_STEP,
                        similarity_each_step=SIMILARITY, rng=rng,
                        use_fused=FUSED_DESIGN,
                        static_override=(env if FUSED_DESIGN
                                               else None))
        save(gc, path)
        print(f"# bracket {bi}: {len(gc.grating_list)} members "
              f"({time.perf_counter() - tb:.0f}s)", flush=True)
        foms = [g.fom(target_wavelength=580 * nm, numG=DESIGN_NUMG,
                      terms=terms) for g in gc.grating_list]
        info.append({"bracket_deg": [lo, hi], "pillars": npil,
                     "members": len(gc.grating_list),
                     "fom_mean": round(float(np.mean(foms)), 4),
                     "fom_min": round(float(np.min(foms)), 4),
                     "wall_s": round(time.perf_counter() - tb, 1)})
    _ledger_update("design", {
        "wall_s": round(time.perf_counter() - t0, 1),
        "brackets": info, "numG": DESIGN_NUMG, "fused": FUSED_DESIGN,
        "rgb_terms_nm": [650, 580, 450], **_hbm_stats()})


def _with_tunnel_retry(fn, tries=3, pause_s=90):
    """The axon remote-compile tunnel occasionally drops a response
    mid-stream (CLAUDE.md); a pause and a clean retry recovers it."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:
            if attempt == tries - 1:
                raise
            print(f"# tunnel error ({e}); retrying in {pause_s}s",
                  flush=True)
            time.sleep(pause_s)


def stage_characterize(art):
    """3-wavelength amplitude DB at numG=100 for periphery + center."""
    from metalens_tpu.hexgrid import HexGridSet
    from metalens_tpu.serialization import load, save
    from metalens_tpu.units import nm
    lams = [l * nm for l in LAMS_NM]
    t0 = time.perf_counter()
    entries = 0
    for bi in range(len(BRACKETS)):
        path = os.path.join(art, f"gc{bi}_char.npz")
        if os.path.exists(path):
            gc = load(path)
            print(f"# characterize bracket {bi}: resumed from {path}",
                  flush=True)
        else:
            tb = time.perf_counter()
            gc = load(os.path.join(art, f"gc{bi}.npz"))
            _with_tunnel_retry(
                lambda: gc.characterize(lams, numG=CHAR_NUMG, u_steps=5))
            save(gc, path)
            print(f"# characterize bracket {bi}: "
                  f"{sum(len(g.data) for g in gc.grating_list)} entries "
                  f"({time.perf_counter() - tb:.0f}s)", flush=True)
        entries += sum(len(g.data) for g in gc.grating_list)
    t_per = time.perf_counter() - t0
    hgs_path = os.path.join(art, "hgs_char.npz")
    if os.path.exists(hgs_path):
        hgs = load(hgs_path)
        print(f"# characterize center: resumed from {hgs_path}", flush=True)
    else:
        hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=16)
        _with_tunnel_retry(
            lambda: hgs.characterize(wavelength=lams, numG=CHAR_NUMG,
                                     just_normal=False, u_steps=5))
        save(hgs, hgs_path)
    entries += sum(len(g.data) for g in hgs.grating_list)
    _ledger_update("characterize", {
        "wall_s": round(time.perf_counter() - t0, 1),
        "wall_s_periphery": round(t_per, 1),
        "numG": CHAR_NUMG, "wavelengths_nm": list(LAMS_NM),
        "db_entries": entries, **_hbm_stats()})


def _load_design(art):
    from metalens_tpu.serialization import load
    gcs = [load(os.path.join(art, f"gc{bi}_char.npz"))
           for bi in range(len(BRACKETS))]
    for gc in gcs:
        gc.build_interpolators()
    hgs = load(os.path.join(art, "hgs_char.npz"))
    hgs.build_interpolators()
    return gcs, hgs


def stage_assemble(art, export=False):
    from metalens_tpu.assembly import make_design
    from metalens_tpu.units import nm, um, degree
    gcs, hgs = _load_design(art)
    d = SOURCE_DISTANCE_UM * um
    radius = RADIUS_UM * um
    # design_periphery requires exactly contiguous brackets
    collections = [[(lo * degree, hi * degree), gc]
                   for (lo, hi, _), gc in zip(BRACKETS, gcs)]
    t0 = time.perf_counter()
    lps, lcs, r_switch, xyrra = make_design(
        collections, d, radius, hgs, make_xyrra_list=True)
    dt = time.perf_counter() - t0
    np.savez_compressed(os.path.join(art, "lens.npz"),
                        xyrra=xyrra, r_switch=r_switch,
                        lcs=np.asarray(lcs),
                        **{f"lps_{k}": np.asarray(v)
                           for k, v in lps.items()
                           if k != "gratingcollection_list"})
    entry = {"wall_s": round(dt, 1), "pillars": int(xyrra.shape[0]),
             "rings": int(len(lps["r_center_list"])),
             "center_sites": int(len(lcs)),
             "r_switch_um": round(float(r_switch) / um, 2),
             "radius_um": RADIUS_UM, "source_distance_um": SOURCE_DISTANCE_UM,
             "na_air": round(math.sin(math.atan(radius / d)), 3)}
    if export:
        from metalens_tpu.export import make_dxf
        te = time.perf_counter()
        make_dxf(xyrra, os.path.join(art, "collimator.dxf"))
        entry["wall_s_dxf"] = round(time.perf_counter() - te, 1)
    _ledger_update("assemble", entry)
    return lps, lcs, r_switch, gcs, hgs


def stage_stitch_farfield(art):
    """Near-field stitch + far-field focus at each wavelength.  The two are
    fused per wavelength so the 0.4 GB aperture fields never hit disk."""
    from metalens_tpu.assembly import make_design
    from metalens_tpu.farfield import farfield, focal_metrics
    from metalens_tpu.geometry import good_fft_number
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.units import nm, um, degree
    gcs, hgs = _load_design(art)
    d = SOURCE_DISTANCE_UM * um
    radius = RADIUS_UM * um
    collections = [[(lo * degree, hi * degree), gc]
                   for (lo, hi, _), gc in zip(BRACKETS, gcs)]
    lps, lcs, r_switch = make_design(collections, d, radius, hgs)

    half = radius * 1.02
    per_lam = {}
    t_all = time.perf_counter()
    for lam_nm in LAMS_NM:
        lam = lam_nm * nm
        n_pts = good_fft_number(2 * half / (lam / 2.2))
        x_pts = np.linspace(-half, half, n_pts)
        t0 = time.perf_counter()
        Ex, Ey, Hx, Hy, xs, ys, P_lens, ng = build_nearfield(
            0.0, 0.0, -d, "x", lam, lps, lcs, hgs, x_pts, x_pts,
            dipole_moment=1e-30)
        np.asarray(Ex.re)  # materialize before timing the stitch
        t_nf = time.perf_counter() - t0
        t0 = time.perf_counter()
        P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, xs, ys,
                                                lam, ng)
        m = focal_metrics(P, ux, uy, dux, duy, total_P, P_lens,
                          spot_radius_u=0.1)
        t_ff = time.perf_counter() - t0
        per_lam[str(lam_nm)] = {
            "aperture_pts": int(n_pts) ** 2,
            "wall_s_stitch": round(t_nf, 1),
            "wall_s_farfield": round(t_ff, 1),
            "transmission": round(m["transmission"], 4),
            "peak_u": [round(m["peak_ux"], 4), round(m["peak_uy"], 4)],
            "spot_fraction_0p1": round(m["spot_fraction_of_total"], 4)}
        print(json.dumps({"lambda_nm": lam_nm, **per_lam[str(lam_nm)]}),
              flush=True)
        del Ex, Ey, Hx, Hy, P
    _ledger_update("stitch_farfield", {
        "wall_s": round(time.perf_counter() - t_all, 1),
        "per_wavelength": per_lam, **_hbm_stats()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "design", "characterize", "assemble",
                             "stitch"])
    ap.add_argument("--artifacts", default=os.path.join(HERE, "ns2_artifacts"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--export", action="store_true",
                    help="also write the DXF pillar list")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-scale pipeline check (single bracket, "
                         "single wavelength, micro lens); does not "
                         "overwrite the production ledger")
    ap.add_argument("--host-design", action="store_true",
                    help="design stage via the host optimizer loops "
                         "(the default since round 5; kept for "
                         "compatibility)")
    ap.add_argument("--fused-design", action="store_true",
                    help="design stage via the fused on-device optimizer "
                         "programs: wins warm (8.5s vs 297s per member) "
                         "but pays ~10min remote compile per program "
                         "pair, so cold from-scratch runs measured "
                         "slower (12018s vs 4407.6s round 5)")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="skip the persistent XLA compilation cache "
                         "(on by default: re-runs and resumed stages "
                         "reload executables instead of recompiling)")
    args = ap.parse_args()
    global FUSED_DESIGN
    if args.host_design:
        FUSED_DESIGN = False
    elif args.fused_design:
        FUSED_DESIGN = True
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        from metalens_tpu.engine import enable_compilation_cache
        cache = enable_compilation_cache()
        print(f"# compilation cache: {cache}", flush=True)
    if args.smoke:
        global RADIUS_UM, SOURCE_DISTANCE_UM, LAMS_NM, DESIGN_NUMG
        global CHAR_NUMG, BRACKETS, LEDGER_PATH
        RADIUS_UM, SOURCE_DISTANCE_UM = 10.5, 25.0
        LAMS_NM = (580,)
        DESIGN_NUMG, CHAR_NUMG = 20, 25
        BRACKETS = ((14.0, 18.0, 2), (18.0, 23.5, 2))
        LEDGER_PATH = os.path.join(HERE, "NS2_LEDGER_SMOKE.json")
        args.artifacts = args.artifacts + "_smoke"
    os.makedirs(args.artifacts, exist_ok=True)
    t0 = time.perf_counter()
    if args.stage in ("all", "design"):
        stage_design(args.artifacts)
    if args.stage in ("all", "characterize"):
        stage_characterize(args.artifacts)
    if args.stage in ("all", "assemble"):
        stage_assemble(args.artifacts, export=args.export)
    if args.stage in ("all", "stitch"):
        stage_stitch_farfield(args.artifacts)
    print(json.dumps({"stage": "done", "stages": args.stage,
                      "wall_s_this_process": round(time.perf_counter() - t0,
                                                   1)}), flush=True)


if __name__ == "__main__":
    main()
