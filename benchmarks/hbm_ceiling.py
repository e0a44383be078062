#!/usr/bin/env python3
"""HBM ceiling for the scale axis: how big an aperture fits one chip?

The axon backend returns no ``memory_stats()`` (every ``hbm_peak_bytes``
probe reads 0), so the ceiling is established the way the reference
manages its RAM ceiling explicitly (``/root/reference/nearfield.py:482-516``
chunks at 1e7 points): an ARITHMETIC inventory of the point-shaped arrays
the stitch holds, validated by pushing a real stitch to the predicted edge
on chip (OOM surfaces as a clean remote-compile/alloc error).

MEASURED (round 4, full NS2 lens, one v5e chip, f32):

  num_x=2800  ( 7.84M points)  OK      -- largest validated stitch
  num_x=3200  (10.24M points)  OOM     -- genuine RESOURCE_EXHAUSTED
  num_x>=3600 (12.96M+ points) blocked by tunnel infra BEFORE reaching
              the chip: the chipless AOT compile helper crashes with
              "Failed to find host bounds for accelerator type" on
              big-footprint programs (terminal-side env bug; NOT
              reproducible or fixable from this sandbox -- setting
              TPU_ACCELERATOR_TYPE client-side is not forwarded).
  raw jit allocation probe: a single 14 GiB output buffer materializes
              fine, so the chip's HBM matches the v5e spec and the
              3200 failure is program-level liveness, not a tunnel cap.

So the measured single-chip ceiling for the CURRENT stitch is
7.84M <= C < 10.24M points -- about 4x below the 42.9M the static
plane inventory predicts.  The inventory counts ~89 resident f32
planes (360 B/point); the gap is peak liveness the plan-level count
misses: the geometry stage runs EAGERLY (one remote XLA op per step,
each holding input+output copies, nothing fused or freed until the
scan consumes them), XLA pads every plane to (8,128) tiles, and the
runtime holds a reserve.  MEASURED_BYTES_PER_POINT below encodes the
validated bracket; past the ceiling, the overflow paths are
``build_nearfield_big`` (uy-slab chunked stitch, host accumulation)
and ``farfield_big`` (slab-chunked transform) -- the same mechanism
the reference uses for ALL apertures above 1e7 points.  Fusing the
eager geometry stage into one jitted program is the known lever if
the single-shot ceiling ever needs to rise.

Per-point byte model (f32 planes of num_x*num_y elements; counted from
``metalens_tpu/nearfield.py`` -- eager locals live for the whole call,
jitted temporaries live inside the scan program):

  geometry & source (eager locals)        ~45 planes
    X Y | lens_r lens_phi | ring class (which_ring in_center which_gc
    safe_ring grating_period angle_per_grating r_center lateral_period
    grating_rotation) | gratingcenter xy | dx dy distance ux uy uz |
    cosr sinr uxp uyp xp yp | dipole s + 5 field comps + 2 weights |
    accumulators Exp Eyp Hxp Hyp (4 complex = 8) | pts stack (3)
  _accumulate_orders scan live set        ~36 planes
    trilinear corner idxs+ws (8+8) | per-order kx ky kz mask inv (5) |
    phase (2) pf_fy pf_fx (4) gathered amps (8) + fusion slack
  center-site lookup (center region)      ~8 planes
    rows found best_d2 best_idx + 4x4 candidate temps

  TOTAL ~ 89 planes x 4 B = ~356 B/point (model uses 360 with margin)

Far-field is smaller: the matmul/four-step DFT holds ~16 planes (field,
DFT matrix, intermediate, output, 3 sibling spectra) and reuses the
stitch's fields, so the STITCH sets the ceiling.  The v5e-8 ceiling
scales by ~8x points (sharded aperture: every point-shaped plane splits
across the mesh, amplitude tables replicate -- parallel/nearfield.py).

Modes:
  --arith              print the model + predicted ceilings (no devices)
  --validate N [N...]  run a real stitch at num_x=N on the chip
                       (uses --artifacts lens if present, else a synthetic
                       center-only hex lens) and report ok/OOM
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BYTES_PER_POINT = 360          # static plane inventory, see docstring
HBM_BYTES_V5E = 16 * 2 ** 30   # v5e: 16 GiB HBM per chip
HBM_USABLE_FRACTION = 0.9      # runtime/program reserve

# Measured on chip (round 4, NS2 lens, f32): 2800^2 ok / 3200^2 OOM.
MEASURED_OK_POINTS = 2800 * 2800
MEASURED_OOM_POINTS = 3200 * 3200
# Effective peak bytes/point implied by the OOM edge (eager-geometry
# double-buffering + tile padding on top of the 360 B resident planes).
MEASURED_BYTES_PER_POINT = int(HBM_BYTES_V5E * HBM_USABLE_FRACTION
                               / MEASURED_OOM_POINTS)   # ~1509


def ceiling_points(n_chips=1, measured=True):
    """Points per mesh: the VALIDATED single-chip stitch size, scaled by
    chip count (every point-shaped plane shards across the mesh in
    parallel/nearfield.py; amplitude tables replicate)."""
    if measured:
        return MEASURED_OK_POINTS * n_chips
    return int(HBM_BYTES_V5E * HBM_USABLE_FRACTION * n_chips
               / BYTES_PER_POINT)


def arith():
    from metalens_tpu.geometry import good_fft_number
    out = {"bytes_per_point_model": BYTES_PER_POINT,
           "bytes_per_point_measured": MEASURED_BYTES_PER_POINT,
           "measured_ok_points": MEASURED_OK_POINTS,
           "measured_oom_points": MEASURED_OOM_POINTS,
           "hbm_bytes": HBM_BYTES_V5E,
           "usable_fraction": HBM_USABLE_FRACTION}
    for chips in (1, 8):
        pts = ceiling_points(chips)
        n = int(math.sqrt(pts))
        # largest 5-smooth grid size not above the budget
        n_fft = n
        while good_fft_number(n_fft) > n:
            n_fft -= 1
        n_fft = good_fft_number(n_fft)
        for lam_nm in (450, 580, 650):
            spacing = lam_nm / 2.2          # nm, the lambda/2.2 default
            radius_um = n_fft * spacing / 2 / 1000.0
            out[f"v5e_{chips}chip_{lam_nm}nm"] = {
                "max_points": pts, "grid": n_fft,
                "aperture_radius_um": round(radius_um, 1)}
    return out


def _synthetic_center_lens(radius):
    """Tiny-DB center-only lens big enough to rate-limit on aperture
    points, cheap enough to characterize in one short chip program."""
    from metalens_tpu.assembly import hexagonal_grid
    from metalens_tpu.hexgrid import HexGridSet
    from metalens_tpu.units import nm
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=4)
    hgs.characterize(wavelength=[580 * nm], numG=9, just_normal=False,
                     u_steps=2)
    hgs.build_interpolators()
    sites = hexagonal_grid(radius, 320 * nm)
    rng = np.random.default_rng(0)
    which = rng.integers(0, len(hgs.grating_list), len(sites))
    lcs = np.column_stack([sites, which.astype(float)])
    return hgs, lcs


def validate(sizes, artifacts=None):
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.units import nm, um
    from metalens_tpu.solver import cpx

    lam = 580 * nm
    if artifacts and os.path.exists(os.path.join(artifacts, "hgs_char.npz")):
        # the real NS2 lens (strongest validation: full periphery + center)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from northstar2 import _load_design, BRACKETS, SOURCE_DISTANCE_UM, \
            RADIUS_UM
        from metalens_tpu.assembly import make_design
        from metalens_tpu.units import degree
        gcs, hgs = _load_design(artifacts)
        colls = [[(lo * degree, hi * degree), gc]
                 for (lo, hi, _), gc in zip(BRACKETS, gcs)]
        lps, lcs, _ = make_design(colls, SOURCE_DISTANCE_UM * um,
                                  RADIUS_UM * um, hgs)
        src_z = -SOURCE_DISTANCE_UM * um
        half = RADIUS_UM * um * 1.02
        kind = "ns2-lens"
    else:
        hgs, lcs = _synthetic_center_lens(60 * um)
        lps = None
        src_z = -150 * um
        half = 61 * um
        kind = "synthetic-center"
    print(json.dumps({"validate": kind,
                      "validated_max_points": ceiling_points(1)}), flush=True)
    for n in sizes:
        # NOTE: half-width is fixed by the lens; pushing n raises sampling
        # density, which stresses HBM identically to a bigger aperture at
        # fixed density (the stitch cost/liveness is per POINT)
        x_pts = np.linspace(-half, half, n)
        try:
            out = build_nearfield(0.0, 0.0, src_z, "x", lam, lps, lcs,
                                  hgs, x_pts, x_pts, dipole_moment=1e-30)
            val = float(np.asarray(out[0].re)[0, 0])  # materialize
            print(json.dumps({"num_x": n, "points": n * n, "ok": True,
                              "bytes_model": n * n * BYTES_PER_POINT,
                              "probe": val}), flush=True)
        except Exception as e:
            print(json.dumps({"num_x": n, "points": n * n, "ok": False,
                              "bytes_model": n * n * BYTES_PER_POINT,
                              "error": f"{type(e).__name__}: {e}"[:3000]}),
                  flush=True)
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arith", action="store_true")
    ap.add_argument("--validate", type=int, nargs="*")
    ap.add_argument("--artifacts",
                    default=os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "ns2_artifacts"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.arith or not args.validate:
        print(json.dumps(arith(), indent=1))
    if args.validate:
        validate(args.validate, args.artifacts)


if __name__ == "__main__":
    main()
