"""Full-lens near-field assembly (the stitcher).

Reconstructs the complex E/H field just behind the whole lens aperture from
the per-unit-cell amplitude databases: every aperture point is classified to
its lens element (periphery ring + azimuthal copy, or center hex cell), the
local incidence direction from the source is computed, the cell's complex
transmission amplitudes are interpolated, and the transverse fields are
rebuilt in the S4 x/y output basis with the off-center and air-propagation
phases applied.  Functional parity with reference ``nearfield.py:66-516``.

TPU-first differences from the reference:

* all heavy arithmetic is jnp (device-resident, works under jit); the
  per-order accumulation is dense multiply-by-mask instead of boolean fancy
  indexing (reference ``nearfield.py:279-327``) -- no dynamic shapes;
* the center-cell lookup replaces scipy cKDTree (reference
  ``nearfield.py:363-367``) with analytic hexagonal-lattice rounding plus a
  dense (n1, n2) -> site-index table: O(1) per point, jit-compatible;
* ``build_nearfield_big``'s RAM-slab loop is kept for API parity, and the
  sharded path (:mod:`metalens_tpu.parallel`) splits the aperture across
  devices instead.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax.numpy as jnp

from . import units as nu
from .geometry import good_fft_number
from .materials import n_glass as n_glass_table
from .solver import cpx
from .solver.cpx import C
from .units import nm, pi, inf

import jax
from .characterize import interp_weights, interp_gather


@jax.jit
def _region_stats(mask, a0, a1, a2):
    """Masked point count + per-array min/max, fused into one device
    program and one (7,) host fetch (the eager version cost seven separate
    device syncs per collection)."""
    stack = jnp.stack([a0, a1, a2])
    m = mask[None]
    mn = jnp.min(jnp.where(m, stack, jnp.inf), axis=(1, 2))
    mx = jnp.max(jnp.where(m, stack, -jnp.inf), axis=(1, 2))
    cnt = mask.sum().astype(mn.dtype)
    return jnp.concatenate([cnt[None], mn, mx])


@jax.jit
def _accumulate_orders(values_all, orders_arr, g0, g1, g2, pts, region_mask,
                       u1, u2, invp1, invp2, xrel, yrel, kvac, kg, ng,
                       Hxw, Hyw, Exp, Eyp, Hxp, Hyp):
    """ALL diffraction orders of one collection in one device program.

    The multilinear interpolation weights depend only on the query points,
    so they are computed once and shared by every (order, pol, channel)
    table; a ``lax.scan`` over the stacked order tables then does, per
    order: corner-gather the four amplitude channels [(x,fy),(x,fx),
    (y,fy),(y,fx)], build the propagating-order mask and phase, and add the
    E/H contributions (reference field formulas, nearfield.py:313-327).
    One dispatch + zero host syncs, vs ~10 eager ops and an interp dispatch
    per order before.  Returns the accumulators plus per-order applicable
    point counts (for progress reporting)."""
    grids = (g0, g1, g2)
    idxs, ws = interp_weights(grids, pts)
    shape = u1.shape
    Z0 = nu.Z0

    def body(carry, ordvals):
        Exp, Eyp, Hxp, Hyp = carry
        o, values4 = ordvals
        kx = kvac * u1 + o[0] * invp1
        ky = kvac * u2 + o[1] * invp2
        mask = (kx ** 2 + ky ** 2 <= kvac ** 2) & region_mask
        kz = jnp.sqrt(jnp.maximum(kg ** 2 - kx ** 2 - ky ** 2,
                                  1e-12 * kvac ** 2))
        phase = cpx.expi(kx * xrel + ky * yrel) * mask
        amps = interp_gather(values4, grids, idxs, ws)   # C of (4, M)
        a_xfy = amps[0].reshape(shape)
        a_xfx = amps[1].reshape(shape)
        a_yfy = amps[2].reshape(shape)
        a_yfx = amps[3].reshape(shape)
        inv = 1.0 / (kg * kz * ng)
        c_fy_x = kx * ky * inv
        c_fy_y = -(kx * kx + kz * kz) * inv
        c_fx_x = (ky * ky + kz * kz) * inv
        c_fx_y = -(kx * ky) * inv
        for a_fy, a_fx, Hw in ((a_xfy, a_xfx, Hxw), (a_yfy, a_yfx, Hyw)):
            Ew = Hw * Z0
            pf_fy = a_fy * phase
            pf_fx = a_fx * phase
            Exp = Exp + pf_fy * (Ew * c_fy_x) + pf_fx * (Ew * c_fx_x)
            Eyp = Eyp + pf_fy * (Ew * c_fy_y) + pf_fx * (Ew * c_fx_y)
            Hxp = Hxp + pf_fy * Hw
            Hyp = Hyp + pf_fx * Hw
        return (Exp, Eyp, Hxp, Hyp), mask.sum()

    (Exp, Eyp, Hxp, Hyp), counts = jax.lax.scan(
        body, (Exp, Eyp, Hxp, Hyp), (orders_arr, values_all))
    return Exp, Eyp, Hxp, Hyp, counts


def _stack_order_tables(interpolators, wavelength_in_nm, all_orders, kinds):
    """(n_orders, 4, *grid, 2) stacked value tables + the shared grids."""
    values_all = jnp.stack([
        jnp.stack([interpolators[(wavelength_in_nm, (ox, oy), p, a)].values
                   for p in ("x", "y") for a in kinds])
        for (ox, oy) in all_orders])
    g = interpolators[(wavelength_in_nm, all_orders[0], "x", kinds[0])].grids
    return values_all, g


def _hex_site_table(lens_center_summary, pitch):
    """Build the dense (n1, n2) -> row-index table for the hex lattice
    x = pitch*n2*sqrt(3)/2, y = pitch*(n1 + n2/2) (the lattice of
    :func:`metalens_tpu.assembly.hexagonal_grid`)."""
    xy = np.asarray(lens_center_summary)[:, 0:2]
    n2 = np.round(2 * xy[:, 0] / (pitch * math.sqrt(3))).astype(int)
    n1 = np.round(xy[:, 1] / pitch - n2 / 2.0).astype(int)
    # verify the inversion is exact (sites really are on the lattice)
    x_back = pitch * n2 * math.sqrt(3) / 2
    y_back = pitch * (n1 + n2 / 2.0)
    assert np.abs(x_back - xy[:, 0]).max() < 1e-6 * pitch
    assert np.abs(y_back - xy[:, 1]).max() < 1e-6 * pitch
    n1_min, n2_min = n1.min() - 2, n2.min() - 2
    table = -np.ones((n1.max() - n1_min + 5, n2.max() - n2_min + 5),
                     dtype=np.int32)
    table[n1 - n1_min, n2 - n2_min] = np.arange(len(xy), dtype=np.int32)
    return jnp.asarray(table), n1_min, n2_min


@jax.jit
def _nearest_center_site(x, y, table, n1_min, n2_min, pitch, site_xy):
    """Index of the nearest stored hex site for each (x, y), via analytic
    lattice rounding with a 4x4 candidate neighborhood (replaces cKDTree).
    Returns (index, found): ``found`` is False where NO stored site lies in
    the candidate window (the index there is a placeholder 0, not the
    global nearest) -- callers must repair or mask those points."""
    n2f = 2 * x / (pitch * math.sqrt(3))
    n1f = y / pitch - n2f / 2.0
    n1r = jnp.floor(n1f).astype(jnp.int32)
    n2r = jnp.floor(n2f).astype(jnp.int32)
    best_d2 = jnp.full(x.shape, jnp.inf)
    best_idx = jnp.zeros(x.shape, dtype=jnp.int32)
    for di in (0, 1, -1, 2):
        for dj in (0, 1, -1, 2):
            n1c = n1r + di
            n2c = n2r + dj
            i1 = jnp.clip(n1c - n1_min, 0, table.shape[0] - 1)
            i2 = jnp.clip(n2c - n2_min, 0, table.shape[1] - 1)
            row = table[i1, i2]
            valid = (row >= 0) & (n1c - n1_min == i1) & (n2c - n2_min == i2)
            safe_row = jnp.maximum(row, 0)
            sx = site_xy[safe_row, 0]
            sy = site_xy[safe_row, 1]
            d2 = jnp.where(valid, (x - sx) ** 2 + (y - sy) ** 2, jnp.inf)
            take = d2 < best_d2
            best_d2 = jnp.where(take, d2, best_d2)
            best_idx = jnp.where(take, safe_row, best_idx)
    return best_idx, jnp.isfinite(best_d2)


@partial(jax.jit, static_argnames=("have_periphery", "plane_wave"))
def _geometry_planes(X, Y, ring_boundaries, gc_index_tab, period_tab,
                     napc_tab, rcen_tab, lens_max_r,
                     source_x, source_y, source_z, kvac,
                     pol_vector, H_coef, dipole_moment,
                     have_periphery, plane_wave):
    """Every point-classification / source-field plane of the stitch in ONE
    device program.

    The eager formulation held ~45 unfused intermediate planes live on the
    device at once (measured ~1.5 KB/point peak, `HBM_CEILING.json`); fusing
    the whole geometry stage lets XLA free the intermediates and return only
    the ~20 planes the order-accumulation scan actually consumes.  Shapes and
    the two structural branches (periphery tables present, plane-wave source)
    are static; every numeric input is traced, so one compiled program per
    (aperture shape, lens topology) serves all wavelengths and source
    positions of that signature.

    Returns (which_gc, in_center, uxp, uyp, xp, yp, grating_period,
    lateral_period, cosr, sinr, ux, uy, eikr_periph, H_xp_weight,
    H_yp_weight, dipole_field_Hx, dipole_field_Hy, local_power_z).
    ``eikr_periph`` is the periphery air-propagation phase (cpx pair; exact
    ones when it does not apply).  ``H_*p_weight`` are the periphery-frame
    simulation weights; the center block's lab-frame weights are
    ``dipole_field_Hy`` / ``dipole_field_Hx`` (reference nearfield.py:237-247).
    """
    lens_r = jnp.sqrt(X ** 2 + Y ** 2)
    lens_phi = jnp.arctan2(Y, X)

    if have_periphery:
        # ring classification (reference nearfield.py:125-128)
        n_rings = period_tab.shape[0]
        which_ring = jnp.searchsorted(ring_boundaries, lens_r) - 1
        in_center = which_ring == -1
        which_ring = jnp.where(which_ring == n_rings, -1, which_ring)
        safe_ring = jnp.maximum(which_ring, 0)
        which_gc = jnp.where(which_ring == -1, -1, gc_index_tab[safe_ring])
        grating_period = period_tab[safe_ring]
        angle_per_grating = 2 * pi / napc_tab[safe_ring]
        r_center = rcen_tab[safe_ring]
        lateral_period = r_center * angle_per_grating
        grating_rotation = (jnp.round(lens_phi / angle_per_grating)
                            * angle_per_grating)
    else:
        in_center = lens_r < lens_max_r
        which_gc = jnp.full(lens_r.shape, -1, dtype=jnp.int32)
        grating_period = jnp.ones_like(lens_r)
        lateral_period = jnp.ones_like(lens_r)
        r_center = jnp.zeros_like(lens_r)
        grating_rotation = jnp.zeros_like(lens_r)

    gratingcenter_x = r_center * jnp.cos(grating_rotation)
    gratingcenter_y = r_center * jnp.sin(grating_rotation)
    if plane_wave:
        ux = jnp.zeros_like(X)
        uy = jnp.zeros_like(X)
        uz = jnp.ones_like(X)
    else:
        dx = X - source_x
        dy = Y - source_y
        dz = 0.0 - source_z
        distance = jnp.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
        ux = dx / distance
        uy = dy / distance
        uz = dz / distance

    cosr, sinr = jnp.cos(grating_rotation), jnp.sin(grating_rotation)
    uxp = ux * cosr + uy * sinr
    uyp = -ux * sinr + uy * cosr
    xp = X * cosr + Y * sinr - r_center
    yp = -X * sinr + Y * cosr

    # source fields at the aperture (everything except the e^{ikr} phase,
    # reference nearfield.py:207-228); Lambertian uz^0.5 scaling
    if not plane_wave:
        s = H_coef * uz ** 0.5 / distance
        dipole_field_Hx = (uy * pol_vector[2] - uz * pol_vector[1]) * s
        dipole_field_Hy = (uz * pol_vector[0] - ux * pol_vector[2]) * s
        dipole_field_Hz = (ux * pol_vector[1] - uy * pol_vector[0]) * s
        dipole_field_Ex = (dipole_field_Hy * uz - dipole_field_Hz * uy) * nu.Z0
        dipole_field_Ey = (dipole_field_Hz * ux - dipole_field_Hx * uz) * nu.Z0
    else:
        one = jnp.ones_like(X)
        dipole_field_Ex = pol_vector[0] * dipole_moment * one
        dipole_field_Ey = pol_vector[1] * dipole_moment * one
        dipole_field_Hx = -pol_vector[1] * dipole_moment / nu.Z0 * one
        dipole_field_Hy = pol_vector[0] * dipole_moment / nu.Z0 * one

    dipole_field_Hxp = dipole_field_Hx * cosr + dipole_field_Hy * sinr
    dipole_field_Hyp = -dipole_field_Hx * sinr + dipole_field_Hy * cosr
    # weights of the unit-amplitude 'x'/'y' simulations reproducing the
    # incident H (reference nearfield.py:237-247)
    H_xp_weight = dipole_field_Hyp
    H_yp_weight = dipole_field_Hxp

    # air propagation phase to the grating center (reference
    # nearfield.py:333-347)
    if not plane_wave and have_periphery:
        air_dist = jnp.sqrt((gratingcenter_x - source_x) ** 2
                            + (gratingcenter_y - source_y) ** 2
                            + source_z ** 2)
        eikr_periph = cpx.expi(kvac * air_dist)
    else:
        eikr_periph = C(jnp.ones_like(X), jnp.zeros_like(X))

    local_power_z = (dipole_field_Ex * dipole_field_Hy
                     - dipole_field_Ey * dipole_field_Hx)

    return (which_gc, in_center, uxp, uyp, xp, yp, grating_period,
            lateral_period, cosr, sinr, ux, uy, eikr_periph,
            H_xp_weight, H_yp_weight, dipole_field_Hx, dipole_field_Hy,
            local_power_z)


@jax.jit
def _rotate_to_lab(Exp, Eyp, Hxp, Hyp, eikr, cosr, sinr):
    """Apply the periphery air phase and rotate the accumulated
    periphery-frame fields back to the lab frame in one program."""
    Exp, Eyp, Hxp, Hyp = Exp * eikr, Eyp * eikr, Hxp * eikr, Hyp * eikr
    return (Exp * cosr - Eyp * sinr, Exp * sinr + Eyp * cosr,
            Hxp * cosr - Hyp * sinr, Hxp * sinr + Hyp * cosr)


def _lens_max_radius(lens_periphery_summary, lens_center_summary, hexgridset):
    """Aperture half-width of a design: outer ring edge, or the center hex
    extent + one cell margin for a center-only lens."""
    if lens_periphery_summary is not None:
        return lens_periphery_summary["r_max_list"][-1]
    return (np.hypot(lens_center_summary[:, 0],
                     lens_center_summary[:, 1]).max() + hexgridset.sep)


def _default_aperture_pts(wavelength, lens_max_r):
    """Default uniform aperture grid: spacing < lambda/2 (Nyquist for the
    propagating spectrum) with an FFT-friendly point count."""
    num = good_fft_number(2 * lens_max_r / (wavelength / 2.2))
    return np.linspace(-lens_max_r, lens_max_r, num=num)


def build_nearfield(source_x, source_y, source_z, source_pol, wavelength,
                    lens_periphery_summary, lens_center_summary, hexgridset,
                    x_pts=None, y_pts=None,
                    dipole_moment=1e-30 * nu.C * nu.m, progress=False,
                    sharding=None):
    """Near-field of the whole lens on the aperture grid.

    Source: point dipole at (source_x, source_y, source_z<0) polarized along
    ``source_pol`` in ('x','y','z'), Lambertian-weighted (uz^0.5 field
    scaling); or a normally-incident plane wave if ``source_z == -inf`` with
    ``dipole_moment`` as the E-field magnitude (reference
    ``nearfield.py:66-83``).

    Returns (Ex, Ey, Hx, Hy, x_pts, y_pts, power_passing_through_lens,
    n_glass); fields are cpx.C real-pair arrays of shape (len(x_pts),
    len(y_pts)) -- convert with cpx.to_np for host numpy complex.  ``lens_periphery_summary`` may be None for a center-only
    lens.

    ``sharding``: optional `jax.sharding.Sharding` for (num_x, num_y)
    aperture arrays.  Every point-shaped tensor in the stitch derives
    elementwise from the (X, Y) meshgrid, so sharding X/Y at creation
    makes XLA's SPMD partitioner run the whole stitch -- including the
    jitted scan-over-orders kernels -- distributed over the mesh, with the
    amplitude tables replicated and zero steady-state collectives.  (This
    supersedes the round-1 per-device host loop; see
    :func:`metalens_tpu.parallel.nearfield.build_nearfield_sharded`.)
    """
    assert source_z < 0
    assert source_pol in ("x", "y", "z")
    wavelength_in_nm = int(round(wavelength / nm))

    have_periphery = lens_periphery_summary is not None
    if have_periphery:
        r_min_list = lens_periphery_summary["r_min_list"]
        r_max_list = lens_periphery_summary["r_max_list"]
        r_center_list = lens_periphery_summary["r_center_list"]
        gc_index_here = lens_periphery_summary["gratingcollection_index_here_list"]
        num_around_circle_list = lens_periphery_summary["num_around_circle_list"]
        grating_period_list = lens_periphery_summary["grating_period_list"]
        gratingcollection_list = lens_periphery_summary["gratingcollection_list"]
        lens_max_r = r_max_list[-1]
        n_glass = gratingcollection_list[0].grating_list[0].n_glass
    else:
        assert lens_center_summary is not None and len(lens_center_summary) > 0
        r_min_list = np.zeros((0,))
        lens_max_r = _lens_max_radius(None, lens_center_summary, hexgridset)
        n_glass = hexgridset.n_glass
        gratingcollection_list = []
    if n_glass == 0:
        n_glass = n_glass_table(wavelength_in_nm)

    if x_pts is None:
        x_pts = _default_aperture_pts(wavelength, lens_max_r)
    if y_pts is None:
        y_pts = _default_aperture_pts(wavelength, lens_max_r)
    num_x, num_y = len(x_pts), len(y_pts)
    for l in (x_pts, y_pts):
        diffs = np.diff(l)
        assert 0 < diffs[0] < wavelength / 2
        assert diffs.max() - diffs.min() <= 1e-9 * np.abs(diffs).max()

    k_glass = 2 * pi * n_glass / wavelength
    kvac = 2 * pi / wavelength

    X, Y = jnp.meshgrid(jnp.asarray(x_pts), jnp.asarray(y_pts), indexing="ij")
    if sharding is not None:
        X = jax.device_put(X, sharding)
        Y = jax.device_put(Y, sharding)

    plane_wave = source_z == -inf
    if plane_wave:
        assert source_pol != "z"
    pol_vector = {"x": [1, 0, 0], "y": [0, 1, 0], "z": [0, 0, 1]}[source_pol]
    H_coef = nu.c0 * (2 * pi / wavelength) ** 2 * dipole_moment / (4 * pi)
    if have_periphery:
        ring_boundaries = np.hstack((r_min_list, lens_max_r))
        gc_index_tab = np.asarray(gc_index_here, dtype=np.int32)
        period_tab = np.asarray(grating_period_list, dtype=float)
        napc_tab = np.asarray(num_around_circle_list, dtype=float)
        rcen_tab = np.asarray(r_center_list, dtype=float)
    else:
        ring_boundaries = np.zeros((1,))
        gc_index_tab = np.zeros((0,), dtype=np.int32)
        period_tab = np.ones((1,))
        napc_tab = np.ones((1,))
        rcen_tab = np.zeros((1,))
    (which_gc, in_center, uxp, uyp, xp, yp, grating_period, lateral_period,
     cosr, sinr, ux, uy, eikr_periph, H_xp_weight, H_yp_weight,
     dipole_field_Hx, dipole_field_Hy, local_power_z) = _geometry_planes(
        X, Y, ring_boundaries, gc_index_tab, period_tab, napc_tab, rcen_tab,
        lens_max_r, source_x, source_y,
        0.0 if plane_wave else source_z, kvac,
        np.asarray(pol_vector, dtype=float), H_coef, dipole_moment,
        have_periphery=have_periphery, plane_wave=plane_wave)

    Exp = cpx.zeros(X.shape, X.dtype)
    Eyp = cpx.zeros(X.shape, X.dtype)
    Hxp = cpx.zeros(X.shape, X.dtype)
    Hyp = cpx.zeros(X.shape, X.dtype)

    # ---- periphery accumulation: one scan-over-orders program per gc ----
    for gc_index, gc in enumerate(gratingcollection_list):
        all_orders = sorted({(e["ox"], e["oy"]) for g in gc.grating_list
                             for e in g.data})
        bounds = gc.interpolator_bounds
        gc_mask = which_gc == gc_index
        # one fused device program + one fetch for the occupancy count and
        # the bounds checks (the reference's explicit raises,
        # nearfield.py:294-305)
        stats = np.asarray(_region_stats(gc_mask, uxp, uyp, grating_period))
        if stats[0] == 0:
            continue
        for i, (name, lo, hi) in enumerate(
                (("ux", bounds[0], bounds[1]),
                 ("uy", bounds[2], bounds[3]),
                 ("grating_period", bounds[4], bounds[5]))):
            if stats[1 + i] < lo:
                raise ValueError(f"need to calculate at smaller {name}!",
                                 float(stats[1 + i]), lo)
            if stats[4 + i] > hi:
                raise ValueError(f"need to calculate at bigger {name}!",
                                 float(stats[4 + i]), hi)
        pts = jnp.stack([uxp.ravel(), uyp.ravel(),
                         grating_period.ravel()], axis=1)
        values_all, grids = _stack_order_tables(
            gc.interpolators, wavelength_in_nm, all_orders,
            ("ampfy", "ampfx"))
        orders_arr = jnp.asarray(np.asarray(all_orders, dtype=float),
                                 dtype=X.dtype)
        Exp, Eyp, Hxp, Hyp, counts = _accumulate_orders(
            values_all, orders_arr, grids[0], grids[1], grids[2], pts,
            gc_mask, uxp, uyp, 2 * pi / grating_period,
            2 * pi / lateral_period, xp, yp, kvac, k_glass, n_glass,
            H_xp_weight, H_yp_weight, Exp, Eyp, Hxp, Hyp)
        if progress:
            for (ox, oy), cnt in zip(all_orders, np.asarray(counts)):
                print(f"diffraction order ({ox},{oy}) of gc {gc_index}; "
                      f"applies at {int(cnt)} points", flush=True)

    # periphery air phase (from the geometry program) + rotation back to the
    # lab frame (reference nearfield.py:333-347), one fused program
    Ex, Ey, Hx, Hy = _rotate_to_lab(Exp, Eyp, Hxp, Hyp, eikr_periph,
                                    cosr, sinr)

    # ---- center accumulation ----
    # skip the whole block (site lookup + scan-over-orders dispatch) when
    # this aperture slab holds no center points, mirroring the periphery
    # loop's occupancy guard above
    run_center = lens_center_summary is not None and len(lens_center_summary) > 0
    if run_center:
        stats = np.asarray(_region_stats(in_center, ux, uy, ux))
        run_center = stats[0] > 0
    if run_center:
        site_xy_np = np.asarray(lens_center_summary)[:, 0:2]
        site_xy = jnp.asarray(site_xy_np)
        pitch = hexgridset.sep
        table, n1_min, n2_min = _hex_site_table(lens_center_summary, pitch)
        rows, found = _nearest_center_site(X, Y, table, n1_min, n2_min,
                                           pitch, site_xy)
        n_missing = int(jnp.sum(in_center & ~found))
        if n_missing:
            # a center point whose 4x4 analytic candidate window holds no
            # stored site (possible in the seam margin near lens_max_r):
            # brute-force the few offenders on host so they get the TRUE
            # nearest site, matching the reference's global cKDTree lookup
            # (reference nearfield.py:363-367) instead of a silent site-0
            # fallback with a bogus off-center phase.
            miss = np.argwhere(np.asarray(in_center & ~found))
            Xm = np.asarray(X)[miss[:, 0], miss[:, 1]]
            Ym = np.asarray(Y)[miss[:, 0], miss[:, 1]]
            d2 = ((Xm[:, None] - site_xy_np[None, :, 0]) ** 2
                  + (Ym[:, None] - site_xy_np[None, :, 1]) ** 2)
            rows_np = np.array(rows)  # np.asarray of a CPU jax array can be
            # a read-only zero-copy view; force a writable copy
            rows_np[miss[:, 0], miss[:, 1]] = np.argmin(d2, axis=1)
            rows = jnp.asarray(rows_np)
        cell_center_x = site_xy[rows, 0]
        cell_center_y = site_xy[rows, 1]
        which_grating = jnp.asarray(
            np.asarray(lens_center_summary)[:, 2])[rows]

        H_x_weight = dipole_field_Hy
        H_y_weight = dipole_field_Hx

        all_orders = sorted({(e["ox"], e["oy"])
                             for g in hexgridset.grating_list
                             for e in g.data})
        x_period = hexgridset.grating_list[0].grating_period
        y_period = hexgridset.grating_list[0].lateral_period
        b = hexgridset.interpolator_bounds
        for i, (name, lo, hi) in enumerate((("ux", b[0], b[1]),
                                            ("uy", b[2], b[3]))):
            if stats[1 + i] < lo:
                raise ValueError(f"need to calculate at smaller {name}!",
                                 float(stats[1 + i]), lo)
            if stats[4 + i] > hi:
                raise ValueError(f"need to calculate at bigger {name}!",
                                 float(stats[4 + i]), hi)
        pts = jnp.stack([ux.ravel(), uy.ravel(),
                         which_grating.astype(jnp.float64
                                              if X.dtype == jnp.float64
                                              else jnp.float32).ravel()],
                        axis=1)

        Exc = cpx.zeros(X.shape, X.dtype)
        Eyc = cpx.zeros(X.shape, X.dtype)
        Hxc = cpx.zeros(X.shape, X.dtype)
        Hyc = cpx.zeros(X.shape, X.dtype)
        values_all, grids = _stack_order_tables(
            hexgridset.interpolators, wavelength_in_nm, all_orders,
            ("ampfy", "ampfx"))
        orders_arr = jnp.asarray(np.asarray(all_orders, dtype=float),
                                 dtype=X.dtype)
        invp1 = jnp.asarray(2 * pi / x_period, dtype=X.dtype)
        invp2 = jnp.asarray(2 * pi / y_period, dtype=X.dtype)
        Exc, Eyc, Hxc, Hyc, counts = _accumulate_orders(
            values_all, orders_arr, grids[0], grids[1], grids[2], pts,
            in_center, ux, uy, invp1, invp2, X - cell_center_x,
            Y - cell_center_y, kvac, k_glass, n_glass,
            H_x_weight, H_y_weight, Exc, Eyc, Hxc, Hyc)
        if progress:
            for (ox, oy), cnt in zip(all_orders, np.asarray(counts)):
                print(f"diffraction order ({ox},{oy}) of center; applies "
                      f"at {int(cnt)} points", flush=True)
        if source_z > -inf:
            air_dist = jnp.sqrt((cell_center_x - source_x) ** 2
                                + (cell_center_y - source_y) ** 2
                                + source_z ** 2)
            eikr = cpx.expi(kvac * air_dist)
            Exc, Eyc, Hxc, Hyc = (Exc * eikr, Eyc * eikr, Hxc * eikr,
                                  Hyc * eikr)
        Ex = Ex + Exc
        Ey = Ey + Eyc
        Hx = Hx + Hxc
        Hy = Hy + Hyc
        in_lens = (which_gc != -1) | in_center
    else:
        in_lens = which_gc != -1

    power_passing_through_lens = float(
        jnp.where(in_lens, local_power_z, 0.0).sum()
        * (x_pts[1] - x_pts[0]) * (y_pts[1] - y_pts[0]))

    return Ex, Ey, Hx, Hy, x_pts, y_pts, power_passing_through_lens, n_glass


def build_nearfield_big(source_x, source_y, source_z, source_pol, wavelength,
                        lens_periphery_summary, lens_center_summary,
                        hexgridset, x_pts=None, y_pts=None,
                        dipole_moment=1e-30 * nu.C * nu.m,
                        pts_at_a_time=1e7, progress=True):
    """Slab-chunked wrapper of :func:`build_nearfield` (API parity with
    reference ``nearfield.py:482-516``).  On TPU the single-call version is
    preferred (HBM-resident); use the sharded runner in
    :mod:`metalens_tpu.parallel` for multi-chip apertures."""
    if x_pts is None or y_pts is None:
        lens_max_r = _lens_max_radius(lens_periphery_summary,
                                      lens_center_summary, hexgridset)
        if x_pts is None:
            x_pts = _default_aperture_pts(wavelength, lens_max_r)
        if y_pts is None:
            y_pts = _default_aperture_pts(wavelength, lens_max_r)
    x_pts, y_pts = np.asarray(x_pts), np.asarray(y_pts)
    # each slab needs >= 2 columns (build_nearfield derives the grid
    # spacing from consecutive points)
    y_pts_at_a_time = max(2, int(pts_at_a_time / x_pts.size))
    Ex = np.zeros((x_pts.size, y_pts.size), dtype=complex)
    Ey = np.zeros_like(Ex)
    Hx = np.zeros_like(Ex)
    Hy = np.zeros_like(Ex)
    power_passing_through_lens = 0.0
    start = 0
    n_glass = None
    while start < y_pts.size:
        end = min(start + y_pts_at_a_time, y_pts.size)
        if y_pts.size - end == 1:
            end = y_pts.size   # absorb a would-be single-column final slab
        if progress:
            print("running y-index", start, "to", end, "out of", y_pts.size,
                  flush=True)
        out = build_nearfield(source_x=source_x, source_y=source_y,
                              source_z=source_z, source_pol=source_pol,
                              wavelength=wavelength,
                              lens_periphery_summary=lens_periphery_summary,
                              lens_center_summary=lens_center_summary,
                              hexgridset=hexgridset, x_pts=x_pts,
                              y_pts=y_pts[start:end],
                              dipole_moment=dipole_moment)
        Ex[:, start:end] = cpx.to_np(out[0])
        Ey[:, start:end] = cpx.to_np(out[1])
        Hx[:, start:end] = cpx.to_np(out[2])
        Hy[:, start:end] = cpx.to_np(out[3])
        power_passing_through_lens += out[6]
        n_glass = out[7]
        start = end
    return (Ex, Ey, Hx, Hy, x_pts, y_pts, power_passing_through_lens,
            n_glass)
