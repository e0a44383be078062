"""Near-field stitcher tests: center-only lens under plane-wave
illumination, checked against the analytically expected transmitted field,
plus the full nearfield -> farfield energy chain."""

import numpy as np
import jax.numpy as jnp
import pytest

from metalens_tpu import units as nu
from metalens_tpu.solver import cpx
from metalens_tpu.hexgrid import HexGridSet
from metalens_tpu.assembly import make_design, hexagonal_grid, PITCH
from metalens_tpu.nearfield import build_nearfield, build_nearfield_big
from metalens_tpu.farfield import farfield
from metalens_tpu.units import nm, um

LAM = 580 * nm


@pytest.fixture(scope="module")
def center_lens():
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=6)
    hgs.characterize(wavelength=LAM, numG=30, just_normal=True)
    hgs.build_interpolators()
    out = make_design([], source_distance=150 * um, radius=4 * um, hgs=hgs,
                      make_xyrra_list=False)
    lens_periphery_summary, lens_center_summary, r_switch = out
    return hgs, lens_center_summary


def test_hex_site_lookup_matches_bruteforce(center_lens):
    from metalens_tpu.nearfield import _hex_site_table, _nearest_center_site
    hgs, summary = center_lens
    table, n1_min, n2_min = _hex_site_table(summary, PITCH)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3.5e-6, 3.5e-6, size=(900, 2))
    # the lookup is only consulted inside the lens-center mask (r < max site
    # radius + sep); outside it the 3x3 lattice neighborhood may have no
    # stored site and the result is masked off anyway
    r_valid = np.hypot(summary[:, 0], summary[:, 1]).max() + hgs.sep
    pts = pts[np.hypot(pts[:, 0], pts[:, 1]) < r_valid][:500]
    site_xy = jnp.asarray(summary[:, 0:2])
    rows, found = _nearest_center_site(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), table, n1_min,
        n2_min, PITCH, site_xy)
    rows, found = np.asarray(rows), np.asarray(found)
    assert found.all()
    d_all = ((pts[:, None, :] - summary[None, :, 0:2]) ** 2).sum(-1)
    rows_ref = d_all.argmin(axis=1)
    d_got = d_all[np.arange(len(pts)), rows]
    d_best = d_all[np.arange(len(pts)), rows_ref]
    # equal distance ties can pick either site; distances must match
    np.testing.assert_allclose(np.sqrt(d_got), np.sqrt(d_best), atol=1e-12)


def test_plane_wave_center_lens_field_and_energy(center_lens):
    hgs, summary = center_lens
    E0 = 1.0
    n_pts = 135  # 2^a 3^b 5^c; ~ 4um aperture at lambda/2.2 sampling
    r_ap = 4.3e-6
    x_pts = np.linspace(-r_ap, r_ap, n_pts)
    y_pts = np.linspace(-r_ap, r_ap, n_pts)
    Ex, Ey, Hx, Hy, x_pts, y_pts, P_lens, n_glass = build_nearfield(
        source_x=0.0, source_y=0.0, source_z=-np.inf, source_pol="x",
        wavelength=LAM, lens_periphery_summary=None,
        lens_center_summary=summary, hexgridset=hgs,
        x_pts=x_pts, y_pts=y_pts, dipole_moment=E0)
    Ex = cpx.to_np(Ex)
    X, Y = np.meshgrid(x_pts, y_pts, indexing="ij")
    r_max_sites = np.hypot(summary[:, 0], summary[:, 1]).max()

    # outside the lens: exactly zero
    outside = np.hypot(X, Y) > r_max_sites + 2 * hgs.sep
    assert np.abs(Ex[outside]).max() == 0.0

    # deep inside: the transmitted Ex should equal E0 * ampfx / n_glass for
    # the site's member (normal incidence, (0,0) order dominates; other
    # propagating orders of the hex lattice add small ripple)
    inside = np.hypot(X, Y) < 0.6 * r_max_sites
    # all sites in this small lens share one member index (tiny phase range)
    members = set(summary[:, 2].astype(int))
    amp_expected = np.mean([hgs.x_amp_list[m] for m in members])
    ratio = Ex[inside].mean() / (E0 * amp_expected / n_glass)
    assert abs(ratio - 1.0) < 0.15

    # incident power bookkeeping: P_lens = |E0|^2/Z0 * (#in-lens cells * dA)
    assert P_lens > 0

    # end-to-end: far-field transmission matches the cell's transmission
    P, total_P, ux, uy, dux, duy = farfield(Ex, Ey, Hx, Hy, x_pts, y_pts,
                                            LAM, n_glass)
    T_farfield = total_P / P_lens
    T_cell = abs(amp_expected) ** 2 / n_glass
    assert abs(T_farfield - T_cell) / T_cell < 0.12
    assert T_farfield < 1.0 + 1e-6


def test_nearest_center_site_reports_misses(center_lens):
    """A query point several lattice cells from every stored site must come
    back found=False (build_nearfield then repairs it with the true global
    nearest, matching the reference's cKDTree semantics), never a silent
    site-0 placeholder."""
    from metalens_tpu.nearfield import _hex_site_table, _nearest_center_site
    hgs, summary = center_lens
    # keep only sites in the x < 0 half-plane so +x queries are far from all
    sparse = summary[summary[:, 0] < -0.5e-6]
    table, n1_min, n2_min = _hex_site_table(sparse, PITCH)
    site_xy = jnp.asarray(sparse[:, 0:2])
    qx = jnp.asarray([2.0e-6, float(sparse[0, 0])])
    qy = jnp.asarray([2.0e-6, float(sparse[0, 1])])
    rows, found = _nearest_center_site(qx, qy, table, n1_min, n2_min,
                                       PITCH, site_xy)
    assert not bool(found[0])       # far point: no candidate in the window
    assert bool(found[1])           # on-site point: found
    assert int(rows[1]) == 0


def test_center_lens_seam_uses_true_nearest_site(center_lens):
    """Points whose analytic lookup window holds no stored site must be
    repaired to the TRUE nearest site.  Pin it by permutation invariance:
    reversing the summary's row order changes which site is index 0, so the
    old silent site-0 fallback gives different fields for the two orderings
    at unfound points, while the repaired lookup is order-independent."""
    from metalens_tpu.nearfield import _hex_site_table, _nearest_center_site
    hgs, summary = center_lens
    sparse = summary[summary[:, 0] < -0.5e-6]
    # aperture patch at +x: inside lens_max_r but far from every stored site
    x_pts = np.linspace(1.2e-6, 1.9e-6, 8)
    y_pts = np.linspace(-0.3e-6, 0.3e-6, 8)
    X, Y = np.meshgrid(x_pts, y_pts, indexing="ij")
    table, n1_min, n2_min = _hex_site_table(sparse, PITCH)
    _, found = _nearest_center_site(
        jnp.asarray(X), jnp.asarray(Y), table, n1_min, n2_min, PITCH,
        jnp.asarray(sparse[:, 0:2]))
    assert not np.asarray(found).any()  # the patch exercises the repair

    kw = dict(source_x=0.0, source_y=0.0, source_z=-np.inf, source_pol="x",
              wavelength=LAM, lens_periphery_summary=None, hexgridset=hgs,
              x_pts=x_pts, y_pts=y_pts, dipole_moment=1.0)
    Ex_a, *_ = build_nearfield(lens_center_summary=sparse, **kw)
    Ex_b, *_ = build_nearfield(lens_center_summary=sparse[::-1].copy(), **kw)
    np.testing.assert_allclose(cpx.to_np(Ex_a), cpx.to_np(Ex_b), atol=1e-15)
    assert np.isfinite(cpx.to_np(Ex_a)).all()


def test_design_center_follows_hexgridset_sep():
    """design_center must lay sites on the SET's lattice (hgs.sep), so the
    stitcher's analytic lattice inversion holds for sep != 320nm."""
    from metalens_tpu.assembly import design_center
    from metalens_tpu.nearfield import _hex_site_table
    sep = 400 * nm
    phases = np.exp(1j * np.linspace(0, 2 * np.pi, 6, endpoint=False))
    hgs = HexGridSet(sep=sep, cyl_height=550 * nm, num_entries=6,
                     x_amp_list=phases)
    summary = design_center(hgs, source_distance=150 * um, radius=2 * um)
    assert summary.shape[0] > 0
    # lattice inversion against hgs.sep must be exact (this raised before)
    _hex_site_table(summary, sep)
    # nearest-neighbor distance is sep, not the 320nm module default
    d = np.hypot(summary[:, None, 0] - summary[None, :, 0],
                 summary[:, None, 1] - summary[None, :, 1])
    d[d == 0] = np.inf
    assert abs(d.min() - sep) < 1e-9 * sep


def test_build_nearfield_big_matches_single_call(center_lens):
    hgs, summary = center_lens
    n_pts = 48
    x_pts = np.linspace(-2e-6, 2e-6, n_pts)
    y_pts = np.linspace(-2e-6, 2e-6, n_pts)
    # source far enough away that incidence stays inside the just_normal
    # interpolation bounds (|u| <= 0.001)
    kw = dict(source_x=0.0, source_y=0.0, source_z=-2500 * um,
              source_pol="y", wavelength=LAM, lens_periphery_summary=None,
              lens_center_summary=summary, hexgridset=hgs,
              x_pts=x_pts, y_pts=y_pts)
    out1 = build_nearfield(**kw)
    out2 = build_nearfield_big(pts_at_a_time=n_pts * 7, progress=False, **kw)
    np.testing.assert_allclose(cpx.to_np(out1[0]), out2[0], atol=1e-12)
    np.testing.assert_allclose(cpx.to_np(out1[3]), out2[3], atol=1e-12)
    assert abs(out1[6] - out2[6]) < 1e-9 * max(abs(out1[6]), 1e-300)


def test_build_nearfield_big_single_column_tail_and_defaults(center_lens):
    """50 % 7 == 1: the last slab would be a single y column, which
    build_nearfield cannot take (no grid spacing) -- it must be absorbed
    into the previous slab.  Also: x_pts/y_pts=None must auto-build the
    aperture grid like build_nearfield does."""
    hgs, summary = center_lens
    x_pts = np.linspace(-2e-6, 2e-6, 48)
    y_pts = np.linspace(-2e-6, 2e-6, 50)
    kw = dict(source_x=0.0, source_y=0.0, source_z=-2500 * um,
              source_pol="y", wavelength=LAM, lens_periphery_summary=None,
              lens_center_summary=summary, hexgridset=hgs)
    out1 = build_nearfield(x_pts=x_pts, y_pts=y_pts, **kw)
    out2 = build_nearfield_big(x_pts=x_pts, y_pts=y_pts,
                               pts_at_a_time=48 * 7, progress=False, **kw)
    np.testing.assert_allclose(cpx.to_np(out1[0]), out2[0], atol=1e-12)
    assert abs(out1[6] - out2[6]) < 1e-9 * max(abs(out1[6]), 1e-300)

    # plane wave: the auto grid spans the full aperture, where a nearby
    # point source would exceed the just_normal |u| <= 0.001 DB bounds
    kw.update(source_z=-np.inf)
    out3 = build_nearfield_big(x_pts=None, y_pts=None, progress=False, **kw)
    out4 = build_nearfield(x_pts=None, y_pts=None, **kw)
    np.testing.assert_allclose(out3[4], out4[4])       # same auto x grid
    np.testing.assert_allclose(out3[0], cpx.to_np(out4[0]), atol=1e-12)
