"""Multi-device sharding tests on the 8-device virtual CPU mesh: sharded
FOM+grad batches match single-device results, and the distributed
transpose-based FFT matches jnp.fft.fft2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metalens_tpu.parallel import (make_mesh, sharded_fom_and_grad,
                                   sharded_characterize_amps, fft2_sharded,
                                   farfield_sharded,
                                   build_nearfield_sharded)
from metalens_tpu.solver import cpx, orders as ordmod, rcwa
from metalens_tpu.units import nm


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_fft2_sharded_matches_dense():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48))
    fn = fft2_sharded(mesh)
    got = cpx.to_np(fn(cpx.from_np(x)))
    ref = np.fft.fft2(x)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-8)


def test_farfield_sharded_matches_single_device():
    from metalens_tpu.farfield import farfield
    mesh = make_mesh()
    LAM = 580 * nm
    NG = 1.459
    n_pts, spacing = 64, LAM / 2.2
    xs = (np.arange(n_pts) - n_pts / 2) * spacing
    rng = np.random.default_rng(1)
    fields = [rng.normal(size=(n_pts, n_pts))
              + 1j * rng.normal(size=(n_pts, n_pts)) for _ in range(4)]
    P1, tot1, *_ = farfield(*fields, xs, xs, LAM, NG)
    P2, tot2, *_ = farfield_sharded(mesh, *fields, xp_list=xs, yp_list=xs,
                                    wavelength=LAM, n_glass=NG)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P1), rtol=1e-8,
                               atol=1e-6 * float(np.nanmax(np.abs(P1))))
    assert abs(tot1 - tot2) < 1e-8 * abs(tot1)


def _batch_inputs(B):
    LX, LY = 1200 * nm, 320 * nm
    rng = np.random.default_rng(7)
    base = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                     [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])
    xyrra = np.stack([base + rng.normal(scale=2 * nm, size=base.shape)
                      for _ in range(B)])
    Lx = np.full(B, LX)
    Ly = np.full(B, LY)
    return xyrra, Lx, Ly


def test_sharded_fom_grad_matches_single_device():
    mesh = make_mesh()
    B = 8
    LAM = 580 * nm
    NG, NT = 1.459, 2.372
    numG = 25
    xyrra, Lx, Ly = _batch_inputs(B)
    orders = ordmod.select_orders(float(Lx[0]), float(Ly[0]), numG)
    q2 = rcwa.q2_upper_bound(orders, float(Lx[0]), float(Ly[0]), LAM, NT ** 2)
    ns = rcwa.default_n_slabs(2 * np.pi * 550 * nm / LAM, q2)

    fn = sharded_fom_and_grad(mesh, orders, ns, target_idx=(
        ordmod.order_index(orders, -1, 0),), inphase=(True,))
    T = 1
    args = (jnp.asarray(xyrra), jnp.asarray(Lx), jnp.asarray(Ly), 550 * nm,
            cpx.from_np(np.asarray([NT ** 2 + 0j])),
            cpx.from_np(np.asarray([NG ** 2 + 0j])),
            jnp.asarray([LAM]), jnp.full((B, T), 0.5),
            jnp.asarray([NG]), jnp.full((B, T), np.sqrt(1 - 0.25)),
            jnp.asarray([1.0]))
    fom, grad = fn(*args)
    assert np.isfinite(float(fom))
    assert grad.shape == xyrra.shape

    # single-device reference via the engine's per-cell program
    from metalens_tpu.parallel.sweep import _fom_one_cell
    foms = []
    for b in range(B):
        foms.append(float(_fom_one_cell(
            orders, ns, 10,
            (ordmod.order_index(orders, -1, 0),), (True,),
            jnp.asarray(xyrra[b]), float(Lx[b]), float(Ly[b]), 550 * nm,
            cpx.from_np(np.asarray([NT ** 2 + 0j])),
            cpx.from_np(np.asarray([NG ** 2 + 0j])),
            jnp.asarray([LAM]), jnp.full((T,), 0.5), jnp.asarray([NG]),
            jnp.full((T,), np.sqrt(1 - 0.25)), jnp.asarray([1.0]))))
    assert abs(float(fom) - np.mean(foms)) < 1e-9

    # gradient sanity vs finite difference on one entry
    eps = 0.01 * nm
    args_p = list(args)
    xp = np.array(xyrra)
    xp[3, 0, 2] += eps
    args_p[0] = jnp.asarray(xp)
    fom_p, _ = fn(*args_p)
    xm = np.array(xyrra)
    xm[3, 0, 2] -= eps
    args_p[0] = jnp.asarray(xm)
    fom_m, _ = fn(*args_p)
    g_fd = (float(fom_p) - float(fom_m)) / (2 * eps)
    g_ad = float(grad[3, 0, 2])
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-12) < 1e-3


def test_sharded_characterize_matches_engine():
    mesh = make_mesh()
    B = 8
    LAM = 580 * nm
    NG, NT = 1.459, 2.372
    numG = 25
    xyrra, Lx, Ly = _batch_inputs(B)
    orders = ordmod.select_orders(float(Lx[0]), float(Ly[0]), numG)
    q2 = rcwa.q2_upper_bound(orders, float(Lx[0]), float(Ly[0]), LAM, NT ** 2)
    ns = rcwa.default_n_slabs(2 * np.pi * 550 * nm / LAM, q2)
    fn = sharded_characterize_amps(mesh, orders, ns)
    ux = np.linspace(0.3, 0.6, B)
    uy = np.zeros(B)
    eps_p = cpx.from_np(np.asarray(NT ** 2 + 0j))
    eps_g = cpx.from_np(np.asarray(NG ** 2 + 0j))
    ampf, ampr = fn(jnp.asarray(xyrra), jnp.asarray(Lx), jnp.asarray(Ly),
                    550 * nm, eps_p, eps_g, LAM,
                    jnp.asarray(ux), jnp.asarray(uy))
    assert ampf.shape == (B, 2, 2 * numG)

    # compare one element against the single-cell engine program (which
    # batches (wavelength, direction) jointly: give eps/lam a batch dim)
    from metalens_tpu.engine import (_characterize_program, _order_bounds,
                                     _traced_order_args)
    Dx, Dy = _order_bounds(orders)
    single = _characterize_program(len(orders), Dx, Dy, ns, 10, fff=True)
    omx, omy, i0 = _traced_order_args(orders)
    eps_p1 = cpx.from_np(np.asarray([NT ** 2 + 0j]))
    eps_g1 = cpx.from_np(np.asarray([NG ** 2 + 0j]))
    a1, r1 = single(jnp.asarray(xyrra[5]), omx, omy, i0, float(Lx[5]),
                    float(Ly[5]),
                    550 * nm, eps_p1, eps_g1, jnp.asarray([LAM]),
                    jnp.asarray([ux[5]]), jnp.asarray([uy[5]]))
    np.testing.assert_allclose(cpx.to_np(ampf[5]), cpx.to_np(a1[0]),
                               rtol=1e-9, atol=1e-12)


def test_sharded_nearfield_matches_single_device():
    from metalens_tpu.hexgrid import HexGridSet
    from metalens_tpu.assembly import make_design
    from metalens_tpu.nearfield import build_nearfield
    from metalens_tpu.units import um
    LAM = 580 * nm
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=3)
    hgs.characterize(wavelength=LAM, numG=20, just_normal=True)
    hgs.build_interpolators()
    _, lcs, _ = make_design([], source_distance=150 * um, radius=3 * um,
                            hgs=hgs)
    x = np.linspace(-3.2e-6, 3.2e-6, 48)
    kw = dict(source_x=0.0, source_y=0.0, source_z=-np.inf, source_pol="x",
              wavelength=LAM, lens_periphery_summary=None,
              lens_center_summary=lcs, hexgridset=hgs,
              dipole_moment=1.0)
    ref = build_nearfield(x_pts=x, y_pts=x, **kw)
    mesh = make_mesh()
    out = build_nearfield_sharded(mesh, x_pts=x, y_pts=x, **kw)
    np.testing.assert_allclose(out[0], cpx.to_np(ref[0]), atol=1e-12)
    np.testing.assert_allclose(out[3], cpx.to_np(ref[3]), atol=1e-12)
    assert abs(out[6] - ref[6]) <= 1e-9 * max(abs(ref[6]), 1e-300)


def test_sharded_member_optimize_matches_single_device():
    """The sharded fused-design path (members over the mesh) must produce
    the SAME optimization trajectory as the same member run on a 1-device
    mesh: sharding distributes work, never changes the math."""
    import math
    from metalens_tpu import Grating, validate
    from metalens_tpu.parallel import sharded_member_optimize
    from metalens_tpu.units import degree

    def seed_member():
        period = 580.0 / math.sin(50.0 * degree)
        rows = np.array([[-period / 4, 0.0, 70.0, 80.0, 0.0],
                         [period / 4, 0.0, 100.0, 95.0, 0.0]])
        g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                    target_wavelength=580 * nm, angle_in_air=50.0 * degree,
                    xyrra_list_in_nm_deg=rows)
        assert validate(g)
        return g

    kw = dict(target_wavelength=580 * nm, numG=9, attempts=2,
              max_rounds_per_dispatch=2, max_dispatches=1, verbose=False)
    members = [seed_member() for _ in range(3)]
    mesh8 = make_mesh()
    out8, foms8 = sharded_member_optimize(mesh8, members,
                                          seeds=[5, 6, 7], **kw)
    assert len(out8) == 3
    for g, f in zip(out8, foms8):
        assert validate(g)
        assert np.isfinite(f)
    # distinct seeds explore distinct draws
    assert not np.allclose(out8[0].xyrra_list, out8[1].xyrra_list)

    mesh1 = make_mesh(devices=jax.devices()[:1])
    out1, foms1 = sharded_member_optimize(mesh1, [seed_member()],
                                          seeds=[5], **kw)
    np.testing.assert_allclose(foms1[0], foms8[0], rtol=1e-12)
    np.testing.assert_allclose(out1[0].xyrra_list, out8[0].xyrra_list,
                               rtol=0, atol=1e-12)

    # determinism: same seeds, same mesh -> identical results
    out8b, foms8b = sharded_member_optimize(mesh8,
                                            [seed_member() for _ in range(3)],
                                            seeds=[5, 6, 7], **kw)
    np.testing.assert_allclose(foms8b, foms8, rtol=0, atol=0)
