"""Engine-level tests: FOM semantics (term structure, normal-incidence
special case, s sign flip) and the characterize data schema."""

import numpy as np
import pytest

from metalens_tpu import Grating
from metalens_tpu.engine import fom_of_grating, characterize_grating
from metalens_tpu.solver.fom import FomTerm
from metalens_tpu.units import nm, degree


def make_grating():
    return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                   target_wavelength=580 * nm, angle_in_air=30 * degree,
                   xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.],
                                                  [500., 10., 80., 110., 5.]]))


def test_fom_passthrough_term_is_bounded_efficiency():
    """A target_order=0, non-inphase term scores |amp|^2/(n cos) which is the
    transmitted power fraction at normal incidence: in [0, 1]."""
    g = make_grating()
    f = g.fom(numG=30, terms=[FomTerm(580 * nm, 1.0, 0, False)])
    assert 0.0 < f < 1.0


def test_fom_inphase_le_power():
    """|Im a| Im a <= |a|^2, so the inphase score never exceeds the power
    score (same wavelength/order)."""
    g = make_grating()
    f_pow = g.fom(target_wavelength=580 * nm, numG=30,
                  terms=[FomTerm(580 * nm, 1.0, -1, False)])
    f_ip = g.fom(target_wavelength=580 * nm, numG=30,
                 terms=[FomTerm(580 * nm, 1.0, -1, True)])
    assert f_ip <= f_pow + 1e-12


def test_fom_weighted_mean():
    g = make_grating()
    t1 = FomTerm(580 * nm, 1.0, -1, False)
    t2 = FomTerm(450 * nm, 1.0, 0, False)
    f1 = g.fom(target_wavelength=580 * nm, numG=30, terms=[t1])
    f2 = g.fom(target_wavelength=580 * nm, numG=30, terms=[t2])
    f12 = g.fom(target_wavelength=580 * nm, numG=30,
                terms=[FomTerm(580 * nm, 0.25, -1, False),
                       FomTerm(450 * nm, 0.75, 0, False)])
    assert abs(f12 - (0.25 * f1 + 0.75 * f2)) < 1e-9


def test_fom_default_terms_need_target_wavelength():
    g = make_grating()
    f = g.fom(target_wavelength=580 * nm, numG=30)
    assert np.isfinite(f) and f != 0


def test_characterize_schema_and_masks():
    g = make_grating()
    data = characterize_grating(g, ux_min=0.3, ux_max=0.7, uy_min=-0.2,
                                uy_max=0.2, u_steps=3, wavelength=580 * nm,
                                numG=30)
    assert len(data) > 0
    keys = {"wavelength_in_nm", "x_or_y", "ux", "uy", "ox", "oy",
            "ampfy", "ampfx", "ampry", "amprx"}
    for e in data:
        assert set(e) == keys
        assert e["x_or_y"] in ("x", "y")
        # propagating-in-air mask (reference grating.lua:406-423)
        Kx = e["ux"] + e["ox"] * 580 / 1160.0
        Ky = e["uy"] + e["oy"] * 580 / 320.0
        assert Kx ** 2 + Ky ** 2 < 1.0 + 1e-9
    # each (point, order) appears for both polarizations
    xs = [e for e in data if e["x_or_y"] == "x"]
    ys = [e for e in data if e["x_or_y"] == "y"]
    assert len(xs) == len(ys)


def test_characterize_just_normal_quadrants():
    g = make_grating()
    g.characterize(just_normal=True, wavelength=580 * nm, numG=30)
    uxs = {e["ux"] for e in g.data}
    uys = {e["uy"] for e in g.data}
    assert uxs == {0.001, -0.001} and uys == {0.001, -0.001}
    # amplitudes copied unchanged across quadrants
    e0 = [e for e in g.data if e["ux"] == 0.001 and e["uy"] == 0.001
          and e["ox"] == 0 and e["oy"] == 0 and e["x_or_y"] == "x"][0]
    e1 = [e for e in g.data if e["ux"] == -0.001 and e["uy"] == -0.001
          and e["ox"] == 0 and e["oy"] == 0 and e["x_or_y"] == "x"][0]
    assert e0["ampfx"] == e1["ampfx"]


def test_characterize_energy_balance():
    """With include_tir=True (all glass-propagating orders kept, reference
    grating.lua:406-415), transmitted + reflected power reconstructed from
    the stored x/y amplitudes must equal the incident power; the default
    (TIR excluded) must give strictly less."""
    import jax.numpy as jnp
    from metalens_tpu.solver import basis
    g = make_grating()
    data = characterize_grating(g, ux_min=0.4, ux_max=0.4, uy_min=0.0,
                                uy_max=0.0, u_steps=1, wavelength=580 * nm,
                                numG=40, include_tir=True)
    data_noTIR = characterize_grating(g, ux_min=0.4, ux_max=0.4, uy_min=0.0,
                                      uy_max=0.0, u_steps=1,
                                      wavelength=580 * nm, numG=40)
    assert len(data_noTIR) < len(data)
    n_g = 1.459
    for pol in ("x", "y"):
        entries = [e for e in data if e["x_or_y"] == pol]
        P = 0.0
        for e in entries:
            Kx = np.array([e["ux"] + e["ox"] * 0.58 / 1.16])
            Ky = np.array([e["uy"] + e["oy"] * 0.58 / 0.32])
            Kz_g = basis.kz_norm(jnp.asarray(Kx), jnp.asarray(Ky), n_g ** 2)
            Kz_a = basis.kz_norm(jnp.asarray(Kx), jnp.asarray(Ky), 1.0)
            cf = jnp.array([e["ampfy"], e["ampfx"]])
            cr = jnp.array([e["ampry"], e["amprx"]])
            P += float(basis.order_powers(cf, jnp.asarray(Kx), jnp.asarray(Ky), Kz_g, n_g).sum())
            P += float(basis.backward_order_powers(cr, jnp.asarray(Kx), jnp.asarray(Ky), Kz_a, 1.0).sum())
        # incident power of unit x/y amplitude at (ux,uy)
        Kx0 = jnp.array([0.4]); Ky0 = jnp.array([0.0])
        Kz0 = basis.kz_norm(Kx0, Ky0, 1.0)
        c_inc = jnp.array([1.0 + 0j, 0j] if pol == "y" else [0j, 1.0 + 0j])
        Pin = float(basis.order_powers(c_inc, Kx0, Ky0, Kz0, 1.0).sum())
        assert abs(P / Pin - 1.0) < 1e-8


def test_one_program_serves_a_design_chain():
    """Members of a design chain differ in grating period (hence in their
    selected order set), but the traced-orders FOM program must be
    compiled ONCE and reused -- the remote-tunnel compile tax per
    continuation member was the dominant cost of production design runs."""
    from metalens_tpu import engine
    from metalens_tpu.solver.fom import FomTerm
    terms = [FomTerm(580 * nm, 1.0, -1, True)]
    engine._fom_program.cache_clear()
    angles = np.linspace(28.0, 34.0, 5)
    foms = []
    for ang in angles:
        g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                    target_wavelength=580 * nm,
                    angle_in_air=float(ang) * degree,
                    xyrra_list_in_nm_deg=np.array(
                        [[0., 0., 120., 90., 0.]]))
        foms.append(g.fom(target_wavelength=580 * nm, numG=30, terms=terms))
    info = engine._fom_program.cache_info()
    assert info.currsize == 1, info   # one program for the whole chain
    assert info.hits >= len(angles) - 1, info
    # sets genuinely differed (otherwise this test pins nothing)
    from metalens_tpu.solver import orders as ordmod
    keys = set()
    for ang in angles:
        g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                    target_wavelength=580 * nm,
                    angle_in_air=float(ang) * degree,
                    xyrra_list_in_nm_deg=np.array(
                        [[0., 0., 120., 90., 0.]]))
        o = ordmod.select_orders(g.grating_period, g.lateral_period, 30)
        keys.add(tuple(map(tuple, np.asarray(o).tolist())))
    assert len(keys) > 1
    assert all(np.isfinite(f) and 0 < f < 1 for f in foms)


def test_small_u_guard_tracks_evaluated_geometry():
    """The small_u (asymptotic-branch-compiled-out) decision must follow the
    radii actually evaluated, not the start geometry: an xyrra override or
    an optimizer step that grows a radius past the 30% headroom must
    re-route to the full-J1 program, so the FOM equals the one a grating
    built directly at that geometry gets."""
    from metalens_tpu.engine import (small_u_ok, static_solve_config,
                                     fom_batch_fn)
    terms = [FomTerm(580 * nm, 1.0, 0, False)]
    kw = dict(lateral_period=320 * nm, cyl_height=550 * nm,
              target_wavelength=580 * nm, angle_in_air=30 * degree)
    small = Grating(xyrra_list_in_nm_deg=np.array([[0., 0., 38., 38., 0.]]),
                    **kw)
    big_xyrra_nm = np.array([[0., 0., 145., 145., 0.]])
    big = Grating(xyrra_list_in_nm_deg=big_xyrra_nm, **kw)
    numG = 30
    orders, *_ = static_solve_config(small, [580 * nm], numG)
    assert small_u_ok(small, orders)          # fit-only program at start
    assert not small_u_ok(big, orders)        # big radii need the full J1

    f_direct = fom_of_grating(big, numG=numG, terms=terms)
    f_override = fom_of_grating(small, numG=numG, terms=terms,
                                xyrra=big.xyrra_list)
    assert abs(f_override - f_direct) < 1e-12 * max(1.0, abs(f_direct))

    fn = fom_batch_fn(small, numG=numG, terms=terms)
    f_batched = float(np.asarray(fn(big.xyrra_list[None]))[0])
    assert abs(f_batched - f_direct) < 1e-12 * max(1.0, abs(f_direct))
