"""Fused on-device optimizer tests: the validate() twin agrees with the
host check, the fused coordinate descent matches the host loop's quality
from the same start, runs reproduce per seed, and the multi-dispatch
continuation (max_rounds_per_dispatch) is seamless."""

import numpy as np
import pytest

from metalens_tpu import Grating, validate
from metalens_tpu.grating import min_diameter, min_distance
from metalens_tpu.optimize_fused import (optimize_fused, optimize2_fused,
                                         feasible_traced)
from metalens_tpu.solver.fom import FomTerm
from metalens_tpu.units import nm, degree

LAM = 580 * nm
TERMS = [FomTerm(LAM, 1.0, -1, True)]


def start_grating():
    return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                   target_wavelength=LAM, angle_in_air=30 * degree,
                   xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))


def two_pillar_grating():
    return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                   target_wavelength=LAM, angle_in_air=30 * degree,
                   xyrra_list_in_nm_deg=np.array(
                       [[-300., 0., 110., 90., 0.],
                        [250., 40., 80., 70., 10.]]))


def test_feasible_traced_agrees_with_host_validate():
    """The on-device gate (margin=0) must agree with grating.validate on
    random perturbations spanning feasible and infeasible geometries."""
    rng = np.random.default_rng(0)
    g = two_pillar_grating()
    sim = g.xyrra_list.copy()
    Lx, Ly = g.grating_period, g.lateral_period
    agree = 0
    n = 200
    for _ in range(n):
        x = sim + rng.normal(0.0, 12 * nm, sim.shape)
        x[:, 4] = sim[:, 4] + rng.normal(0.0, 2 * degree, sim.shape[0])
        gg = g.copy()
        gg.xyrra_list = x
        host = validate(gg, similar_to=sim, how_similar=0.05)
        dev = bool(feasible_traced(x, Lx, Ly, min_diameter / 2,
                                   min_distance, sim=sim, how_similar=0.05))
        agree += host == dev
    assert agree == n


def test_fused_cd_matches_host_quality_and_revalidates():
    g = start_grating()
    sim = g.xyrra_list.copy()
    f0 = g.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    g_f = optimize_fused(g, target_wavelength=LAM, numG=20, terms=TERMS,
                         similar_to=sim, how_similar=0.02, verbose=False,
                         seed=0)
    f1 = g_f.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    assert f1 >= f0
    assert validate(g_f, similar_to=sim, how_similar=0.02)
    np.testing.assert_allclose(g.xyrra_list, sim)   # input untouched


def test_fused_cd_reproduces_and_continuation_is_seamless():
    """max_rounds_per_dispatch=2 forces the host re-dispatch path; the
    result must be identical to the single-dispatch run (the loop state
    round-trips exactly)."""
    g = start_grating()
    sim = g.xyrra_list.copy()
    kw = dict(target_wavelength=LAM, numG=20, terms=TERMS, similar_to=sim,
              how_similar=0.02, verbose=False, seed=3)
    g_a = optimize_fused(g, max_rounds_per_dispatch=64, **kw)
    g_b = optimize_fused(g, max_rounds_per_dispatch=2, **kw)
    np.testing.assert_array_equal(g_a.xyrra_list, g_b.xyrra_list)


def test_vary_angle_use_fused_reproduces():
    """use_fused=True routes the continuation through the device loops;
    seeded runs must be bit-identical, and use_gradient is exclusive."""
    import math
    from metalens_tpu.optimize import vary_angle
    g = start_grating()
    end = math.atan(1.05 * math.tan(33 * degree))
    outs = []
    for _ in range(2):
        rng = np.random.default_rng(5)
        gc = vary_angle(start_grating=g, end_angle=end, lens_type="round",
                        target_wavelength=LAM, numG=20, terms=TERMS,
                        use_fused=True, optimize2_attempts=5, verbose=False,
                        change_each_step=1.05, similarity_each_step=0.15,
                        rng=rng)
        outs.append(np.stack([m.xyrra_list for m in gc.grating_list]))
    np.testing.assert_array_equal(outs[0], outs[1])
    with pytest.raises(ValueError):
        vary_angle(start_grating=g, end_angle=end, lens_type="round",
                   target_wavelength=LAM, numG=20, terms=TERMS,
                   use_fused=True, use_gradient=True, verbose=False)


def test_optimize2_fused_improves():
    g = start_grating()
    f0 = g.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    g_r = optimize2_fused(g, target_wavelength=LAM, attempts=15, numG=20,
                          terms=TERMS, verbose=False, seed=1)
    f1 = g_r.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    assert f1 >= f0


def test_optimize_multistart_returns_best_of_k():
    """best-of-k must return the max restart score, its grating must
    re-score to exactly that value, and the k=member chains must equal
    the individually-seeded chains (the restarts ARE the single calls)."""
    from metalens_tpu.optimize_fused import optimize_multistart
    g = start_grating()
    best, foms = optimize_multistart(g, k=3, target_wavelength=LAM,
                                     numG=20, terms=TERMS, attempts=5,
                                     seed=7, verbose=False)
    assert len(foms) == 3
    assert np.isclose(
        float(np.real(best.fom(target_wavelength=LAM, numG=20,
                               terms=TERMS))), max(foms))
    # restart i is exactly the seeded single-call chain
    g1 = optimize_fused(g, target_wavelength=LAM, numG=20, terms=TERMS,
                        seed=7 + 2, verbose=False)
    g1 = optimize2_fused(g1, target_wavelength=LAM, numG=20, terms=TERMS,
                         attempts=5, seed=7 + 3, verbose=False)
    assert np.isclose(
        foms[1],
        float(np.real(g1.fom(target_wavelength=LAM, numG=20, terms=TERMS))))
    # determinism: same seed, same answer
    best2, foms2 = optimize_multistart(g, k=3, target_wavelength=LAM,
                                       numG=20, terms=TERMS, attempts=5,
                                       seed=7, verbose=False)
    np.testing.assert_array_equal(best.xyrra_list, best2.xyrra_list)
    assert foms == foms2
    assert validate(best)


def test_min_gap_headroom_is_enforced():
    """An inflated min_gap must hold for every accepted result (the
    continuation-headroom contract), and a floor the start itself
    violates leaves the geometry unchanged rather than crashing."""
    from metalens_tpu.grating import min_distance
    g = two_pillar_grating()
    mg = min_distance * 1.5
    g_r = optimize2_fused(g, target_wavelength=LAM, attempts=10, numG=20,
                          terms=TERMS, verbose=False, seed=5, min_gap=mg)
    assert bool(feasible_traced(g_r.xyrra_list, g_r.grating_period,
                                g_r.lateral_period, min_diameter / 2, mg))
    assert validate(g_r)
    # a floor the start violates: no move can be accepted
    huge = g.lateral_period   # 320nm clearance is impossible here
    g_u = optimize_fused(g, target_wavelength=LAM, numG=20, terms=TERMS,
                         verbose=False, seed=5, min_gap=huge)
    g0 = g.copy()
    g0.standardize()
    np.testing.assert_allclose(g_u.xyrra_list, g0.xyrra_list)


def test_optimize_multistart_accept_gate():
    """accept filters best-selection without touching the score list; an
    all-rejecting gate raises."""
    from metalens_tpu.optimize_fused import optimize_multistart
    g = start_grating()
    kw = dict(k=2, target_wavelength=LAM, numG=20, terms=TERMS,
              attempts=5, seed=7, verbose=False)
    best_all, foms = optimize_multistart(g, **kw)
    f_best = float(np.real(best_all.fom(target_wavelength=LAM, numG=20,
                                        terms=TERMS)))
    if not np.isclose(foms[0], foms[1]):
        # reject exactly the unrestricted winner -> the other restart wins
        best_other, foms2 = optimize_multistart(
            g, accept=lambda gg: abs(float(np.real(
                gg.fom(target_wavelength=LAM, numG=20, terms=TERMS)))
                - f_best) > 1e-12, **kw)
        assert foms2 == foms
        f_other = float(np.real(
            best_other.fom(target_wavelength=LAM, numG=20, terms=TERMS)))
        assert np.isclose(f_other, min(foms))
    with pytest.raises(ValueError):
        optimize_multistart(g, accept=lambda gg: False, **kw)


def test_package_level_lazy_export():
    # the lazy hook pins the FUNCTIONS over the submodule attribute, so
    # `from metalens_tpu import optimize_fused` binds the callable even
    # though the name collides with the submodule (the hook's import
    # installs the module attr; without the pin, a from-import's second
    # lookup would see the module)
    import metalens_tpu
    assert metalens_tpu.optimize2_fused is optimize2_fused
    assert callable(metalens_tpu.optimize_fused)
    assert metalens_tpu.optimize_fused is optimize_fused
    from metalens_tpu.optimize_fused import optimize_multistart
    assert metalens_tpu.optimize_multistart is optimize_multistart


def test_seed_and_continuation_share_one_program():
    # a trust-region (similar_to) member must reuse the unconstrained seed
    # member's compiled program: sim is an array input with how_similar=inf
    # when unconstrained, not a separate signature (cold NS2 design runs
    # pay one remote compile per (nE, config), not two)
    from metalens_tpu.optimize_fused import _rp_program
    _rp_program.cache_clear()
    g = two_pillar_grating()
    kw = dict(target_wavelength=LAM, numG=20, terms=TERMS, verbose=False)
    g1 = optimize2_fused(g, attempts=3, seed=1, **kw)
    optimize2_fused(g1, attempts=3, seed=2, similar_to=g1.xyrra_list,
                    how_similar=0.05, **kw)
    info = _rp_program.cache_info()
    assert info.misses == 1 and info.hits == 1


def test_static_envelope_covers_ladder_and_is_physics_exact():
    """The continuation envelope must cover every ladder member's exact
    static config, and an OVERSIZED program must compute the same physics
    (superset dense grid; more slabs/terms only tighten the slab
    exponential) -- the guarantees behind sharing one compiled program per
    bracket (the round-5 cold NS2 design paid 16 drift-induced ~10-min
    remote compiles without this)."""
    import math
    import jax.numpy as jnp
    from metalens_tpu.engine import (_fom_inputs, _fom_program,
                                     _order_bounds, _traced_order_args,
                                     static_solve_config)
    from metalens_tpu.optimize import (continuation_static_envelope,
                                       _continuation_ladder,
                                       _init_collection)

    g = start_grating()
    end = math.atan(1.5 * math.tan(33 * degree))
    env = continuation_static_envelope(g, end, "round", LAM, numG=20,
                                       terms=TERMS, change_each_step=1.05)
    pairs = _continuation_ladder(_init_collection(g, "round", LAM),
                                 end, 1.05)
    assert len(pairs) >= 5
    for gp, lp in pairs:
        probe = Grating(lateral_period=lp, grating_period=gp,
                        cyl_height=g.cyl_height,
                        xyrra_list_in_nm_deg=g.xyrra_list_in_nm_deg)
        orders, ns, tt, _ = static_solve_config(probe, [LAM], 20)
        dx, dy = _order_bounds(orders)
        assert env[0] >= dx and env[1] >= dy
        assert env[2] >= ns and env[3] >= tt

    rd = np.float64
    orders, ns, tt, herm, tgt, inph, arrays = _fom_inputs(g, LAM, 20,
                                                          TERMS, rd)
    Dx, Dy = _order_bounds(orders)
    omx, omy, i0 = _traced_order_args(orders)
    args = (jnp.asarray(g.xyrra_list, rd), omx, omy, i0,
            jnp.asarray(tgt, jnp.int32), g.grating_period,
            g.lateral_period, g.cyl_height) + arrays
    f_exact = float(_fom_program(len(orders), Dx, Dy, ns, tt, inph,
                                 False, False, True, herm)(*args))
    f_fat = float(_fom_program(len(orders), Dx + 16, Dy + 8, 2 * ns,
                               tt + 8, inph, False, False, True,
                               herm)(*args))
    np.testing.assert_allclose(f_fat, f_exact, rtol=1e-9, atol=1e-12)


def test_fused_continuation_shares_one_program_per_bracket():
    """vary_angle(use_fused=True) auto-computes the static envelope: the
    whole continuation (and a seed sharing the envelope) compiles exactly
    ONE cd and ONE rp program."""
    import math
    from metalens_tpu.optimize import vary_angle
    from metalens_tpu.optimize_fused import _cd_program, _rp_program
    _cd_program.cache_clear()
    _rp_program.cache_clear()
    g = start_grating()
    end = math.atan(1.2 * math.tan(33 * degree))
    rng = np.random.default_rng(5)
    gc = vary_angle(start_grating=g, end_angle=end, lens_type="round",
                    target_wavelength=LAM, numG=20, terms=TERMS,
                    use_fused=True, optimize2_attempts=3, verbose=False,
                    change_each_step=1.05, similarity_each_step=0.15,
                    rng=rng)
    assert len(gc.grating_list) >= 3
    assert _cd_program.cache_info().misses == 1
    assert _rp_program.cache_info().misses == 1

    # an envelope that does NOT cover the member is rejected loudly
    from metalens_tpu.optimize_fused import optimize_fused
    with pytest.raises(ValueError):
        optimize_fused(g, target_wavelength=LAM, numG=20, terms=TERMS,
                       verbose=False, static_override=(16, 4, 1, 4))
