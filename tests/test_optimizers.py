"""Optimizer behavior tests: the coordinate-descent parity loop, random
perturbation, the gradient optimizer's constraint handling, and agreement
between the derivative-free and gradient paths on improvement direction."""

import numpy as np
import pytest

from metalens_tpu import Grating, validate
from metalens_tpu.optimize import (optimize, optimize2, optimize_gradient,
                                   constraint_penalty)
from metalens_tpu.solver.fom import FomTerm
from metalens_tpu.units import nm, degree

LAM = 580 * nm
TERMS = [FomTerm(LAM, 1.0, -1, True)]


def start_grating():
    return Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                   target_wavelength=LAM, angle_in_air=30 * degree,
                   xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))


def test_optimize_coordinate_descent_improves_and_respects_trust_region():
    import random
    random.seed(0)
    g = start_grating()
    f0 = g.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    similar = g.xyrra_list.copy()
    # tight trust region bounds the total work of the CD loop
    g_opt = optimize(g, target_wavelength=LAM, numG=20, terms=TERMS,
                     similar_to=similar, how_similar=0.02, verbose=False)
    f1 = g_opt.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    assert f1 >= f0
    assert validate(g_opt, similar_to=similar, how_similar=0.02)
    # input object untouched (reference contract: returns a copy)
    np.testing.assert_allclose(g.xyrra_list, similar)


def test_optimize2_improves():
    g = start_grating()
    f0 = g.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    rng = np.random.default_rng(3)
    g_opt = optimize2(g, target_wavelength=LAM, attempts=15, numG=20,
                      terms=TERMS, verbose=False, rng=rng)
    f1 = g_opt.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    assert f1 >= f0


def test_seeded_runs_reproduce():
    """rng-threading (round 4): the same seed must give bit-identical
    designs -- equal-FOM realizations were measured to differ 2x in raw
    off-design transmission, so the ledger runs are seeded now."""
    outs = []
    for _ in range(2):
        g = start_grating()
        rng = np.random.default_rng(7)
        g1 = optimize(g, target_wavelength=LAM, numG=20, terms=TERMS,
                      similar_to=g.xyrra_list.copy(), how_similar=0.02,
                      verbose=False, rng=rng)
        g2 = optimize2(g1, target_wavelength=LAM, attempts=8, numG=20,
                       terms=TERMS, verbose=False, rng=rng)
        outs.append(g2.xyrra_list.copy())
    np.testing.assert_array_equal(outs[0], outs[1])


def test_gradient_beats_random_at_equal_solve_budget():
    g = start_grating()
    rng = np.random.default_rng(1)
    g_r = optimize2(g, target_wavelength=LAM, attempts=20, numG=20,
                    terms=TERMS, verbose=False, rng=rng)
    f_r = g_r.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    g_g = optimize_gradient(g, target_wavelength=LAM, numG=20, terms=TERMS,
                            steps=20, verbose=False)
    f_g = g_g.fom(target_wavelength=LAM, numG=20, terms=TERMS)
    assert f_g > f_r


def test_constraint_penalty_zero_inside_positive_outside():
    import jax.numpy as jnp
    g = start_grating()
    Lx, Ly = g.grating_period, g.lateral_period
    pen = float(constraint_penalty(jnp.asarray(g.xyrra_list), Lx, Ly,
                                   50 * nm, 100 * nm))
    assert pen == 0.0
    # shrink a radius below the minimum
    bad = g.xyrra_list.copy()
    bad[0, 2] = 30 * nm
    pen = float(constraint_penalty(jnp.asarray(bad), Lx, Ly, 50 * nm,
                                   100 * nm))
    assert pen > 0
    # two overlapping pillars
    bad = np.array([[0., 0., 110 * nm, 90 * nm, 0.],
                    [150 * nm, 0., 110 * nm, 90 * nm, 0.]])
    pen = float(constraint_penalty(jnp.asarray(bad), Lx, Ly, 50 * nm,
                                   100 * nm))
    assert pen > 0
    # trust region violation
    sim = g.xyrra_list.copy()
    moved = sim.copy()
    moved[0, 0] += 0.1 * Lx
    pen = float(constraint_penalty(jnp.asarray(moved), Lx, Ly, 50 * nm,
                                   100 * nm, similar_to=sim,
                                   how_similar=0.03))
    assert pen > 0
