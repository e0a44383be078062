"""Supercell representation invariance: a grating re-described on a
doubled lateral cell (two y-shifted copies of every pillar) is the same
physical structure.  On the MAPPED order set (my -> 2*my, identical
reciprocal vectors) the Laurent solve must agree to solver precision, and
the odd-my orders the bigger cell adds are exactly dark.  The NV-
factorized solve agrees within its raster discretization (the normal
field is projected on an R x R grid over the CELL, so the doubled cell
samples y at half the density -- a representation-dependent discretization
of the same factorization, not a physics difference; measured 5.4e-3 at
numG=20/R=64, shrinking with R).  This underwrites the bracket-3
supercell experiment (benchmarks/bracket3_supercell.py): optimizing the
640 nm twin explores a strictly larger design space from an equivalent
start."""

import sys
import os

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from bracket3_supercell import double_lateral  # noqa: E402
from metalens_tpu import Grating, validate  # noqa: E402
from metalens_tpu.solver import basis, cpx, orders as ordmod, rcwa  # noqa: E402
from metalens_tpu.units import nm, degree  # noqa: E402


def _member():
    period = 580.0 / np.sin(41.5 * degree)
    rows = np.array([[-period / 3, 12.0, 60.0, 70.0, 10.0],
                     [0.0, -25.0, 80.0, 75.0, -14.0],
                     [period / 3, 5.0, 90.0, 85.0, 3.0]])
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=41.5 * degree,
                xyrra_list_in_nm_deg=rows)
    assert validate(g)
    return g


def _amps(g, orders, ux, fff, lam=580 * nm, nt=2.372, ng=1.459):
    N = orders.shape[0]
    i0 = ordmod.order_index(orders, 0, 0)
    n_slabs, taylor = rcwa.slab_schedule(
        2 * np.pi * g.cyl_height / lam, orders, g.grating_period,
        g.lateral_period, lam, nt ** 2)
    S, _, _ = rcwa.cell_smatrix(
        jnp.asarray(orders), jnp.asarray(g.xyrra_list), g.grating_period,
        g.lateral_period, g.cyl_height, nt ** 2, ng ** 2, lam, ux, 0.0,
        n_slabs=n_slabs, taylor_terms=taylor, fff=fff)
    cy_s, cx_s = basis.incident_sp_amplitudes(ux, 0.0, "s")
    cy_p, cx_p = basis.incident_sp_amplitudes(ux, 0.0, "p")
    c = jnp.zeros((2 * N, 2))
    c = c.at[i0, 0].set(cy_s).at[i0 + N, 0].set(cx_s)
    c = c.at[i0, 1].set(cy_p).at[i0 + N, 1].set(cx_p)
    return cpx.to_np(S.s11 @ c)


UX = float(np.sin(41.5 * degree))


def test_doubled_cell_mapped_orders_match_exactly():
    """Laurent path: same reciprocal vectors -> identical operators ->
    amplitudes to solver precision."""
    g = _member()
    g2 = double_lateral(g)
    assert validate(g2)
    orders = ordmod.select_orders(g.grating_period, g.lateral_period, 20)
    orders2 = np.array(orders, copy=True)
    orders2[:, 1] *= 2
    a1 = _amps(g, orders, UX, fff=False)
    a2 = _amps(g2, orders2, UX, fff=False)
    np.testing.assert_allclose(a2, a1, rtol=0, atol=1e-9)


def test_doubled_cell_nv_matches_within_raster():
    """NV path: the normal-field raster is per-cell, so the twin is a
    different discretization of the same factorization -- close, not
    exact (see module docstring)."""
    g = _member()
    g2 = double_lateral(g)
    orders = ordmod.select_orders(g.grating_period, g.lateral_period, 20)
    orders2 = np.array(orders, copy=True)
    orders2[:, 1] *= 2
    a1 = _amps(g, orders, UX, fff=True)
    a2 = _amps(g2, orders2, UX, fff=True)
    np.testing.assert_allclose(a2, a1, rtol=0, atol=2e-2)
    assert np.abs(a2 - a1).max() > 1e-8   # and NOT exact: raster differs


def test_doubled_cell_odd_orders_are_dark():
    """The odd-my channels the supercell opens carry no power while the
    structure keeps its 320 nm symmetry."""
    g = _member()
    g2 = double_lateral(g)
    orders = ordmod.select_orders(g.grating_period, g.lateral_period, 12)
    mapped = np.array(orders, copy=True)
    mapped[:, 1] *= 2
    odd = np.array([[mx, my] for mx in (-1, 0, 1) for my in (-1, 1)])
    orders2 = np.concatenate([mapped, odd], axis=0)
    a2 = _amps(g2, orders2, UX, fff=False)
    N2 = orders2.shape[0]
    for k in range(len(mapped), N2):
        np.testing.assert_allclose(a2[k], 0.0, atol=1e-10)
        np.testing.assert_allclose(a2[k + N2], 0.0, atol=1e-10)


def test_doubled_cell_twin_geometry():
    g = _member()
    g2 = double_lateral(g)
    assert g2.xyrra_list.shape[0] == 2 * g.xyrra_list.shape[0]
    assert g2.grating_period == g.grating_period
    assert g2.lateral_period == 2 * g.lateral_period
    assert (g2.get_angle_in_air(580 * nm) ==
            g.get_angle_in_air(580 * nm))
