"""Direct coverage for user-facing API that was previously exercised only
indirectly: collection efficiency reporting, batched FOM lists, pattern
stretching, and the collimator phase targets."""

import numpy as np

from metalens_tpu import Grating, GratingCollection, engine
from metalens_tpu.assembly import target_phase, target_phase_zeros
from metalens_tpu.geometry import stretch_pattern
from metalens_tpu.units import nm, um, degree


def _collection():
    gs = [Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                  target_wavelength=580 * nm, angle_in_air=a * degree,
                  xyrra_list_in_nm_deg=np.array([[0., 0., 110., 90., 0.]]))
          for a in (18, 20)]
    return GratingCollection(target_wavelength=580 * nm,
                             lateral_period=320 * nm,
                             lens_type="cyl", grating_list=gs)


def test_show_efficiencies_matches_individual_foms():
    gc = _collection()
    out = gc.show_efficiencies(numG=16, plot=False)
    assert len(out) == 2
    for (angle, eff), g in zip(out, gc.grating_list):
        assert angle == g.get_angle_in_air(580 * nm)
        assert abs(eff - g.fom(target_wavelength=580 * nm, numG=16)) < 1e-9
    # angles ascend with the sorted (by grating_period) member order
    # (round/cyl law: smaller period = larger angle -> descending angles)
    assert out[0][0] != out[1][0]


def test_fom_of_gratings_matches_loop():
    gc = _collection()
    foms = engine.fom_of_gratings(gc.grating_list,
                                  target_wavelength=580 * nm, numG=16)
    singles = [g.fom(target_wavelength=580 * nm, numG=16)
               for g in gc.grating_list]
    np.testing.assert_allclose(foms, singles, atol=1e-12)


def test_stretch_pattern():
    xyrra = np.array([[100., -50., 20., 30., 0.7]])
    out = stretch_pattern(xyrra, 2.0, 0.5)
    np.testing.assert_allclose(out, [[200., -25., 40., 15., 0.7]])
    # input untouched
    assert xyrra[0, 0] == 100.


def test_target_phase_zero_ring_consistency():
    """target_phase_zeros returns exactly the radii where the target phase
    has wrapped by an integer multiple of 2*pi."""
    d = 150 * um
    radius = 40 * um
    zeros = target_phase_zeros(radius, d)
    assert zeros[0] == 0.0
    assert zeros[-1] >= radius
    ph0 = target_phase(0.0, d)
    for r in zeros:
        # every ring boundary is phase-equivalent to the center (mod 2*pi)
        dphi = target_phase(r, d) - ph0
        assert abs((dphi + np.pi) % (2 * np.pi) - np.pi) < 1e-6
    # and midway inside a zone the phase is NOT equivalent
    mid = 0.5 * (zeros[1] + zeros[2])
    dphi = target_phase(mid, d) - ph0
    assert abs((dphi + np.pi) % (2 * np.pi) - np.pi) > 0.5
