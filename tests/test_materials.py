"""Material dispersion tables and the 0-sentinel resolution."""

import numpy as np
import pytest

from metalens_tpu import materials
from metalens_tpu.units import nm


def test_operational_tables_match_reference_values():
    # the 9 operational wavelengths (reference grating.lua:70-93)
    assert materials.n_tio2(580 * nm) == 2.372
    assert materials.n_glass(580 * nm) == 1.459
    assert materials.n_tio2(450) == 2.5
    assert materials.n_glass(650) == 1.457


def test_strict_lookup_raises_off_table():
    with pytest.raises(ValueError):
        materials.n_glass(583 * nm)
    with pytest.raises(ValueError):
        materials.n_tio2(300 * nm)


def test_interpolated_dispersion():
    # measured curve agrees with the operational table to rounding
    for wl in (450, 500, 580, 650):
        assert abs(materials.n_tio2(wl, strict=False)
                   - materials.n_tio2(wl)) < 2e-3
    # TiO2 absorbs in the UV: complex index below the band edge
    n_uv = materials.n_tio2(340, strict=False)
    assert np.iscomplexobj(n_uv) and n_uv.imag > 0
    # smooth in between tabulated points
    assert 2.37 < materials.n_tio2(578, strict=False) < 2.38


def test_resolve_indices_sentinel():
    ng, nt = materials.resolve_indices(0, 0, 580 * nm)
    assert (ng, nt) == (1.459, 2.372)
    ng, nt = materials.resolve_indices(1.5, 2.0, 999 * nm)
    assert (ng, nt) == (1.5, 2.0)
