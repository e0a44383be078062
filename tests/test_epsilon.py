"""Analytic Fourier coefficients of pillar patterns vs a brute-force FFT of a
rasterized eps(x, y): validates the J1 ellipse transform, rotations, offsets,
and the Toeplitz assembly."""

import numpy as np
import jax.numpy as jnp

from metalens_tpu.solver import cpx, orders as ordmod
from metalens_tpu.solver.epsilon import (ellipse_layer_toeplitz,
                                         rect_layer_toeplitz)
from metalens_tpu.solver.special import j1 as j1_jax
from metalens_tpu.units import nm


def rasterized_eps_hat(Lx, Ly, eps_fn, mx, my, n=2048):
    xs = (np.arange(n) + 0.5) / n * Lx - Lx / 2
    ys = (np.arange(n) + 0.5) / n * Ly - Ly / 2
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    eps = eps_fn(X, Y)
    phase = np.exp(-1j * 2 * np.pi * (mx * X / Lx + my * Y / Ly))
    return (eps * phase).mean()


def test_j1_against_scipy_grid():
    # compare against high-accuracy series/known values without scipy:
    # numpy doesn't ship J1, so use the integral definition on a few points
    xs = np.array([0.1, 0.5, 1.0, 2.0, 5.0, 7.9, 8.1, 12.0, 30.0])
    theta = np.linspace(0, np.pi, 20001)
    for x in xs:
        ref = np.trapezoid(np.cos(theta - x * np.sin(theta)), theta) / np.pi
        got = float(j1_jax(x))
        assert abs(got - ref) < 2e-7, (x, got, ref)


def test_ellipse_fourier_vs_fft():
    Lx, Ly = 1200 * nm, 400 * nm
    xyrra = np.array([[-200 * nm, 50 * nm, 150 * nm, 90 * nm, 0.4],
                      [300 * nm, -60 * nm, 80 * nm, 120 * nm, -0.9]])
    eps_p = 5.6

    def eps_fn(X, Y):
        eps = np.ones_like(X)
        for x0, y0, rx, ry, a in xyrra:
            # account for periodic wrap of pillars near boundaries
            for sx in (-1, 0, 1):
                for sy in (-1, 0, 1):
                    dx, dy = X - x0 + sx * Lx, Y - y0 + sy * Ly
                    u = (dx * np.cos(a) + dy * np.sin(a)) / rx
                    v = (-dx * np.sin(a) + dy * np.cos(a)) / ry
                    eps = np.where(u ** 2 + v ** 2 <= 1, eps_p, eps)
        return eps

    orders = ordmod.select_orders(Lx, Ly, 15)
    E = cpx.to_np(ellipse_layer_toeplitz(orders, Lx, Ly,
                                         jnp.asarray(xyrra), eps_p))
    for i in range(0, 15, 4):
        for j in range(0, 15, 5):
            dm = orders[i] - orders[j]
            ref = rasterized_eps_hat(Lx, Ly, eps_fn, dm[0], dm[1])
            assert abs(E[i, j] - ref) < 3e-3 * eps_p, (i, j, E[i, j], ref)


def test_rect_fourier_vs_fft():
    Lx, Ly = 1000 * nm, 500 * nm
    eps_f = 4.0
    center = (100 * nm, -50 * nm)
    widths = (400 * nm, 200 * nm)

    def eps_fn(X, Y):
        inx = np.abs(X - center[0]) <= widths[0] / 2
        iny = np.abs(Y - center[1]) <= widths[1] / 2
        return np.where(inx & iny, eps_f, 1.0)

    orders = ordmod.select_orders(Lx, Ly, 9)
    E = cpx.to_np(rect_layer_toeplitz(orders, Lx, Ly, center, widths, eps_f))
    for i in range(9):
        dm = orders[i] - orders[0]
        ref = rasterized_eps_hat(Lx, Ly, eps_fn, dm[0], dm[1])
        assert abs(E[i, 0] - ref) < 5e-3, (i, E[i, 0], ref)


def test_toeplitz_is_hermitian_for_real_eps():
    Lx, Ly = 1200 * nm, 320 * nm
    xyrra = jnp.asarray(np.array([[10 * nm, 5 * nm, 100 * nm, 80 * nm, 0.3]]))
    orders = ordmod.select_orders(Lx, Ly, 25)
    E = cpx.to_np(ellipse_layer_toeplitz(orders, Lx, Ly, xyrra, 5.6))
    np.testing.assert_allclose(E, E.conj().T, atol=1e-12)


def test_traced_structure_matches_static():
    """The traced-orders structure factor and NV projector (dense
    difference superset + traced gather) must reproduce the static
    distinct-difference path exactly."""
    import jax.numpy as jnp
    from metalens_tpu.solver import orders as ordmod
    from metalens_tpu.solver.epsilon import (
        ellipse_structure_toeplitz, ellipse_structure_toeplitz_traced)
    from metalens_tpu.solver.fff import (
        normal_projector_toeplitz, normal_projector_toeplitz_traced)
    from metalens_tpu.engine import _order_bounds
    from metalens_tpu.units import nm

    LX, LY = 1150 * nm, 320 * nm
    xyrra = np.array([[-210 * nm, 5 * nm, 140 * nm, 105 * nm, 0.07],
                      [190 * nm, -12 * nm, 95 * nm, 125 * nm, -0.1]])
    orders = ordmod.select_orders(LX, LY, 33)
    Dx, Dy = _order_bounds(orders)
    o = np.asarray(orders)
    mx = jnp.asarray(o[:, 0], jnp.int32)
    my = jnp.asarray(o[:, 1], jnp.int32)

    S0, z0 = ellipse_structure_toeplitz(orders, LX, LY, xyrra)
    S1, z1 = ellipse_structure_toeplitz_traced(mx, my, Dx, Dy, LX, LY,
                                               jnp.asarray(xyrra))
    np.testing.assert_allclose(cpx.to_np(S1), cpx.to_np(S0), atol=1e-14)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=0)

    P0 = normal_projector_toeplitz(orders, LX, LY, xyrra)
    P1 = normal_projector_toeplitz_traced(mx, my, Dx, Dy, LX, LY,
                                          jnp.asarray(xyrra))
    for a, b in zip(P1, P0):
        np.testing.assert_allclose(cpx.to_np(a), cpx.to_np(b), atol=1e-14)


def test_traced_gather_idx_rejects_undersized_bounds():
    """Concrete order vectors exceeding the dense-grid bounds must raise
    (JAX gathers clamp silently, which would be wrong physics)."""
    import pytest
    from metalens_tpu.solver.epsilon import traced_gather_idx
    mx = np.array([0, 3, -3])
    my = np.array([0, 1, -1])
    traced_gather_idx(mx, my, 6, 2)          # fits: fine
    with pytest.raises(ValueError):
        traced_gather_idx(mx, my, 5, 2)      # |dmx| reaches 6 > 5
    with pytest.raises(ValueError):
        traced_gather_idx(mx, my, 6, 1)      # |dmy| reaches 2 > 1
