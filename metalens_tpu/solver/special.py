"""Special functions needed by the solver, implemented in pure jnp so they
run (and differentiate) on TPU.

Only ``j1`` is needed: the analytic Fourier transform of an ellipse is
``2*pi*rx*ry*J1(u)/u`` (see :mod:`metalens_tpu.solver.epsilon`).  The
rational/asymptotic approximations below are the classic Abramowitz & Stegun
9.4.4-9.4.6 fits (|abs error| < ~1e-8 below 8, < ~1e-7 above), which is far
below the geometric tolerances of the design problem.
"""

from __future__ import annotations

import jax.numpy as jnp

_P1 = (72362614232.0, -7895059235.0, 242396853.1, -2972611.439,
       15704.48260, -30.16036606)
_Q1 = (144725228442.0, 2300535178.0, 18583304.74, 99447.43394,
       376.9991397, 1.0)
_PA = (1.0, 0.183105e-2, -0.3516396496e-4, 0.2457520174e-5, -0.240337019e-6)
_QA = (0.04687499995, -0.2002690873e-3, 0.8449199096e-5,
       -0.88228987e-6, 0.105787412e-6)


def _poly(coeffs, x):
    acc = jnp.zeros_like(x) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * x + c
    return acc


def j1(x):
    """Bessel function of the first kind, order 1, for real input."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)

    # |x| < 8: rational approximation
    y = x * x
    small = x * _poly(_P1, y) / _poly(_Q1, y)

    # |x| >= 8: asymptotic form
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y2 = z * z
    xx = ax - 2.356194491  # 3*pi/4
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30)) * (
        jnp.cos(xx) * _poly(_PA, y2) - z * jnp.sin(xx) * _poly(_QA, y2)
    ) * jnp.sign(x)

    return jnp.where(ax < 8.0, small, big)


def j1_over_x(x):
    """J1(x)/x, with the correct limit 1/2 at x = 0 (and a quadratically
    correct Taylor branch near 0 so gradients are clean)."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    safe = jnp.where(ax < 1e-6, 1.0, x)
    taylor = 0.5 - x * x / 16.0
    return jnp.where(ax < 1e-6, taylor, j1(safe) / safe)


def j1_small(x):
    """J1 for |x| < 8 only (the rational fit, no asymptotic branch).  Half
    the op count of :func:`j1`; callers must guarantee the range (pillar
    geometry usually does: u = |G'| * r stays well under 8 for visible-light
    cells)."""
    y = x * x
    return x * _poly(_P1, y) / _poly(_Q1, y)


def j1_over_x_from_sq(x2, small_arg_only: bool = False):
    """J1(sqrt(x2))/sqrt(x2) as a function of the *squared* argument.

    Written so that the gradient w.r.t. x2 is finite at x2 = 0 (a plain
    sqrt(0) inside would poison reverse-mode AD with NaN -- the diagonal of
    every Toeplitz eps matrix hits exactly this point).

    ``small_arg_only=True`` uses the |x| < 8 rational fit alone (caller
    guarantees the range)."""
    x2 = jnp.asarray(x2)
    small = x2 < 1e-12
    safe_x2 = jnp.where(small, 1.0, x2)
    x = jnp.sqrt(safe_x2)
    taylor = 0.5 - x2 / 16.0
    j1x = j1_small(x) if small_arg_only else j1(x)
    return jnp.where(small, taylor, j1x / x)
