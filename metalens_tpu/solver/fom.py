"""Figure of merit as first-class data.

The reference configures its FOM by *editing a Lua table in grating.lua*
(``grating.lua:295-311``, documented workflow ``README.md:52``).  Here it is a
list of :class:`FomTerm`; the default reproduces the file's shipped table
(``grating.lua:301-304``): 0.580um weight 0.5 into order -1 inphase, 0.450um
weight 0.5 into order 0 inphase.

Scoring reproduces ``grating.lua:188-229`` exactly:

* per term, the cell is excited from air at theta = angle_in_air (or 0 for
  target order 0), phi = 0, in s and then p polarization;
* the transmitted amplitude of the target order is read in S4's block layout
  (y-block for s, x-block for p, ``grating.lua:204-214``), with the s
  amplitude sign-flipped to keep the s-vs-p phase relation consistent across
  the lens (``grating.lua:208-211``);
* inphase terms score |Im(a)| * Im(a) / (n_glass cos(theta)) -- rewarding
  phase-consistent output; non-inphase terms score |a|^2 / (n_glass
  cos(theta)) (``grating.lua:216-219``);
* the FOM is the s/p average, weight-averaged over terms
  (``grating.lua:313-328``).

Because the whole pipeline is differentiable, the same function also powers
the gradient optimizer (:func:`metalens_tpu.optimize.optimize_gradient`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp

from ..units import nm


@dataclass(frozen=True)
class FomTerm:
    """One figure-of-merit term.

    wavelength       vacuum wavelength (SI metres)
    weight           relative weight in the weighted mean
    target_order     target diffraction order ox (oy = 0)
    inphase          demand consistent output phase (score the Im component)
    """
    wavelength: float
    weight: float = 1.0
    target_order: int = -1
    inphase: bool = True


DEFAULT_FOM_TERMS = (
    FomTerm(wavelength=580 * nm, weight=0.5, target_order=-1, inphase=True),
    FomTerm(wavelength=450 * nm, weight=0.5, target_order=0, inphase=True),
)


def term_score(amp_s_y, amp_p_x, n_glass_now, cos_theta, inphase: bool):
    """Score one term from the target-order transmitted amplitudes of the s
    and p runs (y-block and x-block amplitudes respectively).  Amplitudes
    are :class:`metalens_tpu.solver.cpx.C` scalars."""
    from . import cpx
    amp_s = -cpx.promote(amp_s_y)    # s sign flip, grating.lua:208-211
    amp_p = cpx.promote(amp_p_x)
    if inphase:
        score_s = jnp.abs(amp_s.im) * amp_s.im
        score_p = jnp.abs(amp_p.im) * amp_p.im
    else:
        score_s = cpx.abs2(amp_s)
        score_p = cpx.abs2(amp_p)
    denom = n_glass_now * cos_theta
    return (score_s / denom + score_p / denom) / 2.0

