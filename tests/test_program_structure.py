"""Pin the OPERATION COUNTS of the production cell-solve programs.

The round-2/3 performance work (lean conversion stars, the outer star
applied straight to the incident vector, X0-s12 commutation in the
doubling, only-requested S-matrix blocks) is structural: it removes dense
matmuls and solves from the traced program, with values pinned equal by
test_star_specializations / test_engine.  Those tests can't notice a
regression that REINTRODUCES dead work, because the values stay right.
This test counts calls to the two choke points every dense complex
operation goes through -- ``cpx.matmul`` (all Karatsuba matmuls) and
``cpx.solve`` (all dense inverses / linear solves) -- and pins the totals
for the production program shapes.

The measured performance model (CLAUDE.md): solves are the wall-clock
lever (~75-80% of the batch), matmuls are nearly free but their count
tracks the leanness refactors.  Solve-count pins are exact and explained;
matmul pins are exact totals at a FIXED static config (n_slabs=2,
taylor_terms=28 -- Paterson-Stockmeyer chunking depends on the term
count, so the pin fixes it rather than using slab_schedule).

Reference role: this is the rebuild's analog of keeping S4's per-solve
cost model honest -- the reference had no such guard (SURVEY.md section 4).
"""

import numpy as np
import pytest

from metalens_tpu.solver import cpx, orders as ordmod, rcwa
from metalens_tpu.units import nm

LX, LY = 1200 * nm, 320 * nm
LAM = 580 * nm
H = 550 * nm
EPS_P, EPS_G = 2.372 ** 2, 1.459 ** 2
XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0]])


@pytest.fixture
def counted(monkeypatch):
    """Patch the cpx choke points with counters; yields the count dict."""
    counts = {"matmul": 0, "solve": 0}
    orig_mm, orig_sv = cpx.matmul, cpx.solve

    def mm(a, b, **kw):
        counts["matmul"] += 1
        return orig_mm(a, b, **kw)

    def sv(a, b, **kw):
        counts["solve"] += 1
        return orig_sv(a, b, **kw)

    monkeypatch.setattr(cpx, "matmul", mm)
    monkeypatch.setattr(cpx, "solve", sv)
    yield counts


def _setup(numG=13):
    orders = ordmod.select_orders(LX, LY, numG)
    n = orders.shape[0]
    c_inc = np.zeros(2 * n)
    c_inc[ordmod.order_index(orders, 0, 0)] = 1.0
    return orders, c_inc


def _amplitudes(orders, c_inc, counts, *, n_slabs=2, fff=True,
                want_reflection=True):
    counts["matmul"] = counts["solve"] = 0
    ampf, ampr, _, _ = rcwa.cell_amplitudes(
        orders, XYRRA, LX, LY, H, EPS_P, EPS_G, LAM, 0.01, 0.0, c_inc,
        n_slabs=n_slabs, taylor_terms=28, fff=fff,
        want_reflection=want_reflection)
    return ampf, ampr


def _smatrix(orders, counts, outputs):
    counts["matmul"] = counts["solve"] = 0
    S, _, _ = rcwa.cell_smatrix(
        orders, XYRRA, LX, LY, H, EPS_P, EPS_G, LAM, 0.01, 0.0,
        n_slabs=2, taylor_terms=28, fff=True, outputs=outputs)
    return S


def test_production_amplitudes_solve_count(counted):
    """The production (fff, both-amplitude) program at n_slabs=2 issues
    EXACTLY 6 dense solves: layer Einv + fff <<1/eps>> (both size N),
    slab M22inv + 1 doubling + inner conversion star + outer star X0
    (size 2N).  Every one dispatches to the grouped Pallas inverse on
    TPU; a seventh solve would be a ~15% whole-program regression."""
    orders, c_inc = _setup()
    _amplitudes(orders, c_inc, counted)
    assert counted["solve"] == 6
    # every halving of the slab count removes exactly one doubling solve
    _amplitudes(orders, c_inc, counted, n_slabs=4)
    assert counted["solve"] == 7


def test_laurent_drops_the_recip_inverse(counted):
    """fff=False must not pay the <<1/eps>> inverse or the 3 NV-correction
    matmuls (Delta @ P_hat blocks)."""
    orders, c_inc = _setup()
    _amplitudes(orders, c_inc, counted)
    m_fff, s_fff = counted["matmul"], counted["solve"]
    _amplitudes(orders, c_inc, counted, fff=False)
    assert counted["solve"] == s_fff - 1
    assert counted["matmul"] <= m_fff - 3


def test_production_amplitudes_matmul_total(counted):
    """Exact dense-matmul total of the production amplitudes program at
    (n_slabs=2, taylor_terms=28).  Budget: 3 NV products + 20 Taylor
    (Y build + shared-power Paterson-Stockmeyer + T12/T21/T22 finalize)
    + 1 slab s21 + 4-5 doubling + 1 inner-star s21 + thin outer
    products (v, ampf, ampr).  38 is the round-3 lean figure -- the
    pre-round-3 program with full conversion stars and the concatenated
    doubling RHS measured 45+ here.  If a refactor CHANGES this number,
    re-derive the budget; an unexplained increase is dead work."""
    orders, c_inc = _setup()
    _amplitudes(orders, c_inc, counted)
    assert counted["matmul"] == 38
    # the reflection amplitude costs exactly one extra thin matvec
    _amplitudes(orders, c_inc, counted, want_reflection=False)
    assert counted["matmul"] == 37


def test_smatrix_outputs_prune_matmuls(counted):
    """The ``outputs`` selection must monotonically shed dense matmuls
    while never changing the solve count (the solves are structural)."""
    orders, _ = _setup()
    _smatrix(orders, counted, ("s11", "s12", "s21", "s22"))
    m_full, s_full = counted["matmul"], counted["solve"]
    assert s_full == 6
    assert m_full == 41
    _smatrix(orders, counted, ("s11", "s21"))
    assert counted["solve"] == 6
    m_fom_char = counted["matmul"]
    _smatrix(orders, counted, ("s11",))
    assert counted["solve"] == 6
    m_fom = counted["matmul"]
    assert m_fom <= m_fom_char <= m_full - 3
    # the amplitudes route undercuts even the leanest S-matrix route:
    # its outer star never materializes a dense block at all
    orders, c_inc = _setup()
    _amplitudes(orders, c_inc, counted)
    assert counted["matmul"] <= m_fom_char + 1


def test_counts_independent_of_numG(counted):
    """The op-count structure is shape-independent (same program graph at
    every truncation) -- numG only changes matrix sizes."""
    orders, c_inc = _setup(numG=25)
    _amplitudes(orders, c_inc, counted)
    assert counted["solve"] == 6
    assert counted["matmul"] == 38
