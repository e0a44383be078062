"""The structure-exploiting fast paths in solver/rcwa.py must be exactly
the general algebra: diag-block interface stars, the mirror-symmetric slab
doubling star, the symmetric transfer->scattering shortcut, and the shared-
power (Paterson-Stockmeyer) series evaluation.  Each is pinned against the
general/naive computation on random inputs."""

import math

import numpy as np

from metalens_tpu.solver import basis, cpx, rcwa


def _rnd_dense(rng, n2, scale=0.3):
    return cpx.from_np(scale * (rng.normal(size=(n2, n2))
                                + 1j * rng.normal(size=(n2, n2))))


def _rnd_blocks(rng, N, scale=0.4):
    return tuple(cpx.from_np(scale * (rng.normal(size=N)
                                      + 1j * rng.normal(size=N)))
                 for _ in range(4))


def _maxdiff(a, b):
    return float(np.abs(cpx.to_np(a) - cpx.to_np(b)).max())


def test_star_blockdiag_dense_matches_dense_star():
    rng = np.random.default_rng(0)
    N, n2 = 6, 12
    B = rcwa.SMatrix(*(_rnd_dense(rng, n2) for _ in range(4)))
    Ab = rcwa.BlockSMatrix(*(_rnd_blocks(rng, N) for _ in range(4)))
    Ad = rcwa.SMatrix(*(basis.block_to_dense(x) for x in Ab))
    got = rcwa.star_blockdiag_dense(Ab, B)
    ref = rcwa.redheffer_star(Ad, B)
    for g, r in zip(got, ref):
        assert _maxdiff(g, r) < 1e-13


def test_star_dense_blockdiag_matches_dense_star():
    rng = np.random.default_rng(1)
    N, n2 = 6, 12
    A = rcwa.SMatrix(*(_rnd_dense(rng, n2) for _ in range(4)))
    Bb = rcwa.BlockSMatrix(*(_rnd_blocks(rng, N) for _ in range(4)))
    Bd = rcwa.SMatrix(*(basis.block_to_dense(x) for x in Bb))
    got = rcwa.star_dense_blockdiag(A, Bb)
    ref = rcwa.redheffer_star(A, Bd)
    for g, r in zip(got, ref):
        assert _maxdiff(g, r) < 1e-13


def test_symmetric_self_star_matches_general_star():
    # any S with s11 == s22 and s12 == s21 (the input contract)
    rng = np.random.default_rng(2)
    n2 = 14
    s11 = _rnd_dense(rng, n2)
    s12 = _rnd_dense(rng, n2)
    S = rcwa.SMatrix(s11, s12, s12, s11)
    got = rcwa.redheffer_star_self_symmetric(S)
    ref = rcwa.redheffer_star(S, S)
    for g, r in zip(got, ref):
        assert _maxdiff(g, r) < 1e-12
    assert _maxdiff(got.s11, got.s22) == 0.0
    assert _maxdiff(got.s12, got.s21) == 0.0


def test_symmetric_slab_conversion_matches_general():
    # ANY constant (F, G) defines a z-uniform segment, whose transfer matrix
    # is mirror-symmetric in a same-both-sides amplitude basis
    rng = np.random.default_rng(3)
    N, n2 = 5, 10
    F = _rnd_dense(rng, n2, 0.5)
    G = _rnd_dense(rng, n2, 0.5)
    T = rcwa.thin_slab_T_blocks(F, G, 0.7, 14)
    Kx = rng.normal(size=N)
    Ky = rng.normal(size=N)
    Kz = basis.kz_norm(Kx, Ky, rcwa.EPS_REF)
    n_ref = cpx.csqrt_posim(cpx.promote(rcwa.EPS_REF))
    we = basis.we_blocks(Kx, Ky, Kz, n_ref)
    wei = basis.we_inv_blocks(Kx, Ky, Kz, n_ref)
    got = rcwa.slab_smatrix_in_basis(T, we, wei, symmetric=True)
    ref = rcwa.slab_smatrix_in_basis(T, we, wei, symmetric=False)
    for g, r in zip(got, ref):
        assert _maxdiff(g, r) < 1e-12


def test_shared_power_polys_match_naive_horner():
    rng = np.random.default_rng(4)
    n = 16
    Y = cpx.from_np(0.2 * (rng.normal(size=(n, n))
                           + 1j * rng.normal(size=(n, n))))
    I = cpx.eye(n, Y.re.dtype)
    Yn = cpx.to_np(Y)
    for d in (0, 1, 2, 3, 7, 12, 13):
        coeff_lists = [
            [(-1.0) ** k / math.factorial(2 * k) for k in range(d + 1)],
            [(-1.0) ** k / math.factorial(2 * k + 1) for k in range(d + 1)],
            [(-1.0) ** (k + 1) / math.factorial(2 * k + 2)
             for k in range(d + 1)],
        ]
        outs = rcwa._shared_power_polys(Y, I, coeff_lists)
        for coeffs, got in zip(coeff_lists, outs):
            ref = np.zeros_like(Yn)
            P = np.eye(n, dtype=complex)
            for c in coeffs:
                ref += c * P
                P = P @ Yn
            assert np.abs(cpx.to_np(got) - ref).max() < 1e-14


def test_slab_schedule_is_converged():
    """The (n_slabs, taylor_terms) pairing from slab_schedule must give a
    series-converged slab: raising taylor_terms far beyond the scheduled
    count must not change the FOM at f64."""
    from metalens_tpu import Grating, engine
    from metalens_tpu.solver.fom import FomTerm
    from metalens_tpu.units import nm, degree

    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                target_wavelength=580 * nm, angle_in_air=30 * degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))
    terms = [FomTerm(580 * nm, 1.0, -1, True)]
    orders, n_slabs, taylor, _ = engine.static_solve_config(
        g, [580 * nm], 25)
    assert n_slabs & (n_slabs - 1) == 0
    f_sched = engine.fom_of_grating(g, 580 * nm, numG=25, terms=terms)
    f_over = engine.fom_of_grating(g, 580 * nm, numG=25, terms=terms,
                                   taylor_terms=taylor + 14)
    assert abs(f_sched - f_over) < 1e-11


def test_partial_outputs_match_full_star():
    """outputs= on the specialized stars must reproduce exactly the blocks
    it keeps and return None for the rest (the engine's FOM/characterize
    programs request only s11 / s11+s21 of the final cell S-matrix)."""
    rng = np.random.default_rng(7)
    N, n2 = 6, 12
    B = rcwa.SMatrix(*(_rnd_dense(rng, n2) for _ in range(4)))
    Ab = rcwa.BlockSMatrix(*(_rnd_blocks(rng, N) for _ in range(4)))
    full = rcwa.star_blockdiag_dense(Ab, B)
    for outputs in [("s11",), ("s11", "s21"), ("s21", "s22"), ("s12",)]:
        part = rcwa.star_blockdiag_dense(Ab, B, outputs=outputs)
        for name in rcwa.FULL_OUTPUTS:
            if name in outputs:
                assert _maxdiff(getattr(part, name),
                                getattr(full, name)) == 0.0
            else:
                assert getattr(part, name) is None
    A = rcwa.SMatrix(*(_rnd_dense(rng, n2) for _ in range(4)))
    Bb = rcwa.BlockSMatrix(*(_rnd_blocks(rng, N) for _ in range(4)))
    full = rcwa.star_dense_blockdiag(A, Bb)
    for outputs in [("s11",), ("s11", "s21"), ("s21", "s22"), ("s12",)]:
        part = rcwa.star_dense_blockdiag(A, Bb, outputs=outputs)
        for name in rcwa.FULL_OUTPUTS:
            if name in outputs:
                # dropping s12/s22 narrows the solve RHS; same linear
                # system, so bit-equality is not guaranteed -- 1e-14 is
                assert _maxdiff(getattr(part, name),
                                getattr(full, name)) < 1e-14
            else:
                assert getattr(part, name) is None


def test_cell_smatrix_partial_outputs():
    """cell_smatrix(outputs=...) returns identical s11/s21 to the full
    solve, with and without the NV factorization."""
    from metalens_tpu.solver.orders import select_orders

    orders = select_orders(0.48e-6, 0.32e-6, 13)
    xyrra = np.array([[0.05e-6, -0.02e-6, 0.11e-6, 0.09e-6, 0.4],
                      [-0.12e-6, 0.07e-6, 0.07e-6, 0.06e-6, -0.2]])
    args = (orders, xyrra, 0.48e-6, 0.32e-6, 0.55e-6, 5.5 + 0.0j,
            2.1025 + 0.0j, 0.58e-6, 0.31, 0.07)
    for fff in (False, True):
        full, _, _ = rcwa.cell_smatrix(*args, n_slabs=2, taylor_terms=12,
                                       fff=fff)
        # every single block and the engine combinations: the inner-star
        # dependency map must request exactly what the outer star reads
        # (a missing dependency crashes; the s12 <- s11 edge was once lost)
        for outputs in [("s11",), ("s21",), ("s12",), ("s22",),
                        ("s11", "s21"), ("s12", "s22")]:
            part, _, _ = rcwa.cell_smatrix(*args, n_slabs=2,
                                           taylor_terms=12, fff=fff,
                                           outputs=outputs)
            for name in outputs:
                assert _maxdiff(getattr(part, name),
                                getattr(full, name)) < 1e-13
            for name in set(rcwa.FULL_OUTPUTS) - set(outputs):
                assert getattr(part, name) is None


def test_cell_amplitudes_matches_smatrix_route():
    """cell_amplitudes (the engine's apply-to-incidence route) must equal
    scatter_amplitudes(cell_smatrix(...)) exactly -- same linear algebra,
    thin right-hand sides instead of dense block materialization."""
    import jax.numpy as jnp

    from metalens_tpu.solver import orders as ordmod

    orders = ordmod.select_orders(0.48e-6, 0.32e-6, 13)
    N = orders.shape[0]
    i0 = ordmod.order_index(orders, 0, 0)
    xyrra = np.array([[0.05e-6, -0.02e-6, 0.11e-6, 0.09e-6, 0.4],
                      [-0.12e-6, 0.07e-6, 0.07e-6, 0.06e-6, -0.2]])
    args = (orders, xyrra, 0.48e-6, 0.32e-6, 0.55e-6, 5.5 + 0.0j,
            2.1025 + 0.0j, 0.58e-6, 0.31, 0.07)
    c = jnp.zeros((2 * N, 2))
    c = c.at[i0, 0].set(1.0).at[i0 + N, 1].set(1.0)
    for fff in (False, True):
        S, _, _ = rcwa.cell_smatrix(*args, n_slabs=2, taylor_terms=12,
                                    fff=fff)
        ref_f, ref_r = rcwa.scatter_amplitudes(S, c)
        ampf, ampr, _, _ = rcwa.cell_amplitudes(*args, c, n_slabs=2,
                                                taylor_terms=12, fff=fff)
        assert _maxdiff(ampf, ref_f) < 1e-13
        assert _maxdiff(ampr, ref_r) < 1e-13
        ampf2, none_r, _, _ = rcwa.cell_amplitudes(
            *args, c, n_slabs=2, taylor_terms=12, fff=fff,
            want_reflection=False)
        assert none_r is None
        assert _maxdiff(ampf2, ampf) == 0.0


def test_relaxed_slab_cap_counts_and_parity():
    """The f64 per-slab cap (16.5; this suite runs x64 so the default
    resolves to it -- see test_slab_cap_is_dtype_aware for the f32 cap)
    must halve the doubling count at both production bench configs vs the
    round-2 cap of 9, and the f64 amplitudes must match a conservative
    (4x slabs) schedule to the measured doubling-cancellation floor
    (~3e-10 at t*q=16.2; see the slab-cap comment block in rcwa.py)."""
    import jax.numpy as jnp
    from metalens_tpu.solver import orders as ordmod
    from metalens_tpu.units import nm

    LX, LY, LAM, H = 1200 * nm, 320 * nm, 580 * nm, 550 * nm
    NT, NG = 2.372, 1.459
    XYRRA = np.array([[-215 * nm, 2 * nm, 144 * nm, 111 * nm, 0.0],
                      [196 * nm, -8 * nm, 100 * nm, 130 * nm, 0.1]])
    k0h = 2 * math.pi * H / LAM

    counts = {}
    for numG in (50, 100):
        orders = ordmod.select_orders(LX, LY, numG)
        ns, tt = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2)
        ns9, _ = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2,
                                    target=9.0)
        counts[numG] = (ns, ns9)
        assert ns == ns9 // 2, counts
    assert counts[50] == (2, 4) and counts[100] == (4, 8)

    numG = 50
    orders = ordmod.select_orders(LX, LY, numG)
    i0 = ordmod.order_index(orders, 0, 0)
    ns, tt = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2)

    def ampf(ns_, tt_):
        c = jnp.zeros((2 * numG,)).at[i0].set(1.0)
        a, _, _, _ = rcwa.cell_amplitudes(
            orders, jnp.asarray(XYRRA), LX, LY, H, NT ** 2, NG ** 2, LAM,
            0.45, 0.1, c, n_slabs=ns_, taylor_terms=tt_, fff=True)
        return cpx.to_np(a)

    fast = ampf(ns, tt)
    conservative = ampf(4 * ns, max(12, tt // 2))
    assert np.abs(fast - conservative).max() < 3e-9


def test_slab_cap_is_dtype_aware():
    """Round 4: the per-slab t*q cap is PRECISION-DEPENDENT.  True f32
    (x64 off -- the chip) has ~eps*e^{t*q} representation headroom in the
    thin-slab transfer entries: measured on the bench cell, the error on
    propagating orders ramps 4.8e-5 -> 1.7e-4 -> 3.4e-3 -> 1.6e-2 at
    t*q = 11 / 12 / 13 / 16.2 over a ~1.5e-4 pipeline floor.  The round-3
    cap of 16.5 therefore shipped ~1.4e-2 f32 amplitude error at the
    numG=50 production schedule (its 'unchanged up to 21' probe ran under
    x64, which masks the cancellation).  Caps: f32 11.0, f64 16.5."""
    from metalens_tpu.solver import orders as ordmod
    from metalens_tpu.units import nm

    assert rcwa.slab_cap(np.float32) == rcwa.SLAB_CAP_F32 == 11.0
    assert rcwa.slab_cap(np.float64) == rcwa.SLAB_CAP_F64 == 16.5
    # the suite runs with x64 on -> ambient default resolves to the f64 cap
    assert rcwa.slab_cap() == rcwa.SLAB_CAP_F64

    LX, LY, LAM, H = 1200 * nm, 320 * nm, 580 * nm, 550 * nm
    NT = 2.372
    k0h = 2 * math.pi * H / LAM
    for numG, want_f32, want_f64 in ((50, 4, 2), (100, 4, 4)):
        orders = ordmod.select_orders(LX, LY, numG)
        ns32, _ = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2,
                                     target=rcwa.slab_cap(np.float32))
        ns64, _ = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2,
                                     target=rcwa.slab_cap(np.float64))
        assert (ns32, ns64) == (want_f32, want_f64), (numG, ns32, ns64)
        # default-target call sees the ambient (x64) precision
        ns_amb, _ = rcwa.slab_schedule(k0h, orders, LX, LY, LAM, NT ** 2)
        assert ns_amb == ns64


def test_cell_amplitudes_accepts_1d_incident_vector():
    """A 1-D c_inc (the natural 'incident vector' reading of the docstring)
    must give the same amplitudes as the 1-column matrix form -- the
    per-order diag scaling used to broadcast it into an outer product
    silently."""
    import jax.numpy as jnp
    from metalens_tpu.solver import orders as ordmod

    orders = ordmod.select_orders(0.48e-6, 0.32e-6, 13)
    N = orders.shape[0]
    i0 = ordmod.order_index(orders, 0, 0)
    xyrra = np.array([[0.05e-6, -0.02e-6, 0.11e-6, 0.09e-6, 0.4]])
    args = (orders, xyrra, 0.48e-6, 0.32e-6, 0.55e-6, 5.5 + 0.0j,
            2.1025 + 0.0j, 0.58e-6, 0.31, 0.07)
    c1 = jnp.zeros(2 * N).at[i0].set(1.0)
    c2 = c1[:, None]
    f1, r1, _, _ = rcwa.cell_amplitudes(*args, c1, n_slabs=2, taylor_terms=12)
    f2, r2, _, _ = rcwa.cell_amplitudes(*args, c2, n_slabs=2, taylor_terms=12)
    assert f1.shape == (2 * N,) and r1.shape == (2 * N,)
    assert _maxdiff(f1, cpx.C(f2.re[:, 0], f2.im[:, 0])) == 0.0
    assert _maxdiff(r1, cpx.C(r2.re[:, 0], r2.im[:, 0])) == 0.0
