"""Sharded solve batches: the reference's process fan-out
(``grating.py:1062-1072``) as SPMD over the device mesh.

Shapes: a batch of B unit cells (same pillar count; periods/geometry may
differ) is sharded over the mesh axis; every device runs the same jitted
RCWA program on its shard; collectives (pmean) combine scalar results and
gradients.  This is the framework's data-parallel training step: one step =
B FOM evaluations + exact geometry gradients + an update.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..solver import basis, orders as ordmod, rcwa
from ..solver.fom import term_score


def _fom_one_cell(orders, n_slabs, taylor_terms, target_idx, inphase,
                  xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, ng_now, cos_theta,
                  weights, fff=True):
    """FOM of a single cell over T terms (arrays of length T; eps_p/eps_g
    are cpx.C arrays)."""
    N = orders.shape[0]
    i0 = ordmod.order_index(orders, 0, 0)
    T = len(target_idx)
    total = 0.0
    wsum = 0.0
    for t in range(T):
        cy_s, cx_s = basis.incident_sp_amplitudes(ux[t], 0.0, "s")
        cy_p, cx_p = basis.incident_sp_amplitudes(ux[t], 0.0, "p")
        c = jnp.zeros((2 * N, 2), dtype=xyrra.dtype)
        c = c.at[i0, 0].set(cy_s).at[i0 + N, 0].set(cx_s)
        c = c.at[i0, 1].set(cy_p).at[i0 + N, 1].set(cx_p)
        ampf, _, Kx, Ky = rcwa.cell_amplitudes(
            orders, xyrra, Lx, Ly, h, eps_p[t], eps_g[t], lam[t], ux[t],
            0.0, c, n_slabs=n_slabs, taylor_terms=taylor_terms, fff=fff,
            want_reflection=False)
        idx = target_idx[t]
        score = term_score(ampf[idx, 0], ampf[idx + N, 1], ng_now[t],
                           cos_theta[t], inphase[t])
        total = total + weights[t] * score
        wsum = wsum + weights[t]
    return total / wsum


def sharded_fom_and_grad(mesh, orders, n_slabs, target_idx, inphase,
                         taylor_terms=12, axis_name="cells", fff=True):
    """Build a jitted SPMD function:

        (xyrra[B, nE, 5], Lx[B], Ly[B], h, eps_p[T], eps_g[T], lam[T],
         ux[B, T], ng_now[T], cos_theta[B, T], weights[T])
            -> (mean_fom (scalar), d mean_fom / d xyrra [B, nE, 5])

    B must be divisible by the mesh axis size.  Each device solves its shard
    of cells; pmean combines the loss (so the gradient of the *mean* FOM
    arrives already psum'd by SPMD autodiff).

    ``n_slabs`` and ``taylor_terms`` must be a converged pairing -- take
    both from :func:`metalens_tpu.solver.rcwa.slab_schedule` (the default
    12 terms matches the classic target-4.5 ``default_n_slabs`` count, NOT
    the schedule's relaxed-cap count, which needs its longer series).
    """
    orders = np.asarray(orders)

    def per_shard(xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, ng_now,
                  cos_theta, weights):
        def one(xy, lx, ly, u, ct):
            return _fom_one_cell(orders, n_slabs, taylor_terms,
                                 target_idx, inphase, xy, lx, ly, h,
                                 eps_p, eps_g, lam, u, ng_now, ct, weights,
                                 fff=fff)
        foms = jax.vmap(one)(xyrra, Lx, Ly, ux, cos_theta)
        return jax.lax.pmean(jnp.mean(foms), axis_name)

    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P(),
                  P(), P(axis_name), P(), P(axis_name), P()),
        out_specs=P())

    def fom_and_grad(xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, ng_now,
                     cos_theta, weights):
        return jax.value_and_grad(
            lambda xy: smapped(xy, Lx, Ly, h, eps_p, eps_g, lam, ux, ng_now,
                               cos_theta, weights))(xyrra)

    return jax.jit(fom_and_grad)


def sharded_characterize_amps(mesh, orders, n_slabs, taylor_terms=12,
                              axis_name="cells", fff=True):
    """Build a jitted SPMD characterize sweep: the (direction x cell) batch
    sharded over the mesh.

        (xyrra[B, nE, 5], Lx[B], Ly[B], h, eps_p (C), eps_g (C), lam,
         ux[B], uy[B]) -> (ampf C[B, 2, 2N], ampr C[B, 2, 2N])
    """
    orders_np = np.asarray(orders)
    N = orders_np.shape[0]
    i0 = ordmod.order_index(orders_np, 0, 0)

    def one(xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, uy):
        c = jnp.zeros((2 * N, 2), dtype=xyrra.dtype)
        c = c.at[i0, 0].set(1.0).at[i0 + N, 1].set(1.0)
        ampf, ampr, _, _ = rcwa.cell_amplitudes(
            orders_np, xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, uy, c,
            n_slabs=n_slabs, taylor_terms=taylor_terms, fff=fff)
        return ampf.T, ampr.T

    def per_shard(xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, uy):
        return jax.vmap(one, in_axes=(0, 0, 0, None, None, None, None, 0, 0)
                        )(xyrra, Lx, Ly, h, eps_p, eps_g, lam, ux, uy)

    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P(),
                  P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)))
    return jax.jit(smapped)
