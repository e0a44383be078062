"""Multi-host (DCN) scale-out for sweep workloads.

The reference scales past one machine by launching more interpreter
processes, each driving its own S4 subprocesses over a hand-split range of
cells (``/root/reference/grating.py:30-35, 1173-1184`` -- "run this script
on N computers with different ``worker_number``").  The TPU-native
equivalent is a *single SPMD program* over the global device set of a
multi-host pod slice: every host runs the same Python, `jax.distributed`
wires the hosts into one runtime, the mesh spans all chips, and the batch
axis is sharded so that intra-host traffic rides ICI and only the
coordination (compilation consensus, barriers) touches DCN.

Design rules (scaling-book recipe):

* data-parallel cell sweeps shard the batch axis only -- no cross-cell
  communication exists in the solve, so the DCN carries zero collective
  traffic in steady state; psum/pmean reductions of scalars ride the
  hierarchical collective (ICI within a host, one hop across).
* each host feeds only its own shard (``host_local_batch``): arrays are
  assembled with `jax.make_array_from_process_local_data`, so no host ever
  materializes the global batch.

Single-process usage is a degenerate case of the same API (the test
exercises it end-to-end), so code written against this module runs
unchanged from a laptop CPU to a multi-host pod slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def _distributed_client_active() -> bool:
    """Whether jax.distributed.initialize() has already run -- checked via
    the distributed service's own state, NOT via jax.process_count():
    process_count() initializes the XLA backend as a side effect, after
    which jax.distributed.initialize() permanently refuses to run ("must be
    called before any JAX calls that might initialise the XLA backend").
    """
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:   # private API moved: fall back to attempting init
        return False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initialize the multi-host runtime (idempotent).

    On TPU pods the three arguments are auto-detected from the environment
    and may be omitted; for manual bring-up (e.g. CPU hosts over DCN) pass
    ``coordinator_address='host0:1234'``, ``num_processes``, and this
    host's ``process_id``.  Safe to call when already initialized or when
    running single-process: both cases are no-ops.

    MUST be the first JAX-touching call of the process (standard
    jax.distributed contract); this function itself touches no
    backend-initializing API before handing off to
    ``jax.distributed.initialize`` (pinned by tests/test_distributed.py).
    """
    if _distributed_client_active():
        return  # already wired up
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(axis_names=("cells",), shape=None) -> Mesh:
    """A mesh over the GLOBAL device set (all hosts' chips).

    After :func:`init_distributed`, ``jax.devices()`` returns every chip in
    the slice; single-process it degenerates to the local mesh.
    """
    return make_mesh(shape=shape, axis_names=axis_names,
                     devices=jax.devices())


def global_batch_from_host_shards(mesh: Mesh, host_local_batch,
                                  axis_name="cells"):
    """Assemble a globally-sharded batch from per-host local shards.

    ``host_local_batch`` is a pytree of numpy arrays holding THIS host's
    cells (leading axis = local batch).  Returns the same pytree as global
    jax.Arrays sharded ``P(axis_name)`` over the mesh -- each host
    contributes only what it loaded; nothing is gathered.
    """
    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis_name,
                                         *(None,) * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(one, host_local_batch)


def replicate_to_mesh(mesh: Mesh, pytree):
    """Broadcast host-identical values (scalars, per-term tables) to every
    device as fully-replicated global arrays.  All hosts must pass the same
    values (standard SPMD contract)."""
    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(*(None,) * x.ndim))
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(one, pytree)


def host_slice(total: int, axis_size: int = None):
    """This host's contiguous [start, stop) range of a global batch of
    ``total`` items -- the analogue of the reference's hand-split
    ``worker_number`` ranges (``grating.py:1173-1184``), derived from the
    process grid instead of edited by hand.  ``total`` must divide evenly
    into ``jax.process_count()`` hosts (pad the sweep to a multiple, as the
    sharded kernels already require for the device axis)."""
    nproc = jax.process_count()
    assert total % nproc == 0, (total, nproc)
    per = total // nproc
    start = jax.process_index() * per
    return start, start + per


def multihost_barrier(name: str = "metalens_sync"):
    """Block until every host reaches this point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
