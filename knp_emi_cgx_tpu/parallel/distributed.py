"""Multi-process (multi-host) launch glue: the mpirun/MPI_COMM_WORLD
equivalent (SURVEY §5.8).

The reference scales with `mpirun -n P` — every rank runs the same script,
DOLFINx partitions the mesh at read time, PETSc owns the communication.
The TPU-native mapping is single-controller multi-process JAX:

    KNPEMI_COORDINATOR=host0:1234 KNPEMI_NUM_PROCESSES=4 \\
        KNPEMI_PROCESS_ID=$RANK python -m knp_emi_cgx_tpu.main --config ...

Every process calls `initialize_distributed()` before touching any jax
backend; afterwards `jax.devices()` spans ALL hosts, a `jax.sharding.Mesh`
over them makes the dof-sharded step (parallel/dof_sharded.py) run across
hosts unchanged — halo ppermutes ride ICI within a slice and DCN across,
inserted by XLA from the same shardings.  The single-process virtual-device
path (tests, dryrun) is the degenerate case: `initialize_distributed()` is
a no-op and every helper below behaves identically.

Host-side setup (mesh build, partition, CSR pattern) runs REDUNDANTLY on
every process — it is deterministic, so all processes hold identical global
index structures; `shard_global_array` then materialises each process's
device shards only.  This mirrors the reference's rank-0-computes+bcast
pattern without the broadcast (recompute is cheaper than shipping at these
sizes, and there is no ordering hazard).
"""
from __future__ import annotations

import os

import numpy as np


ENV_COORDINATOR = "KNPEMI_COORDINATOR"
ENV_NUM_PROCESSES = "KNPEMI_NUM_PROCESSES"
ENV_PROCESS_ID = "KNPEMI_PROCESS_ID"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> tuple[int, int]:
    """Env-driven `jax.distributed.initialize`; no-op for single process.

    Returns (process_index, process_count).  Must run before any jax
    backend initialises (like the XLA_FLAGS handling in __graft_entry__).
    """
    import jax

    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    if num_processes is None and ENV_NUM_PROCESSES in os.environ:
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and ENV_PROCESS_ID in os.environ:
        process_id = int(os.environ[ENV_PROCESS_ID])

    if coordinator and (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def is_lead() -> bool:
    """Rank-0 test (the reference's `PETSc.Sys.Print` gating)."""
    import jax

    return jax.process_index() == 0


def lead_print(*args, **kwargs):
    if is_lead():
        print(*args, **kwargs)


def global_mesh(axis: str = "cells", devices=None):
    """1-D device mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_global_array(x, sharding):
    """Materialise a (host-globally-replicated) numpy/jax array as a sharded
    global jax.Array — works single- and multi-process.

    Single process: plain device_put.  Multi-process: every process holds
    the full host array (deterministic redundant setup); each contributes
    only its addressable shards.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx])


def validate_halo_plan(halo) -> None:
    """Consistency check of a HaloSpMV exchange plan — the per-process
    bookkeeping invariant: for every hop distance delta, what device d SENDS
    is exactly what device (d - delta) mod n expects to find in its halo
    slots, and every remapped column index points at a slot the exchange
    actually fills.  Raises AssertionError on violation."""
    n_dev = halo.n_devices
    rows_per = halo.rows_per
    cols = np.asarray(halo.cols)
    offset = rows_per
    for delta in halo.deltas:
        send = np.asarray(halo.send_idx[delta])          # [n_dev, w]
        w = send.shape[1]
        for d in range(n_dev):
            src = (d + delta) % n_dev
            # columns device d references in this delta's halo segment
            seg = cols[d][(cols[d] >= offset) & (cols[d] < offset + w)]
            slots = np.unique(seg) - offset
            # what src sends to d (src sends to (src - delta) mod n = d)
            sent = send[src]
            # every referenced slot must be filled by the exchange
            assert np.all(slots < w), (delta, d, "slot out of range")
            referenced = np.zeros(w, dtype=bool)
            referenced[slots] = True
            # slots beyond the sender's real payload must be unreferenced
            # (they are padding); slots within it map 1:1 onto sent dofs
            assert referenced.sum() <= w, (delta, d)
        offset += halo.halo_width[delta]
    assert offset == halo.total_width, "halo layout width mismatch"
