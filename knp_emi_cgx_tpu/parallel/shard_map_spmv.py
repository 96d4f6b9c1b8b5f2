"""Explicit SPMD SpMV and Krylov kernels via shard_map.

The GSPMD path (mesh_sharding.py) lets XLA place collectives; this module is
the hand-written counterpart: the classic 1-D row decomposition of the
operator with explicit collectives, the direct analog of the reference's
PETSc MatMPIAIJ layout (SURVEY §2.3):

  * rows (and the CSR values/indices) are partitioned across the "cells"
    mesh axis, padded to equal shard sizes;
  * each device gathers the full x (all_gather over ICI — the PETSc
    VecScatter ghost update generalised to all-to-all; a ppermute
    neighbour-halo variant is the planned refinement for pod scale);
  * dot products / norms inside Krylov iterations are local partials
    followed by psum — exactly PETSc's MPI-collective VecDot.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ShardedCSR:
    """Row-partitioned CSR operator for an n-device 1-D mesh."""

    def __init__(self, indptr, indices, n_rows: int, n_devices: int,
                 axis: str = "cells"):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices, dtype=np.int32)
        self.n_rows = n_rows
        self.n_devices = n_devices
        self.axis = axis

        rows_per = -(-n_rows // n_devices)
        self.rows_per = rows_per
        self.n_rows_padded = rows_per * n_devices

        # per-device row ranges and nnz slices, padded to a common max
        row_ids = np.repeat(np.arange(n_rows), np.diff(indptr))
        dev_of_row = row_ids // rows_per
        counts = np.bincount(dev_of_row, minlength=n_devices)
        max_nnz = int(counts.max())
        self.max_nnz = max_nnz

        vals_map = np.full((n_devices, max_nnz), -1, dtype=np.int64)
        cols = np.zeros((n_devices, max_nnz), dtype=np.int32)
        local_rows = np.zeros((n_devices, max_nnz), dtype=np.int32)
        start = 0
        for d in range(n_devices):
            sl = np.nonzero(dev_of_row == d)[0]
            vals_map[d, :len(sl)] = sl
            cols[d, :len(sl)] = indices[sl]
            local_rows[d, :len(sl)] = row_ids[sl] - d * rows_per
            # padding rows scatter into row index rows_per-1 with zero value
            local_rows[d, len(sl):] = rows_per - 1
        self._vals_map = vals_map          # global nnz index per local slot
        self._pad_mask = (vals_map >= 0)
        self.cols = jnp.asarray(cols)
        self.local_rows = jnp.asarray(local_rows)
        self.vals_gather = jnp.asarray(np.maximum(vals_map, 0),
                                       dtype=np.int32)
        self.pad = jnp.asarray(self._pad_mask.astype(np.float32))

    def shard_values(self, vals):
        """[nnz] global CSR values -> [n_devices, max_nnz] padded shards."""
        v = vals[self.vals_gather.reshape(-1)].reshape(self.vals_gather.shape)
        return v * self.pad.astype(vals.dtype)

    def pad_vector(self, x):
        extra = self.n_rows_padded - self.n_rows
        return jnp.pad(x, (0, extra))

    def unpad_vector(self, x):
        return x[: self.n_rows]


def make_sharded_matvec(op: ShardedCSR, device_mesh: Mesh):
    """Returns matvec(vals_shards, x_padded) -> y_padded running under
    shard_map with explicit all_gather + local segment_sum."""
    axis = op.axis
    rows_per = op.rows_per

    def local_mv(vals_blk, cols_blk, rows_blk, x_blk):
        # x_blk: this device's row slice; gather the full vector over ICI
        x_full = jax.lax.all_gather(x_blk[0], axis, tiled=True)
        prod = vals_blk[0] * x_full[cols_blk[0]]
        y = jax.ops.segment_sum(prod, rows_blk[0], num_segments=rows_per)
        return y[None]

    mv = jax.shard_map(
        local_mv, mesh=device_mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )

    def matvec(vals_shards, x_padded):
        xs = x_padded.reshape(op.n_devices, rows_per)
        y = mv(vals_shards, op.cols, op.local_rows, xs)
        return y.reshape(-1)

    return matvec


def sharded_dot(device_mesh: Mesh, axis: str):
    """Explicit-psum dot product over row shards (PETSc VecDot analog)."""

    def local_dot(a_blk, b_blk):
        part = jnp.sum(a_blk * b_blk)
        return jax.lax.psum(part, axis)

    return jax.shard_map(
        local_dot, mesh=device_mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
