"""Neighbour-halo SpMV with explicit ppermute exchange.

The all_gather row-decomposition (shard_map_spmv.py) ships the WHOLE vector
to every device; at pod scale the right pattern is the reference's PETSc
VecScatter: each device owns a contiguous (graph-partitioned, reordered)
range of dofs and exchanges only the boundary values its neighbours
reference.  Here:

  SETUP (host):
    * partition the dof adjacency graph (native BFS partitioner — the
      ParMETIS role) and RE-ORDER dofs so each device owns a contiguous
      range (locality is what makes halos small);
    * for every directed device offset delta with any coupling, record the
      (padded) set of local dofs to SEND to the device delta hops away and
      where the receiver scatters them in its halo buffer;
    * remap column indices into [own range | halo slots].

  APPLY (device, shard_map):
    * one `jax.lax.ppermute` per distinct offset delta (BFS partitions of a
      mesh graph typically need only delta = ±1) — data volume is the
      partition boundary, not the global vector;
    * local CSR SpMV over [x_own | x_halo].
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


class HaloSpMV:
    def __init__(self, A_indptr, A_indices, n: int, n_devices: int,
                 axis: str = "cells", part: np.ndarray | None = None):
        """part: optional externally supplied dof -> device map (e.g. derived
        from a mesh-vertex partition so that several operators — the system
        matrix and its preconditioner — share one vector layout).  When None,
        the dof adjacency graph is partitioned here."""
        import scipy.sparse as sp

        indptr = np.asarray(A_indptr)
        indices = np.asarray(A_indices)
        self.axis = axis
        self.n = n
        self.n_devices = n_devices

        # --- partition the adjacency graph and reorder dofs ---
        from knp_emi_cgx_tpu import native

        if part is not None:
            part = np.asarray(part, dtype=np.int32)
        if part is None and native.get_lib() is not None:
            # symmetrise the pattern for partitioning
            G = sp.csr_matrix((np.ones(len(indices)),
                               indices, indptr), shape=(n, n))
            G = ((G + G.T) > 0).tocsr()
            part = native.partition(G.indptr, G.indices.astype(np.int32),
                                    n_devices)
        if part is None:
            part = (np.arange(n) * n_devices // n).astype(np.int32)
        self.part = part

        order = np.argsort(part, kind="stable")
        self.perm = order                    # new_pos -> old dof
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        self.inv_perm = inv                  # old dof -> new_pos

        counts = np.bincount(part, minlength=n_devices)
        self.rows_per = rows_per = int(counts.max())
        self.n_padded = rows_per * n_devices

        # position of each reordered dof within its device block
        offsets = np.concatenate([[0], np.cumsum(counts)])
        newpos_global = np.empty(n, dtype=np.int64)  # padded global position
        for d in range(n_devices):
            sl = slice(offsets[d], offsets[d + 1])
            newpos_global[order[sl]] = d * rows_per + np.arange(counts[d])
        self.newpos = newpos_global          # old dof -> padded position

        # --- per-device CSR in the new ordering ---
        row_ids = np.repeat(np.arange(n), np.diff(indptr))
        new_rows = newpos_global[row_ids]
        new_cols = newpos_global[indices]
        dev_of = new_rows // rows_per
        nnz_counts = np.bincount(dev_of, minlength=n_devices)
        max_nnz = int(nnz_counts.max())
        self.max_nnz = max_nnz

        vals_map = np.full((n_devices, max_nnz), 0, dtype=np.int64)
        pad_mask = np.zeros((n_devices, max_nnz), dtype=bool)
        local_rows = np.full((n_devices, max_nnz), rows_per - 1,
                             dtype=np.int32)
        col_dev = np.zeros((n_devices, max_nnz), dtype=np.int64)
        col_loc = np.zeros((n_devices, max_nnz), dtype=np.int64)
        for d in range(n_devices):
            sl = np.nonzero(dev_of == d)[0]
            k = len(sl)
            vals_map[d, :k] = sl
            pad_mask[d, :k] = True
            local_rows[d, :k] = (new_rows[sl] - d * rows_per).astype(np.int32)
            col_dev[d, :k] = new_cols[sl] // rows_per
            col_loc[d, :k] = new_cols[sl] % rows_per

        # --- halo plan: distinct nonzero offsets delta = (src - self) mod n ---
        deltas = sorted({int((cd - d) % n_devices)
                         for d in range(n_devices)
                         for cd in np.unique(col_dev[d][pad_mask[d]])}
                        - {0})
        self.deltas = deltas

        # for each delta: what each device SENDS (indices into its own block)
        # and how many halo slots each device needs; receiver slot layout is
        # [own | halo(delta_0) | halo(delta_1) | ...] each padded to a common
        # per-delta width
        send_idx = {}
        halo_width = {}
        recv_slot_of = {}   # (delta, device) -> {remote_local_col: slot}
        for delta in deltas:
            widths = []
            per_dev_send = []
            per_dev_slotmap = []
            for d in range(n_devices):
                src = (d + delta) % n_devices
                # device d needs these columns owned by src
                m = pad_mask[d] & (col_dev[d] == src)
                needed = np.unique(col_loc[d][m])
                widths.append(len(needed))
                per_dev_slotmap.append({int(c): i for i, c in enumerate(needed)})
                per_dev_send.append(needed)
            w = max(widths) if widths else 0
            halo_width[delta] = w
            # what device d SENDS = what the device (d - delta) mod n needs
            send = np.zeros((n_devices, max(w, 1)), dtype=np.int32)
            for d in range(n_devices):
                dst = (d - delta) % n_devices
                needed = per_dev_send[dst]
                send[d, :len(needed)] = needed
            send_idx[delta] = send
            recv_slot_of[delta] = per_dev_slotmap

        # remap columns -> [0, rows_per) own, then halo slots
        base = rows_per
        col_slot = np.zeros((n_devices, max_nnz), dtype=np.int32)
        for d in range(n_devices):
            own = col_dev[d] == d
            col_slot[d][own] = col_loc[d][own].astype(np.int32)
            off = base
            for delta in deltas:
                m = pad_mask[d] & (col_dev[d] == ((d + delta) % n_devices))
                slotmap = recv_slot_of[delta][d]
                if m.any():
                    col_slot[d][m] = off + np.asarray(
                        [slotmap[int(c)] for c in col_loc[d][m]],
                        dtype=np.int32)
                off += halo_width[delta]
        self.total_width = base + sum(halo_width[d] for d in deltas)
        self.halo_width = halo_width

        self.cols = jnp.asarray(col_slot)
        self.local_rows = jnp.asarray(local_rows)
        self.vals_gather = jnp.asarray(vals_map, dtype=jnp.int32)
        self.pad = jnp.asarray(pad_mask.astype(np.float64))
        self.send_idx = {d: jnp.asarray(v) for d, v in send_idx.items()}

    # ------------------------------------------------------------------
    def shard_values(self, vals):
        v = vals[self.vals_gather.reshape(-1)].reshape(self.vals_gather.shape)
        return v * self.pad.astype(vals.dtype)

    def pad_vector(self, x):
        out = jnp.zeros(self.n_padded, dtype=x.dtype)
        return out.at[jnp.asarray(self.newpos)].set(x)

    def unpad_vector(self, xp):
        return xp[jnp.asarray(self.newpos)]

    # ------------------------------------------------------------------
    def make_matvec_fn(self, device_mesh: Mesh):
        """Returns (matvec, arrays): matvec(arrays, vals_shards, x_padded).

        The index structures (column slots, local rows, send maps) travel as
        the `arrays` ARGUMENT rather than closure constants, so a jitted hot
        loop can bundle them (see utils/devicestate.py — closure constants
        get re-shipped to the device per execution on remote runtimes)."""
        axis = self.axis
        rows_per = self.rows_per
        deltas = self.deltas
        n_dev = self.n_devices

        def local_mv(vals_blk, cols_blk, rows_blk, x_blk, *send_blks):
            x_own = x_blk[0]
            parts = [x_own]
            for delta, sidx in zip(deltas, send_blks):
                payload = x_own[sidx[0]]
                # send my boundary values to the device delta hops BEHIND me
                perm = [(i, (i - delta) % n_dev) for i in range(n_dev)]
                received = jax.lax.ppermute(payload, axis, perm)
                parts.append(received)
            x_ext = jnp.concatenate(parts)
            prod = vals_blk[0] * x_ext[cols_blk[0]]
            y = jax.ops.segment_sum(prod, rows_blk[0], num_segments=rows_per)
            return y[None]

        in_specs = [P(axis, None)] * (4 + len(deltas))
        mv = jax.shard_map(local_mv, mesh=device_mesh,
                           in_specs=tuple(in_specs), out_specs=P(axis, None))

        def matvec(arrays, vals_shards, x_padded):
            xs = x_padded.reshape(n_dev, rows_per)
            args = [vals_shards, arrays["cols"], arrays["local_rows"], xs]
            args += list(arrays["send"])
            return mv(*args).reshape(-1)

        arrays = {"cols": self.cols, "local_rows": self.local_rows,
                  "send": tuple(self.send_idx[d] for d in deltas)}
        return matvec, arrays

    def make_matvec(self, device_mesh: Mesh):
        fn, arrays = self.make_matvec_fn(device_mesh)

        def matvec(vals_shards, x_padded):
            return fn(arrays, vals_shards, x_padded)

        return matvec
