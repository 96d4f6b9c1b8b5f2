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
        # host copies for the lazily built per-device ELL (df32 path) and
        # for setup-time value sharding without a device readback (never
        # D2H in a setup path — axon flips into synchronous mode)
        self._col_slot_np = col_slot
        self._local_rows_np = local_rows
        self._pad_mask_np = pad_mask
        self._vals_gather_np = vals_map
        self._ell = None

    def shard_values_np(self, vals_np: np.ndarray) -> np.ndarray:
        """Host-side shard_values for static setup products."""
        return (vals_np[self._vals_gather_np]
                * self._pad_mask_np.astype(vals_np.dtype))

    # ------------------------------------------------------------------
    # Per-device ELL layout: row-major padded storage whose width-axis
    # reductions are compensated df_add trees (solvers/df32.py) — the
    # sharded analog of EllMatrix.  Entries keep their CSR order within
    # each row, so the per-row summation tree is IDENTICAL for any device
    # count (bit-reproducible matvecs across partitions).
    # ------------------------------------------------------------------
    def _build_ell(self):
        if self._ell is not None:
            return self._ell
        n_dev, max_nnz = self._pad_mask_np.shape
        rows_per = self.rows_per
        deg = np.zeros((n_dev, rows_per), dtype=np.int64)
        for d in range(n_dev):
            valid = self._pad_mask_np[d]
            np.add.at(deg[d], self._local_rows_np[d][valid], 1)
        self._deg_np = deg
        w = max(1, int(deg.max()))
        # WIDTH-MAJOR [n_dev, w, rows_per]: TPU pads the two minor dims to
        # (8, 128) — a trailing small width axis would expand HBM ~8-10x
        ell_gather = np.zeros((n_dev, w, rows_per), dtype=np.int32)
        ell_mask = np.zeros((n_dev, w, rows_per), dtype=np.float32)
        ell_cols = np.zeros((n_dev, w, rows_per), dtype=np.int32)
        ellpos_of = np.full((n_dev, max_nnz), -1, dtype=np.int64)
        for d in range(n_dev):
            valid = np.nonzero(self._pad_mask_np[d])[0]
            r = self._local_rows_np[d][valid]
            order = np.argsort(r, kind="stable")   # preserves CSR order in-row
            rs = r[order]
            starts = np.searchsorted(rs, np.arange(rows_per))
            j = np.arange(len(rs)) - starts[rs]
            ell_gather[d, j, rs] = valid[order]
            ell_mask[d, j, rs] = 1.0
            ell_cols[d, j, rs] = self._col_slot_np[d][valid[order]]
            ellpos_of[d, valid[order]] = j * rows_per + rs
        self._ell = {
            "w": w,
            "gather": jnp.asarray(ell_gather),
            "mask": jnp.asarray(ell_mask),
            "cols": jnp.asarray(ell_cols),
            "pos_of_np": ellpos_of,
            "gather_np": ell_gather,
            "mask_np": ell_mask,
        }
        return self._ell

    def ell_values_np(self, vals_np: np.ndarray) -> np.ndarray:
        """Host-side per-device ELL values [n_dev, w, rows_per] from values
        in the original CSR order (1-D) or the padded layout [n_dev,
        max_nnz].  Setup path for STATIC operators (preconditioners): the
        hot loop then skips the per-call value gather entirely."""
        ell = self._build_ell()
        v = vals_np if vals_np.ndim == 2 else self.shard_values_np(vals_np)
        n_dev = self.n_devices
        out = np.take_along_axis(v, ell["gather_np"].reshape(n_dev, -1),
                                 axis=1)
        return (out.reshape(ell["gather_np"].shape)
                * ell["mask_np"].astype(v.dtype))

    def ell_repair_onehot(self, repair_slots_padded, phi_col_mask_vals):
        """Static arrays for the in-matvec nullspace repair (the sharded
        `repaired_ell_values`): a one-hot [n_dev, rows_per, w] marking each
        row's repair slot, and the phi-column indicator in ELL layout."""
        ell = self._build_ell()
        n_dev, max_nnz = self._pad_mask_np.shape
        w = ell["w"]
        rs = np.asarray(repair_slots_padded).reshape(n_dev, self.rows_per)
        k = rs - np.arange(n_dev)[:, None] * max_nnz
        k = np.clip(k, 0, max_nnz - 1)
        pos = ell["pos_of_np"][np.arange(n_dev)[:, None], k]
        pos = np.clip(pos, 0, self.rows_per * w - 1)
        onehot = np.zeros((n_dev, w * self.rows_per), dtype=np.float32)
        # scatter ONLY for real rows: pad rows carry slot 0 from
        # apply_dof_remap, and their clipped positions would land inside
        # ANOTHER row's one-hot (doubling that row's repair)
        d_idx, r_idx = np.nonzero(self._deg_np > 0)
        onehot[d_idx, pos[d_idx, r_idx]] = 1.0
        onehot = onehot.reshape(n_dev, w, self.rows_per)
        mask = np.asarray(phi_col_mask_vals).reshape(n_dev, max_nnz)
        gather = np.asarray(ell["gather"])
        mask_ell = (np.take_along_axis(
            mask, gather.reshape(n_dev, -1), axis=1)
            .reshape(n_dev, w, self.rows_per).astype(np.float32)
            * np.asarray(ell["mask"]))
        return jnp.asarray(onehot), jnp.asarray(mask_ell)

    def make_matvec_df_fn(self, device_mesh: Mesh, repair: bool = False):
        """Compensated (double-f32) halo matvec: (arrays, vals_shards,
        xh, xl) -> (yh, yl), everything sharded over the device mesh.

        vals_shards are plain f32 assembly values in the padded layout; with
        repair=True the arrays must carry "repair_onehot"/"phi_mask_ell"
        (from `ell_repair_onehot`) and the matvec applies the exact
        discrete-nullspace repair in the lo part, device-locally.
        """
        from knp_emi_cgx_tpu.solvers.df32 import (df_from_f32, df_mul,
                                                  df_scale_f32, df_sum,
                                                  fast_two_sum)

        ell = self._build_ell()
        axis = self.axis
        rows_per = self.rows_per
        deltas = self.deltas
        n_dev = self.n_devices

        def local_mv(vals_blk, gather_blk, mask_blk, cols_blk,
                     rep_blk, phim_blk, xh_blk, xl_blk, *send_blks):
            xh_own, xl_own = xh_blk[0], xl_blk[0]
            parts_h, parts_l = [xh_own], [xl_own]
            for delta, sidx in zip(deltas, send_blks):
                payload = jnp.stack([xh_own[sidx[0]], xl_own[sidx[0]]])
                perm = [(i, (i - delta) % n_dev) for i in range(n_dev)]
                received = jax.lax.ppermute(payload, axis, perm)
                parts_h.append(received[0])
                parts_l.append(received[1])
            xh_ext = jnp.concatenate(parts_h)
            xl_ext = jnp.concatenate(parts_l)

            ell_h = vals_blk[0][gather_blk[0]] * mask_blk[0]   # [w, rows_per]
            gxh = xh_ext[cols_blk[0]]
            gxl = xl_ext[cols_blk[0]]
            if repair:
                sh, sl = df_sum(*df_from_f32(ell_h * phim_blk[0]), axis=0)
                rowsum = sh + sl
                ell_l = -rowsum[None, :] * rep_blk[0]
                ph, pl = df_mul(ell_h, ell_l, gxh, gxl)
            else:
                ph, pl = df_scale_f32(gxh, gxl, ell_h)
            yh, yl = df_sum(ph, pl, axis=0)
            return yh[None], yl[None]

        in_specs = [P(axis, None)] + [P(axis, None, None)] * 3 \
            + [P(axis, None, None), P(axis, None, None)] \
            + [P(axis, None)] * 2 + [P(axis, None)] * len(deltas)
        mv = jax.shard_map(local_mv, mesh=device_mesh,
                           in_specs=tuple(in_specs),
                           out_specs=(P(axis, None), P(axis, None)))

        dummy = jnp.zeros((n_dev, 1, 1), dtype=jnp.float32)
        arrays = {"gather": ell["gather"], "mask": ell["mask"],
                  "cols": ell["cols"],
                  "repair_onehot": dummy, "phi_mask_ell": dummy,
                  "send": tuple(self.send_idx[d] for d in deltas)}

        def matvec(arrays, vals_shards, xh, xl):
            yh, yl = mv(vals_shards,
                        arrays["gather"], arrays["mask"], arrays["cols"],
                        arrays["repair_onehot"], arrays["phi_mask_ell"],
                        xh.reshape(n_dev, rows_per),
                        xl.reshape(n_dev, rows_per),
                        *arrays["send"])
            return yh.reshape(-1), yl.reshape(-1)

        return matvec, arrays

    def make_ell_df_fn(self, device_mesh: Mesh, repair: bool = False):
        """Per-solve ELL value precompute: (arrays, vals_shards) ->
        (ell_h, ell_l), both [n_dev, w, rows_per], sharded.

        The sharded analog of `solvers.df32.repaired_ell_values`: the value
        gather and (with repair=True) the nullspace-repair row sums are
        computed ONCE per assembled operator instead of inside every matvec
        — pair with `make_matvec_df_ell_fn`.  Bit-identical results: the
        same ops run on the same data, just hoisted out of the Krylov loop.
        """
        from knp_emi_cgx_tpu.solvers.df32 import df_from_f32, df_sum

        ell = self._build_ell()
        axis = self.axis
        n_dev = self.n_devices

        def local_vals(vals_blk, gather_blk, mask_blk, rep_blk, phim_blk):
            ell_h = vals_blk[0][gather_blk[0]] * mask_blk[0]  # [w, rows_per]
            if repair:
                sh, sl = df_sum(*df_from_f32(ell_h * phim_blk[0]), axis=0)
                rowsum = sh + sl
                ell_l = -rowsum[None, :] * rep_blk[0]
            else:
                ell_l = jnp.zeros_like(ell_h)
            return ell_h[None], ell_l[None]

        spec3 = P(axis, None, None)
        fn = jax.shard_map(local_vals, mesh=device_mesh,
                           in_specs=(P(axis, None), spec3, spec3, spec3,
                                     spec3),
                           out_specs=(spec3, spec3))

        dummy = jnp.zeros((n_dev, 1, 1), dtype=jnp.float32)
        arrays = {"gather": ell["gather"], "mask": ell["mask"],
                  "repair_onehot": dummy, "phi_mask_ell": dummy}

        def ell_values(arrays, vals_shards):
            return fn(vals_shards, arrays["gather"], arrays["mask"],
                      arrays["repair_onehot"], arrays["phi_mask_ell"])

        return ell_values, arrays

    def make_matvec_df_ell_fn(self, device_mesh: Mesh, with_lo: bool = True):
        """Compensated halo matvec over PRECOMPUTED ELL values.

        with_lo=True:  matvec(arrays, ell_h, ell_l, xh, xl) — df32 operator
        values (nullspace-repaired system matrices, `make_ell_df_fn`).
        with_lo=False: matvec(arrays, ell_h, xh, xl) — plain f32 values
        (static preconditioner operators, `ell_values_np`).

        Saves the per-call value gather (+ repair row sums) of
        `make_matvec_df_fn` — ~2x on the system matvec at tissue scale.
        """
        from knp_emi_cgx_tpu.solvers.df32 import (df_mul, df_scale_f32,
                                                  df_sum)

        ell = self._build_ell()
        axis = self.axis
        rows_per = self.rows_per
        deltas = self.deltas
        n_dev = self.n_devices

        def local_mv(ellh_blk, elll_blk, cols_blk, xh_blk, xl_blk,
                     *send_blks):
            xh_own, xl_own = xh_blk[0], xl_blk[0]
            parts_h, parts_l = [xh_own], [xl_own]
            for delta, sidx in zip(deltas, send_blks):
                payload = jnp.stack([xh_own[sidx[0]], xl_own[sidx[0]]])
                perm = [(i, (i - delta) % n_dev) for i in range(n_dev)]
                received = jax.lax.ppermute(payload, axis, perm)
                parts_h.append(received[0])
                parts_l.append(received[1])
            xh_ext = jnp.concatenate(parts_h)
            xl_ext = jnp.concatenate(parts_l)
            gxh = xh_ext[cols_blk[0]]
            gxl = xl_ext[cols_blk[0]]
            if with_lo:
                ph, pl = df_mul(ellh_blk[0], elll_blk[0], gxh, gxl)
            else:
                ph, pl = df_scale_f32(gxh, gxl, ellh_blk[0])
            yh, yl = df_sum(ph, pl, axis=0)
            return yh[None], yl[None]

        spec3 = P(axis, None, None)
        in_specs = [spec3] * (3 if with_lo else 2) \
            + [P(axis, None)] * 2 + [P(axis, None)] * len(deltas)
        if not with_lo:
            def wrapped(ellh, cols, xh, xl, *send):
                return local_mv(ellh, None, cols, xh, xl, *send)
            body = wrapped
        else:
            body = local_mv
        mv = jax.shard_map(body, mesh=device_mesh,
                           in_specs=tuple(in_specs),
                           out_specs=(P(axis, None), P(axis, None)))

        arrays = {"cols": ell["cols"],
                  "send": tuple(self.send_idx[d] for d in deltas)}

        if with_lo:
            def matvec(arrays, ell_h, ell_l, xh, xl):
                yh, yl = mv(ell_h, ell_l, arrays["cols"],
                            xh.reshape(n_dev, rows_per),
                            xl.reshape(n_dev, rows_per), *arrays["send"])
                return yh.reshape(-1), yl.reshape(-1)
        else:
            def matvec(arrays, ell_h, xh, xl):
                yh, yl = mv(ell_h, arrays["cols"],
                            xh.reshape(n_dev, rows_per),
                            xl.reshape(n_dev, rows_per), *arrays["send"])
                return yh.reshape(-1), yl.reshape(-1)

        return matvec, arrays

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
