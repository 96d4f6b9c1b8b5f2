"""Dof-sharded smoothed-aggregation AMG preconditioner.

The reference runs hypre BoomerAMG *inside the parallel solve* — every MPI
rank smooths its own matrix rows and the hierarchy is distributed
(`KNPEMIx_solver.py:269-273` with PETSc MatMPIAIJ).  This module gives the
dof-sharded TPU path (parallel/dof_sharded.py) the same capability, replacing
the Chebyshev block preconditioner with the mesh-robust SA-AMG V-cycle of
solvers/amg.py:

  * ONE hierarchy is built (host, once) on the monolithic block-diagonal
    preconditioner matrix with `components` = field-block labels and
    per-component spectral bounds, so it is mathematically the per-block
    AMG of `BlockDiagonalPreconditioner(mode="amg")` — aggregates never
    span two field blocks and every smoothing weight is the block's own.
  * The FINE level (the dominant cost) is sharded over the device mesh in
    the SAME padded dof layout as the Krylov vectors: smoothing = halo
    ppermute SpMVs (parallel/halo_spmv.py) + per-dof Chebyshev-Jacobi
    weights; restriction = per-device partial products + one collective;
    prolongation = device-local rows.
  * Levels >= 1 are REPLICATED on every device (coarse-grid agglomeration,
    the standard parallel-AMG move — hypre agglomerates coarse grids too;
    ours agglomerates after the first coarsening, ~10x smaller than the
    fine level in 3D).  The replicated V-cycle reuses solvers/amg.py
    unchanged, so 8-device and 1-device applications agree to roundoff.

Both application precisions are provided: plain (f64/f32 storage dtype) and
compensated double-f32 (`apply_df`) — the production-tolerance path, where
the preconditioner must act as a fixed linear operator to ~2^-48 so the
df32 Krylov recurrence (solvers/df32.py) does not stall.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import scipy.sparse as sp

from knp_emi_cgx_tpu.parallel.halo_spmv import HaloSpMV
from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG


def monolithic_block_precond(assembler, u0_np):
    """The per-field preconditioner blocks (solvers/precond.py
    `_build_blocks` — the Benedusi P form) assembled into one monolithic
    block-diagonal CSR in the monolithic dof ordering, plus the per-dof
    field-block label.  Returns (Pm, block_of, offsets)."""
    from knp_emi_cgx_tpu.solvers.precond import _build_blocks

    blocks = _build_blocks(assembler, u0_np)
    sizes = [b.shape[0] for b in blocks]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    assert offsets[-1] == assembler.n_dofs
    Pm = sp.block_diag(blocks, format="csr")
    Pm.sort_indices()
    block_of = np.repeat(np.arange(len(blocks)), sizes)
    return Pm, block_of, offsets


def _transfer_ells(P0: sp.csr_matrix, dof_part: np.ndarray,
                   newpos: np.ndarray, rows_per: int, n_dev: int):
    """Per-device ELL layouts of the prolongation P0 (fine x coarse) for the
    sharded transfers.  Entries are grouped by the OWNING DEVICE of their
    fine dof (row of P = column of R), so both transfers touch only data
    the device already holds:

      prolong  [n_dev, wP, rows_per]: per fine-local row, coarse column ids
      restrict [n_dev, wR, nc]:       per coarse row, fine-LOCAL column ids

    Width-major layouts (TPU tiling, STATUS gotcha 7); zero-padded values
    make masks unnecessary (0 * x[anything] = 0).
    """
    coo = P0.tocoo()   # row-major, CSR order within rows
    nc = P0.shape[1]
    dev = dof_part[coo.row]
    r_loc_all = newpos[coo.row] - dev * rows_per

    # widths: max P-row nnz (prolong), max per (coarse row, device) (restrict)
    wP = int(np.diff(P0.indptr).max()) if P0.nnz else 1

    p_cols = np.zeros((n_dev, wP, rows_per), dtype=np.int32)
    p_vals = np.zeros((n_dev, wP, rows_per), dtype=np.float64)

    wR = 1
    r_entries = []
    for d in range(n_dev):
        sel = np.nonzero(dev == d)[0]
        r_loc = r_loc_all[sel]
        # prolong layout: j-th entry of each fine-local row
        order = np.argsort(r_loc, kind="stable")
        rs = r_loc[order]
        starts = np.searchsorted(rs, np.arange(rows_per))
        j = np.arange(len(rs)) - starts[rs]
        p_cols[d, j, rs] = coo.col[sel][order]
        p_vals[d, j, rs] = coo.data[sel][order]
        # restrict layout: j-th entry of each coarse row on this device
        cs_order = np.argsort(coo.col[sel], kind="stable")
        cs = coo.col[sel][cs_order]
        cstarts = np.searchsorted(cs, np.arange(nc))
        cj = np.arange(len(cs)) - cstarts[cs]
        wR = max(wR, int(cj.max()) + 1 if len(cj) else 1)
        r_entries.append((cs, cj, r_loc[cs_order], coo.data[sel][cs_order]))

    r_cols = np.zeros((n_dev, wR, nc), dtype=np.int32)
    r_vals = np.zeros((n_dev, wR, nc), dtype=np.float64)
    for d, (cs, cj, rl, vals) in enumerate(r_entries):
        r_cols[d, cj, cs] = rl
        r_vals[d, cj, cs] = vals
    return p_cols, p_vals, r_cols, r_vals


class ShardedAMG:
    """SA-AMG V-cycle applied to padded dof-sharded vectors.

    Drop-in for `ShardedChebyshevPreconditioner` in the dof-sharded step:
    `__call__(r)` (plain) and `apply_df(rh, rl)` (compensated double-f32),
    plus the `device_state()/install()` bundle protocol.
    """

    def __init__(self, assembler, u0, dof_part, device_mesh: Mesh,
                 axis: str = "cells", df: bool = False, cache: bool = False,
                 smooth_iters: int = 2, coarse_on_device0: bool = False,
                 shard_levels: int = 1, matrix: sp.csr_matrix | None = None,
                 components: np.ndarray | None = None,
                 block_pairs: np.ndarray | None = None,
                 per_component_lam: bool | None = None,
                 dtype=None, **amg_kwargs):
        """Default construction builds the KNP-EMI monolithic block-diagonal
        preconditioner from (assembler, u0).  Pass `matrix` to shard an AMG
        hierarchy on an ARBITRARY SPD CSR instead (e.g. the whole EMI
        operator with `components`/`block_pairs` — the membrane-pair
        smoothing recipe); `assembler`/`u0` may then be None."""
        n_dev = device_mesh.devices.size
        self.axis = axis
        self.smooth_iters = int(smooth_iters)
        self.df = df

        if matrix is not None:
            Pm = matrix.tocsr()
            block_of = components
            n = Pm.shape[0]
            dtype = dtype or (assembler.dtype if assembler is not None
                              else jnp.float64)
            pcl = bool(per_component_lam)
        else:
            dtype = assembler.dtype
            n = assembler.n_dofs
            u0_np = np.asarray(u0, dtype=np.float64)
            Pm, block_of, _ = monolithic_block_precond(assembler, u0_np)
            pcl = True if per_component_lam is None else per_component_lam
        amg = SmoothedAggregationAMG(
            Pm, dtype=dtype, df=df, components=block_of,
            per_component_lam=pcl, smooth_iters=smooth_iters,
            block_pairs=block_pairs,
            keep_host=True, cache=cache, **amg_kwargs)
        self.amg = amg

        A0, P0, B0, lam0 = amg.host_levels[0]
        # level-0 smoothing operator: elementwise dinv when B0 is diagonal;
        # otherwise (pair-block smoothing, the EMI membrane recipe) B0 is a
        # static CSR applied as its own halo SpMV in the SAME dof layout —
        # 2x2 membrane pairs live on one vertex, so under a vertex-derived
        # partition B0 has (near-)empty halos, but the general path is used
        self._b0_diag = (B0 - sp.diags(B0.diagonal())).nnz == 0
        halo = HaloSpMV(A0.indptr, A0.indices, n, n_dev,
                        axis=axis, part=dof_part)
        self.halo = halo
        self._matvec, mv = halo.make_matvec_fn(device_mesh)

        npdt = np.dtype(dtype)
        lam_vec = np.broadcast_to(np.asarray(lam0, dtype=np.float64),
                                  (n,)).copy()
        dinv = np.asarray(B0.diagonal())

        def pad(v, fill=0.0):
            out = np.full(halo.n_padded, fill)
            out[halo.newpos] = v
            return out

        lam_pad = pad(lam_vec, fill=1.0)   # pad dofs: any positive value
        dinv_pad = pad(dinv)               # pad dofs stay exactly zero
        state = {
            "Avals": jnp.asarray(
                halo.shard_values_np(np.asarray(A0.data, dtype=npdt))),
            "dinv": jnp.asarray(dinv_pad.astype(npdt)),
            "w1": jnp.asarray((1.0 / (0.7 * lam_pad)).astype(npdt)),
            "w2": jnp.asarray((1.0 / (1.1 * lam_pad)).astype(npdt)),
            "newpos": jnp.asarray(halo.newpos),
            "mv": mv,
            "amg": amg.device_state(),
        }
        if not self._b0_diag:
            halo_b = HaloSpMV(B0.indptr, B0.indices, n, n_dev,
                              axis=axis, part=dof_part)
            self.halo_b = halo_b
            self._matvec_b, mv_b = halo_b.make_matvec_fn(device_mesh)
            state["mv_b"] = mv_b
            state["Bvals"] = jnp.asarray(
                halo_b.shard_values_np(np.asarray(B0.data, dtype=npdt)))

        # coarse_on_device0: run the replicated coarse hierarchy on device 0
        # only (lax.cond on the axis index) and broadcast the correction
        # with one psum.  On REAL multi-chip hardware replicated compute is
        # free (all chips run in parallel) and this flag should stay off;
        # on a 1-core virtual mesh the 8 device threads SERIALIZE, so the
        # replicated level-1 work costs 8x and dominates the V-cycle
        # (measured 37 s/apply at 603k dofs; the flag removes 7/8 of it).
        self.coarse_on_device0 = bool(coarse_on_device0)
        self._coarse0_k = {}
        self._coarse0_df_k = {}
        self._single_level = not amg.levels[0].has_P
        if not self._single_level:
            p_cols, p_vals, r_cols, r_vals = _transfer_ells(
                P0.tocsr(), np.asarray(dof_part), halo.newpos,
                halo.rows_per, n_dev)
            state["p_cols"] = jnp.asarray(p_cols)
            state["p_vals"] = jnp.asarray(p_vals.astype(npdt))
            state["r_cols"] = jnp.asarray(r_cols)
            state["r_vals"] = jnp.asarray(r_vals.astype(npdt))
            self._nc = r_cols.shape[2]
            self._build_transfer_fns(device_mesh, n_dev)
            if self.coarse_on_device0:
                self._build_coarse_fns(device_mesh)

        if df:
            # static operator: ELL values gathered once at setup, hot-loop
            # matvecs skip the per-call gather (make_matvec_df_ell_fn)
            self._matvec_df, mv_df = halo.make_matvec_df_ell_fn(
                device_mesh, with_lo=False)
            state["mv_df"] = mv_df
            state["Avals_f"] = jnp.asarray(
                halo.ell_values_np(np.asarray(A0.data, dtype=np.float32)))
            if self._b0_diag:
                dinv_f = dinv_pad.astype(np.float32)
                state["wd1"] = jnp.asarray(
                    (1.0 / (0.7 * lam_pad)).astype(np.float32) * dinv_f)
                state["wd2"] = jnp.asarray(
                    (1.0 / (1.1 * lam_pad)).astype(np.float32) * dinv_f)
            else:
                # matrix B0: the Chebyshev weight cannot be folded into a
                # diagonal — apply B0 as a df ELL halo matvec, then scale
                self._matvec_df_b, mv_df_b = self.halo_b.make_matvec_df_ell_fn(
                    device_mesh, with_lo=False)
                state["mv_df_b"] = mv_df_b
                state["Bvals_f"] = jnp.asarray(self.halo_b.ell_values_np(
                    np.asarray(B0.data, dtype=np.float32)))
                state["wd1"] = jnp.asarray(
                    (1.0 / (0.7 * lam_pad)).astype(np.float32))
                state["wd2"] = jnp.asarray(
                    (1.0 / (1.1 * lam_pad)).astype(np.float32))
            if not self._single_level:
                state["p_vals_f"] = jnp.asarray(p_vals.astype(np.float32))
                state["r_vals_f"] = jnp.asarray(r_vals.astype(np.float32))

        # shard_levels=2: shard LEVEL 1 as well (the remaining ~50% of the
        # V-cycle after the coarsening fix), agglomerating only from level 2
        # — the hierarchy is then pod-scalable: replicated work shrinks to
        # the ~1k-dof tail.  Opt-in; shard_levels=1 keeps the proven path.
        self.shard_levels = 1
        if (shard_levels >= 2 and not self._single_level
                and self.amg.levels[1].has_P):
            A1, P1, B1, lam1 = amg.host_levels[1]
            if (B1 - sp.diags(B1.diagonal())).nnz == 0:
                self._setup_level1(A1, P1.tocsr(), B1, lam1, P0.tocsr(),
                                   np.asarray(dof_part), device_mesh,
                                   n_dev, npdt, df, state)
                self.shard_levels = 2
        self._state = state

    # ------------------------------------------------------------------
    def _build_transfer_fns(self, device_mesh, n_dev):
        axis = self.axis
        rows_per = self.halo.rows_per

        def local_restrict(vals, cols, x_blk):
            partial = (vals[0] * x_blk[0][cols[0]]).sum(axis=0)
            return jax.lax.psum(partial, axis)

        self._restrict = jax.shard_map(
            local_restrict, mesh=device_mesh,
            in_specs=(P(axis, None, None), P(axis, None, None),
                      P(axis, None)),
            out_specs=P())

        def local_prolong(vals, cols, xc):
            return (vals[0] * xc[cols[0]]).sum(axis=0)[None]

        self._prolong = jax.shard_map(
            local_prolong, mesh=device_mesh,
            in_specs=(P(axis, None, None), P(axis, None, None), P()),
            out_specs=P(axis, None))

        from knp_emi_cgx_tpu.solvers.df32 import df_scale_f32, df_sum

        def local_restrict_df(vals, cols, xh_blk, xl_blk):
            ph, pl = df_scale_f32(xh_blk[0][cols[0]], xl_blk[0][cols[0]],
                                  vals[0])
            sh, sl = df_sum(ph, pl, axis=0)            # [nc] partial
            # compensated cross-device reduction: gather the n_dev partial
            # pairs and df_add-tree them locally (a plain psum would round
            # in f32 and break the ~2^-48 operator accuracy)
            g = jax.lax.all_gather(jnp.stack([sh, sl]), axis)
            return df_sum(g[:, 0], g[:, 1], axis=0)

        # check_vma=False: the result IS replicated (all_gather output is
        # identical on every device and the df_add tree is deterministic),
        # but the static checker cannot infer replication through all_gather
        self._restrict_df = jax.shard_map(
            local_restrict_df, mesh=device_mesh,
            in_specs=(P(axis, None, None), P(axis, None, None),
                      P(axis, None), P(axis, None)),
            out_specs=(P(), P()), check_vma=False)

        def local_prolong_df(vals, cols, xch, xcl):
            ph, pl = df_scale_f32(xch[cols[0]], xcl[cols[0]], vals[0])
            yh, yl = df_sum(ph, pl, axis=0)
            return yh[None], yl[None]

        self._prolong_df = jax.shard_map(
            local_prolong_df, mesh=device_mesh,
            in_specs=(P(axis, None, None), P(axis, None, None), P(), P()),
            out_specs=(P(axis, None), P(axis, None)))

    # ------------------------------------------------------------------
    def _build_coarse_fns(self, device_mesh, k: int = 1):
        """Device-0-only replicated-tail cycle starting at hierarchy level
        k (lax.cond on the axis index + one psum broadcast)."""
        axis = self.axis
        amg = self.amg

        def local_coarse(st_amg, rc):
            old = amg.install(st_amg)
            try:
                out = jax.lax.cond(
                    jax.lax.axis_index(axis) == 0,
                    lambda _: amg._cycle(k, rc),
                    lambda _: jnp.zeros_like(rc), None)
                return jax.lax.psum(out, axis)
            finally:
                amg.install(old)

        self._coarse0_k[k] = jax.shard_map(
            local_coarse, mesh=device_mesh, in_specs=(P(), P()),
            out_specs=P())

        def local_coarse_df(st_amg, rch, rcl):
            old = amg.install(st_amg)
            try:
                out = jax.lax.cond(
                    jax.lax.axis_index(axis) == 0,
                    lambda _: jnp.stack(amg._cycle_df(k, rch, rcl)),
                    lambda _: jnp.zeros((2,) + rch.shape, rch.dtype), None)
                s = jax.lax.psum(out, axis)
                return s[0], s[1]
            finally:
                amg.install(old)

        self._coarse0_df_k[k] = jax.shard_map(
            local_coarse_df, mesh=device_mesh, in_specs=(P(), P(), P()),
            out_specs=(P(), P()))

    def _coarse_cycle(self, st, rc, k: int = 1):
        if self.coarse_on_device0:
            return self._coarse0_k[k](st["amg"], rc)
        return self.amg._cycle(k, rc)

    def _coarse_cycle_df(self, st, rch, rcl, k: int = 1):
        if self.coarse_on_device0:
            return self._coarse0_df_k[k](st["amg"], rch, rcl)
        return self.amg._cycle_df(k, rch, rcl)

    # ------------------------------------------------------------------
    def _setup_level1(self, A1, P1, B1, lam1, P0, dof_part, device_mesh,
                      n_dev, npdt, df, state):
        """Shard hierarchy level 1: its own halo plan over a coarse-dof
        partition (each coarse dof owned by the device holding the
        plurality of its fine rows — aggregate locality makes this cheap),
        sharded smoothing, and level-1<->2 transfers in the same per-device
        ELL form as level 0's."""
        n1 = A1.shape[0]
        coo = P0.tocoo()
        dev = dof_part[coo.row]
        cnt = np.bincount(coo.col.astype(np.int64) * n_dev + dev,
                          minlength=n1 * n_dev).reshape(n1, n_dev)
        part1 = cnt.argmax(axis=1).astype(np.int32)
        halo1 = HaloSpMV(A1.indptr, A1.indices, n1, n_dev,
                         axis=self.axis, part=part1)
        self.halo1 = halo1
        self._matvec1, mv1 = halo1.make_matvec_fn(device_mesh)

        lam_vec1 = np.broadcast_to(np.asarray(lam1, dtype=np.float64),
                                   (n1,)).copy()
        dinv1 = np.asarray(B1.diagonal())

        def pad1(v, fill=0.0):
            out = np.full(halo1.n_padded, fill)
            out[halo1.newpos] = v
            return out

        lam_pad1 = pad1(lam_vec1, fill=1.0)
        dinv_pad1 = pad1(dinv1)
        # replicated [n1] coarse vector <-> padded level-1 layout maps
        pos_to_orig = np.zeros(halo1.n_padded, dtype=np.int64)
        mask1 = np.zeros(halo1.n_padded)
        pos_to_orig[halo1.newpos] = np.arange(n1)
        mask1[halo1.newpos] = 1.0

        p_cols1, p_vals1, r_cols1, r_vals1 = _transfer_ells(
            P1, part1, halo1.newpos, halo1.rows_per, n_dev)
        state.update({
            "Avals_l1": jnp.asarray(
                halo1.shard_values_np(np.asarray(A1.data, dtype=npdt))),
            "dinv_l1": jnp.asarray(dinv_pad1.astype(npdt)),
            "w1_l1": jnp.asarray((1.0 / (0.7 * lam_pad1)).astype(npdt)),
            "w2_l1": jnp.asarray((1.0 / (1.1 * lam_pad1)).astype(npdt)),
            "mv_l1": mv1,
            "pos_l1": jnp.asarray(pos_to_orig.astype(np.int32)),
            "mask_l1": jnp.asarray(mask1.astype(npdt)),
            "newpos_l1": jnp.asarray(halo1.newpos.astype(np.int32)),
            "p_cols_l1": jnp.asarray(p_cols1),
            "p_vals_l1": jnp.asarray(p_vals1.astype(npdt)),
            "r_cols_l1": jnp.asarray(r_cols1),
            "r_vals_l1": jnp.asarray(r_vals1.astype(npdt)),
        })
        if df:
            self._matvec_df1, mv_df1 = halo1.make_matvec_df_ell_fn(
                device_mesh, with_lo=False)
            dinv1_f = dinv_pad1.astype(np.float32)
            state.update({
                "mv_df_l1": mv_df1,
                "Avals_f_l1": jnp.asarray(halo1.ell_values_np(
                    np.asarray(A1.data, dtype=np.float32))),
                "wd1_l1": jnp.asarray(
                    (1.0 / (0.7 * lam_pad1)).astype(np.float32) * dinv1_f),
                "wd2_l1": jnp.asarray(
                    (1.0 / (1.1 * lam_pad1)).astype(np.float32) * dinv1_f),
                "p_vals_f_l1": jnp.asarray(p_vals1.astype(np.float32)),
                "r_vals_f_l1": jnp.asarray(r_vals1.astype(np.float32)),
                "mask_f_l1": jnp.asarray(mask1.astype(np.float32)),
            })
        if self.coarse_on_device0:
            self._build_coarse_fns(device_mesh, k=2)

    # ------------------------------------------------------------------
    def _smooth_level(self, st, x, r, sfx, matvec):
        for it in range(self.smooth_iters):
            w = st["w1" + sfx] if it % 2 == 0 else st["w2" + sfx]
            rr = r - matvec(st["mv" + sfx], st["Avals" + sfx], x)
            if sfx == "" and not self._b0_diag:
                u = self._matvec_b(st["mv_b"], st["Bvals"], rr)
            else:
                u = st["dinv" + sfx] * rr
            x = x + w * u
        return x

    def _smooth0(self, st, x, r):
        return self._smooth_level(st, x, r, "", self._matvec)

    def _level1_cycle(self, st, rc):
        n_dev = self.halo1.n_devices
        r1 = rc[st["pos_l1"]] * st["mask_l1"]
        x1 = self._smooth_level(st, jnp.zeros_like(r1), r1, "_l1",
                                self._matvec1)
        resid = r1 - self._matvec1(st["mv_l1"], st["Avals_l1"], x1)
        rc2 = self._restrict(st["r_vals_l1"], st["r_cols_l1"],
                             resid.reshape(n_dev, -1))
        xc2 = self._coarse_cycle(st, rc2, k=2)
        x1 = x1 + self._prolong(st["p_vals_l1"], st["p_cols_l1"],
                                xc2).reshape(-1)
        x1 = self._smooth_level(st, x1, r1, "_l1", self._matvec1)
        return x1[st["newpos_l1"]]

    def __call__(self, r):
        st = self._state
        if self._single_level:
            rfull = r[st["newpos"]]
            x = self.amg._cycle(0, rfull)
            return jnp.zeros_like(r).at[st["newpos"]].set(x)
        n_dev = self.halo.n_devices
        x = self._smooth0(st, jnp.zeros_like(r), r)
        resid = r - self._matvec(st["mv"], st["Avals"], x)
        rc = self._restrict(st["r_vals"], st["r_cols"],
                            resid.reshape(n_dev, -1))
        if self.shard_levels >= 2:
            xc = self._level1_cycle(st, rc)
        else:
            xc = self._coarse_cycle(st, rc)
        x = x + self._prolong(st["p_vals"], st["p_cols"], xc).reshape(-1)
        return self._smooth0(st, x, r)

    # ------------------------------------------------------------------
    def _smooth_level_df(self, st, xh, xl, bh, bl, sfx, matvec_df):
        from knp_emi_cgx_tpu.solvers.df32 import df_add, df_scale_f32

        b0_mat = sfx == "" and not self._b0_diag
        for it in range(self.smooth_iters):
            wd = st["wd1" + sfx] if it % 2 == 0 else st["wd2" + sfx]
            yh, yl = matvec_df(st["mv_df" + sfx], st["Avals_f" + sfx],
                               xh, xl)
            rh, rl = df_add(bh, bl, -yh, -yl)
            if b0_mat:
                rh, rl = self._matvec_df_b(st["mv_df_b"], st["Bvals_f"],
                                           rh, rl)
            uh, ul = df_scale_f32(rh, rl, wd)
            xh, xl = df_add(xh, xl, uh, ul)
        return xh, xl

    def _smooth0_df(self, st, xh, xl, bh, bl):
        return self._smooth_level_df(st, xh, xl, bh, bl, "",
                                     self._matvec_df)

    def _level1_cycle_df(self, st, rch, rcl):
        from knp_emi_cgx_tpu.solvers.df32 import df_add, df_zeros_like

        n_dev = self.halo1.n_devices
        r1h = rch[st["pos_l1"]] * st["mask_f_l1"]
        r1l = rcl[st["pos_l1"]] * st["mask_f_l1"]
        z = df_zeros_like(r1h)
        x1h, x1l = self._smooth_level_df(st, z[0], z[1], r1h, r1l, "_l1",
                                         self._matvec_df1)
        yh, yl = self._matvec_df1(st["mv_df_l1"], st["Avals_f_l1"],
                                  x1h, x1l)
        resh, resl = df_add(r1h, r1l, -yh, -yl)
        rc2h, rc2l = self._restrict_df(st["r_vals_f_l1"], st["r_cols_l1"],
                                       resh.reshape(n_dev, -1),
                                       resl.reshape(n_dev, -1))
        xc2h, xc2l = self._coarse_cycle_df(st, rc2h, rc2l, k=2)
        e1h, e1l = self._prolong_df(st["p_vals_f_l1"], st["p_cols_l1"],
                                    xc2h, xc2l)
        x1h, x1l = df_add(x1h, x1l, e1h.reshape(-1), e1l.reshape(-1))
        x1h, x1l = self._smooth_level_df(st, x1h, x1l, r1h, r1l, "_l1",
                                         self._matvec_df1)
        return x1h[st["newpos_l1"]], x1l[st["newpos_l1"]]

    def apply_df(self, rh, rl):
        from knp_emi_cgx_tpu.solvers.df32 import df_add, df_zeros_like

        st = self._state
        if self._single_level:
            rfh, rfl = rh[st["newpos"]], rl[st["newpos"]]
            xh, xl = self.amg._cycle_df(0, rfh, rfl)
            z = df_zeros_like(rh)
            return (z[0].at[st["newpos"]].set(xh),
                    z[1].at[st["newpos"]].set(xl))
        n_dev = self.halo.n_devices
        z = df_zeros_like(rh)
        xh, xl = self._smooth0_df(st, z[0], z[1], rh, rl)
        yh, yl = self._matvec_df(st["mv_df"], st["Avals_f"], xh, xl)
        resh, resl = df_add(rh, rl, -yh, -yl)
        rch, rcl = self._restrict_df(st["r_vals_f"], st["r_cols"],
                                     resh.reshape(n_dev, -1),
                                     resl.reshape(n_dev, -1))
        if self.shard_levels >= 2:
            xch, xcl = self._level1_cycle_df(st, rch, rcl)
        else:
            xch, xcl = self._coarse_cycle_df(st, rch, rcl)
        eh, el = self._prolong_df(st["p_vals_f"], st["p_cols"], xch, xcl)
        xh, xl = df_add(xh, xl, eh.reshape(-1), el.reshape(-1))
        return self._smooth0_df(st, xh, xl, rh, rl)

    # -- device-array bundling (utils/devicestate.py pattern) --
    def device_state(self):
        st = dict(self._state)
        st["amg"] = self.amg.device_state()
        return st

    def install(self, st):
        old = dict(self._state)
        old["amg"] = self.amg.install(st["amg"])
        self._state = st
        return old
