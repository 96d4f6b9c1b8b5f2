"""Device-side assembly of the KNP-EMI block operator and right-hand side.

TPU-first re-design of the reference's UFL weak form + multiphenicsx block
assembly (`KNPEMIx_problem.py:454-655`, `KNPEMIx_solver.py:104-116`):

* The monolithic system over 2*(N_ions+1) scalar CG1 fields is stored as ONE
  static-sparsity CSR matrix.  Sparsity, dof restrictions (multiphenicsx
  `DofMapRestriction` equivalent) and all index maps are computed once on the
  host (numpy); per-step assembly on device only recomputes VALUES.
* Volume terms are exact closed-form P1 element tensors (see fem/p1.py) —
  the time-invariant part (mass + diffusion, and the (phi,k) flux-divergence
  coupling) is pre-summed into `A_static_vals`; only drift terms weighted by
  previous concentrations, the membrane coupling blocks and the RHS are
  recomputed per step, via a single fused gather → vectorised math →
  `segment_sum` scatter.  No dynamic shapes, no host sync.
* Membrane-facet integrands (Nernst potentials, channel currents, alpha
  fractions — `KNPEMIx_problem.py:504-651`) are evaluated at Gauss points of
  the same degree-10 accuracy as the reference's quadrature metadata.

Field ordering matches the reference block layout (`KNPEMIx_problem.py:46-48`):
  [ion_0_i .. ion_{N-1}_i, phi_i, ion_0_e .. ion_{N-1}_e, phi_e]
with intra fields restricted to the closure of the intracellular cells and
extra fields to the extracellular closure.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.fem.p1 import (
    cell_geometry,
    facet_geometry,
    facet_quadrature,
    reference_mass,
)
from knp_emi_cgx_tpu.mesh.topology import MeshTopology
from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley


class KNPEMIAssembler:
    """Precomputes static structure; exposes jittable `assemble`."""

    def __init__(self, topo: MeshTopology, params, models,
                 dtype=jnp.float64,
                 dirichlet_bcs: bool = False,
                 pinned_dofs: np.ndarray | None = None,
                 source_vertex_values: dict | None = None,
                 mms=None,
                 pad_multiple: int = 1):
        """pad_multiple: pad per-cell and per-facet dynamic work arrays to a
        multiple of this count (zero-measure dummy entries anchored at a
        membrane vertex, contributing exact zeros) so they shard evenly
        across a device mesh."""
        self.topo = topo
        self.params = params
        self.models = list(models)
        self.dtype = dtype
        self.dirichlet_bcs = dirichlet_bcs
        self.mms = mms
        self.pad_multiple = max(1, int(pad_multiple))

        p = params
        mesh = topo.mesh
        dim = mesh.dim
        nv = dim + 1
        self.N_ions = N = p.N_ions
        self.nvar = nvar = N + 1
        self.nf = nf = 2 * nvar
        self.PHI_I = N
        self.PHI_E = nvar + N
        nV = mesh.num_points

        # ------------------------------------------------------------------
        # Dof restrictions and monolithic numbering
        # ------------------------------------------------------------------
        intra = topo.intra_dofs
        extra = topo.extra_dofs
        ni, ne = len(intra), len(extra)
        self.ni, self.ne = ni, ne
        self.n_dofs = nvar * (ni + ne)

        intra_rank = np.full(nV, -1, dtype=np.int64)
        intra_rank[intra] = np.arange(ni)
        extra_rank = np.full(nV, -1, dtype=np.int64)
        extra_rank[extra] = np.arange(ne)

        # field_dof[f, v] -> monolithic index (or huge sentinel if inactive)
        field_dof = np.full((nf, nV), -1, dtype=np.int64)
        for f in range(nvar):
            field_dof[f] = np.where(intra_rank >= 0, f * ni + intra_rank, -1)
        base = nvar * ni
        for f in range(nvar, nf):
            field_dof[f] = np.where(
                extra_rank >= 0, base + (f - nvar) * ne + extra_rank, -1)
        self.field_dof = field_dof

        # ------------------------------------------------------------------
        # Dirichlet boundary dofs (KNPEMIx_problem.py:96-198)
        # ------------------------------------------------------------------
        bc_flag = np.zeros(self.n_dofs, dtype=bool)
        bc_const = np.zeros(self.n_dofs)
        if dirichlet_bcs:
            for f in range(nf):
                d = field_dof[f, topo.boundary_dofs]
                d = d[d >= 0]
                bc_flag[d] = True
                if mms is None:
                    # constant Dirichlet values from the initial conditions
                    # (KNPEMIx_problem.py:136-162): concentrations pinned to
                    # their inits, phi_i to phi_m_init, phi_e to 0
                    if f < nvar - 1:
                        bc_const[d] = p.ion_list[f]["ki_init"]
                    elif f == self.PHI_I:
                        bc_const[d] = p.phi_m_init
                    elif f != self.PHI_E:
                        bc_const[d] = p.ion_list[f - nvar]["ke_init"]
        if pinned_dofs is not None:
            bc_flag[np.asarray(pinned_dofs)] = True
        self.bc_flag_np = bc_flag
        self.const_bc_values_np = bc_const
        self.const_bc_values = jnp.asarray(bc_const, dtype=dtype)
        self.has_bcs = bool(bc_flag.any())

        # ------------------------------------------------------------------
        # Volume geometry per subdomain side
        # ------------------------------------------------------------------
        grads, vols = cell_geometry(mesh.points, mesh.cells)
        Mref = reference_mass(dim)
        self._sides = []
        mat_blocks = []   # (rows, cols) per dynamic matrix block, host order
        static_rows, static_cols, static_vals = [], [], []

        # a vertex active in every field's restriction (membrane vertices
        # belong to both compartment closures) — anchor for padded entries
        safe_vertex = int(topo.membrane_verts[0, 0]) if len(topo.membrane_verts) else 0
        pm = self.pad_multiple

        def _padded_count(n):
            return (-(-n // pm)) * pm if pm > 1 else n

        for side, cells_idx in (("i", topo.intra_cells), ("e", topo.extra_cells)):
            Vt = mesh.cells[cells_idx]                     # [nc, nv]
            g = grads[cells_idx]                           # [nc, nv, dim]
            v = vols[cells_idx]                            # [nc]
            K_e = np.einsum("cai,cbi->cab", g, g) * v[:, None, None]
            M_e = v[:, None, None] * Mref[None, :, :]
            n_pad = _padded_count(Vt.shape[0]) - Vt.shape[0]
            if n_pad:
                Vt = np.concatenate(
                    [Vt, np.full((n_pad, nv), safe_vertex, dtype=Vt.dtype)])
                K_e = np.concatenate([K_e, np.zeros((n_pad, nv, nv))])
                M_e = np.concatenate([M_e, np.zeros((n_pad, nv, nv))])
            phi_f = self.PHI_I if side == "i" else self.PHI_E
            ion_off = 0 if side == "i" else nvar
            Dkey = "Di" if side == "i" else "De"

            # --- static: (k,k) mass+diffusion and (phi,k) flux divergence ---
            for k, ion in enumerate(p.ion_list):
                D, z = ion[Dkey], ion["z"]
                kk = M_e + p.dt * D * K_e
                pk = p.dt * z * D * K_e
                r_k = field_dof[ion_off + k][Vt]           # [nc, nv]
                r_p = field_dof[phi_f][Vt]
                for blk, rows in ((kk, r_k), (pk, r_p)):
                    cols = field_dof[ion_off + k][Vt]
                    R = np.broadcast_to(rows[:, :, None], blk.shape)
                    C = np.broadcast_to(cols[:, None, :], blk.shape)
                    static_rows.append(R.ravel())
                    static_cols.append(C.ravel())
                    static_vals.append(blk.ravel())

            # --- dynamic blocks: (k,phi) drift and (phi,phi) ---
            for k in range(N):
                rows = field_dof[ion_off + k][Vt]
                cols = field_dof[phi_f][Vt]
                mat_blocks.append(self._bcast_pair(rows, cols, nv))
            rows = field_dof[phi_f][Vt]
            mat_blocks.append(self._bcast_pair(rows, rows, nv))

            self._sides.append({
                "side": side,
                "Vt": jnp.asarray(Vt, dtype=jnp.int32),
                "K_e": jnp.asarray(K_e, dtype=dtype),
                "M_e": jnp.asarray(M_e, dtype=dtype),
                "ion_off": ion_off,
                "phi_f": phi_f,
                "Dkey": Dkey,
                "Vt_np": Vt,
            })

        # ------------------------------------------------------------------
        # Membrane facet data
        # ------------------------------------------------------------------
        mverts = topo.membrane_verts                        # [n_mf, dim]
        membrane_tags = topo.membrane_tags
        Nq, wq = facet_quadrature(dim, degree=10)           # [nq, dim], [nq]
        self.nq = Nq.shape[0]
        L_f = facet_geometry(mesh.points, mverts)
        n_fpad = _padded_count(mverts.shape[0]) - mverts.shape[0]
        if n_fpad:
            mverts = np.concatenate(
                [mverts, np.full((n_fpad, dim), safe_vertex, dtype=mverts.dtype)])
            L_f = np.concatenate([L_f, np.zeros(n_fpad)])
            membrane_tags = np.concatenate(
                [membrane_tags, np.full(n_fpad, -1, dtype=membrane_tags.dtype)])
        self.n_mf = n_mf = mverts.shape[0]

        # per-model facet masks
        gamma_tags = np.unique(topo.membrane_tags)
        model_masks = []
        for m in self.models:
            tags = m.resolve_tags(gamma_tags.tolist())
            model_masks.append(np.isin(membrane_tags, tags))
        self.model_masks_np = model_masks

        # stimulus facet mask: facets whose tag is a stimulus tag AND which
        # belong to a HodgkinHuxley model's tags (KNPEMIx_problem.py:531-534)
        stim_tags = getattr(params, "stimulus_tags", None)
        if stim_tags is None:
            stim_tags = tuple(gamma_tags.tolist())
        stim_f = np.isin(membrane_tags, stim_tags)
        hh_f = np.zeros(n_mf, dtype=bool)
        for m, mask in zip(self.models, model_masks):
            if isinstance(m, HodgkinHuxley):
                hh_f |= mask
        self.stim_facet_mask_np = stim_f & hh_f
        # The reference unconditionally adds the stimulus for Na on HH models
        # whose tag is a stimulus tag (KNPEMIx_problem.py:531-546).
        self.has_stimulus = bool(self.stim_facet_mask_np.any())

        # spatial stimulus-region mask at quadrature points (static geometry)
        qp_x = np.einsum("fdk,qd->fqk", mesh.points[mverts], Nq)  # [n_mf, nq, dim]
        region = np.ones((n_mf, self.nq))
        sr_range = getattr(params, "stimulus_region_range", None)
        sr_dirs = getattr(params, "stimulus_region_directions", None)
        if sr_range is not None and sr_dirs:
            rng = np.atleast_2d(np.asarray(sr_range, dtype=float))
            for i, d in enumerate(sr_dirs):
                lo, hi = rng[i] if rng.shape[0] > 1 or len(sr_dirs) > 1 else rng[0]
                region *= ((qp_x[:, :, d] > lo) & (qp_x[:, :, d] < hi)).astype(float)
        self.region_qp_np = region

        # stimulus area: integral of region mask over stimulus-tagged facets
        # (KNPEMIx_ionic_model.py:591-601)
        self.stimulus_area = float(
            np.einsum("f,fq,q->", L_f * stim_f.astype(float), region, wq)
        )

        # facet matrix blocks: for each ion the 4 (k, phi) couplings, then the
        # 4 potential-row couplings — host index arrays in device value order
        fd = field_dof
        mv = mverts
        d = dim

        def fpair(rowf, colf):
            rows = fd[rowf][mv]                            # [n_mf, d]
            cols = fd[colf][mv]
            R = np.broadcast_to(rows[:, :, None], (n_mf, d, d))
            C = np.broadcast_to(cols[:, None, :], (n_mf, d, d))
            return R.ravel(), C.ravel()

        facet_blocks = []
        for k in range(N):
            facet_blocks += [fpair(k, self.PHI_I), fpair(k, self.PHI_E),
                             fpair(nvar + k, self.PHI_I), fpair(nvar + k, self.PHI_E)]
        facet_blocks += [fpair(self.PHI_I, self.PHI_I), fpair(self.PHI_I, self.PHI_E),
                         fpair(self.PHI_E, self.PHI_I), fpair(self.PHI_E, self.PHI_E)]

        # ------------------------------------------------------------------
        # Build global CSR pattern
        # ------------------------------------------------------------------
        dyn_rows = np.concatenate([b[0] for b in mat_blocks] + [b[0] for b in facet_blocks])
        dyn_cols = np.concatenate([b[1] for b in mat_blocks] + [b[1] for b in facet_blocks])
        st_rows = np.concatenate(static_rows)
        st_cols = np.concatenate(static_cols)
        st_vals = np.concatenate(static_vals)

        bc_dofs = np.nonzero(bc_flag)[0]
        all_rows = np.concatenate([st_rows, dyn_rows, bc_dofs])
        all_cols = np.concatenate([st_cols, dyn_cols, bc_dofs])
        if np.any(all_rows < 0) or np.any(all_cols < 0):
            raise RuntimeError("Assembly references an inactive dof")

        keys = all_rows * self.n_dofs + all_cols
        uniq = inv = None
        try:
            from knp_emi_cgx_tpu import native

            res = native.coalesce_coo(keys)
            if res is not None:
                uniq, inv = res
        except Exception:
            pass
        if uniq is None:
            uniq, inv = np.unique(keys, return_inverse=True)
        self.nnz = nnz = uniq.shape[0]
        # output sizes for the assembly scatters; rewritten by
        # apply_dof_remap for dof-sharded (padded, reordered) layouts
        self.nnz_out = nnz
        self.n_out = self.n_dofs
        csr_rows = (uniq // self.n_dofs).astype(np.int64)
        csr_cols = (uniq % self.n_dofs).astype(np.int64)
        indptr = np.zeros(self.n_dofs + 1, dtype=np.int64)
        np.add.at(indptr, csr_rows + 1, 1)
        indptr = np.cumsum(indptr)
        self.indptr = jnp.asarray(indptr, dtype=jnp.int32)
        self.indices = jnp.asarray(csr_cols, dtype=jnp.int32)
        from knp_emi_cgx_tpu.ops.spmv import expand_row_ids
        self.row_ids = expand_row_ids(indptr)
        self.csr_rows_np = csr_rows
        self.csr_cols_np = csr_cols

        n_st = st_rows.shape[0]
        n_dyn = dyn_rows.shape[0]
        st_slots = inv[:n_st]
        self.dyn_slots = jnp.asarray(inv[n_st:n_st + n_dyn], dtype=jnp.int32)
        bc_diag_slots = inv[n_st + n_dyn:]

        # BC masking of static values (rows and columns zeroed; unit diagonal)
        st_keep = (~bc_flag[st_rows]) & (~bc_flag[st_cols])
        A_static = np.zeros(nnz)
        np.add.at(A_static, st_slots, st_vals * st_keep)
        np.add.at(A_static, bc_diag_slots, 1.0)
        self.A_static_vals = jnp.asarray(A_static, dtype=dtype)

        # dynamic value masks (static row/col -> static keep factors)
        self.dyn_keep = jnp.asarray(
            ((~bc_flag[dyn_rows]) & (~bc_flag[dyn_cols])).astype(np.float64),
            dtype=dtype)

        # lifting structure for Dirichlet columns: b[row] -= A[row,col]*g[col]
        if self.has_bcs:
            lift_mask_st = (~bc_flag[st_rows]) & bc_flag[st_cols]
            self._lift_static = (
                jnp.asarray(st_vals * lift_mask_st, dtype=dtype),
                jnp.asarray(st_rows, dtype=jnp.int32),
                jnp.asarray(st_cols, dtype=jnp.int32),
            )
            self._lift_dyn_mask = jnp.asarray(
                ((~bc_flag[dyn_rows]) & bc_flag[dyn_cols]).astype(np.float64),
                dtype=dtype)
            self._dyn_rows = jnp.asarray(dyn_rows, dtype=jnp.int32)
            self._dyn_cols = jnp.asarray(dyn_cols, dtype=jnp.int32)
        self.bc_flag = jnp.asarray(bc_flag)

        # ------------------------------------------------------------------
        # RHS structure
        # ------------------------------------------------------------------
        rhs_rows = []
        for s in self._sides:
            ion_off = s["ion_off"]
            for k in range(N):
                rhs_rows.append(field_dof[ion_off + k][s["Vt_np"]].ravel())
        for f in list(range(N)) + [self.PHI_I]:
            rhs_rows.append(field_dof[f][mv].ravel())
        for f in list(range(nvar, nvar + N)) + [self.PHI_E]:
            rhs_rows.append(field_dof[f][mv].ravel())

        if mms is not None:
            self._setup_mms(rhs_rows, mverts, L_f, Nq, wq)

        self.rhs_rows = jnp.asarray(np.concatenate(rhs_rows), dtype=jnp.int32)
        self.rhs_keep = jnp.asarray(
            (~bc_flag[np.concatenate(rhs_rows)]).astype(np.float64), dtype=dtype)

        # device arrays for facet evaluation
        self.mverts = jnp.asarray(mverts, dtype=jnp.int32)
        self.Nq = jnp.asarray(Nq, dtype=dtype)            # [nq, d]
        self.wq = jnp.asarray(wq, dtype=dtype)
        self.L_f = jnp.asarray(L_f, dtype=dtype)
        self.model_masks = [jnp.asarray(m.astype(np.float64), dtype=dtype)
                            for m in model_masks]
        self.stim_facet_mask = jnp.asarray(
            self.stim_facet_mask_np.astype(np.float64), dtype=dtype)
        self.region_qp = jnp.asarray(region, dtype=dtype)

        # per-field vertex source arrays (ion injection etc.)
        src = np.zeros((nf, nV))
        for k, ion in enumerate(p.ion_list):
            src[k, :] = ion.get("f_i", 0.0)
            src[nvar + k, :] = ion.get("f_e", 0.0)
        if source_vertex_values:
            for f_idx, vals in source_vertex_values.items():
                src[f_idx] = vals
        self.src = jnp.asarray(src, dtype=dtype)

        # nullspace vector (constants on both potentials, normalised —
        # KNPEMIx_solver.py:297-335)
        ns = np.zeros(self.n_dofs)
        ns[field_dof[self.PHI_I][intra]] = 1.0
        ns[field_dof[self.PHI_E][extra]] = 1.0
        ns /= np.linalg.norm(ns)
        self.nullspace = jnp.asarray(ns, dtype=dtype)

    # -- device-array bundling (see utils/devicestate.py): every jnp array
    # the jitted step touches must be passed as an argument, not captured --
    DEVICE_ATTRS = (
        "A_static_vals", "dyn_slots", "dyn_keep", "rhs_rows", "rhs_keep",
        "indices", "indptr", "row_ids", "nullspace", "src", "bc_flag",
        "mverts", "Nq", "wq", "L_f", "stim_facet_mask", "region_qp",
        "_lift_dyn_mask", "_dyn_rows", "_dyn_cols",
        "_mms_arrays", "_mms_bc_entries", "const_bc_values",
    )
    SIDE_ATTRS = ("Vt", "K_e", "M_e")

    def device_state(self):
        from knp_emi_cgx_tpu.utils.devicestate import collect

        st = {"attrs": collect(self, self.DEVICE_ATTRS),
              "model_masks": list(self.model_masks),
              "sides": [{k: s[k] for k in self.SIDE_ATTRS}
                        for s in self._sides]}
        if self.has_bcs:
            st["lift_static"] = self._lift_static
        return st

    def install_device_state(self, st):
        from knp_emi_cgx_tpu.utils.devicestate import install

        old = self.device_state()
        install(self, st["attrs"])
        self.model_masks = st["model_masks"]
        for s, d in zip(self._sides, st["sides"]):
            s.update(d)
        if "lift_static" in st:
            self._lift_static = st["lift_static"]
        return old

    def apply_dof_remap(self, halo):
        """Re-target every assembly scatter into `halo`'s padded,
        device-contiguous dof layout (see parallel/halo_spmv.py): rows/dofs
        go through halo.newpos, CSR value slots through the inverse of
        halo.vals_gather.  After this call the assembler speaks the padded
        dof space exclusively — `assemble` returns values in the
        [n_devices * max_nnz] sharded layout and b/[bc_values]/nullspace as
        [halo.n_padded] vectors, so a dof-sharded solve never reindexes.

        This is the PETSc ADD_VALUES-into-MatMPIAIJ equivalent
        (KNPEMIx_solver.py:114): each device's assembly contributions land
        directly in the distributed storage.
        """
        if getattr(self, "_dof_remap", None) is not None:
            raise RuntimeError("apply_dof_remap may only be called once")
        newpos = np.asarray(halo.newpos)            # old dof -> padded pos
        vg = np.asarray(halo.vals_gather).ravel()   # padded slot -> old slot
        pm = np.asarray(halo.pad).ravel() > 0
        new_of = np.empty(self.nnz, dtype=np.int64)
        new_of[vg[pm]] = np.nonzero(pm)[0]
        dtype, it = self.dtype, jnp.int32

        self.dyn_slots = jnp.asarray(new_of[np.asarray(self.dyn_slots)],
                                     dtype=it)
        A_pad = np.zeros(vg.shape[0])
        A_pad[new_of] = np.asarray(self.A_static_vals)
        self.A_static_vals = jnp.asarray(A_pad, dtype=dtype)
        self.rhs_rows = jnp.asarray(newpos[np.asarray(self.rhs_rows)],
                                    dtype=it)

        bc_flag = np.zeros(halo.n_padded, dtype=bool)
        bc_flag[newpos] = self.bc_flag_np
        self.bc_flag = jnp.asarray(bc_flag)
        cbv = np.zeros(halo.n_padded)
        cbv[newpos] = self.const_bc_values_np
        self.const_bc_values = jnp.asarray(cbv, dtype=dtype)
        if self.has_bcs:
            sv, sr, sc = self._lift_static
            self._lift_static = (
                sv,
                jnp.asarray(newpos[np.asarray(sr)], dtype=it),
                jnp.asarray(newpos[np.asarray(sc)], dtype=it))
            self._dyn_rows = jnp.asarray(newpos[np.asarray(self._dyn_rows)],
                                         dtype=it)
            self._dyn_cols = jnp.asarray(newpos[np.asarray(self._dyn_cols)],
                                         dtype=it)
        ns = np.zeros(halo.n_padded)
        ns[newpos] = np.asarray(self.nullspace)
        self.nullspace = jnp.asarray(ns, dtype=dtype)
        if self.mms is not None:
            self._mms_bc_entries = {
                name: (jnp.asarray(newpos[np.asarray(dofs)], dtype=it), coords)
                for name, (dofs, coords) in self._mms_bc_entries.items()}

        self.nnz_out = int(vg.shape[0])
        self.n_out = int(halo.n_padded)
        self._dof_remap = halo

    @staticmethod
    def _bcast_pair(rows, cols, nv):
        shape = (rows.shape[0], nv, nv)
        R = np.broadcast_to(rows[:, :, None], shape)
        C = np.broadcast_to(cols[:, None, :], shape)
        return R.ravel(), C.ravel()

    # ----------------------------------------------------------------------
    # MMS verification support (reference KNPEMIx_problem.py:616-651 and
    # setup_MMS_params :746-805)
    # ----------------------------------------------------------------------

    @staticmethod
    def _oriented_normals(points, fverts, inside_pts):
        """Unit facet normals pointing AWAY from `inside_pts` (one reference
        point per facet, e.g. the adjacent intracellular cell centroid)."""
        fp = points[fverts]
        if points.shape[1] == 2:
            t = fp[:, 1, :] - fp[:, 0, :]
            n = np.stack([t[:, 1], -t[:, 0]], axis=1)
        else:
            n = np.cross(fp[:, 1, :] - fp[:, 0, :], fp[:, 2, :] - fp[:, 0, :])
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        n = n / norm
        mid = fp.mean(axis=1)
        flip = np.einsum("fd,fd->f", n, mid - inside_pts) < 0
        n[flip] *= -1.0
        return n

    def _setup_mms(self, rhs_rows, mverts, L_f, Nq, wq):
        from knp_emi_cgx_tpu.fem.p1 import cell_quadrature, facet_geometry

        topo = self.topo
        mesh = topo.mesh
        dim = mesh.dim
        fd = self.field_dof
        N, nvar = self.N_ions, self.nvar
        dtype = self.dtype
        md = {}

        # --- volume source quadrature per side ---
        Nc, wc = cell_quadrature(dim, degree=10)
        md["Ncell"] = jnp.asarray(Nc, dtype=dtype)
        md["wcell"] = jnp.asarray(wc, dtype=dtype)
        for si, s in enumerate(self._sides):
            Vt_np = s["Vt_np"]
            coords = mesh.points[Vt_np]                       # [nc, nv, dim]
            md[f"qp_x_{si}"] = jnp.asarray(
                np.einsum("cvd,qv->cqd", coords, Nc), dtype=dtype)
            # cell measures (padded cells have zero mass => zero volume)
            vol = np.asarray(s["M_e"]).sum(axis=(1, 2))
            md[f"vol_{si}"] = jnp.asarray(vol, dtype=dtype)
            for k in range(N):
                rhs_rows.append(fd[s["ion_off"] + k][Vt_np].ravel())
            rhs_rows.append(fd[s["phi_f"]][Vt_np].ravel())

        # --- membrane facet qp coords + normals (out of intra, '+') ---
        n_real = len(topo.membrane_cell_intra)
        fqx = np.einsum("fvd,qv->fqd", mesh.points[mverts], Nq)
        md["facet_qp_x"] = jnp.asarray(fqx, dtype=dtype)
        normals = np.zeros((mverts.shape[0], dim))
        intra_centroid = mesh.points[
            mesh.cells[topo.membrane_cell_intra]].mean(axis=1)
        normals[:n_real] = self._oriented_normals(
            mesh.points, mverts[:n_real], intra_centroid)
        md["facet_normal"] = jnp.asarray(normals, dtype=dtype)
        for k in range(N):
            rhs_rows.append(fd[k][mverts].ravel())
        for k in range(N):
            rhs_rows.append(fd[nvar + k][mverts].ravel())
        rhs_rows.append(fd[self.PHI_I][mverts].ravel())
        rhs_rows.append(fd[self.PHI_E][mverts].ravel())

        # --- exterior boundary facets (ds terms, :629-630) --- the reference
        # integrates over ALL exterior facets (untagged ds measure,
        # mixed_dim_problem.py:736)
        bmask = topo.exterior_facet_mask
        bfacets = topo.facets[bmask]
        bL = facet_geometry(mesh.points, bfacets)
        bqx = np.einsum("fvd,qv->fqd", mesh.points[bfacets], Nq)
        cell_centroid = mesh.points[
            mesh.cells[topo.facet_cells[bmask, 0]]].mean(axis=1)
        bn = self._oriented_normals(mesh.points, bfacets, cell_centroid)
        md["bqp_x"] = jnp.asarray(bqx, dtype=dtype)
        md["bnormal"] = jnp.asarray(bn, dtype=dtype)
        md["bL"] = jnp.asarray(bL, dtype=dtype)
        for k in range(N):
            rhs_rows.append(fd[nvar + k][bfacets].ravel())
        rhs_rows.append(fd[self.PHI_E][bfacets].ravel())

        # --- Dirichlet values: extracellular exact fields at boundary dofs
        # (KNPEMIx_problem.py:109-134 — MMS BCs only on the We fields) ---
        bdofs_v = topo.boundary_dofs
        bc_entries = {}
        for k, ion in enumerate(self.params.ion_list):
            f = nvar + k
            dofs = fd[f][bdofs_v]
            bc_entries[f"{ion['name']}_e"] = (
                jnp.asarray(dofs[dofs >= 0], dtype=jnp.int32),
                jnp.asarray(mesh.points[bdofs_v][dofs >= 0], dtype=dtype))
        dofs = fd[self.PHI_E][bdofs_v]
        bc_entries["phi_e"] = (
            jnp.asarray(dofs[dofs >= 0], dtype=jnp.int32),
            jnp.asarray(mesh.points[bdofs_v][dofs >= 0], dtype=dtype))
        self._mms_bc_entries = bc_entries
        self._mms_arrays = md

    def mms_bc_values(self, t):
        """Dirichlet boundary values from the exact extracellular solutions
        at time t (jittable)."""
        vals = jnp.zeros(self.n_out, dtype=self.dtype)
        for name, (dofs, coords) in self._mms_bc_entries.items():
            vals = vals.at[dofs].set(
                self.mms.scalar(name)(coords, t).astype(self.dtype))
        return vals

    def _mms_rhs_values(self, t, alpha_i, alpha_e, Lw):
        """Extra RHS contribution blocks, mirroring the row order appended in
        `_setup_mms`."""
        p = self.params
        N = self.N_ions
        dt = p.dt
        md = self._mms_arrays
        mms = self.mms
        out = []

        # volume sources
        Ncell, wcell = md["Ncell"], md["wcell"]
        for si, s in enumerate(self._sides):
            qp_x = md[f"qp_x_{si}"]
            vol = md[f"vol_{si}"]
            side = "i" if si == 0 else "e"

            def vint(fvals):
                # [nc, nq] -> [nc, nv]: vol * sum_q w_q f N_a
                return jnp.einsum("c,cq,q,qa->ca", vol, fvals, wcell, Ncell)

            for k, ion in enumerate(p.ion_list):
                f = mms.scalar(f"f_{ion['name']}_{side}")(qp_x, t)
                out.append(dt * vint(f))
            fphi = mms.scalar(f"f_phi_{side}")(qp_x, t)
            out.append(-dt * vint(fphi))

        # membrane facet corrections
        fx = md["facet_qp_x"]
        n = md["facet_normal"][:, None, :]                   # [n_mf, 1, dim]
        TFi_n = jnp.einsum("fqd,fqd->fq", mms.vector("total_flux_intra")(fx, t),
                           jnp.broadcast_to(n, fx.shape))
        TFe_n = jnp.einsum("fqd,fqd->fq", mms.vector("total_flux_extra")(fx, t),
                           jnp.broadcast_to(n, fx.shape))
        dphi_dt = mms.scalar("dphi_m_dt")(fx, t)
        phi_m_ex = mms.scalar("phi_m")(fx, t)
        f_gamma = TFi_n - TFe_n
        # per-ion Ich_k = phi_m (PassiveModel); f_phi_k identical per ion
        f_phi_k = dphi_dt + phi_m_ex - TFi_n
        f_phi_m = dphi_dt + N * phi_m_ex - TFi_n

        def fvec(coef):
            return jnp.einsum("fq,qa->fa", Lw * coef, self.Nq)

        for k, ion in enumerate(p.ion_list):
            z = ion["z"]
            out.append((dt / (p.F * z)) * fvec(alpha_i[k] * f_phi_k))
        for k, ion in enumerate(p.ion_list):
            z = ion["z"]
            out.append((-dt / (p.F * z)) * fvec(alpha_e[k] * (f_phi_k + f_gamma)))
        out.append(dt * fvec(f_phi_m))
        out.append(-dt * fvec(f_phi_m + f_gamma))

        # exterior boundary terms
        bx = md["bqp_x"]
        bn = md["bnormal"][:, None, :]
        bLw = md["bL"][:, None] * self.wq[None, :]

        def bvec(coef):
            return jnp.einsum("fq,qa->fa", bLw * coef, self.Nq)

        Jn = {}
        for ion in p.ion_list:
            Jk = mms.vector(f"J_{ion['name']}_e")(bx, t)
            Jn[ion["name"]] = jnp.einsum(
                "fqd,fqd->fq", Jk, jnp.broadcast_to(bn, bx.shape))
        for k, ion in enumerate(p.ion_list):
            out.append(-dt * bvec(Jn[ion["name"]]))
        out.append(sum(p.F * ion["z"] * bvec(Jn[ion["name"]])
                       for ion in p.ion_list))
        return out

    # ----------------------------------------------------------------------
    # Device-side per-step assembly (jittable)
    # ----------------------------------------------------------------------

    def facet_qp_fields(self, u, phi_m, gates):
        """Interpolate previous-step fields to membrane quadrature points."""
        p = self.params
        N = self.N_ions

        def at_qp(vertex_vals):
            return jnp.einsum("fd,qd->fq", vertex_vals[self.mverts], self.Nq)

        c_i = [at_qp(u[k]) for k in range(N)]
        c_e = [at_qp(u[self.nvar + k]) for k in range(N)]
        q = {
            "c_i": c_i,
            "c_e": c_e,
            "phi_m": at_qp(phi_m),
            "n": at_qp(gates["n"]),
            "m": at_qp(gates["m"]),
            "h": at_qp(gates["h"]),
        }
        q["E"] = [
            (p.psi / ion["z"]) * jnp.log(c_e[k] / c_i[k])
            for k, ion in enumerate(p.ion_list)
        ]
        return q

    def channel_currents(self, q, t):
        """Total channel current per ion at facet qp, including stimulus
        (KNPEMIx_problem.py:504-555)."""
        p = self.params
        N = self.N_ions
        I_ch = [jnp.zeros((self.n_mf, self.nq), dtype=self.dtype)
                for _ in range(N)]
        for model, mask in zip(self.models, self.model_masks):
            for k, ion in enumerate(p.ion_list):
                cur = model.current(k, ion, q, p)
                I_ch[k] = I_ch[k] + mask[:, None] * cur

        if self.has_stimulus:
            t_mod = jnp.mod(t + 1e-12, p.T_stim)   # update_t_mod, :673-675
            if p.tau_syn_rise is not None:
                exp_factor = (jnp.exp(-t_mod / p.tau_syn_decay)
                              - jnp.exp(-t_mod / p.tau_syn_rise))
            else:
                exp_factor = jnp.exp(-t_mod / p.a_syn)
            na = p.ion_index["Na"]
            stim = (self.stim_facet_mask[:, None] * self.region_qp
                    * p.g_syn_bar * exp_factor
                    * (q["phi_m"] - q["E"][na]))
            if p.scale_stimulus:
                stim = stim / self.stimulus_area
            I_ch[na] = I_ch[na] + stim
        return I_ch

    def assemble(self, u, phi_m, gates, t, bc_values=None):
        """Assemble (csr_vals, b) for the current state.  Jittable.

        u       : [nf, nV] previous-step fields
        phi_m   : [nV] previous membrane potential
        gates   : dict n/m/h [nV]
        t       : new time (the reference increments t before assembly)
        bc_values : [n_dofs] Dirichlet values (required if BCs active)
        """
        p = self.params
        N = self.N_ions
        dt = p.dt

        dyn_vals = []
        rhs_vals = []

        # ---- volume dynamic blocks + volume RHS ----
        for s in self._sides:
            Vt, K_e, M_e = s["Vt"], s["K_e"], s["M_e"]
            ion_off, Dkey = s["ion_off"], s["Dkey"]
            phi_coef = 0.0
            for k, ion in enumerate(p.ion_list):
                D, z = ion[Dkey], ion["z"]
                kmean = jnp.mean(u[ion_off + k][Vt], axis=1)          # [nc]
                dyn_vals.append(
                    ((dt * D * z / p.psi) * kmean)[:, None, None] * K_e)
                phi_coef = phi_coef + (dt * z * z * D / p.psi) * kmean
                # RHS: (k_prev, v) + dt*(f, v)
                fvals = u[ion_off + k][Vt] + dt * self.src[ion_off + k][Vt]
                rhs_vals.append(jnp.einsum("cab,cb->ca", M_e, fvals))
            dyn_vals.append(phi_coef[:, None, None] * K_e)

        # ---- facet quantities ----
        q = self.facet_qp_fields(u, phi_m, gates)
        I_ch = self.channel_currents(q, t)
        I_tot = sum(I_ch)

        denom_i = sum(ion["Di"] * ion["z"] ** 2 * q["c_i"][k]
                      for k, ion in enumerate(p.ion_list))
        denom_e = sum(ion["De"] * ion["z"] ** 2 * q["c_e"][k]
                      for k, ion in enumerate(p.ion_list))
        alpha_i = [ion["Di"] * ion["z"] ** 2 * q["c_i"][k] / denom_i
                   for k, ion in enumerate(p.ion_list)]
        alpha_e = [ion["De"] * ion["z"] ** 2 * q["c_e"][k] / denom_e
                   for k, ion in enumerate(p.ion_list)]

        Lw = self.L_f[:, None] * self.wq[None, :]                     # [n_mf, nq]

        def fmat(coef):
            # facet matrix block: L_f * sum_q w_q coef(q) N_a N_b
            return jnp.einsum("fq,qa,qb->fab", Lw * coef, self.Nq, self.Nq)

        def fvec(coef):
            return jnp.einsum("fq,qa->fa", Lw * coef, self.Nq)

        CMF = p.C_M / p.F
        ones = jnp.ones((self.n_mf, self.nq), dtype=self.dtype)
        phim_q = q["phi_m"]

        for k, ion in enumerate(p.ion_list):
            z = ion["z"]
            Cik = alpha_i[k] * (p.C_M / (p.F * z))
            Cek = alpha_e[k] * (p.C_M / (p.F * z))
            dyn_vals += [fmat(Cik), fmat(-Cik), fmat(-Cek), fmat(Cek)]
        dyn_vals += [fmat(CMF * ones), fmat(-CMF * ones),
                     fmat(-CMF * ones), fmat(CMF * ones)]

        # facet RHS (KNPEMIx_problem.py:607-610, 640-642)
        for k, ion in enumerate(p.ion_list):
            z = ion["z"]
            r_i = -(1.0 / (p.F * z)) * (dt * I_ch[k] - alpha_i[k] * p.C_M * phim_q)
            rhs_vals.append(fvec(r_i))
        rhs_vals.append(fvec(-(1.0 / p.F) * (dt * I_tot - p.C_M * phim_q)))
        for k, ion in enumerate(p.ion_list):
            z = ion["z"]
            r_e = (1.0 / (p.F * z)) * (dt * I_ch[k] - alpha_e[k] * p.C_M * phim_q)
            rhs_vals.append(fvec(r_e))
        rhs_vals.append(fvec((1.0 / p.F) * (dt * I_tot - p.C_M * phim_q)))

        if self.mms is not None:
            rhs_vals += self._mms_rhs_values(t, alpha_i, alpha_e, Lw)

        dyn_flat = jnp.concatenate([v.reshape(-1) for v in dyn_vals])
        rhs_flat = jnp.concatenate([v.reshape(-1) for v in rhs_vals])

        # ---- scatter ----
        csr_vals = self.A_static_vals + jax.ops.segment_sum(
            dyn_flat * self.dyn_keep, self.dyn_slots, num_segments=self.nnz_out)
        b = jax.ops.segment_sum(rhs_flat * self.rhs_keep, self.rhs_rows,
                                num_segments=self.n_out)

        if self.has_bcs:
            if bc_values is None:
                bc_values = self.const_bc_values
            sv, sr, sc = self._lift_static
            lift = jax.ops.segment_sum(sv * bc_values[sc], sr,
                                       num_segments=self.n_out)
            lift = lift + jax.ops.segment_sum(
                dyn_flat * self._lift_dyn_mask * bc_values[self._dyn_cols],
                self._dyn_rows, num_segments=self.n_out)
            b = b - lift
            b = jnp.where(self.bc_flag, bc_values, b)

        return csr_vals, b
