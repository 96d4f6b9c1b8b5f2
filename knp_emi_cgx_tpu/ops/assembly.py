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


def _dev(x, dtype=None):
    """numpy -> device with the dtype conversion done HOST-SIDE.  A bare
    jnp.asarray(big_f64_array, dtype=f32) dispatches convert_element_type on
    the device — one XLA compilation per distinct shape at setup time."""
    if dtype is not None:
        x = np.asarray(x, dtype=np.dtype(dtype))
    return jnp.asarray(np.ascontiguousarray(x))


def _unique_inverse(keys):
    """Sorted-unique + inverse over packed int64 keys (native fast path)."""
    try:
        from knp_emi_cgx_tpu import native

        res = native.coalesce_coo(keys)
        if res is not None:
            return res
    except Exception:
        pass
    return np.unique(keys, return_inverse=True)


def _section_timer():
    """Setup-phase section timing, printed when KNP_SETUP_VERBOSE is set."""
    import os
    import time

    if not os.environ.get("KNP_SETUP_VERBOSE"):
        return lambda label: None
    state = {"t": time.perf_counter()}

    def mark(label):
        now = time.perf_counter()
        print(f"  [setup] {label}: {now - state['t']:.3f}s", flush=True)
        state["t"] = now

    return mark


class KNPEMIAssembler:
    """Precomputes static structure; exposes jittable `assemble`."""

    def __init__(self, topo: MeshTopology, params, models,
                 dtype=jnp.float64,
                 dirichlet_bcs: bool = False,
                 pinned_dofs: np.ndarray | None = None,
                 source_vertex_values: dict | None = None,
                 mms=None,
                 pad_multiple: int = 1,
                 node_space=None):
        """pad_multiple: pad per-cell and per-facet dynamic work arrays to a
        multiple of this count (zero-measure dummy entries anchored at a
        membrane vertex, contributing exact zeros) so they shard evenly
        across a device mesh.

        node_space: a fem.p2.P2NodeSpace for fem_order=2 — dofs become P2
        nodes (vertices + edge midpoints), element tensors the static P2
        reference contractions, facet coupling the P2 facet shape tables.
        None (default) keeps the P1 vertex-dof path."""
        mark = _section_timer()
        self.topo = topo
        self.params = params
        self.models = list(models)
        self.dtype = dtype
        self.dirichlet_bcs = dirichlet_bcs
        self.mms = mms
        self.pad_multiple = max(1, int(pad_multiple))
        self.node_space = node_space
        self.order = 2 if node_space is not None else 1

        p = params
        mesh = topo.mesh
        dim = mesh.dim
        self.N_ions = N = p.N_ions
        self.nvar = nvar = N + 1
        self.nf = nf = 2 * nvar
        self.PHI_I = N
        self.PHI_E = nvar + N
        nV = mesh.num_points

        # dof-space tables: P1 vertices, or P2 nodes (vertex-id prefix)
        if self.order == 2:
            from knp_emi_cgx_tpu.fem.p2 import reference_tensors
            n_pts = node_space.n_nodes
            cell_tab = node_space.cell_nodes
            mtab_real = node_space.membrane_facet_nodes
            bset = node_space.boundary_nodes
            pts_nodes = node_space.node_points
            intra = node_space.intra_nodes
            extra = node_space.extra_nodes
            M2, E2, Q2 = reference_tensors(dim)
        else:
            n_pts = nV
            cell_tab = mesh.cells
            mtab_real = topo.membrane_verts
            bset = topo.boundary_dofs
            pts_nodes = mesh.points
            intra = topo.intra_dofs
            extra = topo.extra_dofs
        nv = cell_tab.shape[1]                   # dofs per cell
        self.n_pts = n_pts
        self.cell_tab_np = cell_tab
        self.points_np = pts_nodes
        self.intra_dofs_np = intra
        self.extra_dofs_np = extra
        self.boundary_dofs_np = bset

        # ------------------------------------------------------------------
        # Dof restrictions and monolithic numbering
        # ------------------------------------------------------------------
        ni, ne = len(intra), len(extra)
        self.ni, self.ne = ni, ne
        self.n_dofs = nvar * (ni + ne)

        intra_rank = np.full(n_pts, -1, dtype=np.int64)
        intra_rank[intra] = np.arange(ni)
        extra_rank = np.full(n_pts, -1, dtype=np.int64)
        extra_rank[extra] = np.arange(ne)

        # field_dof[f, v] -> monolithic index (or huge sentinel if inactive)
        field_dof = np.full((nf, n_pts), -1, dtype=np.int64)
        for f in range(nvar):
            field_dof[f] = np.where(intra_rank >= 0, f * ni + intra_rank, -1)
        base = nvar * ni
        for f in range(nvar, nf):
            field_dof[f] = np.where(
                extra_rank >= 0, base + (f - nvar) * ne + extra_rank, -1)
        self.field_dof = field_dof

        mark("dof restrictions")
        # ------------------------------------------------------------------
        # Dirichlet boundary dofs (KNPEMIx_problem.py:96-198)
        # ------------------------------------------------------------------
        bc_flag = np.zeros(self.n_dofs, dtype=bool)
        bc_const = np.zeros(self.n_dofs)
        if dirichlet_bcs:
            for f in range(nf):
                d = field_dof[f, bset]
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

        mark("bc dofs")
        # ------------------------------------------------------------------
        # Volume geometry per subdomain side
        # ------------------------------------------------------------------
        grads, vols = cell_geometry(mesh.points, mesh.cells)
        Mref = reference_mass(dim)
        self._sides = []

        # a dof active in every field's restriction (membrane vertices
        # belong to both compartment closures) — anchor for padded entries
        safe_vertex = int(mtab_real[0, 0]) if len(mtab_real) else 0
        pm = self.pad_multiple

        def _padded_count(n):
            return (-(-n // pm)) * pm if pm > 1 else n

        # The monolithic CSR pattern is NOT built from per-field-block COO
        # streams (that costs O(nnz_elementwise) ~ 70M entries at 32^3).
        # Every field block shares one of two vertex-pair adjacencies (intra
        # / extra cells), so the pattern work is one pair-coalesce per side
        # (16*nc keys) + O(nnz) analytic block placement — ~10x less host
        # work, and element-pair static sums (K_pair/M_pair) come out as a
        # byproduct.  This is the DOLFINx SparsityPattern role, specialised
        # to the fixed KNP-EMI block structure.
        pats = {}
        for side, cells_idx in (("i", topo.intra_cells), ("e", topo.extra_cells)):
            Vt = cell_tab[cells_idx]                       # [nc, nv]
            g = grads[cells_idx]                           # [nc, d+1, dim]
            v = vols[cells_idx]                            # [nc]
            # per-cell P1 metric S_c = vol * (g.g); P2 tensors are its static
            # reference contractions (fem/p2.py): the per-step drift stays a
            # single einsum against Q_e just like the P1 coef*K_e path
            S_c = np.einsum("cai,cbi->cab", g, g) * v[:, None, None]
            if self.order == 2:
                K_e = np.einsum("cpr,apbr->cab", S_c, E2)
                M_e = v[:, None, None] * M2[None, :, :]
                Q_e = np.einsum("cpr,mapbr->cmab", S_c, Q2)
            else:
                K_e = S_c
                M_e = v[:, None, None] * Mref[None, :, :]
                Q_e = None
            n_pad = _padded_count(Vt.shape[0]) - Vt.shape[0]
            if n_pad:
                Vt = np.concatenate(
                    [Vt, np.full((n_pad, nv), safe_vertex, dtype=Vt.dtype)])
                K_e = np.concatenate([K_e, np.zeros((n_pad, nv, nv))])
                M_e = np.concatenate([M_e, np.zeros((n_pad, nv, nv))])
                if Q_e is not None:
                    Q_e = np.concatenate([Q_e, np.zeros((n_pad, nv, nv, nv))])
            phi_f = self.PHI_I if side == "i" else self.PHI_E
            ion_off = 0 if side == "i" else nvar
            Dkey = "Di" if side == "i" else "De"

            rank = intra_rank if side == "i" else extra_rank
            nside = ni if side == "i" else ne
            Rt = rank[Vt]                                  # [nc, nv] side ranks
            if np.any(Rt < 0):
                raise RuntimeError("Assembly references an inactive dof")
            pkeys = (Rt[:, :, None] * nside + Rt[:, None, :]).reshape(-1)
            upairs, pair_id = _unique_inverse(pkeys)
            prow = (upairs // nside).astype(np.int64)
            pindptr = np.zeros(nside + 1, dtype=np.int64)
            np.add.at(pindptr, prow + 1, 1)
            pindptr = np.cumsum(pindptr)
            E = upairs.shape[0]
            pats[side] = {
                "n": nside, "keys": upairs, "indptr": pindptr,
                "rows": prow, "cols": (upairs % nside).astype(np.int64),
                "pair_id": pair_id,
                "K": np.bincount(pair_id, weights=K_e.reshape(-1),
                                 minlength=E),
                "M": np.bincount(pair_id, weights=M_e.reshape(-1),
                                 minlength=E),
            }

            self._sides.append({
                "side": side,
                "Vt": _dev(Vt, jnp.int32),
                "K_e": _dev(K_e, dtype),
                "M_e": _dev(M_e, dtype),
                "Q_e": _dev(Q_e, dtype) if Q_e is not None else None,
                "ion_off": ion_off,
                "phi_f": phi_f,
                "Dkey": Dkey,
                "Vt_np": Vt,
                "K_e_np": K_e,
                "M_e_np": M_e,
                # per-entry pair / rank ids: the per-step volume scatters are
                # pre-summed on device to pair level (matrix) and vertex
                # level (RHS) before landing in global storage — ~10x less
                # scatter traffic than entry-level segment_sums
                "pair_id": _dev(pair_id, jnp.int32),
                "rank_flat": _dev(Rt.reshape(-1), jnp.int32),
                "E": E,
                "nside": nside,
            })

        mark("volume blocks")
        # ------------------------------------------------------------------
        # Membrane facet data
        # ------------------------------------------------------------------
        # geometry stays on the VERTEX table (measures, qp coords, normals);
        # dof coupling runs on the facet dof table (== vertex table for P1,
        # vertices + facet edge midpoints for P2)
        mgeom = topo.membrane_verts                         # [n_mf, dim]
        mverts = mtab_real                                  # [n_mf, nfn] dofs
        membrane_tags = topo.membrane_tags
        Nq_geom, wq = facet_quadrature(dim, degree=10)      # [nq, dim], [nq]
        if self.order == 2:
            from knp_emi_cgx_tpu.fem.p2 import facet_shape_values
            Nq, _ = facet_shape_values(dim, degree=10)      # [nq, nfn]
        else:
            Nq = Nq_geom
        self.nq = Nq.shape[0]
        L_f = facet_geometry(mesh.points, mgeom)
        n_fpad = _padded_count(mverts.shape[0]) - mverts.shape[0]
        if n_fpad:
            mverts = np.concatenate(
                [mverts, np.full((n_fpad, mverts.shape[1]), safe_vertex,
                                 dtype=mverts.dtype)])
            mgeom = np.concatenate(
                [mgeom, np.full((n_fpad, dim), int(mgeom[0, 0]) if len(mgeom)
                                else 0, dtype=mgeom.dtype)])
            L_f = np.concatenate([L_f, np.zeros(n_fpad)])
            membrane_tags = np.concatenate(
                [membrane_tags, np.full(n_fpad, -1, dtype=membrane_tags.dtype)])
        self.n_mf = n_mf = mverts.shape[0]
        self.mtab_np = mverts
        self.Nq_np, self.wq_np, self.L_f_np = Nq, wq, L_f

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
        qp_x = np.einsum("fdk,qd->fqk", mesh.points[mgeom], Nq_geom)  # [n_mf, nq, dim]
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

        # membrane facet coupling patterns: facet vertex pairs in the rank
        # spaces of the row/col fields.  Same-compartment facet blocks land
        # inside the volume adjacency (a facet's vertices share the adjacent
        # cell on each side); cross-compartment blocks get their own small
        # patterns
        fd = field_dof
        mv = mverts
        d = mv.shape[1]                                    # dofs per facet
        fri = intra_rank[mv]                               # [n_mf, d]
        fre = extra_rank[mv]
        if np.any(fri < 0) or np.any(fre < 0):
            raise RuntimeError("Membrane vertex missing from a restriction")

        def _facet_pattern(rr, rc, ncols):
            keys = (rr[:, :, None] * ncols + rc[:, None, :]).reshape(-1)
            ukeys, pid = _unique_inverse(keys)
            return {"keys": ukeys, "rows": (ukeys // ncols).astype(np.int64),
                    "cols": (ukeys % ncols).astype(np.int64), "pid": pid}

        F_ie = _facet_pattern(fri, fre, ne)                # intra rows
        F_ei = _facet_pattern(fre, fri, ni)                # extra rows
        # facet entry -> pair index inside the side adjacency
        keys_ii = (fri[:, :, None] * ni + fri[:, None, :]).reshape(-1)
        pos_ii = np.searchsorted(pats["i"]["keys"], keys_ii)
        keys_ee = (fre[:, :, None] * ne + fre[:, None, :]).reshape(-1)
        pos_ee = np.searchsorted(pats["e"]["keys"], keys_ee)
        assert np.array_equal(pats["i"]["keys"][pos_ii], keys_ii)
        assert np.array_equal(pats["e"]["keys"][pos_ee], keys_ee)

        mark("facet data")
        # ------------------------------------------------------------------
        # Build global CSR pattern analytically from the block structure
        # ------------------------------------------------------------------
        # pattern name -> (row-space indptr, per-pair rows/cols)
        def _pat_indptr(pat, nrows):
            ip = np.zeros(nrows + 1, dtype=np.int64)
            np.add.at(ip, pat["rows"] + 1, 1)
            return np.cumsum(ip)

        F_ie["indptr"] = _pat_indptr(F_ie, ni)
        F_ei["indptr"] = _pat_indptr(F_ei, ne)
        patterns = {"vol_i": pats["i"], "vol_e": pats["e"],
                    "fie": F_ie, "fei": F_ei}

        def row_off(f):
            return f * ni if f < nvar else nvar * ni + (f - nvar) * ne

        def row_n(f):
            return ni if f < nvar else ne

        # per row field: (pattern, col field) in ascending col-offset order
        block_defs = {}
        for k in range(N):
            block_defs[k] = [("vol_i", k), ("vol_i", self.PHI_I),
                             ("fie", self.PHI_E)]
            block_defs[nvar + k] = [("fei", self.PHI_I),
                                    ("vol_e", nvar + k),
                                    ("vol_e", self.PHI_E)]
        block_defs[self.PHI_I] = ([("vol_i", kk) for kk in range(N)]
                                  + [("vol_i", self.PHI_I),
                                     ("fie", self.PHI_E)])
        block_defs[self.PHI_E] = ([("fei", self.PHI_I)]
                                  + [("vol_e", nvar + kk) for kk in range(N)]
                                  + [("vol_e", self.PHI_E)])

        counts = np.zeros(self.n_dofs, dtype=np.int64)
        for f in range(nf):
            deg = np.zeros(row_n(f), dtype=np.int64)
            for patname, _cf in block_defs[f]:
                deg += np.diff(patterns[patname]["indptr"])
            counts[row_off(f):row_off(f) + row_n(f)] = deg
        indptr = np.concatenate([[0], np.cumsum(counts)])
        self.nnz = nnz = int(indptr[-1])
        # output sizes for the assembly scatters; rewritten by
        # apply_dof_remap for dof-sharded (padded, reordered) layouts
        self.nnz_out = nnz
        self.n_out = self.n_dofs

        csr_cols = np.empty(nnz, dtype=np.int64)
        block_slots = {}
        for f in range(nf):
            base = indptr[row_off(f):row_off(f) + row_n(f)].copy()
            for patname, cf in block_defs[f]:
                pat = patterns[patname]
                E = pat["rows"].shape[0]
                within = np.arange(E) - pat["indptr"][pat["rows"]]
                slots = base[pat["rows"]] + within
                csr_cols[slots] = row_off(cf) + pat["cols"]
                block_slots[(f, patname, cf)] = slots
                base += np.diff(pat["indptr"])

        csr_rows = np.repeat(np.arange(self.n_dofs, dtype=np.int64), counts)
        self.indptr = _dev(indptr, jnp.int32)
        self.indices = _dev(csr_cols, jnp.int32)
        self.row_ids = _dev(csr_rows, jnp.int32)
        # host copies: solver/partitioner setup must NEVER read a device
        # array back (the first D2H flips the axon runtime into a ~3000x
        # slower synchronous per-kernel mode for the rest of the process)
        self.indptr_np = indptr
        self.csr_rows_np = csr_rows
        self.csr_cols_np = csr_cols

        mark("csr build")
        # ---- static values: per-pair sums placed at the block slots ----
        A_raw = np.zeros(nnz)
        for s in self._sides:
            pat = pats[s["side"]]
            ion_off, phi_f, Dkey = s["ion_off"], s["phi_f"], s["Dkey"]
            vol = "vol_i" if s["side"] == "i" else "vol_e"
            for k, ion in enumerate(p.ion_list):
                D, z = ion[Dkey], ion["z"]
                A_raw[block_slots[(ion_off + k, vol, ion_off + k)]] += \
                    pat["M"] + p.dt * D * pat["K"]
                A_raw[block_slots[(phi_f, vol, ion_off + k)]] += \
                    p.dt * z * D * pat["K"]

        # ---- dynamic slot maps ----
        # volume drift blocks land PAIR-level (assemble pre-sums per pair,
        # block-major [(k,phi) for each ion, then (phi,phi)]); facet blocks
        # stay entry-level (small), in the exact order assemble() emits them
        for s in self._sides:
            vol = "vol_i" if s["side"] == "i" else "vol_e"
            ion_off, phi_f = s["ion_off"], s["phi_f"]
            vol_slots = np.concatenate(
                [block_slots[(ion_off + k, vol, phi_f)] for k in range(N)]
                + [block_slots[(phi_f, vol, phi_f)]])
            s["vol_slots_np"] = vol_slots
            s["vol_slots"] = _dev(vol_slots, jnp.int32)

        dyn_slots = []
        for k in range(N):
            dyn_slots += [
                block_slots[(k, "vol_i", self.PHI_I)][pos_ii],
                block_slots[(k, "fie", self.PHI_E)][F_ie["pid"]],
                block_slots[(nvar + k, "fei", self.PHI_I)][F_ei["pid"]],
                block_slots[(nvar + k, "vol_e", self.PHI_E)][pos_ee],
            ]
        dyn_slots += [
            block_slots[(self.PHI_I, "vol_i", self.PHI_I)][pos_ii],
            block_slots[(self.PHI_I, "fie", self.PHI_E)][F_ie["pid"]],
            block_slots[(self.PHI_E, "fei", self.PHI_I)][F_ei["pid"]],
            block_slots[(self.PHI_E, "vol_e", self.PHI_E)][pos_ee],
        ]
        dyn_slots = np.concatenate(dyn_slots)
        self.dyn_slots = _dev(dyn_slots, jnp.int32)

        # ---- nullspace-repair structure (selective-f64 solves) ----
        # The f32-assembled operator has no EXACT nullspace (independently
        # rounded values break the zero row-sum over potential columns that
        # the continuous operator guarantees).  For f64 solves of the
        # pure-Neumann system, solvers/refine.py restores discrete
        # compatibility by subtracting each row's phi-column sum from the
        # row's phi-partner entry — a per-entry correction below f32
        # assembly error.  Here: the partner slot per row (the (v,v) pair of
        # the row field's (f, phi) block) and the phi-column indicator.
        repair = np.empty(self.n_dofs, dtype=np.int64)
        for f in range(nf):
            side = "i" if f < nvar else "e"
            pat = pats[side]
            volp = "vol_i" if f < nvar else "vol_e"
            phi_f = self.PHI_I if f < nvar else self.PHI_E
            dkeys = np.arange(pat["n"], dtype=np.int64) * (pat["n"] + 1)
            dpos = np.searchsorted(pat["keys"], dkeys)
            assert np.array_equal(pat["keys"][dpos], dkeys)
            repair[row_off(f):row_off(f) + pat["n"]] = \
                block_slots[(f, volp, phi_f)][dpos]
        self.phi_repair_slots = _dev(repair, jnp.int32)
        is_phi_dof = np.zeros(self.n_dofs, dtype=bool)
        is_phi_dof[row_off(self.PHI_I):row_off(self.PHI_I) + ni] = True
        is_phi_dof[row_off(self.PHI_E):row_off(self.PHI_E) + ne] = True
        self.phi_col_mask = _dev(is_phi_dof[csr_cols].astype(float), dtype)

        mark("static vals + dyn slots")
        # ---- BC masking (slot-level) + Dirichlet lifting ----
        if self.has_bcs:
            keep = (~bc_flag[csr_rows]) & (~bc_flag[csr_cols])
            A_static = A_raw * keep
            # unit diagonal on BC rows: locate each BC dof's diagonal slot
            bc_dofs = np.nonzero(bc_flag)[0]
            f_of = np.where(bc_dofs < nvar * ni, bc_dofs // ni,
                            nvar + (bc_dofs - nvar * ni) // ne)
            r_of = np.where(bc_dofs < nvar * ni, bc_dofs % ni,
                            (bc_dofs - nvar * ni) % ne)
            diag_slots = np.empty(len(bc_dofs), dtype=np.int64)
            for f in np.unique(f_of):
                m = f_of == f
                vol = "vol_i" if f < nvar else "vol_e"
                pat = patterns[vol]
                dkeys = r_of[m] * (pat["n"] + 1)
                dpos = np.searchsorted(pat["keys"], dkeys)
                assert np.array_equal(pat["keys"][dpos], dkeys)
                diag_slots[m] = block_slots[(int(f), vol, int(f))][dpos]
            A_static[diag_slots] = 1.0

            # lifting: b[row] -= A[row, col] * g[col] for interior rows,
            # Dirichlet cols (coalesced-slot form of the reference's
            # apply_lifting)
            lift_mask = (~bc_flag[csr_rows]) & bc_flag[csr_cols]
            self._lift_static = (
                _dev(A_raw * lift_mask, dtype),
                _dev(csr_rows, jnp.int32),
                _dev(csr_cols, jnp.int32),
            )
            # volume drift blocks: keep/lift masks at PAIR level (masking is
            # a per-(row,col) property, identical before or after the
            # per-pair pre-sum)
            for s in self._sides:
                pat = pats[s["side"]]
                ion_off, phi_f = s["ion_off"], s["phi_f"]
                vr, vc = [], []
                for k in range(N):
                    vr.append(row_off(ion_off + k) + pat["rows"])
                    vc.append(row_off(phi_f) + pat["cols"])
                vr.append(row_off(phi_f) + pat["rows"])
                vc.append(row_off(phi_f) + pat["cols"])
                vr = np.concatenate(vr)
                vc = np.concatenate(vc)
                s["vol_keep"] = _dev(
                    ((~bc_flag[vr]) & (~bc_flag[vc])).astype(float), dtype)
                s["vol_lift_mask"] = _dev(
                    ((~bc_flag[vr]) & bc_flag[vc]).astype(float), dtype)
                s["vol_rows"] = _dev(vr, jnp.int32)
                s["vol_cols"] = _dev(vc, jnp.int32)

            # facet blocks: entry-level masks (small)
            def fpair(rowf, colf):
                return self._bcast_pair(fd[rowf][mv], fd[colf][mv], d)

            fb = []
            for k in range(N):
                fb += [fpair(k, self.PHI_I), fpair(k, self.PHI_E),
                       fpair(nvar + k, self.PHI_I), fpair(nvar + k, self.PHI_E)]
            fb += [fpair(self.PHI_I, self.PHI_I), fpair(self.PHI_I, self.PHI_E),
                   fpair(self.PHI_E, self.PHI_I), fpair(self.PHI_E, self.PHI_E)]
            dyn_rows = np.concatenate([b[0] for b in fb])
            dyn_cols = np.concatenate([b[1] for b in fb])
            self.dyn_keep = _dev(
                ((~bc_flag[dyn_rows]) & (~bc_flag[dyn_cols])).astype(float),
                dtype)
            self._lift_dyn_mask = _dev(
                ((~bc_flag[dyn_rows]) & bc_flag[dyn_cols]).astype(float),
                dtype)
            self._dyn_rows = _dev(dyn_rows, jnp.int32)
            self._dyn_cols = _dev(dyn_cols, jnp.int32)
        else:
            A_static = A_raw
            self.dyn_keep = None
        self.A_static_vals = _dev(A_static, dtype)
        self.bc_flag = jnp.asarray(bc_flag)

        mark("bc masks/lift")
        # ------------------------------------------------------------------
        # RHS structure
        # ------------------------------------------------------------------
        rhs_rows = []
        for s in self._sides:
            ion_off = s["ion_off"]
            for k in range(N):
                # volume RHS is pre-summed to vertex-rank level in assemble;
                # rank r of field f lives at monolithic dof row_off(f) + r
                f = ion_off + k
                rhs_rows.append(row_off(f) + np.arange(s["nside"]))
        for f in list(range(N)) + [self.PHI_I]:
            rhs_rows.append(field_dof[f][mv].ravel())
        for f in list(range(nvar, nvar + N)) + [self.PHI_E]:
            rhs_rows.append(field_dof[f][mv].ravel())

        if mms is not None:
            self._setup_mms(rhs_rows, mverts, mgeom, L_f, wq)

        rhs_rows_np = np.concatenate(rhs_rows)
        self.rhs_rows = _dev(rhs_rows_np, jnp.int32)
        self.rhs_keep = (_dev((~bc_flag[rhs_rows_np]).astype(float), dtype)
                         if self.has_bcs else None)

        # device arrays for facet evaluation
        self.mverts = _dev(mverts, jnp.int32)
        self.Nq = _dev(Nq, dtype)            # [nq, d]
        self.wq = _dev(wq, dtype)
        self.L_f = _dev(L_f, dtype)
        self.model_masks = [_dev(m.astype(float), dtype)
                            for m in model_masks]
        self.stim_facet_mask = _dev(
            self.stim_facet_mask_np.astype(float), dtype)
        self.region_qp = _dev(region, dtype)

        # per-field vertex source arrays (ion injection etc.)
        src = np.zeros((nf, n_pts))
        for k, ion in enumerate(p.ion_list):
            src[k, :] = ion.get("f_i", 0.0)
            src[nvar + k, :] = ion.get("f_e", 0.0)
        if source_vertex_values:
            for f_idx, vals in source_vertex_values.items():
                src[f_idx] = vals
        self.src_np = src   # host copy (flux/budget diagnostics)
        self.src = _dev(src, dtype)

        mark("rhs structure + device arrays")
        # nullspace vector (constants on both potentials, normalised —
        # KNPEMIx_solver.py:297-335)
        ns = np.zeros(self.n_dofs)
        ns[field_dof[self.PHI_I][intra]] = 1.0
        ns[field_dof[self.PHI_E][extra]] = 1.0
        ns /= np.linalg.norm(ns)
        self.nullspace_np = ns
        self.nullspace = _dev(ns, dtype)

    # -- device-array bundling (see utils/devicestate.py): every jnp array
    # the jitted step touches must be passed as an argument, not captured --
    DEVICE_ATTRS = (
        "A_static_vals", "dyn_slots", "dyn_keep", "rhs_rows", "rhs_keep",
        "indices", "indptr", "row_ids", "nullspace", "src", "bc_flag",
        "phi_repair_slots", "phi_col_mask",
        "mverts", "Nq", "wq", "L_f", "stim_facet_mask", "region_qp",
        "_lift_dyn_mask", "_dyn_rows", "_dyn_cols",
        "_mms_arrays", "_mms_bc_entries", "const_bc_values",
    )
    SIDE_ATTRS = ("Vt", "K_e", "M_e", "Q_e", "pair_id", "rank_flat",
                  "vol_slots", "vol_keep", "vol_lift_mask", "vol_rows",
                  "vol_cols")

    def device_state(self):
        from knp_emi_cgx_tpu.utils.devicestate import collect

        st = {"attrs": collect(self, self.DEVICE_ATTRS),
              "model_masks": list(self.model_masks),
              "sides": [{k: s[k] for k in self.SIDE_ATTRS if s.get(k) is not None}
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

    def apply_vertex_remap(self, newpos_v, n_vpad: int):
        """Re-target every VERTEX-indexed assembly gather (cell vertex
        tables, membrane facet vertices, per-vertex sources) into a padded,
        device-contiguous vertex layout, so the STATE FIELDS (u, phi_m,
        gating) can be sharded over the device mesh alongside the solver
        vectors — the last replicated piece of the PETSc distributed-vector
        model (KNPEMIx_solver.py:452-468 scatters into distributed
        component Vecs).  After this call `assemble` expects u/phi_m/gates
        in the padded vertex layout ([nf, n_vpad] / [n_vpad])."""
        if getattr(self, "_vertex_remap", None) is not None:
            raise RuntimeError("apply_vertex_remap may only be called once")
        if self.mms is not None:
            raise RuntimeError("vertex remap does not support MMS problems")
        # order-generic: for P2 `newpos_v` is a NODE remap over n_pts
        # (vertices + edge midpoints) and every table below already indexes
        # the node space (cell_tab/mtab/src all carry node ids)
        newpos_v = np.asarray(newpos_v)
        it = jnp.int32
        self.mverts = jnp.asarray(
            newpos_v[np.asarray(self.mverts)], dtype=it)
        for s in self._sides:
            s["Vt"] = jnp.asarray(newpos_v[s["Vt_np"]], dtype=it)
        src = np.asarray(self.src)
        src_pad = np.zeros((src.shape[0], n_vpad), dtype=src.dtype)
        src_pad[:, newpos_v] = src
        self.src = jnp.asarray(src_pad)
        self.n_vpad = int(n_vpad)
        self._vertex_remap = newpos_v

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
        for s in self._sides:
            s["vol_slots"] = jnp.asarray(new_of[s["vol_slots_np"]], dtype=it)
            if s.get("vol_rows") is not None:
                s["vol_rows"] = jnp.asarray(
                    newpos[np.asarray(s["vol_rows"])], dtype=it)
                s["vol_cols"] = jnp.asarray(
                    newpos[np.asarray(s["vol_cols"])], dtype=it)
        # nullspace-repair structure: slots into the padded value layout,
        # per-row entries scattered to padded rows (pad rows: self-slot 0
        # with zero mask — harmless)
        rep_pad = np.zeros(halo.n_padded, dtype=np.int64)
        rep_pad[newpos] = new_of[np.asarray(self.phi_repair_slots)]
        self.phi_repair_slots_np = rep_pad        # host copy (df32 sharded)
        self.phi_repair_slots = jnp.asarray(rep_pad, dtype=it)
        mask_pad = np.zeros(vg.shape[0])
        mask_pad[new_of] = np.asarray(self.phi_col_mask)
        self.phi_col_mask_np = mask_pad           # host copy (df32 sharded)
        self.phi_col_mask = jnp.asarray(mask_pad, dtype=dtype)

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
        ns[newpos] = self.nullspace_np
        self.nullspace_np = ns
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

    def _setup_mms(self, rhs_rows, mverts, mgeom, L_f, wq):
        """mverts: facet DOF table (padded); mgeom: facet VERTEX table
        (padded, for measures/coords/normals — identical for P1)."""
        from knp_emi_cgx_tpu.fem.p1 import (cell_quadrature, facet_geometry,
                                            facet_quadrature)

        topo = self.topo
        mesh = topo.mesh
        dim = mesh.dim
        fd = self.field_dof
        N, nvar = self.N_ions, self.nvar
        dtype = self.dtype
        md = {}
        Nq_geom, _ = facet_quadrature(dim, degree=10)

        # --- volume source quadrature per side ---
        if self.order == 2:
            from knp_emi_cgx_tpu.fem.p2 import cell_shape_values
            Nc, wc = cell_shape_values(dim, degree=10)
        else:
            Nc, wc = cell_quadrature(dim, degree=10)
        md["Ncell"] = jnp.asarray(Nc, dtype=dtype)
        md["wcell"] = jnp.asarray(wc, dtype=dtype)
        for si, s in enumerate(self._sides):
            Vt_np = s["Vt_np"]
            # node coords at the dof table reproduce the affine map exactly
            # under the matching shape table (P2 interpolates linears)
            coords = self.points_np[Vt_np]                    # [nc, nv, dim]
            md[f"qp_x_{si}"] = jnp.asarray(
                np.einsum("cvd,qv->cqd", coords, Nc), dtype=dtype)
            # cell measures (padded cells have zero mass => zero volume)
            vol = s["M_e_np"].sum(axis=(1, 2))
            md[f"vol_{si}"] = jnp.asarray(vol, dtype=dtype)
            for k in range(N):
                rhs_rows.append(fd[s["ion_off"] + k][Vt_np].ravel())
            rhs_rows.append(fd[s["phi_f"]][Vt_np].ravel())

        # --- membrane facet qp coords + normals (out of intra, '+') ---
        n_real = len(topo.membrane_cell_intra)
        fqx = np.einsum("fvd,qv->fqd", mesh.points[mgeom], Nq_geom)
        md["facet_qp_x"] = jnp.asarray(fqx, dtype=dtype)
        normals = np.zeros((mverts.shape[0], dim))
        intra_centroid = mesh.points[
            mesh.cells[topo.membrane_cell_intra]].mean(axis=1)
        normals[:n_real] = self._oriented_normals(
            mesh.points, mgeom[:n_real], intra_centroid)
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
        bqx = np.einsum("fvd,qv->fqd", mesh.points[bfacets], Nq_geom)
        cell_centroid = mesh.points[
            mesh.cells[topo.facet_cells[bmask, 0]]].mean(axis=1)
        bn = self._oriented_normals(mesh.points, bfacets, cell_centroid)
        md["bqp_x"] = jnp.asarray(bqx, dtype=dtype)
        md["bnormal"] = jnp.asarray(bn, dtype=dtype)
        md["bL"] = jnp.asarray(bL, dtype=dtype)
        btab = (self.node_space.facet_nodes(bfacets)
                if self.order == 2 else bfacets)
        for k in range(N):
            rhs_rows.append(fd[nvar + k][btab].ravel())
        rhs_rows.append(fd[self.PHI_E][btab].ravel())

        # --- Dirichlet values: extracellular exact fields at boundary dofs
        # (KNPEMIx_problem.py:109-134 — MMS BCs only on the We fields) ---
        bdofs_v = self.boundary_dofs_np
        bpts = self.points_np[bdofs_v]
        bc_entries = {}
        for k, ion in enumerate(self.params.ion_list):
            f = nvar + k
            dofs = fd[f][bdofs_v]
            bc_entries[f"{ion['name']}_e"] = (
                jnp.asarray(dofs[dofs >= 0], dtype=jnp.int32),
                jnp.asarray(bpts[dofs >= 0], dtype=dtype))
        dofs = fd[self.PHI_E][bdofs_v]
        bc_entries["phi_e"] = (
            jnp.asarray(dofs[dofs >= 0], dtype=jnp.int32),
            jnp.asarray(bpts[dofs >= 0], dtype=dtype))
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
        vol_scatters = []   # (slots, masked pair vals, raw pair vals) per side

        # ---- volume dynamic blocks + volume RHS ----
        # drift blocks are pre-summed per vertex PAIR and the RHS per vertex
        # RANK before the global scatter — the scatter then moves O(E)
        # values instead of O(16*nc)
        for s in self._sides:
            Vt, K_e, M_e = s["Vt"], s["K_e"], s["M_e"]
            ion_off, Dkey = s["ion_off"], s["Dkey"]
            coefs = []
            phi_coef = 0.0
            for k, ion in enumerate(p.ion_list):
                D, z = ion[Dkey], ion["z"]
                kvals = u[ion_off + k][Vt]                            # [nc, nv]
                if self.order == 2:
                    # drift block = sum_m c_m * Q_e[c,m,a,b]: keep the full
                    # nodal coefficient (the P1 cell-mean is only exact for
                    # constant-gradient test pairs)
                    coefs.append((dt * D * z / p.psi) * kvals)
                    phi_coef = phi_coef + (dt * z * z * D / p.psi) * kvals
                else:
                    kmean = jnp.mean(kvals, axis=1)                   # [nc]
                    coefs.append((dt * D * z / p.psi) * kmean)
                    phi_coef = phi_coef + (dt * z * z * D / p.psi) * kmean
                # RHS: (k_prev, v) + dt*(f, v), pre-summed to rank level
                fvals = kvals + dt * self.src[ion_off + k][Vt]
                contrib = jnp.einsum("cab,cb->ca", M_e, fvals)
                rhs_vals.append(jax.ops.segment_sum(
                    contrib.reshape(-1), s["rank_flat"],
                    num_segments=s["nside"]))
            coefs.append(phi_coef)
            if self.order == 2:
                C = jnp.stack(coefs)                                  # [nvar, nc, nn]
                prods = jnp.einsum("vcm,cmab->vcab",
                                   C, s["Q_e"]).reshape(self.nvar, -1)
            else:
                C = jnp.stack(coefs)                                  # [nvar, nc]
                prods = (C[:, :, None, None] * K_e[None]).reshape(self.nvar, -1)
            pv = jax.ops.segment_sum(prods.T, s["pair_id"],
                                     num_segments=s["E"])             # [E, nvar]
            pvf = pv.T.reshape(-1)           # block-major [(k,phi)..., (phi,phi)]
            masked = (pvf * s["vol_keep"] if "vol_keep" in s and
                      s.get("vol_keep") is not None else pvf)
            vol_scatters.append((s["vol_slots"], masked, pvf, s))

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
        if self.dyn_keep is not None:
            dyn_flat = dyn_flat * self.dyn_keep
        if self.rhs_keep is not None:
            rhs_flat = rhs_flat * self.rhs_keep
        csr_vals = self.A_static_vals + jax.ops.segment_sum(
            dyn_flat, self.dyn_slots, num_segments=self.nnz_out)
        for slots, masked, _raw, _s in vol_scatters:
            csr_vals = csr_vals.at[slots].add(masked)
        b = jax.ops.segment_sum(rhs_flat, self.rhs_rows,
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
            for _slots, _masked, raw, s in vol_scatters:
                lift = lift + jax.ops.segment_sum(
                    raw * s["vol_lift_mask"] * bc_values[s["vol_cols"]],
                    s["vol_rows"], num_segments=self.n_out)
            b = b - lift
            b = jnp.where(self.bc_flag, bc_values, b)

        return csr_vals, b
