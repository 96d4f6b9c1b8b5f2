"""Smoothed-aggregation algebraic multigrid, TPU-native.

The reference leans on hypre BoomerAMG through PETSc
(`KNPEMIx_solver.py:267-273`) for the near-singular potential blocks of the
block-diagonal preconditioner.  TPU has no hypre — and classical AMG's
sequential triangular smoothers map terribly onto the MXU/VPU anyway.  This
module rebuilds the capability TPU-first:

  * SETUP (host, numpy/scipy, once per run): greedy aggregation on the
    strength graph, smoothed prolongation P = (I - omega D^-1 A) P0,
    Galerkin coarse operators A_c = P^T A P, recursing until the coarsest
    level is small enough for a dense inverse.
  * APPLY (device, jittable): a V-cycle whose every ingredient is a
    static-sparsity CSR SpMV or a small dense matvec — Chebyshev/Jacobi
    smoothing (polynomial smoothers are the TPU-appropriate choice: no
    sequential dependencies, pure fused VPU work), restriction/prolongation
    as SpMVs, dense coarse solve on the MXU.

The result is a mesh-robust O(n) preconditioner whose application is one
fused XLA computation — no host round-trips inside the Krylov loop.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp



def _up(x, dtype):
    """Host-convert then device_put — a jnp.asarray dtype conversion from
    numpy compiles one convert_element_type executable PER SHAPE, which at
    tissue scale (44 AMG levels x 8 blocks x several arrays) cost ~2 min of
    setup; numpy conversion + device_put costs none."""
    import numpy as _np
    import jax.numpy as _jnp
    return _jnp.asarray(_np.asarray(x, dtype=_np.dtype(dtype)))


def _strength_graph(A: sp.csr_matrix, theta: float = 0.08) -> sp.csr_matrix:
    """Symmetric strength-of-connection: keep |a_ij| >= theta*sqrt(a_ii a_jj)."""
    d = np.sqrt(np.abs(A.diagonal()))
    C = A.tocoo()
    keep = np.abs(C.data) >= theta * d[C.row] * d[C.col]
    keep &= C.row != C.col
    return sp.csr_matrix((C.data[keep], (C.row[keep], C.col[keep])), shape=A.shape)


def _aggregate(C: sp.csr_matrix) -> np.ndarray:
    """Greedy aggregation (standard SA pass 1+2). Returns agg id per node.
    Uses the native C++ kernel when available (knp_native.cpp — the hypre
    coarsening equivalent); pure-Python fallback below."""
    try:
        from knp_emi_cgx_tpu import native

        res = native.aggregate(C.indptr, C.indices)
        if res is not None:
            return res[0]
    except Exception:
        pass
    n = C.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    next_agg = 0
    indptr, indices = C.indptr, C.indices
    # pass 1: roots with fully unaggregated neighbourhoods
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if np.all(agg[nbrs] == -1):
            agg[i] = next_agg
            agg[nbrs] = next_agg
            next_agg += 1
    # pass 2: attach leftovers to an aggregated neighbour (or make singleton)
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        tagged = nbrs[agg[nbrs] != -1]
        if len(tagged):
            agg[i] = agg[tagged[0]]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg


def _lam_max_jacobi(A: sp.csr_matrix, iters: int = 20,
                    Binv: sp.csr_matrix | None = None) -> float:
    """Power-iteration estimate of lambda_max(B A) (B = D^-1 by default)."""
    if Binv is None:
        Binv = sp.diags(1.0 / A.diagonal())
    x = np.random.default_rng(0).normal(size=A.shape[0])
    x /= np.linalg.norm(x)
    lam = 1.0
    for _ in range(iters):
        y = Binv @ (A @ x)
        lam = np.linalg.norm(y)
        if lam == 0:
            return 1.0
        x = y / lam
    return float(lam)


def _lam_max_per_component(A: sp.csr_matrix, comp: np.ndarray,
                           Binv: sp.csr_matrix, iters: int = 20) -> np.ndarray:
    """Per-dof lambda_max(B A) where A/B are block-diagonal across the
    `comp` labels (the monolithic field-block preconditioner): simultaneous
    per-component power iteration — one global SpMV per iteration with
    per-component renormalisation is exactly independent power iterations,
    because no entry couples two components.  Returns lam per DOF (constant
    within each component)."""
    ncomp = int(comp.max()) + 1
    x = np.random.default_rng(0).normal(size=A.shape[0])
    lam = np.ones(ncomp)
    for _ in range(iters):
        nrm = np.sqrt(np.bincount(comp, x * x, minlength=ncomp))
        nrm[nrm == 0] = 1.0
        x = x / nrm[comp]
        y = Binv @ (A @ x)
        lam = np.sqrt(np.bincount(comp, y * y, minlength=ncomp))
        x = y
    lam[lam == 0] = 1.0
    return lam[comp]


def _disjoint_pairs(pairs: np.ndarray, n: int) -> np.ndarray:
    """Greedy maximal disjoint subset of dof pairs (each dof in <=1 block)."""
    used = np.zeros(n, dtype=bool)
    keep = np.zeros(len(pairs), dtype=bool)
    for k in range(len(pairs)):
        a, b = pairs[k]
        if a != b and not used[a] and not used[b]:
            keep[k] = True
            used[a] = used[b] = True
    return pairs[keep]


def _block_dinv(A: sp.csr_matrix, pairs: np.ndarray | None) -> sp.csr_matrix:
    """Block-diagonal inverse smoothing operator: exact 2x2 inverses on the
    given disjoint dof pairs (membrane intra/extra partners, whose
    difference mode pointwise Jacobi cannot smooth — the 2x2 blocks are
    near-singular in that mode when the membrane mass dominates), plain
    1/a_ii elsewhere.  Applied on device as one static CSR SpMV — batched
    tiny inverses are exactly what the VPU wants."""
    n = A.shape[0]
    d = A.diagonal()
    if pairs is None or len(pairs) == 0:
        return sp.diags(1.0 / d).tocsr()
    i, j = pairs[:, 0], pairs[:, 1]
    aij = np.asarray(A[i, j]).ravel()
    aji = np.asarray(A[j, i]).ravel()
    det = d[i] * d[j] - aij * aji
    ok = np.abs(det) > 1e-14 * np.abs(d[i] * d[j])
    # fall back to pointwise on (near-)singular blocks
    det = np.where(ok, det, 1.0)
    bii = np.where(ok, d[j] / det, 1.0 / d[i])
    bjj = np.where(ok, d[i] / det, 1.0 / d[j])
    bij = np.where(ok, -aij / det, 0.0)
    bji = np.where(ok, -aji / det, 0.0)
    unpaired = np.ones(n, dtype=bool)
    unpaired[i] = unpaired[j] = False
    u = np.nonzero(unpaired)[0]
    rows = np.concatenate([u, i, i, j, j])
    cols = np.concatenate([u, i, j, j, i])
    vals = np.concatenate([1.0 / d[u], bii, bij, bjj, bji])
    B = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    B.sort_indices()
    return B


class AMGLevel:
    """Per-level device arrays.  All index structures are data (passed as jit
    arguments via device_state), never closure constants."""

    ARRAYS = ("A_indices", "A_row_ids", "A_vals",
              "B_indices", "B_row_ids", "B_vals",
              "P_indices", "P_row_ids", "P_vals",
              "R_indices", "R_row_ids", "R_vals",
              "A_ell_cols", "A_ell_vals", "B_ell_cols", "B_ell_vals",
              "P_ell_cols", "P_ell_vals", "R_ell_cols", "R_ell_vals",
              "lam_vec")

    def __init__(self, A: sp.csr_matrix, P: sp.csr_matrix | None, lam_max,
                 dtype, df: bool = False, Binv: sp.csr_matrix | None = None):
        from knp_emi_cgx_tpu.ops.spmv import expand_row_ids

        # lam_max may be a per-dof VECTOR (per-component spectral bounds,
        # see _lam_max_per_component) — the smoothers then use per-dof
        # Chebyshev-Jacobi weights, constant within each component
        if np.ndim(lam_max) > 0:
            self.lam_vec = _up(lam_max, dtype)
            lam_max = float(np.max(lam_max))
        else:
            self.lam_vec = None
        self.n = A.shape[0]
        self.A_indices = _up(A.indices, jnp.int32)
        self.A_row_ids = expand_row_ids(A.indptr)
        self.A_vals = _up(A.data, dtype)
        # smoothing operator B ~ block-diag(A)^-1 (see _block_dinv); plain
        # Jacobi when no pair blocks were requested
        if Binv is None:
            Binv = sp.diags(1.0 / A.diagonal()).tocsr()
        self.B_indices = _up(Binv.indices, jnp.int32)
        self.B_row_ids = expand_row_ids(Binv.indptr)
        self.B_vals = _up(Binv.data, dtype)
        self.lam_max = lam_max
        self.has_P = P is not None
        Pc = Rc = None
        if P is not None:
            Pc = P.tocsr()
            Rc = P.T.tocsr()
            self.nc = Pc.shape[1]
            self.P_indices = _up(Pc.indices, jnp.int32)
            self.P_row_ids = expand_row_ids(Pc.indptr)
            self.P_vals = _up(Pc.data, dtype)
            self.R_indices = _up(Rc.indices, jnp.int32)
            self.R_row_ids = expand_row_ids(Rc.indptr)
            self.R_vals = _up(Rc.data, dtype)
        if df:
            # compensated (double-f32) application path: ELL layouts whose
            # row reductions are df_add trees (solvers/df32.py)
            from knp_emi_cgx_tpu.solvers.df32 import EllMatrix

            ellA = EllMatrix(A.indptr, A.indices)
            self.A_ell_cols = ellA.cols
            self.A_ell_vals = jnp.asarray(
                ellA.ell_values(np.asarray(A.data, dtype=np.float32)))
            ellB = EllMatrix(Binv.indptr, Binv.indices)
            self.B_ell_cols = ellB.cols
            self.B_ell_vals = jnp.asarray(
                ellB.ell_values(np.asarray(Binv.data, dtype=np.float32)))
            if P is not None:
                ellP = EllMatrix(Pc.indptr, Pc.indices)
                self.P_ell_cols = ellP.cols
                self.P_ell_vals = jnp.asarray(
                    ellP.ell_values(np.asarray(Pc.data, dtype=np.float32)))
                ellR = EllMatrix(Rc.indptr, Rc.indices)
                self.R_ell_cols = ellR.cols
                self.R_ell_vals = jnp.asarray(
                    ellR.ell_values(np.asarray(Rc.data, dtype=np.float32)))


class SmoothedAggregationAMG:
    """V-cycle preconditioner for an SPD CSR matrix."""

    def __init__(self, A: sp.csr_matrix, dtype=jnp.float64,
                 max_levels: int = 10, coarse_size: int = 200,
                 theta: float = 0.08, omega: float = 4.0 / 3.0,
                 smooth_iters: int = 2, df: bool = False,
                 components: np.ndarray | None = None,
                 block_pairs: np.ndarray | None = None,
                 cache: bool = False,
                 per_component_lam: bool = False,
                 keep_host: bool = False,
                 cycles: int = 1, cycle_damp: float = 1.0):
        """components: optional int label per dof (e.g. biological
        compartment id).  When given, aggregates never span two components,
        so the tentative prolongation exactly reproduces every
        per-component-constant vector — the near-kernel of membrane-coupled
        (EMI-type) operators, whose low-energy modes are compartment
        constants with jumps across the membrane (the TPU-side analog of
        feeding hypre a near-nullspace; cf. the reference's per-block
        preconditioner `EMIx_problem.py:240-245` which sidesteps the issue
        by never coarsening across fields)."""
        self.dtype = dtype
        self.smooth_iters = smooth_iters
        # cycles: V-cycles per application (z += cycle(b - A z)); >1 closes
        # most of the gap to the P-form's exact-application iteration floor
        # (pc_lab: joint-phi s3c2 12.8 warm its vs 17.6 at s3c1, floor 11.2)
        self.cycles = cycles
        # damp extra cycles: M_2 = M + damp*M(I - A M) stays nonsingular
        # for all lam(MA) in (0,2] iff damp<1 (undamped 2-cycle measured
        # STAGNANT at tissue12x2c where lam(MA) reaches 2; scripts/pc_lab)
        self.cycle_damp = cycle_damp
        self.df = df
        self.levels: list[AMGLevel] = []
        # keep_host: retain the host-side (A, P, Binv, lam) per level — the
        # sharded-AMG build (parallel/sharded_amg.py) consumes them
        self.host_levels = None
        self.coarse_inv_np = None
        if per_component_lam and components is None:
            raise ValueError("per_component_lam requires components")

        A = A.tocsr()
        key = None
        if cache:
            # disk-cached hierarchy (utils/setupcache.py): the build is a
            # pure function of (A, setup params); a hit replays as device
            # uploads only
            from knp_emi_cgx_tpu.utils.setupcache import (content_key,
                                                          load_amg_hierarchy,
                                                          save_amg_hierarchy)

            key_arrays = [A.indptr, A.indices, A.data]
            extra = (f"ml{max_levels}_cs{coarse_size}_th{theta}_om{omega}")
            if components is not None:
                key_arrays.append(np.asarray(components))
                extra += "_comp"
            if block_pairs is not None and len(block_pairs):
                key_arrays.append(np.asarray(block_pairs))
                extra += "_bp"
            if per_component_lam:
                extra += "_pcl"
            key = content_key(*key_arrays, extra=extra)
            hit = load_amg_hierarchy(key)
            if hit is not None:
                host_levels, coarse_inv = hit
                for (Al, Pl, Bl, lam) in host_levels:
                    self.levels.append(AMGLevel(Al, Pl, lam, dtype, df=df,
                                                Binv=Bl))
                self.coarse_inv = _up(coarse_inv, dtype)
                if keep_host:
                    self.host_levels = host_levels
                    self.coarse_inv_np = coarse_inv
                return

        comp = None
        if components is not None:
            comp = np.asarray(components, dtype=np.int64)
            if comp.shape[0] != A.shape[0]:
                raise ValueError("components must have one label per dof")
        pairs = None
        if block_pairs is not None and len(block_pairs):
            pairs = _disjoint_pairs(
                np.asarray(block_pairs, dtype=np.int64), A.shape[0])

        host_levels = []
        for level in range(max_levels):
            Binv = _block_dinv(A, pairs)
            if per_component_lam:
                lam = _lam_max_per_component(A, comp, Binv)
            else:
                lam = _lam_max_jacobi(A, Binv=Binv)
            if A.shape[0] <= coarse_size:
                host_levels.append((A, None, Binv, lam))
                self.levels.append(AMGLevel(A, None, lam, dtype, df=df,
                                            Binv=Binv))
                break
            # theta filters ONLY the finest level: Galerkin coarse operators
            # are dense-ish with smoothly varying entries, and filtering
            # them strands most nodes as singletons — observed at 48^3
            # tissue: level-1 -> level-2 coarsened only 2.1x and the
            # level-2 operator came out DENSER than level 1 (1305 max
            # nnz/row), dominating the whole V-cycle.  Keeping every
            # off-diagonal on coarse levels is standard SA practice.
            C = _strength_graph(A, theta if level == 0 else 0.0)
            agg = _aggregate(C if C.nnz else sp.csr_matrix(A.shape))
            if comp is not None:
                # split every aggregate at component boundaries; relabel
                # densely.  np.unique on the (agg, comp) pairs gives each
                # surviving (aggregate, component) cell its own coarse dof.
                pair = agg * (comp.max() + 1) + comp
                uniq, agg = np.unique(pair, return_inverse=True)
                comp_next = uniq % (comp.max() + 1)
            nagg = int(agg.max()) + 1
            if nagg >= A.shape[0]:  # no coarsening possible
                host_levels.append((A, None, Binv, lam))
                self.levels.append(AMGLevel(A, None, lam, dtype, df=df,
                                            Binv=Binv))
                break
            P0 = sp.csr_matrix(
                (np.ones(A.shape[0]), (np.arange(A.shape[0]), agg)),
                shape=(A.shape[0], nagg))
            if per_component_lam:
                # per-dof damping: each component's rows smoothed with its
                # own spectral bound (the per-block prolongation smoother)
                P = P0 - omega * (sp.diags(1.0 / lam) @ (Binv @ (A @ P0)))
            else:
                P = P0 - (omega / lam) * (Binv @ (A @ P0))
            host_levels.append((A, P.tocsr(), Binv, lam))
            self.levels.append(AMGLevel(A, P, lam, dtype, df=df, Binv=Binv))
            A = (P.T @ A @ P).tocsr()
            A.sort_indices()
            if comp is not None:
                comp = comp_next
            if pairs is not None:
                # pair blocks propagate through the hierarchy: the two dofs
                # of a membrane pair land in different aggregates (component
                # splitting guarantees it), and their coarse images keep the
                # strong negative coupling that needs blockwise smoothing
                pi, pj = agg[pairs[:, 0]], agg[pairs[:, 1]]
                keep = pi != pj
                cp = np.unique(np.stack([pi[keep], pj[keep]], axis=1), axis=0)
                pairs = _disjoint_pairs(cp, nagg) if len(cp) else None
        # coarsest dense inverse (host — the matrix is tiny)
        dense = A.toarray()
        # guard singular coarse op (pure-Neumann blocks): regularise lightly
        scale = np.abs(dense).max() or 1.0
        dense = dense + 1e-12 * scale * np.eye(dense.shape[0])
        coarse_inv = np.linalg.inv(dense)
        self.coarse_inv = _up(coarse_inv, dtype)
        if key is not None:
            save_amg_hierarchy(key, host_levels, coarse_inv)
        if keep_host:
            self.host_levels = host_levels
            self.coarse_inv_np = coarse_inv

    # ------------------------------------------------------------------
    def device_state(self):
        out = {"levels": [], "coarse_inv": self.coarse_inv}
        for lv in self.levels:
            out["levels"].append({k: getattr(lv, k) for k in AMGLevel.ARRAYS
                                  if hasattr(lv, k)})
        return out

    def install(self, st):
        old = self.device_state()
        self.coarse_inv = st["coarse_inv"]
        for lv, d in zip(self.levels, st["levels"]):
            for k, v in d.items():
                setattr(lv, k, v)
        return old

    def _smooth(self, level: AMGLevel, x, b):
        """Chebyshev-weighted Jacobi sweeps (TPU-friendly polynomial)."""
        from knp_emi_cgx_tpu.ops.spmv import csr_mv

        # alternating two-weight scheme targeting [0.3*lam, 1.1*lam];
        # per-dof weights when per-component spectral bounds are available
        lam = level.lam_vec if level.lam_vec is not None else level.lam_max
        weights = (1.0 / (0.7 * lam), 1.0 / (1.1 * lam))
        for it in range(self.smooth_iters):
            omega = weights[it % 2]
            r = b - csr_mv(level.A_vals, x, level.A_indices, level.A_row_ids,
                           level.n)
            x = x + omega * csr_mv(level.B_vals, r, level.B_indices,
                                   level.B_row_ids, level.n)
        return x

    def _cycle(self, k: int, b):
        from knp_emi_cgx_tpu.ops.spmv import csr_mv

        level = self.levels[k]
        if not level.has_P:
            return self.coarse_inv @ b
        x = self._smooth(level, jnp.zeros_like(b), b)
        r = b - csr_mv(level.A_vals, x, level.A_indices, level.A_row_ids,
                       level.n)
        rc = csr_mv(level.R_vals, r, level.R_indices, level.R_row_ids,
                    level.nc)
        xc = self._cycle(k + 1, rc)
        x = x + csr_mv(level.P_vals, xc, level.P_indices, level.P_row_ids,
                       level.n)
        x = self._smooth(level, x, b)
        return x

    def __call__(self, b):
        from knp_emi_cgx_tpu.ops.spmv import csr_mv

        x = self._cycle(0, b)
        lv = self.levels[0]
        for _ in range(self.cycles - 1):
            r = b - csr_mv(lv.A_vals, x, lv.A_indices, lv.A_row_ids, lv.n)
            x = x + self.cycle_damp * self._cycle(0, r)
        return x

    # ------------------------------------------------------------------
    # compensated (double-f32) application — requires df=True at setup
    # ------------------------------------------------------------------
    def _smooth_df(self, level: AMGLevel, xh, xl, bh, bl):
        from knp_emi_cgx_tpu.solvers.df32 import (df_add, df_scale_f32,
                                                  ell_mv_df)

        if level.lam_vec is not None:
            lam = level.lam_vec.astype(jnp.float32)
            weights = (1.0 / (np.float32(0.7) * lam),
                       1.0 / (np.float32(1.1) * lam))
        else:
            lam = level.lam_max
            weights = (np.float32(1.0 / (0.7 * lam)),
                       np.float32(1.0 / (1.1 * lam)))
        for it in range(self.smooth_iters):
            omega = weights[it % 2]
            yh, yl = ell_mv_df(level.A_ell_cols, level.A_ell_vals, xh, xl)
            rh, rl = df_add(bh, bl, -yh, -yl)
            uh, ul = ell_mv_df(level.B_ell_cols, level.B_ell_vals, rh, rl)
            uh, ul = df_scale_f32(uh, ul, omega)
            xh, xl = df_add(xh, xl, uh, ul)
        return xh, xl

    def _cycle_df(self, k: int, bh, bl):
        from knp_emi_cgx_tpu.solvers.df32 import (df_add, dense_mv_df,
                                                  ell_mv_df, df_zeros_like)

        level = self.levels[k]
        if not level.has_P:
            return dense_mv_df(self.coarse_inv.astype(jnp.float32), bh, bl)
        z = df_zeros_like(bh)
        xh, xl = self._smooth_df(level, z[0], z[1], bh, bl)
        yh, yl = ell_mv_df(level.A_ell_cols, level.A_ell_vals, xh, xl)
        rh, rl = df_add(bh, bl, -yh, -yl)
        rch, rcl = ell_mv_df(level.R_ell_cols, level.R_ell_vals, rh, rl)
        xch, xcl = self._cycle_df(k + 1, rch, rcl)
        eh, el = ell_mv_df(level.P_ell_cols, level.P_ell_vals, xch, xcl)
        xh, xl = df_add(xh, xl, eh, el)
        return self._smooth_df(level, xh, xl, bh, bl)

    def apply_df(self, rh, rl):
        """Fixed-to-df-accuracy V-cycle apply on a df32 vector."""
        from knp_emi_cgx_tpu.solvers.df32 import (df_add, df_scale_f32,
                                                  ell_mv_df)

        if not hasattr(self.levels[0], "A_ell_cols"):
            raise RuntimeError("build SmoothedAggregationAMG with df=True")
        xh, xl = self._cycle_df(0, rh, rl)
        lv = self.levels[0]
        for _ in range(self.cycles - 1):
            yh, yl = ell_mv_df(lv.A_ell_cols, lv.A_ell_vals, xh, xl)
            sh, sl = df_add(rh, rl, -yh, -yl)
            eh, el = self._cycle_df(0, sh, sl)
            eh, el = df_scale_f32(eh, el, np.float32(self.cycle_damp))
            xh, xl = df_add(xh, xl, eh, el)
        return xh, xl
