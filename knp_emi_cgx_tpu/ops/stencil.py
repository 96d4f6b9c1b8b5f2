"""Lattice-stencil (diagonal-offset) storage for the KNP-EMI operator —
the TPU-native SpMV for structured meshes.

Why: XLA lowers the gather in `x[cols]` to per-element loads (~1.4e8
elem/s measured on the v5e — `scripts/tpu_truth.py`), which makes the ELL
matvec the dominant cost of every Krylov iteration, ~500x off the HBM
bandwidth bound.  On the generated structured meshes (unit square/cube,
tissue boxes — `mesh/generation.py` numbers lattice vertices
lexicographically) every mesh neighbor sits at a CONSTANT index offset, so
a gather can become a shifted contiguous slice, which runs at full memory
bandwidth.  Measured: 1.6 ms vs 45 ms per df32 matvec at 405k dofs
(`scripts/tpu_stencil_probe.py`) — a ~28x step-rate lever.

Representation.  The compacted monolithic dof space (field-major with
per-side rank compaction, `ops/assembly.py:148-168`) does NOT have constant
offsets — the side compaction destroys them.  The UNCOMPACTED lattice space
does: dof_lat(f, v) = f * n_pts + v over ALL lattice points, with inactive
(f, v) slots exactly zero.  Every CSR entry (row, col) maps to a triple
(f_row, f_col, dv = v_col - v_row); on a structured mesh the number of
distinct triples is tiny (e.g. 28 coupled field pairs x <= 15 vertex
offsets = 404 diagonals on 3D tissue, measured) and INDEPENDENT of mesh
size.  The operator becomes

    y[f_r * n_pts : +n_pts] += vals[d] * x_pad[f_c * n_pts + dv : +n_pts]

for each diagonal d — slices at trace-time-constant starts, no gathers.
Entries whose slice crosses a lattice boundary (or the segment of the next
field) have vals[d][v] == 0 by construction (no CSR entry there), so the
out-of-range reads are harmless.

Unstructured meshes: the triple count grows with n; the constructor
refuses (`n_diags > max_diags`) and callers fall back to the ELL path.

Reference parity note: this replaces PETSc MatAIJ's role for the iterative
production path (KNPEMIx_solver.py:104-116, 435); values are refreshed
from the same per-step assembly (`ops/assembly.py:1077`), so the operator
is bit-identical to the CSR one — only the matvec schedule differs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.solvers.df32 import (df_add, df_from_f32, df_scale_f32,
                                          df_sum)


def detect_lattice(points: np.ndarray):
    """Return the lattice dims (memory-major, minor axis last) when the
    point cloud is a lexicographically numbered tensor grid, else None.

    The generated meshes number vertices v = (iz*(ny+1) + iy)*(nx+1) + ix
    (mesh/generation.py:103-110; 2D analog y-major), which is exactly what
    the structured transfers in solvers/lattice_amg.py need.  Imported
    meshes with arbitrary numbering return None and callers fall back to
    the unstructured (gather) path."""
    n, dim = points.shape
    axes = []
    for d in range(dim):
        axes.append(np.unique(points[:, d]))
    sizes = [len(a) for a in axes]
    if int(np.prod(sizes)) != n:
        return None
    idx = [np.searchsorted(axes[d], points[:, d]) for d in range(dim)]
    if dim == 2:
        flat = idx[1] * sizes[0] + idx[0]
        dims = (sizes[1], sizes[0])
    elif dim == 3:
        flat = (idx[2] * sizes[1] + idx[1]) * sizes[0] + idx[0]
        dims = (sizes[2], sizes[1], sizes[0])
    else:
        return None
    if not np.array_equal(flat, np.arange(n)):
        return None
    return dims


def bucket_offsets(A, max_diags: int = 512):
    """Host-side offset bucketing of a square scipy CSR matrix on a
    lexicographic lattice: returns (offsets [K] int64 ascending,
    stack [K, n] float32) with stack[k, r] = A[r, r + offsets[k]].

    Raises ValueError when the pattern has more than max_diags distinct
    offsets (not lattice-structured in this numbering)."""
    A = A.tocoo()
    n = A.shape[0]
    d = A.col.astype(np.int64) - A.row.astype(np.int64)
    offs, diag_id = np.unique(d, return_inverse=True)
    if offs.shape[0] > max_diags:
        raise ValueError(f"{offs.shape[0]} diagonals (> {max_diags})")
    stack = np.zeros((offs.shape[0], n), dtype=np.float32)
    # duplicate (row, col) entries accumulate like COO->CSR would
    np.add.at(stack, (diag_id, A.row.astype(np.int64)),
              A.data.astype(np.float32))
    return offs, stack


def dia_matvec_df(stack, starts, pad_lo, pad_hi, xh, xl):
    """y = A x (df32 x, f32 diagonal stack [K, n]) for a single-field
    lattice operator; compensated tree reduction.  `starts` are
    trace-time-constant slice starts into the padded vector."""
    n = stack.shape[1]
    xph = jnp.pad(xh, (pad_lo, pad_hi))
    xpl = jnp.pad(xl, (pad_lo, pad_hi))
    Xh = jnp.stack([jax.lax.slice(xph, (s,), (s + n,)) for s in starts])
    Xl = jnp.stack([jax.lax.slice(xpl, (s,), (s + n,)) for s in starts])
    ph, pl = df_scale_f32(Xh, Xl, stack)
    return df_sum(ph, pl, axis=0)


class StencilMatrix:
    """Diagonal-stack storage of the monolithic KNP-EMI operator over the
    uncompacted (field, lattice-vertex) space.

    Built once from the assembler's static CSR pattern (host-side numpy
    only — never reads a device array).  Per-step values arrive as the
    assembled CSR value vector and are rearranged by one static scatter
    (`diag_values`).

    Raises ValueError when the pattern is not lattice-structured
    (n_diags > max_diags) — callers fall back to EllMatrix.
    """

    def __init__(self, assembler, max_diags: int = 4096):
        fd = assembler.field_dof                    # [nf, n_pts], -1 inactive
        nf, n_pts = fd.shape
        n_dofs = assembler.n_dofs

        inv_f = np.full(n_dofs, -1, dtype=np.int64)
        inv_v = np.full(n_dofs, -1, dtype=np.int64)
        for f in range(nf):
            act = np.nonzero(fd[f] >= 0)[0]
            inv_f[fd[f, act]] = f
            inv_v[fd[f, act]] = act
        if np.any(inv_f < 0):
            raise ValueError("field_dof does not cover the dof space")

        rows = assembler.csr_rows_np
        cols = assembler.csr_cols_np
        f_r, v_r = inv_f[rows], inv_v[rows]
        f_c, v_c = inv_f[cols], inv_v[cols]
        dv = v_c - v_r
        span = 2 * n_pts + 1
        key = (f_r * nf + f_c) * span + (dv + n_pts)
        ukeys, diag_id = np.unique(key, return_inverse=True)
        n_diags = ukeys.shape[0]
        if n_diags > max_diags:
            raise ValueError(
                f"pattern has {n_diags} lattice diagonals (> {max_diags}); "
                "not stencil-structured")

        self.nf, self.n_pts = nf, n_pts
        self.n_lat = nf * n_pts
        self.n_dofs = n_dofs
        self.n_diags = n_diags

        pair = ukeys // span
        self.diag_fr = (pair // nf).astype(np.int64)
        self.diag_fc = (pair % nf).astype(np.int64)
        self.diag_dv = (ukeys % span - n_pts).astype(np.int64)
        # ukeys ascend in f_r-major order, so each row field's diagonals
        # occupy a CONTIGUOUS id range -> static slices of the value stack
        self._fr_range = []
        for f in range(nf):
            ids = np.nonzero(self.diag_fr == f)[0]
            if ids.size == 0:
                self._fr_range.append((0, 0))
                continue
            lo, hi = int(ids[0]), int(ids[-1]) + 1
            assert hi - lo == ids.size, "diag ids not contiguous per field"
            self._fr_range.append((lo, hi))

        # CSR slot -> position in the [n_diags, n_pts] diagonal stack
        slot = diag_id * n_pts + v_r
        if np.unique(slot).shape[0] != slot.shape[0]:
            raise AssertionError("CSR->diag mapping is not injective")
        self.diag_slot_np = slot
        self.diag_slot = jnp.asarray(slot.astype(np.int32))

        # padded-x slice starts per diagonal (python ints -> static slices)
        mono_off = self.diag_fc * n_pts + self.diag_dv
        self.pad_lo = int(max(0, -(mono_off.min())))
        self.pad_hi = int(max(0, int(mono_off.max()) + n_pts - self.n_lat))
        self._starts = [int(o) + self.pad_lo for o in mono_off]
        # diagonals grouped by row field (accumulation order = ascending
        # diag id within each field, deterministic)
        self._by_fr = [np.nonzero(self.diag_fr == f)[0].tolist()
                       for f in range(nf)]

        # compacted dof -> lattice position (inject/extract, field scatter)
        lat = np.empty(n_dofs, dtype=np.int64)
        for f in range(nf):
            act = np.nonzero(fd[f] >= 0)[0]
            lat[fd[f, act]] = f * n_pts + act
        self.lat_of_dof_np = lat
        self.lat_of_dof = jnp.asarray(lat.astype(np.int32))

        # nullspace-repair structure (solvers/df32.py repaired_ell_values
        # semantics, restated on diagonals): row phi-column sums come from
        # the diagonals whose col field is a potential; the correction
        # lands on the row's (f, phi_side(f), dv=0) diagonal
        phi_i, phi_e = assembler.PHI_I, assembler.PHI_E
        self._phi_diags_by_fr = [
            [int(d) for d in self._by_fr[f]
             if self.diag_fc[d] in (phi_i, phi_e)]
            for f in range(nf)]
        self._repair_diag = []
        for f in range(nf):
            pf = phi_i if f <= phi_i else phi_e
            hits = np.nonzero((self.diag_fr == f) & (self.diag_fc == pf)
                              & (self.diag_dv == 0))[0]
            if hits.shape[0] != 1:
                raise AssertionError("missing (f, phi, dv=0) repair diagonal")
            self._repair_diag.append(int(hits[0]))

    # -- per-step value refresh -------------------------------------------
    def diag_values(self, csr_vals):
        """[n_diags, n_pts] diagonal stack from assembled CSR values.

        Jittable; one static unique-index scatter (same cost class as the
        assembly's own value scatters)."""
        flat = jnp.zeros(self.n_diags * self.n_pts, dtype=csr_vals.dtype)
        flat = flat.at[self.diag_slot].set(csr_vals)
        return flat.reshape(self.n_diags, self.n_pts)

    def repaired_diag_values(self, csr_vals):
        """(diag_h, lo_rows): f32 diagonal stack plus the nullspace-repair
        correction, stored as ONE [nf, n_pts] row array (the correction is
        nonzero only on the per-field (f, phi, dv=0) diagonal) — the df32
        low part of the repaired operator at an 8x smaller footprint than a
        full lo stack."""
        dh = self.diag_values(csr_vals)
        lo = []
        for f in range(self.nf):
            ids = self._phi_diags_by_fr[f]
            stack = jnp.stack([dh[d] for d in ids])
            sh, sl = df_sum(*df_from_f32(stack), axis=0)
            lo.append(-(sh + sl))            # exact sum, one rounding
        return dh, jnp.stack(lo)

    # -- matvec -------------------------------------------------------------
    # Trace-size discipline: a naive per-diagonal slice + compensated-add
    # chain unrolls to ~15k HLO ops inside the GMRES while_loop and XLA
    # compiles it for MINUTES.  Instead: compute each UNIQUE slice once
    # (different field pairs share (f_c, dv) slices), stack each row
    # field's shifted operands (the field's diagonal ids are a contiguous
    # range -> static value-stack slice), and reduce with one df tree sum.

    def _slice(self, xpad, start):
        return jax.lax.slice(xpad, (start,), (start + self.n_pts,))

    def _shift_stack(self, xpad, f):
        lo, hi = self._fr_range[f]
        # unique slices memoized per (xpad id, start) at trace time
        cache = {}

        def sl(s):
            if s not in cache:
                cache[s] = self._slice(xpad, s)
            return cache[s]

        return jnp.stack([sl(self._starts[d]) for d in range(lo, hi)])

    def matvec_df(self, diag_h, xh, xl, lo_rows=None):
        """y = A x for df32 x over the lattice space; diag_h f32 values,
        optional lo_rows [nf, n_pts] repair corrections (df32 low part on
        the (f, phi, dv=0) diagonals).  Compensated to ~2^-48 like
        EllMatrix.matvec_df (tree reduction over the diagonal axis)."""
        xph = jnp.pad(xh, (self.pad_lo, self.pad_hi))
        xpl = jnp.pad(xl, (self.pad_lo, self.pad_hi))
        out_h, out_l = [], []
        for f in range(self.nf):
            lo, hi = self._fr_range[f]
            Vh = jax.lax.slice(diag_h, (lo, 0), (hi, self.n_pts))
            Xh = self._shift_stack(xph, f)
            Xl = self._shift_stack(xpl, f)
            ph, pl = df_scale_f32(Xh, Xl, Vh)
            ah, al = df_sum(ph, pl, axis=0)
            if lo_rows is not None:
                d0 = self._repair_diag[f]
                s0 = self._starts[d0]
                ph, pl = df_scale_f32(self._slice(xph, s0),
                                      self._slice(xpl, s0), lo_rows[f])
                ah, al = df_add(ah, al, ph, pl)
            out_h.append(ah)
            out_l.append(al)
        return jnp.concatenate(out_h), jnp.concatenate(out_l)

    def matvec_f32(self, diag_h, x):
        xpad = jnp.pad(x, (self.pad_lo, self.pad_hi))
        out = []
        for f in range(self.nf):
            lo, hi = self._fr_range[f]
            Vh = jax.lax.slice(diag_h, (lo, 0), (hi, self.n_pts))
            X = self._shift_stack(xpad, f)
            out.append(jnp.sum(Vh * X, axis=0))
        return jnp.concatenate(out)

    # -- compacted <-> lattice ------------------------------------------------
    def inject(self, x):
        """Compacted monolithic vector -> lattice vector (zeros inactive)."""
        out = jnp.zeros(x.shape[:-1] + (self.n_lat,), dtype=x.dtype)
        return out.at[..., self.lat_of_dof].set(x)

    def extract(self, y_lat):
        return y_lat[..., self.lat_of_dof]

    def wrap_precond_df(self, apply_df):
        """Lift a compacted-space df32 preconditioner apply to the lattice
        space (extract -> apply -> inject); zero on inactive slots, so the
        Krylov iteration stays inside the active subspace."""
        def apply_lat(rh, rl):
            yh, yl = apply_df(self.extract(rh), self.extract(rl))
            return self.inject(yh), self.inject(yl)
        return apply_lat

    # -- device-array bundling (utils/devicestate.py pattern) --
    DEVICE_ATTRS = ("diag_slot", "lat_of_dof")

    def device_state(self):
        return {k: getattr(self, k) for k in self.DEVICE_ATTRS}

    def install(self, st):
        old = {k: getattr(self, k) for k in st}
        for k, v in st.items():
            setattr(self, k, v)
        return old
