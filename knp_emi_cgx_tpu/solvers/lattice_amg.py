"""Gather-free geometric-algebraic multigrid on lexicographic lattices.

The production V-cycle cost on the axon TPU is dominated by XLA's
per-element gather lowering (~1.4e8 elem/s — scripts/tpu_truth.py), which
hits every ELL matvec inside SmoothedAggregationAMG (smoother, residual,
P/R transfers).  On the STRUCTURED meshes the per-field preconditioner
blocks (solvers/precond.py `_build_blocks`) live on a lexicographic lattice
(mesh/generation.py), so every AMG ingredient has a gather-free form:

  * level operators  — offset-bucketed diagonal stacks: the matvec is K
    shifted contiguous slices (ops/stencil.py `dia_matvec_df`)
  * coarsening       — 2^dim lattice-block aggregates: the coarse grid is
    again a lexicographic lattice, so EVERY level stays stencil-structured
  * tentative P0     — per-axis 2x replication (pure reshape/repeat)
  * smoothed P/R     — P = (I - (omega/lam) D^-1 A) P0 applied as
    upsample + one stencil matvec (and R = P^T symmetrically); the SAME
    Jacobi-smoothed-aggregation transfer SmoothedAggregationAMG builds
    (amg.py:353-361), just never materialised as a gather matrix
  * smoother         — alternating two-weight Jacobi, identical semantics
    to SmoothedAggregationAMG._smooth_df (amg.py:445-464)
  * coarsest level   — dense inverse (embedded over the lattice points)

Inactive lattice points (a per-field block only covers its compartment's
closure) carry exactly-zero rows/columns; dinv is 0 there, the smoother
never updates them, and the final apply masks them, so the V-cycle is the
compacted SA V-cycle's structural twin with geometric aggregates.

Hierarchy values are static (the preconditioner is built once from the
initial state, like the reference's reassemble_P=False default,
KNPEMIx_solver.py:34), so setup is plain host scipy.

Reference role: hypre BoomerAMG under the block-diagonal preconditioner
(KNPEMIx_solver.py:267-273).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.ops.stencil import bucket_offsets, dia_matvec_df
from knp_emi_cgx_tpu.solvers.amg import _lam_max_jacobi
from knp_emi_cgx_tpu.solvers.df32 import (df_add, df_scale_f32, df_sum,
                                          df_zeros_like, dense_mv_df)


def _block_agg(dims, factors=None):
    """Flat coarse index per fine lattice point for per-axis block
    aggregates (factor 2 on coarsened axes, 1 on kept axes — e.g. the
    field axis of a joint multi-field lattice never coarsens), plus the
    coarse dims.  dims are memory-major (minor axis last)."""
    if factors is None:
        factors = (2,) * len(dims)
    cdims = tuple(-(-s // f) for s, f in zip(dims, factors))
    grids = np.meshgrid(*[np.arange(s) // f for s, f in zip(dims, factors)],
                        indexing="ij")
    flat = grids[0]
    for d in range(1, len(dims)):
        flat = flat * cdims[d] + grids[d]
    return flat.reshape(-1), cdims


class _Level:
    __slots__ = ("dims", "cdims", "factors", "starts", "pad_lo", "pad_hi",
                 "stack", "dinv", "w1", "w2", "wt", "has_P", "n")

    def __init__(self, A, dims, cdims, lam, omega, has_P, factors=None,
                 pair_stride=None, dia=True):
        """lam: lambda_max(Binv A) — a scalar, or a per-dof vector when the
        operator is block-diagonal over fields with different spectral
        scales (per-field bounds; constant within each field segment).

        dia=False: coarsest-marker level whose operator outgrew the DIA
        offset cap — only the dense coarse inverse is ever applied to it
        (see the overflow break in LatticeAMG.__init__), so the stack is
        left empty."""
        if dia:
            offs, stack_np = bucket_offsets(A)
        else:
            offs = np.zeros(0, dtype=np.int64)
            stack_np = np.zeros((0, A.shape[0]), dtype=np.float32)
        self.n = A.shape[0]
        self.dims = dims
        self.cdims = cdims
        self.factors = factors or (2,) * len(dims)
        self.pad_lo = int(max(0, -offs.min())) if len(offs) else 0
        self.pad_hi = int(max(0, offs.max())) if len(offs) else 0
        self.starts = [int(o) + self.pad_lo for o in offs]
        self.stack = jnp.asarray(stack_np)
        self.dinv = jnp.asarray(
            _pair_binv(A, pair_stride).astype(np.float32))
        lam = np.asarray(lam, dtype=np.float32)
        # alternating two-weight Jacobi targets [0.3*lam, 1.1*lam]; the
        # transfer weight is omega/lam (smoothed-aggregation standard)
        self.w1 = jnp.asarray(1.0 / (np.float32(0.7) * lam))
        self.w2 = jnp.asarray(1.0 / (np.float32(1.1) * lam))
        self.wt = jnp.asarray(np.float32(omega) / lam)
        self.has_P = has_P

    # device-array bundling
    ARRAYS = ("stack", "dinv", "w1", "w2", "wt")


def _pair_binv(A, pair_stride):
    """Smoother weights: plain inverted diagonal [n] when pair_stride is
    None, else the exact elementwise 2x2 block inverse [4, n_half] over
    (v, v + pair_stride) dof pairs — the membrane (phi_i, phi_e) pair
    smoothing that conquers the EMI operator (solvers/amg.py
    `_block_dinv`), here with NO gathers: on the joint lattice the pair
    partner is a constant stride away."""
    d = np.asarray(A.diagonal(), dtype=np.float64)
    if pair_stride is None:
        return np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    n = A.shape[0]
    s = int(pair_stride)
    assert n == 2 * s
    # cross coupling A[v, v+s] (and symmetric partner) via one diagonal
    Acoo = A.tocoo()
    c = np.zeros(n, dtype=np.float64)
    mask = Acoo.col - Acoo.row == s
    np.add.at(c, Acoo.row[mask], Acoo.data[mask])
    a11, a22, a12 = d[:s], d[s:], c[:s]
    det = a11 * a22 - a12 * a12
    act = (a11 != 0.0) & (a22 != 0.0)
    safe = np.where(act, np.where(det == 0.0, 1.0, det), 1.0)
    b11 = np.where(act, a22 / safe, np.where(a11 != 0, 1.0 / np.where(a11 == 0, 1, a11), 0.0))
    b22 = np.where(act, a11 / safe, np.where(a22 != 0, 1.0 / np.where(a22 == 0, 1, a22), 0.0))
    b12 = np.where(act, -a12 / safe, 0.0)
    return np.stack([b11, b12, b12, b22])    # [4, s]


def _upsample_crop(x, cdims, dims, factors):
    y = x.reshape(cdims)
    for ax, f in enumerate(factors):
        if f > 1:
            y = jnp.repeat(y, f, axis=ax)
    y = jax.lax.slice(y, (0,) * len(dims), dims)
    return y.reshape(-1)


def _downsum_df(h, l, dims, cdims, factors):
    """P0^T in df32: sum each per-axis block (compensated)."""
    nd = len(dims)
    pads = [(0, factors[d] * cdims[d] - dims[d]) for d in range(nd)]
    h = jnp.pad(h.reshape(dims), pads)
    l = jnp.pad(l.reshape(dims), pads)
    shape = []
    for d in range(nd):
        shape += [cdims[d], factors[d]]
    h = h.reshape(shape)
    l = l.reshape(shape)
    # move the block axes to the end and flatten them
    perm = list(range(0, 2 * nd, 2)) + list(range(1, 2 * nd, 2))
    h = jnp.transpose(h, perm).reshape(int(np.prod(cdims)), -1)
    l = jnp.transpose(l, perm).reshape(int(np.prod(cdims)), -1)
    return df_sum(h, l, axis=1)


def _binv_sp(A, pair_stride):
    """The smoother's Binv as a scipy operator (for lam estimation and
    transfer smoothing): inverted diagonal, or the exact 2x2 pair block
    inverse when pair_stride is set."""
    v = _pair_binv(A, pair_stride)
    if pair_stride is None:
        return sp.diags(v)
    s = int(pair_stride)
    b11, b12, _, b22 = v
    return sp.diags([b12, np.concatenate([b11, b22]), b12],
                    offsets=[-s, 0, s])


class LatticeAMG:
    """V-cycle preconditioner for one SPD per-field block (or the joint
    (phi_i, phi_e) pair, n_fields=2) lifted to the full lattice (zero
    rows/cols at inactive points).

    n_fields > 1: the operator lives on a joint (field, *spatial) lattice;
    the field axis never coarsens (aggregates must not span compartments —
    the joint near-kernel is per-compartment constants with membrane
    jumps).  pair_smooth: exact elementwise 2x2 block-Jacobi on the
    (v, v + n/2) dof pairs at EVERY level — the stride-addressed,
    gather-free analog of solvers/amg.py `block_pairs`, which is what
    conquers the capacitively-coupled membrane operator (EMI at 6-7 its)."""

    def __init__(self, B: sp.spmatrix, active: np.ndarray, dims,
                 smooth_iters: int = 2, omega: float = 4.0 / 3.0,
                 coarse_size: int = 200, max_levels: int = 10,
                 n_fields: int = 1, pair_smooth: bool = False,
                 cycles: int = 1, cycle_damp: float = 1.0,
                 deflate: np.ndarray | None = None,
                 per_field_lam: bool = False):
        """deflate: optional [k, n_lattice] near-kernel basis (e.g. one
        indicator per biological compartment, lifted to the lattice).
        Applied as an EXACT multiplicative coarse correction
        x1 = Z (Z^T A Z)^+ Z^T r before each V-cycle.  Geometric 2^dim
        aggregates can span DISCONNECTED compartments (two cells in one
        lattice block), so unlike strength-based SA the tentative
        prolongation cannot represent independent per-compartment
        constants — for potential blocks those modes carry ~C_M/F ~ 1e-7
        relative energy and the V-cycle stagnates on them (measured
        deflated contraction 0.999, scripts/check_jphi_contraction.py).
        The rank-k correction handles them exactly; on TPU it is two thin
        mask matmuls (MXU) + one stencil matvec — still gather-free."""
        self.cycles = cycles
        self.cycle_damp = np.float32(cycle_damp)
        dims = ((n_fields,) + tuple(dims)) if n_fields > 1 else tuple(dims)
        factors = (((1,) + (2,) * (len(dims) - 1)) if n_fields > 1
                   else (2,) * len(dims))
        if pair_smooth and n_fields != 2:
            raise ValueError("pair_smooth needs n_fields == 2")
        n_pts = int(np.prod(dims))
        B = B.tocoo()
        active = np.asarray(active, dtype=np.int64)
        A = sp.csr_matrix(
            (B.data, (active[B.row], active[B.col])),
            shape=(n_pts, n_pts))
        A.sum_duplicates()
        self.smooth_iters = smooth_iters
        self.levels: list[_Level] = []
        self.active_mask = jnp.asarray(
            np.isin(np.arange(n_pts), active).astype(np.float32))

        self.W = self.Gp = None
        self.defl_lab = self.Gp64 = None
        self.defl_k = 0
        if deflate is not None and len(deflate):
            Z = np.asarray(deflate, dtype=np.float64)
            assert Z.shape[1] == n_pts
            G = Z @ (A @ Z.T)
            Gp = np.linalg.pinv(G, rcond=1e-10)
            vals = Z[Z != 0]
            if ((Z != 0).sum(axis=0).max() <= 1
                    and np.all(vals == 1.0)):
                # the production case: rows are DISJOINT 0/1 compartment
                # indicators, so Z^T r is a segment_sum over a label
                # vector and Z t is a gather — O(n) instead of the dense
                # [k, n] masked matmuls, whose 164 MB W at 36^3x100c made
                # each apply 243 ms (r5 kernel probe; 2.25 ms at 24^3x8c
                # where W was 4.5 MB).  The correction runs in f64
                # (vectors of size n only — elementwise + one small
                # segment reduce, well under the emulated-f64 limits) so
                # it stays exact to the df budget.
                k = Z.shape[0]
                lab = np.full(n_pts, k, dtype=np.int32)
                rows, cols = np.nonzero(Z)
                lab[cols] = rows.astype(np.int32)
                self.defl_lab = jnp.asarray(lab)
                self.defl_k = k
                self.Gp64 = jnp.asarray(Gp)          # [k, k] f64
            else:
                self.W = jnp.asarray(Z.astype(np.float32))
                self.Gp = jnp.asarray(Gp.astype(np.float32))

        if per_field_lam and (pair_smooth or n_fields < 2):
            raise ValueError("per_field_lam needs n_fields > 1, no pairs")
        for _ in range(max_levels):
            d = A.diagonal()
            act = d != 0.0
            n_act = int(act.sum())
            ps = (A.shape[0] // 2) if pair_smooth else None
            Binv = _binv_sp(A, ps)
            if per_field_lam:
                # block-diagonal over fields with very different spectral
                # scales (mass+diffusion vs conduction blocks): one shared
                # scalar lam would under-relax the small-lam fields.  The
                # field axis never coarsens, so the per-dof component
                # label is just flat_index // n_spatial at every level.
                from knp_emi_cgx_tpu.solvers.amg import \
                    _lam_max_per_component

                comp = np.repeat(np.arange(n_fields),
                                 int(np.prod(dims[1:])))
                lam = _lam_max_per_component(A, comp, Binv)
                lam = np.maximum(lam, 1e-30)
            else:
                lam = _lam_max_jacobi(A, Binv=Binv)
            spatial_min = min(s for s, f in zip(dims, factors) if f > 1)
            if n_act <= coarse_size or spatial_min <= 2:
                self.levels.append(_Level(A, dims, dims, lam, omega,
                                          has_P=False, factors=factors,
                                          pair_stride=ps))
                break
            agg, cdims = _block_agg(dims, factors)
            try:
                lv = _Level(A, dims, cdims, lam, omega, has_P=True,
                            factors=factors, pair_stride=ps)
            except ValueError:
                # Galerkin fill-in outgrew the DIA offset cap (observed:
                # the joint phi pair at 36^3x100c reaches 741 offsets at
                # the 2x10^3 level).  Stop coarsening and solve this
                # level densely — but only while that is affordable.
                if n_act > 8000:   # dense inverse beyond this is not
                    raise          # affordable (n^2 storage, n^3 factor)
                self.levels.append(_Level(A, dims, dims, lam, omega,
                                          has_P=False, factors=factors,
                                          pair_stride=ps, dia=False))
                break
            self.levels.append(lv)
            P0 = sp.csr_matrix(
                (np.ones(A.shape[0]), (np.arange(A.shape[0]), agg)),
                shape=(A.shape[0], int(np.prod(cdims))))
            wt = sp.diags(omega / lam) if np.ndim(lam) else (omega / lam)
            P = P0 - wt @ (Binv @ (A @ P0)) if np.ndim(lam) \
                else P0 - wt * (Binv @ (A @ P0))
            A = (P.T @ A @ P).tocsr()
            A.sum_duplicates()
            A.eliminate_zeros()
            dims = cdims
        # coarsest: dense inverse on the active subspace, embedded
        d = A.diagonal()
        act = np.nonzero(d != 0.0)[0]
        dense = A[np.ix_(act, act)].toarray()
        scale = np.abs(dense).max() or 1.0
        dense = dense + 1e-12 * scale * np.eye(dense.shape[0])
        inv = np.linalg.inv(dense)
        full = np.zeros((A.shape[0], A.shape[0]), dtype=np.float32)
        full[np.ix_(act, act)] = inv
        self.coarse_inv = jnp.asarray(full)

    # -- device-array bundling ------------------------------------------------
    def device_state(self):
        return {"coarse_inv": self.coarse_inv,
                "active_mask": self.active_mask,
                "W": self.W, "Gp": self.Gp,
                "defl_lab": self.defl_lab, "Gp64": self.Gp64,
                "levels": [{k: getattr(lv, k) for k in _Level.ARRAYS}
                           for lv in self.levels]}

    def install(self, st):
        old = self.device_state()
        self.coarse_inv = st["coarse_inv"]
        self.active_mask = st["active_mask"]
        self.W, self.Gp = st["W"], st["Gp"]
        self.defl_lab, self.Gp64 = st["defl_lab"], st["Gp64"]
        for lv, d in zip(self.levels, st["levels"]):
            for k, v in d.items():
                setattr(lv, k, v)
        return old

    # -- df32 application -------------------------------------------------
    def _mv(self, lv: _Level, xh, xl):
        return dia_matvec_df(lv.stack, lv.starts, lv.pad_lo, lv.pad_hi,
                             xh, xl)

    @staticmethod
    def _binv_df(lv: _Level, rh, rl, w):
        """(wh, wl) = w * Binv (rh, rl): elementwise diagonal scaling, or
        the stride-addressed 2x2 pair inverse (dinv stored [4, n/2])."""
        if lv.dinv.ndim == 1:
            return df_scale_f32(rh, rl, w * lv.dinv)
        s = lv.n // 2
        b11, b12, b21, b22 = lv.dinv
        r1h, r1l = rh[:s], rl[:s]
        r2h, r2l = rh[s:], rl[s:]
        u1 = df_add(*df_scale_f32(r1h, r1l, b11),
                    *df_scale_f32(r2h, r2l, b12))
        u2 = df_add(*df_scale_f32(r1h, r1l, b21),
                    *df_scale_f32(r2h, r2l, b22))
        uh = jnp.concatenate([u1[0], u2[0]])
        ul = jnp.concatenate([u1[1], u2[1]])
        return df_scale_f32(uh, ul, w)

    def _smooth_df(self, lv: _Level, xh, xl, bh, bl):
        for it in range(self.smooth_iters):
            w = lv.w1 if it % 2 == 0 else lv.w2
            yh, yl = self._mv(lv, xh, xl)
            rh, rl = df_add(bh, bl, -yh, -yl)
            uh, ul = self._binv_df(lv, rh, rl, w)
            xh, xl = df_add(xh, xl, uh, ul)
        return xh, xl

    def _cycle_df(self, k, bh, bl):
        lv = self.levels[k]
        if not lv.has_P:
            return dense_mv_df(self.coarse_inv, bh, bl)
        z = df_zeros_like(bh)
        xh, xl = self._smooth_df(lv, z[0], z[1], bh, bl)
        yh, yl = self._mv(lv, xh, xl)
        rh, rl = df_add(bh, bl, -yh, -yl)
        # R = P^T = P0^T (I - w A Binv): one stencil matvec + block sums
        sh, sl = self._binv_df(lv, rh, rl, lv.wt)
        th, tl = self._mv(lv, sh, sl)
        th, tl = df_scale_f32(th, tl, np.float32(-1.0))
        gh, gl = df_add(rh, rl, th, tl)
        rch, rcl = _downsum_df(gh, gl, lv.dims, lv.cdims, lv.factors)
        xch, xcl = self._cycle_df(k + 1, rch, rcl)
        # P = (I - w Binv A) P0: replicate then one stencil matvec
        uh = _upsample_crop(xch, lv.cdims, lv.dims, lv.factors)
        ul = _upsample_crop(xcl, lv.cdims, lv.dims, lv.factors)
        th, tl = self._mv(lv, uh, ul)
        th, tl = self._binv_df(lv, th, tl, -lv.wt)
        eh, el = df_add(uh, ul, th, tl)
        xh, xl = df_add(xh, xl, eh, el)
        return self._smooth_df(lv, xh, xl, bh, bl)

    def _apply_once_df(self, rh, rl):
        if self.W is None and self.defl_lab is None:
            return self._cycle_df(0, rh, rl)
        # exact near-kernel correction, then V-cycle on the deflated
        # residual: x = Z Gp Z^T r + V(r - A Z Gp Z^T r)
        if self.defl_lab is not None:
            # disjoint 0/1 indicator rows: Z^T r = segment_sum by label,
            # Z t = gather — O(n), exact in f64
            r64 = rh.astype(jnp.float64) + rl.astype(jnp.float64)
            s = jax.ops.segment_sum(r64, self.defl_lab,
                                    num_segments=self.defl_k + 1)
            t = self.Gp64 @ s[:self.defl_k]           # [k] f64
            x1 = jnp.concatenate([t, jnp.zeros((1,), t.dtype)])
            x1 = x1[self.defl_lab]                    # Z t     [n]
            x1h = x1.astype(jnp.float32)
            x1l = (x1 - x1h.astype(jnp.float64)).astype(jnp.float32)
        else:
            sh, sl = dense_mv_df(self.W, rh, rl)      # Z^T r   [k]
            th, tl = dense_mv_df(self.Gp, sh, sl)     # Gp s    [k]
            ph, pl = df_scale_f32(th[:, None], tl[:, None], self.W)
            x1h, x1l = df_sum(ph, pl, axis=0)         # Z t     [n]
        yh, yl = self._mv(self.levels[0], x1h, x1l)
        r2h, r2l = df_add(rh, rl, -yh, -yl)
        x2h, x2l = self._cycle_df(0, r2h, r2l)
        return df_add(x1h, x1l, x2h, x2l)

    def apply_df(self, rh, rl):
        xh, xl = self._apply_once_df(rh, rl)
        lv = self.levels[0]
        for _ in range(self.cycles - 1):
            yh, yl = self._mv(lv, xh, xl)
            sh, sl = df_add(rh, rl, -yh, -yl)
            eh, el = self._apply_once_df(sh, sl)
            eh, el = df_scale_f32(eh, el, self.cycle_damp)
            xh, xl = df_add(xh, xl, eh, el)
        return xh * self.active_mask, xl * self.active_mask
