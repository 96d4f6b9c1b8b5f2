"""Double-f32 ("df32") compensated arithmetic: ~2^-48 effective precision
from pure f32 TPU vector ops.

Why this exists: the production tolerance (rtol 1e-9, KNPEMIx_solver.py:27)
cannot be certified in f32 (eps ~1.2e-7), and the TPU's software-emulated
f64 faults/crawls on large gather+scatter kernels (the SpMV shape) on the
current runtime.  Double-f32 is the TPU-native alternative: every value is
an UNEVALUATED SUM hi + lo of two f32s, maintained with error-free
transformations (Knuth two-sum, Dekker split two-prod) — giving ~48-bit
mantissas at ~4-6 f32 ops per arithmetic op, all of which XLA lowers to
plain vector f32 (no emulation, any size).

Used by solvers/krylov.py's `gmres_df32` for the Krylov vectors, SpMV and
dot products; scalar bookkeeping (Givens, H) stays in true f64 — scalar f64
emulation on TPU is cheap, it is only LARGE f64 tensors that fault.

References: Dekker 1971; Knuth TAOCP v2; Ogita, Rump & Oishi 2005 (dot2) —
standard public algorithms.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SPLIT = np.float32(4097.0)   # 2^12 + 1 splits a 24-bit f32 mantissa


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth, no magnitude assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker split; no FMA dependence)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ----------------------------------------------------------------------
# df32 = (hi, lo) with |lo| <= ulp(hi)/2
# ----------------------------------------------------------------------

def df_zeros_like(x):
    return jnp.zeros_like(x), jnp.zeros_like(x)


def df_from_f32(x):
    return x, jnp.zeros_like(x)


def df_from_f64(x, dtype=jnp.float32):
    """Split an f64 array/scalar into a df32 pair (hi, lo)."""
    hi = x.astype(dtype)
    lo = (x - hi.astype(x.dtype)).astype(dtype)
    return hi, lo


def df_to_f64(h, l):
    return h.astype(jnp.float64) + l.astype(jnp.float64)


def df_add(xh, xl, yh, yl):
    """df32 + df32 (accurate variant, ~20 flops)."""
    sh, se = two_sum(xh, yh)
    tl, te = two_sum(xl, yl)
    c = se + tl
    vh, vl = fast_two_sum(sh, c)
    w = te + vl
    return fast_two_sum(vh, w)


def df_neg(xh, xl):
    return -xh, -xl


def df_scale_f32(xh, xl, c):
    """df32 * f32 (c exact, e.g. matrix values or a sign)."""
    p, pe = two_prod(xh, c)
    return fast_two_sum(p, pe + xl * c)


def df_mul(xh, xl, yh, yl):
    """df32 * df32."""
    p, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return fast_two_sum(p, pe)


def df_axpy(ah, al, xh, xl, yh, yl):
    """(a x) + y with a df32 scalar a broadcast over df32 vectors x, y."""
    ph, pl = df_mul(jnp.broadcast_to(ah, xh.shape),
                    jnp.broadcast_to(al, xh.shape), xh, xl)
    return df_add(ph, pl, yh, yl)


def df_sum(xh, xl, axis=None):
    """Compensated reduction of a df32 array: balanced-tree df_add.

    Works on any axis; the tree is unrolled at trace time (log2(n) steps of
    halving vector adds — pure f32 elementwise work).
    """
    if axis is None:
        xh = xh.reshape(-1)
        xl = xl.reshape(-1)
        axis = 0
    n = xh.shape[axis]
    # pad to a power of two with zeros
    p2 = 1 << max(0, (n - 1).bit_length())
    if p2 != n:
        pad = [(0, 0)] * xh.ndim
        pad[axis] = (0, p2 - n)
        xh = jnp.pad(xh, pad)
        xl = jnp.pad(xl, pad)
    while xh.shape[axis] > 1:
        m = xh.shape[axis] // 2
        a_h = jax.lax.slice_in_dim(xh, 0, m, axis=axis)
        b_h = jax.lax.slice_in_dim(xh, m, 2 * m, axis=axis)
        a_l = jax.lax.slice_in_dim(xl, 0, m, axis=axis)
        b_l = jax.lax.slice_in_dim(xl, m, 2 * m, axis=axis)
        xh, xl = df_add(a_h, a_l, b_h, b_l)
    return jnp.squeeze(xh, axis), jnp.squeeze(xl, axis)


def df_dot(xh, xl, yh, yl):
    """Compensated inner product of two df32 vectors -> f64 scalar.

    dot2-style: exact elementwise products (two_prod) + cross terms, then a
    balanced-tree compensated reduction.  Effective accuracy ~2^-48 relative
    — enough to certify rtol 1e-9 recurrences.
    """
    p, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    sh, sl = df_sum(*fast_two_sum(p, pe))
    return df_to_f64(sh, sl)


def df_matvec_rows(Mh, Ml, xh, xl):
    """[k, n] df32 matrix times [n] df32 vector -> [k] f64 (compensated).

    One batched operation replacing k sequential dots — the TPU-friendly
    shape for Gram-Schmidt coefficient computation."""
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    sh, sl = df_sum(*fast_two_sum(p, pe), axis=1)
    return df_to_f64(sh, sl)


def df_vecmat(ch, cl, Mh, Ml):
    """[k] df32 coefficients times [k, n] df32 matrix -> [n] df32.

    Computes sum_i c_i M[i] with compensated products and a df tree
    reduction over the k axis (batched axpy for Gram-Schmidt updates)."""
    ph, pl = df_mul(jnp.broadcast_to(ch[:, None], Mh.shape),
                    jnp.broadcast_to(cl[:, None], Mh.shape), Mh, Ml)
    return df_sum(ph, pl, axis=0)


def df_norm(xh, xl):
    return jnp.sqrt(df_dot(xh, xl, xh, xl))


# ----------------------------------------------------------------------
# f64-reduce variants of the Gram-Schmidt kernels (r5 perf).
#
# The halving-tree df_sum issues ~17 sequential elementwise stages over
# the [restart+1, n] Arnoldi basis; the r4 bench decomposition measured
# the resulting CGS2 cost at ~80 of the 82.6 ms GMRES iteration at 24^3
# tissue (output/tpu_kernel_probe_24x8.json).  These variants compute the
# SAME exact f32 elementwise products (two_prod — the compensation lives
# there) and then promote to emulated f64 for ONE native XLA reduce;
# accuracy is measurably BETTER than the tree (~1e-15 vs 2.6e-15 rel on
# random [31, 20k]).  The "radix" rows variant first folds the 128-lane
# axis with a short df tree so the f64 intermediate is n/128-sized —
# large-mesh safe (emulated-f64 tensors fault above ~3e7 elements on the
# axon runtime, STATUS gotcha 4).
# ----------------------------------------------------------------------

def df_dot_f64sum(xh, xl, yh, yl):
    """Compensated inner product via exact products + one f64 reduce."""
    p, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return (p.astype(jnp.float64) + pe.astype(jnp.float64)).sum()


def df_matvec_rows_f64sum(Mh, Ml, xh, xl):
    """[k, n] df32 x [n] df32 -> [k] f64 via one f64 reduce."""
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    return (p.astype(jnp.float64) + pe.astype(jnp.float64)).sum(axis=1)


def df_matvec_rows_radix(Mh, Ml, xh, xl):
    """[k, n] df32 x [n] df32 -> [k] f64; df tree over 128 lanes first so
    the f64 intermediate is [k, n/128] (large-mesh safe)."""
    k, n = Mh.shape
    r = 128
    m = -(-n // r)
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    h, l = fast_two_sum(p, pe)
    if m * r != n:
        h = jnp.pad(h, ((0, 0), (0, m * r - n)))
        l = jnp.pad(l, ((0, 0), (0, m * r - n)))
    sh, sl = df_sum(h.reshape(k, m, r), l.reshape(k, m, r), axis=2)
    return (sh.astype(jnp.float64) + sl.astype(jnp.float64)).sum(axis=1)


def df_vecmat_f64sum(ch, cl, Mh, Ml):
    """[k] df32 x [k, n] df32 -> [n] df32 via one f64 reduce over k."""
    ph, pl = df_mul(jnp.broadcast_to(ch[:, None], Mh.shape),
                    jnp.broadcast_to(cl[:, None], Mh.shape), Mh, Ml)
    s = (ph.astype(jnp.float64) + pl.astype(jnp.float64)).sum(axis=0)
    return df_from_f64(s)


# ----------------------------------------------------------------------
# Blocked (sharding-friendly) reductions.  A flat df_sum tree halves the
# vector axis step by step — on a dof-sharded vector every halving is a
# cross-device shuffle.  The blocked variants reduce WITHIN each device
# block first (local tree, zero communication) and combine the tiny
# [n_blocks] remainder at the end (one small collective under GSPMD).
# Compensation is order-insensitive: any summation tree carries ~2^-48.
# ----------------------------------------------------------------------

def df_dot_blocked(xh, xl, yh, yl, n_blocks):
    """Compensated inner product, reduced block-locally first -> f64."""
    p, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    h, l = fast_two_sum(p, pe)
    h = h.reshape(n_blocks, -1)
    l = l.reshape(n_blocks, -1)
    sh, sl = df_sum(h, l, axis=1)           # local trees
    sh, sl = df_sum(sh, sl, axis=0)         # [n_blocks] remainder
    return df_to_f64(sh, sl)


def df_matvec_rows_blocked(Mh, Ml, xh, xl, n_blocks):
    """[k, n] df32 matrix times [n] df32 vector -> [k] f64, block-local."""
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    h, l = fast_two_sum(p, pe)
    k = Mh.shape[0]
    h = h.reshape(k, n_blocks, -1)
    l = l.reshape(k, n_blocks, -1)
    sh, sl = df_sum(h, l, axis=2)           # local trees
    sh, sl = df_sum(sh, sl, axis=1)         # [k, n_blocks] remainder
    return df_to_f64(sh, sl)


# ----------------------------------------------------------------------
# Compensated ELL SpMV
# ----------------------------------------------------------------------

class EllMatrix:
    """ELL (padded, WIDTH-MAJOR [w, n]) storage of a CSR pattern, built once
    on host.

    Row sums reduce along the width axis with df_add trees — unlike
    segment_sum, every partial sum is compensated, so the matvec result
    carries ~2^-48 relative accuracy.

    Layout note: the width axis is the LEADING axis.  TPU tiles the two
    minor dimensions as (8, 128); an [n, w] layout with w ~ 15-60 pads the
    last axis to 128 — an 8-10x HBM expansion that OOMs tissue-scale
    problems (observed: 20.3 GB for a 1.35M-dof step on a 15.75 GB v5e).
    [w, n] padding hits the huge axis instead (negligible).
    """

    # Max elements a single device gather/scatter kernel may touch: the
    # axon runtime faults on very large kernels (a 97M-element ELL gather
    # at 64^3 tissue scale dies; 40M at 48^3 works).  Width chunks keep
    # every kernel under this; chunked df accumulation stays ~2^-48.
    CHUNK_ELEMS = 24_000_000

    def __init__(self, indptr, indices, n_cols=None):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        n = indptr.shape[0] - 1
        deg = np.diff(indptr)
        w = int(deg.max()) if n else 0
        cols = np.zeros((w, n), dtype=np.int32)
        gather = np.zeros((w, n), dtype=np.int64)   # -> position in CSR vals
        mask = np.zeros((w, n), dtype=np.float32)
        for j in range(w):
            has = deg > j
            rows_j = np.nonzero(has)[0]
            pos = indptr[rows_j] + j
            cols[j, rows_j] = indices[pos]
            gather[j, rows_j] = pos
            mask[j, rows_j] = 1.0
        self.n = n
        self.width = w
        self._gather_np = gather
        self._mask_np = mask
        self.cols = jnp.asarray(cols)
        # int32 on device (int64 gathers are emulated on TPU); nnz < 2^31
        self.gather = jnp.asarray(gather.astype(np.int32))
        self.mask = jnp.asarray(mask)

    def ell_values(self, csr_vals):
        """Rearrange CSR values into the padded ELL layout.

        numpy input stays on the host (setup path — a device gather here
        costs one XLA compilation PER DISTINCT SHAPE, which multiplies
        across AMG levels and blocks); jax input is jittable (per-step
        value refresh).
        """
        if isinstance(csr_vals, np.ndarray):
            v = csr_vals[self._gather_np] * self._mask_np.astype(csr_vals.dtype)
            return v
        v = csr_vals[self.gather.reshape(-1)].reshape(self.gather.shape)
        return v * self.mask.astype(csr_vals.dtype)

    def matvec_df(self, ell_vals, xh, xl):
        """y = A x for df32 x, f32 A values: compensated to ~2^-48."""
        gxh = xh[self.cols]
        gxl = xl[self.cols]
        ph, pl = df_scale_f32(gxh, gxl, ell_vals)      # [w, n] df products
        yh, yl = df_sum(ph, pl, axis=0)
        return yh, yl

    def matvec_df2(self, ell_h, ell_l, xh, xl):
        """y = A x with df32 A values (e.g. nullspace-repaired operators)."""
        gxh = xh[self.cols]
        gxl = xl[self.cols]
        ph, pl = df_mul(ell_h, ell_l, gxh, gxl)
        return df_sum(ph, pl, axis=0)

    # -- device-array bundling (utils/devicestate.py pattern) --
    DEVICE_ATTRS = ("cols", "gather", "mask")

    def device_state(self):
        return {k: getattr(self, k) for k in self.DEVICE_ATTRS}

    def install(self, st):
        old = {k: getattr(self, k) for k in st}
        for k, v in st.items():
            setattr(self, k, v)
        return old


def ell_mv_df(cols, vals, xh, xl):
    """y = A x for df32 x given ELL (cols [w, n], masked f32 vals [w, n])."""
    ph, pl = df_scale_f32(xh[cols], xl[cols], vals)
    return df_sum(ph, pl, axis=0)


def dense_mv_df(mat, xh, xl):
    """y = M x for df32 x and a SMALL dense f32 matrix (compensated)."""
    ph, pl = df_scale_f32(xh[None, :], xl[None, :], mat)
    return df_sum(ph, pl, axis=1)


def repaired_ell_values(ell: EllMatrix, csr_vals, phi_col_mask,
                        repair_slots):
    """df32 ELL values of the nullspace-repaired operator.

    The repair correction (each row's phi-column sum, ~eps32 relative to the
    entries) is below the ulp of the f32 entry it lands on — it can only be
    carried in the LO part of a df32 value pair.  Jittable; re-derived from
    the freshly assembled values each step.
    """
    ell_h = ell.ell_values(csr_vals)
    mask_ell = ell.ell_values(phi_col_mask.astype(csr_vals.dtype))
    sh, sl = df_sum(*df_from_f32(ell_h * mask_ell), axis=0)
    rowsum = sh + sl                                   # exact sum, 1 rounding
    lo_csr = jnp.zeros_like(csr_vals).at[repair_slots].add(-rowsum)
    return ell_h, ell.ell_values(lo_csr)


# ----------------------------------------------------------------------
# Left-preconditioned restarted GMRES in df32
# ----------------------------------------------------------------------

class DF32GMRESResult:
    def __init__(self, xh, xl, iterations, residual, converged):
        self.xh, self.xl = xh, xl
        self.iterations = iterations
        self.residual = residual
        self.converged = converged


def gmres_df32(matvec_df, b, x0h, x0l,
               M=None,
               nullspace_df=None,
               rtol: float = 1e-9,
               restart: int = 30,
               max_outer: int = 50,
               n_blocks: int | None = None,
               dots: str = "tree"):
    """Restarted left-preconditioned GMRES with df32 vectors and f64 scalar
    bookkeeping — certifies production tolerances (rtol 1e-9) with pure f32
    tensor ops on TPU.

    matvec_df : (xh, xl) -> (yh, yl), the compensated operator apply
                (EllMatrix.matvec_df closure over the current values)
    b         : f32 right-hand side
    M         : df32 preconditioner apply, (rh, rl) -> (yh, yl) — must be a
                FIXED operator to df accuracy (e.g.
                BlockDiagonalPreconditioner(df=True).apply_df); an f32-noisy
                apply stalls the recurrence near f32 eps
    nullspace_df : (ns_h, ns_l) unit nullspace vector, or None
    rtol      : tolerance on the preconditioned residual norm, relative to
                ||proj(M b)|| (PETSc KSP semantics)

    The Arnoldi basis V is stored as df32 pairs; Hessenberg/Givens data is
    true f64 (scalar-sized — TPU f64 emulation is only problematic for
    LARGE tensors).  The triangular solve is a manual masked back-
    substitution (jnp.linalg f64 factorizations are unsupported on TPU).

    n_blocks: reduce dots/norms block-locally first (set to the device
    count when the vectors are dof-sharded — flat df_sum trees would
    shuffle across devices at every halving step).
    """
    if M is None:
        M = lambda rh, rl: (rh, rl)
    f64 = jnp.float64
    n = b.shape[0]

    vecmat = df_vecmat
    if dots == "auto":
        # f64sum measured 8.4x faster per step than the tree on the axon
        # v5e (0.22 vs 1.86 s/step at 24^3 tissue, identical iteration
        # counts — BENCH r5 A/B); its [restart+1, n] f64 intermediates
        # are safe below the ~3e7-element emulated-f64 runtime limit
        # (gotcha 4), above which the lane-folding radix variant keeps
        # the f64 tensors at n/128
        # threshold from r5 on-chip A/B: [31, 125k] = 3.9M f64 reduce is
        # fast (~5 ms/GMRES-iter total), [31, 405k] = 12.6M already falls
        # into the slow emulated-f64 regime (0.28 s/iter measured at
        # 36^3x100c) — switch to the lane-folding radix form early
        dots = "f64sum" if (restart + 1) * n < 6_000_000 else "radix"
    if n_blocks is not None:
        # dof-sharded: block-local trees (communication-optimal; the f64
        # variants would shuffle across devices inside the reduce)
        dot = lambda ah, al, bh_, bl_: df_dot_blocked(ah, al, bh_, bl_,
                                                      n_blocks)
        mv_rows = lambda Mh, Ml, wh, wl: df_matvec_rows_blocked(
            Mh, Ml, wh, wl, n_blocks)
    elif dots == "f64sum":
        # one native f64 reduce instead of ~17 sequential tree stages —
        # the r5 TPU fix for the 80 ms CGS2 cost (see variant docstrings)
        dot = df_dot_f64sum
        mv_rows = df_matvec_rows_f64sum
        vecmat = df_vecmat_f64sum
    elif dots == "radix":
        # large-mesh-safe: f64 intermediates capped at n/128 elements
        dot = df_dot_f64sum
        mv_rows = df_matvec_rows_radix
    elif dots == "tree":
        dot = df_dot
        mv_rows = df_matvec_rows
    else:
        raise ValueError(f"gmres_df32: unknown dots impl '{dots}'")

    def proj(vh, vl):
        if nullspace_df is None:
            return vh, vl
        ns_h, ns_l = nullspace_df
        d = dot(ns_h, ns_l, vh, vl)          # f64 scalar
        dh, dl = df_from_f64(-d)
        return df_axpy(dh, dl, ns_h, ns_l, vh, vl)

    apply_M_df = M

    bh, bl = proj(*df_from_f32(b))
    Mbh, Mbl = proj(*apply_M_df(bh, bl))
    norm_ref = jnp.sqrt(dot(Mbh, Mbl, Mbh, Mbl))
    tol = rtol * jnp.maximum(norm_ref, 1e-300)

    def residual_df(xh, xl):
        yh, yl = matvec_df(xh, xl)
        rh, rl = df_add(bh, bl, -yh, -yl)
        return proj(*apply_M_df(*proj(rh, rl)))

    def arnoldi_cycle(xh, xl):
        rh, rl = residual_df(xh, xl)
        beta = jnp.sqrt(dot(rh, rl, rh, rl))          # f64

        Vh = jnp.zeros((restart + 1, n), dtype=jnp.float32)
        Vl = jnp.zeros_like(Vh)
        H = jnp.zeros((restart + 1, restart), dtype=f64)
        cs = jnp.zeros(restart, dtype=f64)
        sn = jnp.zeros(restart, dtype=f64)
        g = jnp.zeros(restart + 1, dtype=f64)
        inv_b = 1.0 / jnp.maximum(beta, 1e-300)
        sh, sl = df_from_f64(inv_b)
        Vh = Vh.at[0].set(df_mul(rh, rl, jnp.broadcast_to(sh, rh.shape),
                                 jnp.broadcast_to(sl, rh.shape))[0])
        Vl = Vl.at[0].set(df_mul(rh, rl, jnp.broadcast_to(sh, rh.shape),
                                 jnp.broadcast_to(sl, rh.shape))[1])
        g = g.at[0].set(beta)

        def body(carry):
            j, Vh, Vl, H, cs, sn, g, _res = carry
            wh, wl = matvec_df(Vh[j], Vl[j])
            wh, wl = proj(*apply_M_df(*proj(wh, wl)))

            # classical Gram-Schmidt with reorthogonalisation (CGS2) in
            # batched df32 — two [k, n] passes instead of k sequential dots
            # (MGS-grade stability at TPU-friendly shapes); inactive basis
            # rows are zero, so their coefficients vanish, but mask anyway
            active = (jnp.arange(restart + 1) <= j).astype(f64)
            hcol = jnp.zeros(restart + 1, dtype=f64)
            for _pass in range(2):
                c = mv_rows(Vh, Vl, wh, wl) * active
                ch, cl = df_from_f64(-c)
                uh, ul = vecmat(ch, cl, Vh, Vl)
                wh, wl = df_add(wh, wl, uh, ul)
                hcol = hcol + c
            hj1 = jnp.sqrt(dot(wh, wl, wh, wl))
            hcol = hcol.at[j + 1].set(hj1)
            ih, il = df_from_f64(1.0 / jnp.maximum(hj1, 1e-300))
            nh, nl = df_mul(wh, wl, jnp.broadcast_to(ih, wh.shape),
                            jnp.broadcast_to(il, wh.shape))
            Vh = Vh.at[j + 1].set(nh)
            Vl = Vl.at[j + 1].set(nl)

            def rot(i, hc):
                active = i < j
                hi_, hi1 = hc[i], hc[i + 1]
                new_i = jnp.where(active, cs[i] * hi_ + sn[i] * hi1, hi_)
                new_i1 = jnp.where(active, -sn[i] * hi_ + cs[i] * hi1, hi1)
                return hc.at[i].set(new_i).at[i + 1].set(new_i1)

            hcol = jax.lax.fori_loop(0, restart, rot, hcol)
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = hcol[j] / jnp.maximum(denom, 1e-300)
            s = hcol[j + 1] / jnp.maximum(denom, 1e-300)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            H = H.at[:, j].set(hcol[: restart + 1])
            res = jnp.abs(g[j + 1])
            return j + 1, Vh, Vl, H, cs, sn, g, res

        def cond(carry):
            j, *_, res = carry
            return (j < restart) & (res > tol)

        j, Vh, Vl, H, cs, sn, g, res = jax.lax.while_loop(
            cond, body, (jnp.array(0), Vh, Vl, H, cs, sn, g, beta))

        # masked back-substitution in f64 (no f64 LAPACK on TPU)
        active = jnp.arange(restart) < j
        R = H[:restart, :restart]
        diag = jnp.where(active, jnp.diagonal(R), 1.0)
        diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
        rhs = jnp.where(active, g[:restart], 0.0)

        def back(i_rev, y):
            i = restart - 1 - i_rev
            s = rhs[i] - jnp.dot(R[i], y)
            return y.at[i].set(jnp.where(active[i], s / diag[i], 0.0))

        y = jax.lax.fori_loop(0, restart, back,
                              jnp.zeros(restart, dtype=f64))

        yh, yl = df_from_f64(y)          # inactive entries are exactly 0
        uh, ul = vecmat(yh, yl, Vh[:restart], Vl[:restart])
        xh, xl = df_add(xh, xl, uh, ul)
        return xh, xl, res, j

    def cond(carry):
        _xh, _xl, res, it, outer = carry
        return (res > tol) & (outer < max_outer)

    def step(carry):
        xh, xl, _res, it, outer = carry
        xh, xl, _est, cnt = arnoldi_cycle(xh, xl)
        # certify on the TRUE preconditioned residual, not the Givens
        # recurrence estimate — the estimate drifts a few x over a cycle
        # (observed 4.7e-9 true at a 1e-9 estimate), and the parity tests
        # assert against real f64 residuals.  One extra matvec+M per
        # restart cycle (~1/restart overhead).
        rh, rl = residual_df(xh, xl)
        res = jnp.sqrt(dot(rh, rl, rh, rl))
        return xh, xl, res, it + cnt, outer + 1

    r0h, r0l = residual_df(x0h, x0l)
    r0 = jnp.sqrt(dot(r0h, r0l, r0h, r0l))
    xh, xl, res, it, outer = jax.lax.while_loop(
        cond, step, (x0h, x0l, r0, jnp.array(0), jnp.array(0)))
    return DF32GMRESResult(xh=xh, xl=xl, iterations=it, residual=res,
                           converged=res <= tol)
