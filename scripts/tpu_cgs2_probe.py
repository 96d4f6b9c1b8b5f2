"""Microbenchmark CGS2 kernel variants on the axon TPU (r5 perf round).

The kernel probe decomposed the 82.6 ms GMRES iteration at 24^3 into
matvec 0.38 ms + pc 2.25 ms + ~80 ms of CGS2 work: df_matvec_rows and
df_vecmat on the [31, n] Arnoldi basis, whose df_sum halving trees issue
~17 sequential elementwise stages each.  This probe times drop-in
alternatives at the bench shapes; the accuracy of each variant against an
f64 reference is printed next to its time (we need ~2^-48 relative — the
df32 Krylov certification budget).

Variants for rows ([k,n] x [n] -> [k] f64):
  tree    — current df_sum halving tree
  f64sum  — exact f32 products (two_prod) promoted to emulated f64, ONE
            native reduce
  radix   — reshape [k, m, 128]: df tree over the 128 lane axis, then
            f64 reduce of the [k, m] remainder
Variants for vecmat ([k] x [k,n] -> [n] df32):
  tree    — current df_sum over the k axis
  f64sum  — df_mul products promoted to f64, one reduce, split back

Usage: python scripts/tpu_cgs2_probe.py [n] [k]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from knp_emi_cgx_tpu.solvers.df32 import (df_matvec_rows, df_vecmat,
                                          df_from_f64, df_sum, two_prod,
                                          df_mul, fast_two_sum)


def rows_f64sum(Mh, Ml, xh, xl):
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    return (p.astype(jnp.float64) + pe.astype(jnp.float64)).sum(axis=1)


def rows_radix(Mh, Ml, xh, xl):
    k, n = Mh.shape
    r = 128
    m = -(-n // r)
    pad = m * r - n
    p, pe = two_prod(Mh, xh[None, :])
    pe = pe + (Mh * xl[None, :] + Ml * xh[None, :])
    h, l = fast_two_sum(p, pe)
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad)))
        l = jnp.pad(l, ((0, 0), (0, pad)))
    h = h.reshape(k, m, r)
    l = l.reshape(k, m, r)
    sh, sl = df_sum(h, l, axis=2)     # 7 halvings over the lane axis
    return (sh.astype(jnp.float64) + sl.astype(jnp.float64)).sum(axis=1)


def vecmat_f64sum(ch, cl, Mh, Ml):
    ph, pl = df_mul(jnp.broadcast_to(ch[:, None], Mh.shape),
                    jnp.broadcast_to(cl[:, None], Mh.shape), Mh, Ml)
    s = (ph.astype(jnp.float64) + pl.astype(jnp.float64)).sum(axis=0)
    return df_from_f64(s)


def fence(x):
    return float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(x)[0])))


def slope(f, args, k1=8, k2=40):
    # K-rep inside one launch; the kernel output PERTURBS the first
    # vector argument each rep, so the call cannot be loop-invariant-
    # hoisted out of the fori_loop (the first version of this probe was,
    # and measured ~0 ms for every variant)
    vec0 = args[-2]

    def mk(K):
        def body(i, v):
            out = f(*args[:-2], v, args[-1])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return v + (leaf.ravel()[0] * 1e-30).astype(v.dtype)

        return jax.jit(lambda v: jax.lax.fori_loop(0, K, body, v))

    f1, f2 = mk(k1), mk(k2)
    fence(f1(vec0)); fence(f2(vec0))   # compile
    ts1, ts2 = [], []
    for _ in range(3):
        tic = time.perf_counter(); fence(f1(vec0))
        ts1.append(time.perf_counter() - tic)
        tic = time.perf_counter(); fence(f2(vec0))
        ts2.append(time.perf_counter() - tic)
    return (min(ts2) - min(ts1)) / (k2 - k1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 125000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    rng = np.random.default_rng(0)
    M64 = rng.standard_normal((k, n))
    x64 = rng.standard_normal(n)
    c64 = rng.standard_normal(k) * 1e-3

    def split_np(a):
        # host-side df split: never create device f64 arrays (the f64
        # upload path through the axon tunnel has been observed to wedge)
        hi = a.astype(np.float32)
        lo = (a - hi.astype(np.float64)).astype(np.float32)
        return jax.device_put(hi), jax.device_put(lo)

    Mh, Ml = split_np(M64)
    xh, xl = split_np(x64)
    ch, cl = split_np(c64)

    ref_rows = M64 @ x64
    ref_vec = c64 @ M64

    out = {"n": n, "k": k, "device": str(jax.devices()[0])}
    for name, f in [("rows_tree", df_matvec_rows),
                    ("rows_f64sum", rows_f64sum),
                    ("rows_radix", rows_radix)]:
        v = np.asarray(jax.jit(f)(Mh, Ml, xh, xl))
        err = np.abs(v - ref_rows).max() / np.abs(ref_rows).max()
        s = slope(f, (Mh, Ml, xh, xl))
        out[name] = {"ms": round(s * 1e3, 4), "rel_err": float(err)}
        print(f"{name:12s} {s*1e3:8.3f} ms  rel_err {err:.2e}", flush=True)

    for name, f in [("vecmat_tree", df_vecmat),
                    ("vecmat_f64sum", vecmat_f64sum)]:
        vh, vl = jax.jit(f)(ch, cl, Mh, Ml)
        v = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
        err = np.abs(v - ref_vec).max() / np.abs(ref_vec).max()
        s = slope(f, (ch, cl, Mh, Ml))
        out[name] = {"ms": round(s * 1e3, 4), "rel_err": float(err)}
        print(f"{name:12s} {s*1e3:8.3f} ms  rel_err {err:.2e}", flush=True)

    with open(os.path.join(REPO, "output", "tpu_cgs2_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
