"""Microprobe: DIA (diagonal-offset / stencil) matvec vs ELL gather matvec
on the axon TPU.

tpu_truth.py showed the ELL gather matvec runs ~500x off the bandwidth
bound on this chip (XLA lowers x[cols] to per-element loads at ~145M
elem/s) while contiguous ops run near peak.  On the STRUCTURED tissue
meshes every neighbor sits at a constant lattice offset, so the gather can
become K shifted contiguous slices: y = sum_k vals[k] * xpad[off_k : off_k+n].

This probe times, at a tissue-scale n with K diagonals vs an ELL of equal
nnz (w = K):
  D1  f32 DIA matvec chain
  D2  df32 (compensated) DIA matvec chain - the production arithmetic
  E1  f32 ELL gather matvec chain (the current hot op)

Env: PROBE_N (405224 ~ 8 fields x 36^3 lattice), PROBE_K (15), PROBE_CHAIN
(20), PROBE_REPS (3).
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "405224"))
K = int(os.environ.get("PROBE_K", "15"))
CHAIN = int(os.environ.get("PROBE_CHAIN", "20"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def main():
    print(f"[stencil] device={jax.devices()[0]} n={N} K={K} chain={CHAIN}",
          flush=True)
    rng = np.random.default_rng(0)
    side = 74                      # ~ (N/8)^(1/3) lattice side per field
    offs = np.unique(np.concatenate([
        [0, 1, -1, side, -side, side * side, -side * side],
        rng.integers(-side * side, side * side, size=K),
    ]))[:K].astype(np.int64)
    pad_lo = int(max(0, -offs.min()))
    pad_hi = int(max(0, offs.max()))
    vals = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) / K)
    x0 = jnp.ones((N,), dtype=jnp.float32)
    # STATIC slice starts (python ints) — offsets are known at trace time,
    # so every slice is a static lax.slice XLA can fuse
    starts = [int(o) + pad_lo for o in offs]

    def dia_mv(vals, x):
        xpad = jnp.pad(x, (pad_lo, pad_hi))
        acc = jnp.zeros_like(x)
        for k in range(K):
            seg = jax.lax.slice(xpad, (starts[k],), (starts[k] + N,))
            acc = acc + vals[k] * seg
        return acc

    @jax.jit
    def d1(vals, x):
        def body(x, _):
            y = dia_mv(vals, x)
            return y / jnp.max(jnp.abs(y)), None
        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return y

    from knp_emi_cgx_tpu.solvers.df32 import df_scale_f32, df_add

    def dia_mv_df(vals, xh, xl):
        xph = jnp.pad(xh, (pad_lo, pad_hi))
        xpl = jnp.pad(xl, (pad_lo, pad_hi))
        ah = jnp.zeros_like(xh)
        al = jnp.zeros_like(xl)
        for k in range(K):
            sh = jax.lax.slice(xph, (starts[k],), (starts[k] + N,))
            sl = jax.lax.slice(xpl, (starts[k],), (starts[k] + N,))
            ph, pl = df_scale_f32(sh, sl, vals[k])
            ah, al = df_add(ah, al, ph, pl)
        return ah, al

    @jax.jit
    def d2(vals, x):
        def body(c, _):
            xh, xl = c
            yh, yl = dia_mv_df(vals, xh, xl)
            m = jnp.max(jnp.abs(yh))
            return (yh / m, yl / m), None
        (yh, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), None,
                                  length=CHAIN)
        return yh

    cols = jnp.asarray(rng.integers(0, N, size=(K, N)), dtype=jnp.int32)

    @jax.jit
    def e1(vals, x):
        def body(x, _):
            y = jnp.sum(vals * x[cols], axis=0)
            return y / jnp.max(jnp.abs(y)), None
        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return y

    gb = K * N * 8 * CHAIN / 1e9           # vals + slice reads per matvec
    for name, fn in (("D1 f32 DIA", d1), ("D2 df32 DIA", d2),
                     ("E1 f32 ELL-gather", e1)):
        tic = time.perf_counter()
        y = fn(vals, x0)
        y.block_until_ready()
        t_compile = time.perf_counter() - tic
        best = 1e30
        for _ in range(REPS):
            tic = time.perf_counter()
            y = fn(vals, x0)
            y.block_until_ready()
            best = min(best, time.perf_counter() - tic)
        # execution fence: data-dependent readback
        tic = time.perf_counter()
        m = float(jnp.max(jnp.abs(y)))
        t_read = time.perf_counter() - tic
        per_mv = best / CHAIN * 1e3
        print(f"  [{name}] compile+1st {t_compile:.1f}s  best-blocked "
              f"{best*1e3:.1f}ms ({per_mv:.3f} ms/matvec, "
              f"{gb/best:.0f} GB/s)  readback {t_read:.2f}s  max={m:.3e}",
              flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
