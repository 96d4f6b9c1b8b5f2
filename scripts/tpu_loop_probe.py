"""Measure per-iteration overhead of lax control flow on the axon TPU.

Suspicion (r5): the honest execution-forced step time (~5 s/step at 24^3,
~20 GMRES its) is ~100x the component compute (~0.35 ms matvec, ~1 ms
V-cycle) — consistent with dynamic `lax.while_loop` iterations costing a
fixed runtime overhead each (host-driven condition evaluation), which
static-trip `fori_loop`/`scan` would not pay.

Times, per variant, N iterations of a TRIVIAL body (x *= c on a [8,128]
f32 tile) for two N values; the slope is seconds/iteration of pure loop
overhead.  Every timing is execution-forced by a data-dependent scalar
D2H.  Variants:
  fori     — lax.fori_loop, static trip count baked in
  fori_dyn — lax.fori_loop with TRACED trip count (lowers to while)
  while_c  — while_loop, counter condition
  while_v  — while_loop, condition on a data value (res>tol shape)
  nest     — while_loop(outer) of fori_loop(inner 10) — GMRES shape

Writes output/tpu_loop_probe.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.max(jnp.abs(leaf)))


def timed(f, *args, reps=3):
    ts = []
    for _ in range(reps):
        tic = time.perf_counter()
        fence(f(*args))
        ts.append(time.perf_counter() - tic)
    return min(ts)


def main():
    x0 = jnp.full((8, 128), 0.5, jnp.float32)
    c = jnp.float32(1.0000001)
    results = {"device": str(jax.devices()[0])}
    N1, N2 = 64, 512

    def body(x):
        return x * c

    # fori, static trip
    def mk_fori(n):
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, n, lambda i, v: body(v), x))

    # fori with traced bound (lowers to while_loop)
    fori_dyn = jax.jit(lambda x, n: jax.lax.fori_loop(
        0, n, lambda i, v: body(v), x))

    # while with counter cond
    def mk_while_c(n):
        return jax.jit(lambda x: jax.lax.while_loop(
            lambda s: s[0] < n, lambda s: (s[0] + 1, body(s[1])),
            (jnp.int32(0), x))[1])

    # while conditioned on a data value (never triggers before n)
    def mk_while_v(n):
        return jax.jit(lambda x: jax.lax.while_loop(
            lambda s: (s[0] < n) & (jnp.max(s[1]) > 1e-30),
            lambda s: (s[0] + 1, body(s[1])),
            (jnp.int32(0), x))[1])

    # nested: outer while of inner fori(10) — the GMRES program shape
    def mk_nest(n_outer):
        def outer_body(s):
            k, v = s
            v = jax.lax.fori_loop(0, 10, lambda i, u: body(u), v)
            return k + 1, v

        return jax.jit(lambda x: jax.lax.while_loop(
            lambda s: s[0] < n_outer, outer_body,
            (jnp.int32(0), x))[1])

    for name, mk in [("fori", mk_fori), ("while_c", mk_while_c),
                     ("while_v", mk_while_v), ("nest", mk_nest)]:
        f1, f2 = mk(N1), mk(N2)
        timed(f1, x0, reps=1)   # compile
        timed(f2, x0, reps=1)
        t1, t2 = timed(f1, x0), timed(f2, x0)
        per_it = (t2 - t1) / (N2 - N1)
        results[name] = {"t_n64": round(t1, 4), "t_n512": round(t2, 4),
                         "per_iter_us": round(per_it * 1e6, 2)}
        print(f"{name:8s} N{N1}={t1:.4f}s N{N2}={t2:.4f}s "
              f"-> {per_it*1e6:.1f} us/iter", flush=True)

    # traced-bound fori (one compile, two N values)
    timed(fori_dyn, x0, jnp.int32(N1), reps=1)
    t1 = timed(fori_dyn, x0, jnp.int32(N1))
    t2 = timed(fori_dyn, x0, jnp.int32(N2))
    per_it = (t2 - t1) / (N2 - N1)
    results["fori_dyn"] = {"t_n64": round(t1, 4), "t_n512": round(t2, 4),
                           "per_iter_us": round(per_it * 1e6, 2)}
    print(f"fori_dyn N{N1}={t1:.4f}s N{N2}={t2:.4f}s "
          f"-> {per_it*1e6:.1f} us/iter", flush=True)

    with open(os.path.join(REPO, "output", "tpu_loop_probe.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
