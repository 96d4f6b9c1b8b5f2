"""Ground-truth timing characterization of the axon TPU runtime.

VERDICT r3 weak #1/#2: `block_until_ready` may not fence execution on this
runtime, so loop timings could measure dispatch rate, and the honest cost
may hide in the final device->host readback.  And the 349k-dof minimal
repro (scripts/tpu_minrepro.py) showed sustained launches CRAWLING (199
launches of a ~2 ms kernel not finishing in 470 s) rather than faulting.
This probe measures, per problem size:

  * per-launch latency, timed INDIVIDUALLY with block_until_ready after
    each launch (does block fence?  how does latency scale with n?)
  * a free-running burst of launches + one readback (the queued/deferred
    mode the framework's hot loop uses)
  * the same after the first D2H (the "synchronous per-kernel mode"
    STATUS gotcha 1 warns about)

Kernels with known speed-of-light:
  K1 matmul chain  (compute-bound, 2 N^3 FLOPs/op)
  K2 ELL gather-multiply-rowsum chain (bandwidth-bound, ~12 B/nnz)

Env: TRUTH_SIZES="10000,80000,170000,254000,349000", TRUTH_W, TRUTH_CHAIN,
TRUTH_BURST, TRUTH_MM=0/1.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZES = [int(s) for s in os.environ.get(
    "TRUTH_SIZES", "10000,80000,170000,254000").split(",")]
W = int(os.environ.get("TRUTH_W", "60"))
CHAIN = int(os.environ.get("TRUTH_CHAIN", "20"))
BURST = int(os.environ.get("TRUTH_BURST", "10"))
DO_MM = os.environ.get("TRUTH_MM", "1") == "1"


def probe_kernel(name, sweep_of, x0, sol_ms):
    """sweep_of: () -> jitted fn; x0: initial arg."""
    sweep = sweep_of()
    x = x0
    t0 = time.perf_counter()
    x = sweep(x)
    jax.block_until_ready(x)
    print(f"  [{name}] launch1(compile+exec) {time.perf_counter()-t0:.1f} s"
          f"  (speed-of-light ~{sol_ms:.3f} ms/launch)", flush=True)

    # individually-blocked launches
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        x = sweep(x)
        jax.block_until_ready(x)
        lat.append(time.perf_counter() - t0)
    print(f"  [{name}] blocked-each: " +
          " ".join(f"{v*1e3:.1f}ms" for v in lat), flush=True)

    # free-running burst + readback fence
    t0 = time.perf_counter()
    for _ in range(BURST):
        x = sweep(x)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(x)
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(jnp.max(jnp.abs(x)))
    t_read = time.perf_counter() - t0
    print(f"  [{name}] burst x{BURST}: dispatch {t_dispatch:.3f} s, "
          f"block {t_block:.3f} s, readback {t_read:.3f} s "
          f"(honest {(t_dispatch+t_block+t_read)/BURST*1e3:.1f} ms/launch), "
          f"max|x|={v:.3e}", flush=True)

    # post-D2H per-launch (synchronous mode?)
    lat = []
    for i in range(3):
        t0 = time.perf_counter()
        x = sweep(x)
        jax.block_until_ready(x)
        lat.append(time.perf_counter() - t0)
    print(f"  [{name}] post-D2H blocked-each: " +
          " ".join(f"{v*1e3:.1f}ms" for v in lat), flush=True)


def main():
    print(f"[truth] device: {jax.devices()[0]}", flush=True)

    if DO_MM:
        N = 2048
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N, N)).astype(np.float32)) / N

        def mk():
            @jax.jit
            def sweep(x):
                for _ in range(CHAIN):
                    x = a @ x
                    x = x / jnp.sqrt(jnp.mean(x * x) + 1e-30)
                return x
            return sweep

        sol = CHAIN * 2.0 * N**3 / 45e12 * 1e3
        print(f"[truth] K1 matmul {N}x{N} chain={CHAIN}", flush=True)
        probe_kernel("K1", mk, jnp.ones((N, N), jnp.float32), sol)

    for n in SIZES:
        rng = np.random.default_rng(1)
        cols = jnp.asarray(rng.integers(0, n, size=(W, n)), dtype=jnp.int32)
        vals = jnp.asarray(
            rng.standard_normal((W, n)).astype(np.float32) / W)

        def mk():
            @jax.jit
            def sweep(x):
                for _ in range(CHAIN):
                    x = jnp.sum(vals * x[cols], axis=0)
                    x = x / jnp.sqrt(jnp.mean(x * x) + 1e-30)
                return x
            return sweep

        sol = CHAIN * n * W * 12.0 / 819e9 * 1e3
        print(f"[truth] K2 ELL n={n} w={W} chain={CHAIN}", flush=True)
        probe_kernel(f"K2@{n}", mk, jnp.ones((n,), jnp.float32), sol)

    print("[truth] PASS", flush=True)


if __name__ == "__main__":
    main()
