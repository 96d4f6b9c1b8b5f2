"""Minimal repro for the axon TPU runtime fault above ~3e5 dofs (STATUS
gotcha 8; VERDICT r3 next-step #2).

The framework's 40^3x100c step (349k dofs) faults under sustained stepping
while every stage runs AND reads back correctly in isolation.  This script
strips the framework away entirely: ONE jitted kernel — an ELL-style
gather + multiply + row-sum (the exact memory-access shape of the step's
SpMV) — launched LAUNCHES times on synthetic data, then read back.  No
assembly, no AMG, no Krylov, no framework code.

If this crashes with "TPU worker process crashed" at n=349k while passing
at n=80k, the scale ceiling is attributable to the runtime, not to the
framework's program structure.

Env: REPRO_N (349000), REPRO_W (60), REPRO_LAUNCHES (200), REPRO_CHAIN (20
matvecs per launch).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("REPRO_N", "349000"))
W = int(os.environ.get("REPRO_W", "60"))
LAUNCHES = int(os.environ.get("REPRO_LAUNCHES", "200"))
CHAIN = int(os.environ.get("REPRO_CHAIN", "20"))


def main():
    print(f"[repro] device={jax.devices()[0]} n={N} w={W} "
          f"launches={LAUNCHES} chain={CHAIN}", flush=True)
    rng = np.random.default_rng(0)
    # width-major [w, n] layout (STATUS gotcha 7) like the framework's ELL
    cols = jnp.asarray(rng.integers(0, N, size=(W, N)), dtype=jnp.int32)
    vals = jnp.asarray(rng.standard_normal((W, N)) / W, dtype=jnp.float32)
    x = jnp.ones((N,), dtype=jnp.float32)

    @jax.jit
    def sweep(x):
        def mv(x):
            return jnp.sum(vals * x[cols], axis=0)
        for _ in range(CHAIN):
            x = mv(x)
            x = x / jnp.sqrt(jnp.sum(x * x) + 1e-30)   # keep finite
        return x

    t0 = time.perf_counter()
    x = sweep(x)
    jax.block_until_ready(x)
    print(f"[repro] launch 1 (compile) blocked {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(2, LAUNCHES + 1):
        x = sweep(x)
    jax.block_until_ready(x)
    print(f"[repro] launches 2..{LAUNCHES} dispatched+blocked "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    v = float(jnp.max(jnp.abs(x)))     # THE test: D2H after sustained launches
    print(f"[repro] READBACK OK in {time.perf_counter()-t0:.1f} s: "
          f"max|x|={v:.3e}", flush=True)
    print("[repro] PASS", flush=True)


if __name__ == "__main__":
    main()
