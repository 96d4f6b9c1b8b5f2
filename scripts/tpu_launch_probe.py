"""Per-launch overhead characterization for the axon TPU tunnel.

The split production step fires 3-8 launches per timestep and the honest
blocked per-step wall (0.574 s at 24^3) is ~10x the compute, so the launch
round-trip is the production bottleneck on this runtime.  This probe times
individually-blocked launches of a TRIVIAL kernel while varying the number
of device-array arguments, to attribute the overhead: fixed tunnel
round-trip vs per-argument marshalling.

Usage: python scripts/tpu_launch_probe.py [n_elem]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
REPS = 30


def probe(n_args: int):
    xs = [jnp.full((N,), float(i + 1)) for i in range(n_args)]
    jax.block_until_ready(xs)

    @jax.jit
    def f(*args):
        s = args[0]
        for a in args[1:]:
            s = s + a
        return s * 0.5

    y = f(*xs)
    jax.block_until_ready(y)          # compile
    t = []
    for _ in range(REPS):
        tic = time.perf_counter()
        y = f(*xs)
        jax.block_until_ready(y)
        t.append(time.perf_counter() - tic)
    t = np.array(t) * 1e3
    print(f"[launch] n_args={n_args:3d}: median {np.median(t):7.2f} ms  "
          f"min {t.min():7.2f}  p90 {np.percentile(t, 90):7.2f}",
          flush=True)
    return float(np.median(t))


print(f"[launch] device={jax.devices()[0]} n_elem={N}", flush=True)
m1 = probe(1)
m8 = probe(8)
m64 = probe(64)
print(f"[launch] fixed ~= {m1:.1f} ms; per-arg ~= {(m64 - m1) / 63:.3f} ms",
      flush=True)
