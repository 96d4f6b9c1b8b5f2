"""Multi-process worker: one rank of a 2-process dof-sharded KNP-EMI run.

The `mpirun -n P` equivalent (reference mixed_dim_problem.py:649 — every
rank runs the same script, the mesh is partitioned, PETSc owns the
communication).  Here every process:

  * calls `initialize_distributed()` (env-driven jax.distributed — the
    KNPEMI_COORDINATOR / KNPEMI_NUM_PROCESSES / KNPEMI_PROCESS_ID launch
    convention of parallel/distributed.py) BEFORE any backend init,
  * steers to the CPU platform with N virtual devices per process,
  * builds the dof-sharded problem REDUNDANTLY (deterministic host setup,
    identical on every rank — see parallel/distributed.py's design note),
  * materialises state + bundle as GLOBAL arrays spanning both processes,
  * runs `steps` dof-sharded timesteps — halo ppermutes and psum dots now
    cross the process boundary via the distributed CPU (gloo) collectives,
  * rank 0 writes the resulting fields for the parent to compare against
    the single-process 8-device run.

Launched by tests/test_distributed.py; also a reference template for real
multi-host launches (swap the CPU steering for TPU pods).
"""
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

# per-process virtual device count (4 x 2 processes = 8 global devices)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platform_name", "cpu")

from knp_emi_cgx_tpu.parallel.distributed import (initialize_distributed,
                                                  shard_global_array)

pid, nproc = initialize_distributed()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from knp_emi_cgx_tpu.parallel.dof_sharded import build_dof_sharded_problem


def fetch_replicated(x, rep):
    """Read back a global array on every process: reshard to fully
    replicated, then read the local copy."""
    y = jax.jit(lambda v: v, out_shardings=rep)(x)
    return np.asarray(y.addressable_data(0))


def main():
    out_path = os.environ["KNPEMI_TEST_OUT"]
    steps = int(os.environ.get("KNPEMI_TEST_STEPS", "3"))
    n_mesh = int(os.environ.get("KNPEMI_TEST_NMESH", "12"))

    devices = jax.devices("cpu")
    assert len(devices) == 4 * nproc, (len(devices), nproc)
    assert jax.process_count() == nproc

    problem, state, step_fn, dmesh, halo = build_dof_sharded_problem(
        4 * nproc, devices=devices, n_mesh=n_mesh)

    # the bundle was built with process-local staging arrays; globalize it
    # (it is host-identical on every rank — redundant deterministic setup)
    rep = NamedSharding(dmesh, P())

    def conv(x):
        if isinstance(x, jax.Array):
            if not x.is_fully_addressable:
                return x   # already global (placed by shard_assembler)
            return shard_global_array(np.asarray(x), rep)
        if isinstance(x, np.ndarray):
            return shard_global_array(x, rep)
        return x

    bundle = jax.tree.map(conv, step_fn.bundle)

    its = None
    for _ in range(steps):
        state, its = step_fn.jitted(state, bundle)

    u_pad = fetch_replicated(state.u, rep)
    its_v = int(fetch_replicated(its, rep))
    u = u_pad[..., problem._vperm_newpos]

    if pid == 0:
        np.save(out_path, u)
        with open(out_path + ".meta.json", "w") as f:
            json.dump({"iterations": its_v,
                       "process_count": int(jax.process_count()),
                       "n_global_devices": len(jax.devices("cpu"))}, f)
    print(f"[rank {pid}] done: {its_v} its last step, "
          f"{jax.process_count()} processes", flush=True)


if __name__ == "__main__":
    main()
