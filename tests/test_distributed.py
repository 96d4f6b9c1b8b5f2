"""Multi-process glue (parallel/distributed.py): the mpirun-equivalent
launch path, tested in its single-process degenerate form plus the
per-process halo bookkeeping invariants (VERDICT r1 #6; SURVEY §5.8)."""
import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.parallel.distributed import (
    initialize_distributed, is_lead, global_mesh, shard_global_array,
    validate_halo_plan)


def test_initialize_single_process_noop():
    idx, count = initialize_distributed()
    assert idx == 0 and count == 1
    assert is_lead()


def test_global_mesh_and_shard():
    from jax.sharding import NamedSharding, PartitionSpec as P

    cpu = jax.devices("cpu")[:8]
    mesh = global_mesh("cells", devices=cpu)
    assert mesh.devices.size == 8
    x = np.arange(64, dtype=np.float64)
    arr = shard_global_array(x, NamedSharding(mesh, P("cells")))
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8


def test_halo_plan_invariants():
    """The ppermute exchange plan of the dof-sharded operator satisfies the
    per-process bookkeeping invariants on a real KNP-EMI partition."""
    from knp_emi_cgx_tpu.parallel.dof_sharded import build_dof_sharded_problem

    cpu = jax.devices("cpu")
    problem, state, step, mesh, halo = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=8)
    validate_halo_plan(halo)


def test_env_driven_config(monkeypatch):
    """Env vars parse; single-process values short-circuit initialize."""
    from knp_emi_cgx_tpu.parallel import distributed as D

    monkeypatch.setenv(D.ENV_NUM_PROCESSES, "1")
    monkeypatch.setenv(D.ENV_PROCESS_ID, "0")
    idx, count = initialize_distributed()
    assert (idx, count) == (0, 1)
