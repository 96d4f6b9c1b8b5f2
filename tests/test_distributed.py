"""Multi-process glue (parallel/distributed.py): the mpirun-equivalent
launch path, tested in its single-process degenerate form plus the
per-process halo bookkeeping invariants (VERDICT r1 #6; SURVEY §5.8)."""
import numpy as np
import pytest
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


@pytest.mark.slow   # 56 s: spawns 2 jax.distributed processes
def test_two_process_dof_sharded_step(tmp_path):
    """A REAL 2-process jax.distributed run (VERDICT r2 #4): two
    subprocesses (localhost coordinator, 4 virtual CPU devices each) run
    the dof-sharded KNP-EMI step over the 8-device global mesh — halo
    ppermutes and GMRES psum dots cross the process boundary — and the
    result must match the single-process 8-device run.  Exercises
    `initialize_distributed`'s N>1 branch end-to-end (reference parallel
    envelope: MPI size 16, configs/10m/100c.yaml:6)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from knp_emi_cgx_tpu.parallel.dof_sharded import (
        build_dof_sharded_problem, unpad_vertex_fields)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "scripts", "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "rank0_u.npy")
    STEPS, NMESH = 3, 12
    procs = []
    logs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)           # worker sets its own (4 devs)
        env.update({
            "KNPEMI_COORDINATOR": f"127.0.0.1:{port}",
            "KNPEMI_NUM_PROCESSES": "2",
            "KNPEMI_PROCESS_ID": str(rank),
            "KNPEMI_TEST_OUT": out,
            "KNPEMI_TEST_STEPS": str(STEPS),
            "KNPEMI_TEST_NMESH": str(NMESH),
        })
        log = open(str(tmp_path / f"rank{rank}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen([sys.executable, worker], env=env,
                                      stdout=log, stderr=subprocess.STDOUT,
                                      cwd=root))
    try:
        for p in procs:
            rc = p.wait(timeout=1500)
            assert rc == 0, "worker failed:\n" + "\n---\n".join(
                open(str(tmp_path / f"rank{r}.log")).read()
                for r in range(2))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    u_multi = np.load(out)
    meta = json.load(open(out + ".meta.json"))
    assert meta["process_count"] == 2
    assert meta["n_global_devices"] == 8

    # single-process 8-device reference, same problem & step count
    cpu = jax.devices("cpu")
    problem, state, step, mesh, halo = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=NMESH)
    its = None
    for _ in range(STEPS):
        state, its = step(state)
    u_single = unpad_vertex_fields(problem, state.u)

    assert np.all(np.isfinite(u_multi))
    np.testing.assert_allclose(u_multi, u_single, rtol=1e-9, atol=1e-13)
    assert meta["iterations"] == int(its)
