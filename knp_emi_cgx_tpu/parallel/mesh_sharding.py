"""Multi-chip spatial domain decomposition over a `jax.sharding.Mesh`.

The reference's one real parallel strategy is MPI domain decomposition of
the unstructured mesh (DOLFINx/PETSc ghost handling — SURVEY §2.2).  The
TPU-native mapping:

  * cells / membrane facets  →  sharded across the device mesh axis
    ("cells"), padded to even shards with zero-measure dummy entries
    (see KNPEMIAssembler.pad_multiple)
  * per-step assembly        →  each device computes its local element /
    facet contribution values; the `segment_sum` scatter into the global
    CSR value array becomes partial-sums + an XLA AllReduce — exactly the
    PETSc ADD_VALUES ghost accumulation
  * Krylov reductions        →  dots over replicated/sharded vectors; XLA
    inserts psum collectives over ICI
  * state pytree             →  replicated (field vectors are small
    relative to element data); the explicit-collective counterparts live in
    shard_map_spmv.py (all_gather row decomposition) and halo_spmv.py
    (ppermute neighbour-halo exchange with graph-partitioned reordering)

This GSPMD formulation follows the standard recipe: pick a mesh, annotate
shardings on the data, let XLA insert the collectives.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_assembler(assembler, device_mesh: Mesh, axis: str = "cells"):
    """Place the assembler's per-cell / per-facet arrays sharded over the
    device mesh, and everything else replicated.  Mutates the assembler's
    device arrays in place; index structures (host numpy) are untouched."""
    shard = NamedSharding(device_mesh, P(axis))
    rep = NamedSharding(device_mesh, P())

    for s in assembler._sides:
        for key in ("Vt", "K_e", "M_e"):
            s[key] = jax.device_put(s[key], shard)

    for name in ("mverts", "L_f", "stim_facet_mask", "region_qp"):
        setattr(assembler, name, jax.device_put(getattr(assembler, name), shard))
    assembler.model_masks = [jax.device_put(m, shard)
                             for m in assembler.model_masks]

    for name in ("Nq", "wq", "A_static_vals", "dyn_slots", "dyn_keep",
                 "rhs_rows", "rhs_keep", "indices", "indptr", "nullspace",
                 "src", "bc_flag"):
        setattr(assembler, name, jax.device_put(getattr(assembler, name), rep))
    return assembler


def build_sharded_problem(n_devices: int, devices=None, n_mesh: int = 16,
                          dtype=None, solver: str = "iterative"):
    """Construct a small KNP-EMI problem whose timestep is jitted over an
    `n_devices`-wide device mesh.  Returns (problem, solver, state, step_fn,
    device_mesh)."""
    import jax.numpy as jnp

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    if devices is None:
        # CPU backend only — asking the default backend for devices would
        # initialise it (possibly a single real TPU) and can't widen a mesh.
        devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"build_sharded_problem: need {n_devices} devices, have "
            f"{len(devices)}; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} before jax "
            f"initialises its backends")
    devices = np.array(devices[:n_devices])
    device_mesh = Mesh(devices, ("cells",))

    cfg = load_config("configs/tests/golden_parity.yaml")
    if solver == "iterative":
        cfg.solver_config = {"direct": False,
                             "ksp_settings": {"ksp_rtol": 1e-8 if dtype == jnp.float64 else 1e-6,
                                              "pc_mode": "dense"}}
    mesh, tagger = generate_square_geometry(n_mesh)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=dtype)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    # rebuild the assembler with device-count padding, then shard it
    from knp_emi_cgx_tpu.ops.assembly import KNPEMIAssembler

    problem.assembler = KNPEMIAssembler(
        problem.topo, problem.params, problem.ionic_models,
        dtype=dtype, dirichlet_bcs=cfg.dirichlet_bcs,
        pad_multiple=n_devices)
    shard_assembler(problem.assembler, device_mesh)

    solver_obj = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    rep = NamedSharding(device_mesh, P())
    state = jax.device_put(state, rep)
    step_fn = solver_obj._build_step(state)
    return problem, solver_obj, state, step_fn, device_mesh
