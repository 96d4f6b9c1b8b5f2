"""Benchmark: KNP-EMI timestep throughput on TPU.

Runs a 3D tetrahedral KNP-EMI problem (unit cube, inner cube intracellular,
3 ions + 2 potentials = 8 CG1 fields, HH + ATP + cotransporter membrane,
GMRES + block-diagonal preconditioner, f32) and measures wall-clock per
timestep with the whole step (gating ODE sweep, operator/RHS re-assembly,
Krylov solve, field update) fused in one jitted on-device function.

Metric: microseconds per dof per timestep (lower is better) — the natural
hardware-efficiency density for this workload.

Baseline: the reference repo publishes no per-step numbers; its only
quantitative anchor is `utils/plot_scaling.py:6-8` — 490 s solve + 104 s
assembly on 1 CPU core for a 3D dense-tissue run (594 s total).  Reference
production configs step 25 us with `time_steps: 100` commented as the run
length (`configs/5m/100c.yaml`), and the 5 um tissue meshes carry ~1e6 dofs
(8 fields on ~1.3e5-vertex meshes).  That gives a baseline density of
594 s / (100 steps * 1e6 dofs) ~= 5.94 us/dof/step on CPU (1 core; their
best 6-core point is ~2.8).  vs_baseline reported here is
(baseline us/dof/step) / (ours), i.e. >1 means faster than the reference's
1-core density.  These assumptions are re-examined every round as better
baseline data lands.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

N_MESH = 24          # 24^3 hexes -> 83k tets, 15625 vertices, ~61k dofs
WARMUP = 5
STEPS = 200
BASELINE_US_PER_DOF_STEP = 5.94


def main():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_cube_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.scale_stimulus = False   # 2D-area scaling is unphysical on the cube
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-6, "pc_mode": "amg"}}
    mesh, tagger = generate_cube_geometry(N_MESH)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    step = solver._build_step(state)

    n_dofs = problem.assembler.n_dofs

    # NOTE: no device->host readback before or during timing — the first
    # D2H flips the axon runtime into a synchronous per-kernel mode that is
    # ~3000x slower per step (block_until_ready is safe; int(its) is not).
    for _ in range(WARMUP):
        state, its = step(state)
    jax.block_until_ready(state)

    tic = time.perf_counter()
    for _ in range(STEPS):
        state, its = step(state)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - tic

    sec_per_step = elapsed / STEPS
    us_per_dof_step = sec_per_step / n_dofs * 1e6
    vs_baseline = BASELINE_US_PER_DOF_STEP / us_per_dof_step

    print(json.dumps({
        "metric": "knpemi_3d_step_density",
        "value": round(us_per_dof_step, 6),
        "unit": "us/dof/step",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "n_dofs": int(n_dofs),
            "sec_per_step": round(sec_per_step, 6),
            "gmres_iterations_last": int(its),
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "mesh": f"unit cube {N_MESH}^3x6 tets",
        },
    }))


if __name__ == "__main__":
    main()
