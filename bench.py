"""Benchmark: KNP-EMI timestep throughput on TPU at the PRODUCTION
operating point.

Problem: many-cell 3D tissue in a 5 um box (the reference's
configs/5m/*c.yaml setup; size set by N_MESH/N_CELLS below — currently the
largest point the axon runtime sustains reliably, see the note there),
full neuron+glia membrane stack (HH + ATP pump + cotransporters + Kir),
GMRES + SA-AMG block preconditioner at the reference production tolerance
rtol 1e-9 (preconditioned norm, KNPEMIx_solver.py:27) via the
compensated double-f32 path: f32 physics/assembly, df32 Krylov solve
(error-free-transformation arithmetic, ~2^-48 effective precision, pure
f32 tensor ops — solvers/df32.py) with exact-nullspace repair.  The
certified quantity is the real f64 preconditioned residual (tested in
tests/test_refine.py); TPU-emulated f64 appears only in scalar
bookkeeping.

Metric: microseconds per dof per timestep (lower is better).

Baseline: the reference publishes no per-step numbers; its only in-tree
quantitative anchor is `utils/plot_scaling.py:6-8` — 490 s solve + 104 s
assembly on 1 CPU core for a 3D dense-tissue run (594 s total).  Reference
production configs step 25 us with `time_steps: 100` commented as the run
length (`configs/5m/100c.yaml`), and the 5 um tissue meshes carry ~1e6 dofs.
That gives a baseline density of 594 s / (100 steps * 1e6 dofs)
~= 5.94 us/dof/step on CPU (1 core; their best 6-core point is ~2.8).
vs_baseline = (baseline us/dof/step) / (ours); >1 means faster than the
reference's 1-core density.  The baseline is INFERRED — flagged here every
round until better reference data lands.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_enable_x64", True)   # f64 Krylov (emulated on TPU)

import jax.numpy as jnp

# Operating point: the largest tissue problem the axon TPU runtime runs
# reliably end-to-end TODAY.  Round-3 session-5 re-probe (STATUS gotcha 8;
# output/tpu_probe_{32,36,40,48}_s5.log): sustained stepping + readback now
# PASSES at 32^3x19c (177k dofs, 20 steps) and 36^3x100c (254k dofs — the
# reference's flagship 100-cell count) and still FAULTS at 40^3 (349k) and
# 48^3 (603k), so the runtime ceiling moved from ~1e5 to ~3e5 dofs.  The
# benchmark runs the largest passing point; scale-up beyond it is gated on
# the runtime, not on this framework (at 48^3 and 64^3 every pipeline
# stage — assembly, ELL refresh, compensated matvec, AMG apply,
# bounded-restart GMRES — runs and reads back correctly in isolation).
N_MESH = int(os.environ.get("BENCH_MESH", "36"))
N_CELLS = int(os.environ.get("BENCH_CELLS", "100"))
WARMUP = 3
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
RTOL = 1e-9
# split_step/launch_outer: the probe-proven launch bounding (three jitted
# programs, host-chunked restart cycles — bit-identical results); costs
# ~0.5 ms/step of dispatch, lifts the runtime's fused-program size ceiling
SPLIT = os.environ.get("BENCH_SPLIT", "auto")
SPLIT = (N_MESH >= 33) if SPLIT == "auto" else SPLIT == "1"
BASELINE_US_PER_DOF_STEP = 5.94
# preconditioner A/B knob (amg = per-block SA-AMG; amg2 = joint-phi
# monolithic SA-AMG keeping the membrane capacitive cross-coupling)
PC_MODE = os.environ.get("BENCH_PC", "amg")
# warm-start A/B knob: "extrapolated" (2*x_k - x_{k-1} predictor, default)
# or "previous" (reference non_zero_init_guess semantics)
WARM_START = os.environ.get("BENCH_WARM", "extrapolated")


def main():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    cfg = load_config("configs/tissue/5m_100c.yaml")
    if N_CELLS != 100:        # the config already carries the 100-cell tags
        cfg.intra_tags = tuple(range(2, N_CELLS + 2))
        cfg.gamma_tags = tuple(range(2, N_CELLS + 2))
        # ~8% of cells are glial (last tags), mirroring configs/5m/100c.yaml
        n_glia = max(1, N_CELLS // 12)
        cfg.glia_tags = tuple(range(N_CELLS + 2 - n_glia, N_CELLS + 2))
        cfg.neuron_tags = tuple(t for t in cfg.intra_tags
                                if t not in cfg.glia_tags)
        cfg.stimulus_tags = (5,)
        cfg.membrane_data_tag = cfg.intra_tags[0]
    ksp = {"ksp_rtol": RTOL,
           "pc_mode": PC_MODE,
           "precision": "df32",
           "warm_start": WARM_START}
    if SPLIT:
        ksp.update(split_step=True, launch_outer=2, setup_cache=True)
    cfg.solver_config = {"direct": False, "ksp_settings": ksp}

    tic = time.perf_counter()
    mesh, tagger = generate_tissue_geometry(N_MESH, N_CELLS)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    problem.init_ionic_models(build_models(problem))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    state = state._replace(
        x=jnp.stack([state.x, jnp.zeros_like(state.x)]))
    setup_s = time.perf_counter() - tic

    step = solver._build_step(state)
    n_dofs = problem.assembler.n_dofs

    # NOTE: no device->host readback before or during timing — the first
    # D2H flips the axon runtime into a synchronous per-kernel mode that is
    # ~3000x slower per step (block_until_ready is safe; int(its) is not).
    extrap = solver.extrapolator()   # device-side predictor, no D2H
    x_prev = None
    n_done = 0
    its_trace = []

    def advance(state, x_prev, n_done):
        if extrap is not None:
            x_cur = state.x
            # predict only from two converged solutions (>= 2 steps done)
            if n_done >= 2:
                state = state._replace(x=extrap(x_cur, x_prev))
            x_prev = x_cur
        state, its = step(state)
        return state, x_prev, its

    for _ in range(WARMUP):
        state, x_prev, its = advance(state, x_prev, n_done)
        n_done += 1
    jax.block_until_ready(state)

    tic = time.perf_counter()
    for _ in range(STEPS):
        state, x_prev, its = advance(state, x_prev, n_done)
        n_done += 1
        its_trace.append(its)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - tic

    sec_per_step = elapsed / STEPS
    us_per_dof_step = sec_per_step / n_dofs * 1e6
    vs_baseline = BASELINE_US_PER_DOF_STEP / us_per_dof_step
    its_np = [int(v) for v in its_trace]

    print(json.dumps({
        "metric": "knpemi_tissue_step_density",
        "value": round(us_per_dof_step, 6),
        "unit": "us/dof/step",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "n_dofs": int(n_dofs),
            "n_cells_bio": N_CELLS,
            "sec_per_step": round(sec_per_step, 6),
            "gmres_iterations_mean": round(sum(its_np) / len(its_np), 2),
            "gmres_iterations_max": max(its_np),
            "rtol": RTOL,
            "pc": PC_MODE,
            "warm_start": WARM_START,
            "split_step": bool(SPLIT),
            "criterion": "preconditioned norm (PETSc KSP semantics), "
                         "df32 compensated solve",
            "setup_seconds": round(setup_s, 2),
            "device": str(jax.devices()[0]),
            "dtype": "float32 storage + double-f32 compensated Krylov",
            "mesh": f"tissue {N_MESH}^3x6 tets, {N_CELLS} cells",
            "vs_baseline_conservative": round(1.19 / us_per_dof_step, 3),
            "baseline_note": "5.94 us/dof/step from plot_scaling.py 1-core "
                             "run (594 s / 100 steps / ~1e6 dofs; 100 is "
                             "the time_steps the production configs carry), "
                             "corroborated by a bandwidth model (implies a "
                             "plausible ~8 its/step, baseline_proxy.json) "
                             "and bracketed by a conservative 500-step "
                             "reading (1.19); measured same-host SuperLU "
                             "direct-path proxy: 23.2 us/dof/step at 4.6k "
                             "dofs (see BASELINE.md round-3 section)",
        },
    }))


if __name__ == "__main__":
    main()
