"""Timing-methodology probe (VERDICT r3 weak #2): is block_until_ready
real on this runtime, or is execution deferred to the first D2H readback?

Measures, in ONE process (order matters — the first D2H flips the axon
runtime into a slower synchronous mode, STATUS gotcha 1):

  T_block    : N timed steps + jax.block_until_ready   (old bench method)
  T_readback : the FIRST D2H after those steps — a data-dependent scalar
               (max|phi_m| of the final state).  If execution was deferred,
               this is where the compute actually happens.
  honest s/step = (T_block + T_readback) / N            (what bench.py
               must report: execution provably forced inside the region)
  T_sync     : M more steps, each followed by a scalar readback — the
               post-flip synchronous throughput.

Run with different PROBE_STEPS values (fresh process each) to check that
(T_block + T_readback) scales with N (i.e. it is execution time, not a
fixed flush cost).

Env: PROBE_MESH (24), PROBE_CELLS (8), PROBE_STEPS (10), PROBE_SYNC (5),
     PROBE_SPLIT (auto: mesh>=33).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

N_MESH = int(os.environ.get("PROBE_MESH", "24"))
N_CELLS = int(os.environ.get("PROBE_CELLS", "8"))
STEPS = int(os.environ.get("PROBE_STEPS", "10"))
SYNC_STEPS = int(os.environ.get("PROBE_SYNC", "5"))
SPLIT = os.environ.get("PROBE_SPLIT", "auto")
SPLIT = (N_MESH >= 33) if SPLIT == "auto" else SPLIT == "1"


def main():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    print(f"[tprobe] device: {jax.devices()[0]}", flush=True)
    cfg = load_config("configs/tissue/5m_100c.yaml")
    if N_CELLS != 100:
        cfg.intra_tags = tuple(range(2, N_CELLS + 2))
        cfg.gamma_tags = tuple(range(2, N_CELLS + 2))
        n_glia = max(1, N_CELLS // 12)
        cfg.glia_tags = tuple(range(N_CELLS + 2 - n_glia, N_CELLS + 2))
        cfg.neuron_tags = tuple(t for t in cfg.intra_tags
                                if t not in cfg.glia_tags)
        cfg.stimulus_tags = (cfg.intra_tags[0],)
        cfg.membrane_data_tag = cfg.intra_tags[0]
    ksp = {"ksp_rtol": 1e-9, "pc_mode": "amg", "precision": "df32"}
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
    state = state._replace(x=jnp.stack([state.x, jnp.zeros_like(state.x)]))
    n_dofs = problem.assembler.n_dofs
    print(f"[tprobe] setup {time.perf_counter()-tic:.1f} s, n_dofs={n_dofs}, "
          f"split={SPLIT}", flush=True)

    step = solver._build_step(state)

    # warmup (compile) — no D2H
    tic = time.perf_counter()
    for _ in range(3):
        state, its = step(state)
    jax.block_until_ready(state)
    print(f"[tprobe] warmup 3 steps + block: {time.perf_counter()-tic:.1f} s",
          flush=True)

    # timed region, old methodology boundary
    tic = time.perf_counter()
    for _ in range(STEPS):
        state, its = step(state)
    jax.block_until_ready(state)
    t_block = time.perf_counter() - tic

    # the FIRST D2H: data-dependent scalar readback
    tic = time.perf_counter()
    m = float(jnp.max(jnp.abs(state.phi_m)))
    t_read = time.perf_counter() - tic
    honest = (t_block + t_read) / STEPS
    print(f"[tprobe] T_block({STEPS} steps)={t_block:.3f} s "
          f"({t_block/STEPS*1e3:.2f} ms/step), T_readback={t_read:.3f} s, "
          f"HONEST={(honest)*1e3:.2f} ms/step "
          f"({honest/n_dofs*1e6:.4f} us/dof/step), max|phi_m|={m:.3e}",
          flush=True)

    # post-flip synchronous throughput
    tic = time.perf_counter()
    for _ in range(SYNC_STEPS):
        state, its = step(state)
        _ = float(jnp.max(jnp.abs(state.phi_m)))
    t_sync = (time.perf_counter() - tic) / SYNC_STEPS
    print(f"[tprobe] T_sync(per-step readback x{SYNC_STEPS}): "
          f"{t_sync*1e3:.2f} ms/step, last its={int(its)}", flush=True)
    print("[tprobe] DONE", flush=True)


if __name__ == "__main__":
    main()
