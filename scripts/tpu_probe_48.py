"""Re-probe the axon TPU runtime defect at 48^3 tissue scale (STATUS
gotcha 8; VERDICT r2 #1a).

Round-2 bisection: at 603k dofs every stage runs AND reads back correctly
in isolation, but (a) the fused step faults at launch, (b) a cold
rtol-1e-9 solve in one while_loop launch faults, (c) sustained stepping
with split_step+launch_outer chunking left the device session unreadable.
STATUS says re-probe each round — runtimes get updated.

This probe uses every in-tree mitigation: split_step (three bounded
programs), launch_outer=2 (host-chunked restart cycles), AMG disk cache,
width-major ELL.  It steps N times and then — critically — READS BACK the
potential (block_until_ready does NOT surface the fault; only D2H does).

Exit codes: 0 = sustained stepping verified by readback; nonzero = the
defect persists (the traceback/timeout is the evidence).
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

N_MESH = int(os.environ.get("PROBE_MESH", "48"))
N_CELLS = int(os.environ.get("PROBE_CELLS", "100"))
STEPS = int(os.environ.get("PROBE_STEPS", "10"))


def main():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    print(f"[probe] device: {jax.devices()[0]}", flush=True)
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
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-9,
                                          "pc_mode": "amg",
                                          "precision": "df32",
                                          "split_step": True,
                                          "launch_outer": 2,
                                          "setup_cache": True}}
    tic = time.perf_counter()
    mesh, tagger = generate_tissue_geometry(N_MESH, N_CELLS)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    problem.init_ionic_models(build_models(problem))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    print(f"[probe] setup {time.perf_counter()-tic:.1f} s, "
          f"n_dofs={problem.assembler.n_dofs}", flush=True)

    step = solver._build_step(state)
    state = solver.prepare_state(state)
    print(f"[probe] operator: "
          f"{'stencil' if solver._stencil is not None else 'ell'}",
          flush=True)
    for i in range(1, STEPS + 1):
        tic = time.perf_counter()
        state, its = step(state)
        jax.block_until_ready(state)
        print(f"[probe] step {i} launched+blocked "
              f"({time.perf_counter()-tic:.1f} s)", flush=True)

    # THE test: a D2H readback after sustained stepping
    tic = time.perf_counter()
    phi = np.asarray(state.phi_m)
    print(f"[probe] READBACK OK in {time.perf_counter()-tic:.1f} s: "
          f"max|phi_m|={np.abs(phi).max():.4e}, finite={np.isfinite(phi).all()}",
          flush=True)
    its_v = int(its)
    print(f"[probe] last-step iterations: {its_v}", flush=True)
    print(f"[probe] PASS: sustained {N_MESH}^3x{N_CELLS}c stepping "
          "verified by readback", flush=True)


if __name__ == "__main__":
    main()
