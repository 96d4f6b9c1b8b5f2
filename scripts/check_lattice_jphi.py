"""Quick correctness/iteration check of the joint-phi lattice
preconditioner (LatticeBlockPreconditioner mode='amg_phi') vs the
per-field lattice mode and the direct solve, on a small 3D tissue mesh.

Usage: python scripts/check_lattice_jphi.py [N] [C]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platform_name", "cpu")

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.main import build_models
from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2
STEPS = int(os.environ.get("CHK_STEPS", "4"))


def run(pc_mode, amg_opts=None, direct=False):
    cfg = load_config("configs/tissue/test_8c.yaml")
    cfg.intra_tags = tuple(range(2, C + 2))
    cfg.gamma_tags = tuple(range(2, C + 2))
    cfg.neuron_tags = cfg.intra_tags
    cfg.glia_tags = ()
    cfg.stimulus_tags = (2,)
    cfg.membrane_data_tag = 2
    mesh, tagger = generate_tissue_geometry(N, C)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(build_models(problem))
    ksp = {"ksp_rtol": 1e-9, "pc_mode": pc_mode, "precision": "df32",
           "warm_start": "extrapolated", "matvec": "stencil"}
    if amg_opts:
        ksp.update(amg_opts)
    solver = SolverKNPEMI(problem, {"direct": direct,
                                    "ksp_settings": ksp})
    solver.time_steps = STEPS
    t0 = time.perf_counter()
    state = solver.solve(problem.initial_state())
    wall = time.perf_counter() - t0
    u = np.asarray(state.u, np.float64)
    lat = getattr(solver, "_pc_lattice", False)
    print(f"[chk] {pc_mode}{amg_opts or ''} direct={direct} "
          f"lattice_pc={lat} its={solver.iterations} wall={wall:.1f}s",
          flush=True)
    return u, solver


u_dir, _ = run("amg", direct=True)
u_amg, s_amg = run("amg")
u_jphi, s_jphi = run("amg_phi", {"amg_cycles": 2})

scale = np.abs(u_dir).max()
for name, u in (("amg", u_amg), ("amg_phi_c2", u_jphi)):
    err = np.abs(u - u_dir).max() / scale
    print(f"[chk] {name}: max rel err vs direct = {err:.3e}")
    assert err < 1e-6, (name, err)
tot_a, tot_j = sum(s_amg.iterations), sum(s_jphi.iterations)
print(f"[chk] total its: amg={tot_a} amg_phi_c2={tot_j}")
print("[chk] PASS")
