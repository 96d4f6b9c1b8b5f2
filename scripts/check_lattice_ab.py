"""A/B on one small tissue problem: SA (gather) preconditioners vs the
gather-free lattice preconditioners, same solver semantics.

Usage: python scripts/check_lattice_ab.py [N] [C] [variants...]
Variants: sa_amg sa_phi lat_amg lat_phi lat_phi_c2
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
NAMES = sys.argv[3:] or ["sa_amg", "sa_phi", "lat_amg", "lat_phi",
                         "lat_phi_c2"]
STEPS = int(os.environ.get("CHK_STEPS", "4"))

VARIANTS = {
    # (pc_mode, force SA pc even on lattice mesh, extra ksp)
    "sa_amg": ("amg", True, {}),
    "sa_phi": ("amg_phi", True, {}),
    "sa_phi_c2": ("amg_phi", True, {"amg_cycles": 2}),
    "lat_amg": ("amg", False, {}),
    "lat_phi": ("amg_phi", False, {}),
    "lat_phi_c2": ("amg_phi", False, {"amg_cycles": 2}),
}


def build():
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
    return problem


def run(name):
    pc_mode, force_sa, extra = VARIANTS[name]
    problem = build()
    ksp = {"ksp_rtol": 1e-9, "pc_mode": pc_mode, "precision": "df32",
           "warm_start": "extrapolated", "matvec": "stencil", **extra}
    solver = SolverKNPEMI(problem, {"direct": False, "ksp_settings": ksp})
    solver.time_steps = STEPS
    if force_sa:
        from knp_emi_cgx_tpu.solvers.precond import (
            BlockDiagonalPreconditioner)
        u0 = np.asarray(problem.initial_state().u, np.float64)
        solver._pc = BlockDiagonalPreconditioner(
            problem.assembler, u0, mode=pc_mode, df=True,
            amg_opts=solver.amg_opts)
        solver._pc_lattice = False
    t0 = time.perf_counter()
    state = solver.solve(problem.initial_state())
    wall = time.perf_counter() - t0
    u = np.asarray(state.u, np.float64)
    print(f"[ab] {name:12s} lattice={getattr(solver, '_pc_lattice', False)}"
          f" its={solver.iterations} wall={wall:.0f}s", flush=True)
    return u


us = {}
for name in NAMES:
    us[name] = run(name)
ref = us[NAMES[0]]
scale = np.abs(ref).max()
for name in NAMES[1:]:
    err = np.abs(us[name] - ref).max() / scale
    print(f"[ab] {name} vs {NAMES[0]}: max rel diff = {err:.3e}")
