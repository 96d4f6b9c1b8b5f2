"""Isolated V-cycle quality probe for the joint (phi_i, phi_e) operator:
error-contraction factor per application of
  * SmoothedAggregationAMG(J) with components + pairs (the SA recipe)
  * LatticeAMG(J, n_fields=2, pair_smooth=True|False)
on the same matrix, measured by power iteration on the error propagator
E = I - M A (the asymptotic GMRES-relevant quantity).

Usage: python scripts/check_jphi_contraction.py [N] [C]
"""
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.main import build_models
from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
from knp_emi_cgx_tpu.ops.stencil import detect_lattice
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI
from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG
from knp_emi_cgx_tpu.solvers.lattice_amg import LatticeAMG
from knp_emi_cgx_tpu.solvers.precond import _build_blocks, build_joint_phi

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2

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
a = problem.assembler
dims = detect_lattice(a.points_np)
u0 = np.asarray(problem.initial_state().u, np.float64)
blocks = _build_blocks(a, u0)
Nion = a.N_ions
sizes = [b.shape[0] for b in blocks]
offs = np.concatenate([[0], np.cumsum(sizes)])
J, comp, pairs, ni = build_joint_phi(
    a, blocks[Nion], blocks[2 * Nion + 1],
    int(offs[Nion]), int(offs[2 * Nion + 1]))
ne = J.shape[0] - ni
n_pts = int(np.prod(dims))
print(f"[ctr] J: {J.shape[0]} dofs (ni={ni}, ne={ne}), nnz={J.nnz}, "
      f"lattice dims={dims}", flush=True)

active_j = np.concatenate([a.intra_dofs_np, n_pts + a.extra_dofs_np])
rng = np.random.default_rng(0)


def contraction(apply_fn, lift=None, n_iter=12):
    """|E|-ish: power iteration on E = I - M A (A = J)."""
    e = rng.standard_normal(J.shape[0])
    e /= np.linalg.norm(e)
    rho = None
    for _ in range(n_iter):
        r = J @ e
        z = apply_fn(r, lift)
        e_new = e - z
        rho = np.linalg.norm(e_new) / np.linalg.norm(e)
        e = e_new / np.linalg.norm(e_new)
    return rho


def sa_apply(r, _):
    z = amg_sa(jnp.asarray(r))
    return np.asarray(z, np.float64)


def lat_apply(r, lat):
    rl_full = np.zeros(2 * n_pts)
    rl_full[active_j] = r
    h = jnp.asarray(rl_full, jnp.float32)
    l = jnp.asarray(rl_full - np.asarray(h, np.float64), jnp.float32)
    zh, zl = lat.apply_df(h, l)
    z = np.asarray(zh, np.float64) + np.asarray(zl, np.float64)
    return z[active_j]


for cyc in (1, 2):
    amg_sa = SmoothedAggregationAMG(J, dtype=jnp.float64, smooth_iters=3,
                                    components=comp, block_pairs=pairs,
                                    cycles=cyc)
    print(f"[ctr] SA s3c{cyc} levels={len(amg_sa.levels)} "
          f"rho={contraction(sa_apply):.3f}", flush=True)

for pair_smooth in (True, False):
    for si in (2, 3):
        lat = LatticeAMG(J, active_j, dims, n_fields=2,
                         pair_smooth=pair_smooth, smooth_iters=si)
        lams = [lv.lam for lv in lat.levels]
        print(f"[ctr] LAT pair={pair_smooth} s{si} levels={len(lat.levels)} "
              f"lams={[f'{v:.2f}' for v in lams]} "
              f"rho={contraction(lat_apply, lat):.3f}", flush=True)
