"""Second, independent reference-density estimates (VERDICT r2 #8).

The headline `vs_baseline` in bench.py rests on ONE inferred figure:
5.94 us/dof/step from the reference's `utils/plot_scaling.py:6-8` 1-core
timings (594 s total), assuming the 100-step run length its production
configs carry (`configs/5m/100c.yaml` time_steps: 100) and ~1e6 dofs.
This script produces two additional anchors so the multiplier no longer
rests on a single inference:

1. MEASURED same-host proxy of the reference's direct path: the
   reference's CI golden test solves the 32x32 monolithic KNP-EMI system
   with MUMPS LU, refactoring every step (the semi-implicit operator
   changes each step, `KNPEMIx_solver.py:104-116,435`).  We assemble the
   IDENTICAL discrete system (same P1 discretization, same golden config)
   and time scipy SuperLU factor+solve per step on this host — a
   like-for-like sparse-direct per-step cost on identical hardware.

2. ANALYTIC bandwidth model of the reference's iterative production path:
   per GMRES iteration ~ 1 SpMV + 1 BoomerAMG V-cycle (~5 SpMV
   equivalents) over the ~n*30-nnz monolithic CSR in f64 CSR storage
   (12 B/nnz), at a single-core effective stream bandwidth measured HERE.
   Solving plot_scaling's 4.9 s/step for the implied iteration count
   cross-checks the 5.94 figure for consistency.

Output: one JSON line with all anchors; consumed by BASELINE.md notes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measured_direct_proxy():
    """Per-step factor+solve time of the golden 32x32 monolithic system
    with SuperLU on this host (the MUMPS role)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI

    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(32)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    a = problem.assembler
    state = problem.initial_state()
    gates = {"n": state.n, "m": state.m, "h": state.h}
    vals, b = a.assemble(state.u, state.phi_m, gates, problem.params.dt)
    A = sp.csr_matrix((np.asarray(vals, np.float64),
                       np.asarray(a.csr_cols_np),
                       np.asarray(a.indptr_np)),
                      shape=(a.n_dofs, a.n_dofs))
    # ground one phi dof (the reference's MUMPS icntl24 handles the
    # singular system; SuperLU needs the explicit pin) — cost-neutral
    ns = np.nonzero(np.asarray(a.nullspace_np))[0]
    pin = int(ns[-1])
    A = A.tolil()
    A[pin, :] = 0.0
    A[pin, pin] = 1.0
    A = A.tocsc()
    bb = np.asarray(b, np.float64)

    # warm-up + timed refactor-per-step loop (what the reference does)
    lu = spla.splu(A)
    lu.solve(bb)
    reps = 10
    tic = time.perf_counter()
    for _ in range(reps):
        lu = spla.splu(A)
        x = lu.solve(bb)
    per_step = (time.perf_counter() - tic) / reps
    assert np.all(np.isfinite(x))
    return {
        "n_dofs": int(a.n_dofs),
        "sec_per_step": per_step,
        "us_per_dof_step": per_step / a.n_dofs * 1e6,
        "nnz": int(A.nnz),
    }


def measured_iterative_proxy():
    """Same-host re-enactment of the reference's ITERATIVE golden path
    (VERDICT r3 #6): the identical 32x32 monolithic system solved per step
    by right-preconditioned GMRES at rtol 1e-9 with the reference's
    block-diagonal P form (KNPEMIx_problem.py:657-744) applied exactly
    (sparse LU of the block-diagonal Pm — the role BoomerAMG approximates;
    at this size one V-cycle and one exact block solve cost the same order,
    and exact application can only flatter the baseline).  The reference's
    own CI pins this setup at mean 3.0 GMRES iterations/step."""
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI
    from knp_emi_cgx_tpu.solvers.precond import build_monolithic_precond

    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(32)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    a = problem.assembler
    state = problem.initial_state()
    gates = {"n": state.n, "m": state.m, "h": state.h}
    vals, b = a.assemble(state.u, state.phi_m, gates, problem.params.dt)
    A = sp.csr_matrix((np.asarray(vals, np.float64),
                       np.asarray(a.csr_cols_np),
                       np.asarray(a.indptr_np)),
                      shape=(a.n_dofs, a.n_dofs))
    bb = np.asarray(b, np.float64)
    Pm, _, _ = build_monolithic_precond(
        a, np.asarray(state.u, np.float64))
    # pure-Neumann system (the golden config pins nothing): deflate the
    # joint-constant phi mode exactly as PETSc's MatSetNullSpace does
    # (KNPEMIx_solver.py:297-335).  The block-diagonal P has TWO singular
    # modes (each phi block's own constant); an exact LU would amplify the
    # non-deflated combination by 1/eps and stall GMRES (BoomerAMG's
    # response to those modes is bounded) — shift each block's constant
    # mode by a typical diagonal scale before factorising (deflated LU)
    ns = (a.nullspace_np != 0).astype(np.float64)
    ns /= np.linalg.norm(ns)
    # lightly-regularised LU of P (the BoomerAMG role); convergence on the
    # PRECONDITIONED residual like PETSc's KSP default (KNPEMIx_solver.py
    # norm_type) — modern scipy's gmres tests the UNPRECONDITIONED
    # residual, so M is folded into the operator explicitly
    sigma = Pm.diagonal().mean()
    Plu = spla.splu((Pm + 1e-10 * sigma * sp.eye(a.n_dofs)).tocsc())

    def proj(v):
        return v - ns * (ns @ v)

    MA = spla.LinearOperator(
        A.shape, lambda v: proj(Plu.solve(proj(A @ proj(v)))))
    Mb = proj(Plu.solve(proj(bb)))

    its_box = [0]

    def cb(_):
        its_box[0] += 1

    x, info = spla.gmres(MA, Mb, rtol=1e-9, atol=0.0, restart=30,
                         callback=cb, callback_type="legacy")
    assert info == 0 and np.all(np.isfinite(x))
    reps, its_box[0] = 10, 0
    tic = time.perf_counter()
    for _ in range(reps):
        x, info = spla.gmres(MA, Mb, rtol=1e-9, atol=0.0, restart=30,
                             callback=cb, callback_type="legacy")
    per_step = (time.perf_counter() - tic) / reps
    its = its_box[0] / reps
    # conservative normalisation: the reference's hypre P needs 3.0
    # its/step on this exact problem (its CI gate); scale the measured
    # per-step time down to 3 iterations so the baseline is never
    # flattered by our LU stand-in needing more
    per_step_3its = per_step * 3.0 / max(its, 3.0)
    return {
        "n_dofs": int(a.n_dofs),
        "sec_per_step": per_step,
        "us_per_dof_step": per_step / a.n_dofs * 1e6,
        "iterations_per_step": its,
        "sec_per_step_at_reference_3its": per_step_3its,
        "us_per_dof_step_at_reference_3its":
            per_step_3its / a.n_dofs * 1e6,
        "note": "per-step value refresh + P setup excluded and iteration "
                "count normalised to the reference's 3.0 (both flatter "
                "the baseline); deflated block-P LU in the BoomerAMG "
                "role; PETSc preconditioned-norm criterion",
    }


def measured_tissue_spmv():
    """Measured SpMV cost on a REAL 3D tissue monolithic CSR on this host
    — grounds the bandwidth model's dominant kernel in a direct
    measurement at a 3D point (tissue16x8c, the CI tissue fixture)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import scipy.sparse as sp

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI

    cfg = load_config("configs/tissue/test_8c.yaml")
    mesh, tagger = generate_tissue_geometry(16, 8)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(build_models(problem))
    a = problem.assembler
    state = problem.initial_state()
    gates = {"n": state.n, "m": state.m, "h": state.h}
    vals, _ = a.assemble(state.u, state.phi_m, gates, problem.params.dt)
    A = sp.csr_matrix((np.asarray(vals, np.float64),
                       np.asarray(a.csr_cols_np),
                       np.asarray(a.indptr_np)),
                      shape=(a.n_dofs, a.n_dofs))
    x = np.ones(A.shape[0])
    A @ x
    reps = 50
    tic = time.perf_counter()
    for _ in range(reps):
        y = A @ x
    spmv = (time.perf_counter() - tic) / reps
    assert np.all(np.isfinite(y))
    return {"n_dofs": int(A.shape[0]), "nnz": int(A.nnz),
            "spmv_seconds": spmv,
            "nnz_per_row": A.nnz / A.shape[0],
            "effective_gbs": A.nnz * 12 / spmv / 1e9}


def measured_stream_bandwidth():
    """Effective single-core bandwidth for large strided reads (numpy)."""
    n = 40_000_000
    x = np.ones(n)
    x.sum()
    tic = time.perf_counter()
    reps = 5
    for _ in range(reps):
        x.sum()
    dt = (time.perf_counter() - tic) / reps
    return n * 8 / dt / 1e9   # GB/s


def analytic_iterative_model(bw_gbs):
    """Implied iteration count of the reference's plot_scaling run under a
    bandwidth-bound SpMV model; and the per-step density it predicts."""
    n = 1.0e6             # ~dofs of the 5um/100c meshes
    nnz_per_row = 30.0    # measured on our identical P1 discretization
    csr_bytes = nnz_per_row * n * 12          # 8B value + 4B col index
    spmv_s = csr_bytes / (bw_gbs * 1e9)
    vcycle_s = 5.0 * spmv_s                   # BoomerAMG V-cycle ~5 SpMVs
    per_it = spmv_s + vcycle_s + 4 * n * 8 / (bw_gbs * 1e9)  # + orthog.
    ref_step_s = 4.9                          # 490 s / 100 steps
    implied_its = ref_step_s / per_it
    return {
        "assumed_bandwidth_gbs": bw_gbs,
        "spmv_seconds": spmv_s,
        "per_iteration_seconds": per_it,
        "reference_sec_per_step": ref_step_s,
        "implied_iterations_per_step": implied_its,
        "consistent": bool(3.0 <= implied_its <= 60.0),
    }


def main():
    direct = measured_direct_proxy()
    iterative = measured_iterative_proxy()
    tissue = measured_tissue_spmv()
    bw = measured_stream_bandwidth()
    model = analytic_iterative_model(bw)
    out = {
        "measured_direct_proxy": direct,
        "measured_iterative_proxy": iterative,
        "measured_tissue_spmv": tissue,
        "measured_stream_bandwidth_gbs": bw,
        "analytic_iterative_model": model,
        "baseline_estimates_us_per_dof_step": {
            "plot_scaling_100_steps": 5.94,
            "plot_scaling_500_steps_conservative": 1.19,
            "direct_path_measured_same_host": direct["us_per_dof_step"],
            "iterative_path_measured_same_host":
                iterative["us_per_dof_step"],
            "iterative_path_measured_same_host_at_3its":
                iterative["us_per_dof_step_at_reference_3its"],
        },
    }
    print(json.dumps(out, indent=1))
    with open("output/baseline_proxy.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
