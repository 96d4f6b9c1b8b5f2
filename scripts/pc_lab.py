"""Preconditioner / warm-start laboratory (VERDICT r3 next-step #3).

Host-side (numpy/scipy) experiment harness for cutting tissue-scale GMRES
iterations at rtol 1e-9.  It reproduces the production solver's semantics
exactly — left-preconditioned restarted GMRES, rtol on ||M b||, nullspace
projection (solvers/krylov.py) — but applies candidate preconditioners via
sparse LU / eager AMG so each variant costs seconds instead of an XLA
compile on the 1-core host.  Rankings transfer: the device path applies
the SAME operators in df32.

Trajectory: the problem is stepped with exact (bordered-deflated sparse LU)
solves so every experiment sees the same converged physics at every step —
warm-start quality is then measured against real dynamics, not noise.

Experiments (per step, from step `skip` on):
  pc form   : block   — block-diagonal Benedusi P (pc_mode amg semantics)
              jphi    — + membrane capacitive (phi_i, phi_e) cross coupling
                        (pc_mode amg_phi semantics)
  apply     : exact   — sparse LU (the FORM's iteration-count limit)
              amg     — SmoothedAggregationAMG V-cycle(s), eager on CPU
  predictor : prev | lin (2x_k - x_{k-1}) | quad (3x_k - 3x_{k-1} + x_{k-2})
  deflation : harmonic-Ritz recycling (GCRO-DR style), k vectors carried
              across steps

Usage: python scripts/pc_lab.py [--mesh tissue16x8c] [--steps 6] [--skip 2]
       [--rtol 1e-9] [--variants ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platform_name", "cpu")


# ---------------------------------------------------------------------------
# GMRES with the production solver's exact semantics (solvers/krylov.py):
# left preconditioning, rtol on ||proj(M b)||, nullspace projection after
# every M application, modified Gram-Schmidt Arnoldi, restart.
# ---------------------------------------------------------------------------

def gmres_np(matvec, b, x0, M, ns=None, rtol=1e-9, restart=30,
             max_iters=2000, deflate_U=None, deflate_AU=None):
    """Returns (x, iters, relres, basis_V, basis_H) — V/H from the LAST
    restart cycle (for harmonic-Ritz extraction)."""
    def proj(v):
        if ns is None:
            return v
        return v - (ns @ v) * ns

    b = proj(b)
    norm_ref = np.linalg.norm(proj(M(b)))
    tol = rtol * max(norm_ref, 1e-300)

    x = x0.copy()
    iters = 0
    last_V = last_H = None
    # GCRO-DR-style deflation: C = orth(M AU), U' = U R^-1; residual kept
    # orthogonal to C, solution gains U' (C^T r) contributions.
    C = Udef = None
    if deflate_U is not None and deflate_U.shape[1] > 0:
        MAU = np.stack([proj(M(deflate_AU[:, j]))
                        for j in range(deflate_AU.shape[1])], axis=1)
        Q, R = np.linalg.qr(MAU)
        ok = np.abs(np.diag(R)) > 1e-12 * np.abs(R).max()
        if ok.any():
            C = Q[:, ok]
            Udef = np.linalg.solve(R[np.ix_(ok, ok)].T,
                                   deflate_U[:, ok].T).T

    def correct(x):
        """Residual with the recycled-space component solved out exactly:
        M A Udef = C (by construction), so x += Udef (C^T r) zeroes the
        C-component of the preconditioned residual in one update."""
        r = proj(M(b - matvec(x)))
        if C is not None:
            cr = C.T @ r
            x = x + Udef @ cr
            r = r - C @ cr
        return x, r

    while iters < max_iters:
        x, r = correct(x)
        beta = np.linalg.norm(r)
        if beta <= tol:
            break
        m = restart
        V = np.zeros((len(b), m + 1))
        H = np.zeros((m + 1, m))
        V[:, 0] = r / beta
        g = np.zeros(m + 1)
        g[0] = beta
        cs = np.zeros(m)
        sn = np.zeros(m)
        k_done = 0
        for k in range(m):
            w = proj(M(matvec(V[:, k])))
            if C is not None:
                w = w - C @ (C.T @ w)
            for j in range(k + 1):
                H[j, k] = V[:, j] @ w
                w = w - H[j, k] * V[:, j]
            H[k + 1, k] = np.linalg.norm(w)
            if H[k + 1, k] > 1e-300:
                V[:, k + 1] = w / H[k + 1, k]
            # Givens
            h0, h1 = H[k, k], H[k + 1, k]
            for j in range(k):
                t = cs[j] * H[j, k] + sn[j] * H[j + 1, k]
                H[j + 1, k] = -sn[j] * H[j, k] + cs[j] * H[j + 1, k]
                H[j, k] = t
            d = np.hypot(H[k, k], H[k + 1, k])
            cs[k], sn[k] = H[k, k] / d, H[k + 1, k] / d
            H[k, k] = d
            H[k + 1, k] = 0.0
            g[k + 1] = -sn[k] * g[k]
            g[k] = cs[k] * g[k]
            iters += 1
            k_done = k + 1
            if abs(g[k + 1]) <= tol:
                break
        y = np.linalg.solve(
            np.triu(H[:k_done, :k_done])
            + np.tril(H[:k_done, :k_done], -1), g[:k_done])
        x = x + V[:, :k_done] @ y
        last_V, last_H = V, H[:k_done + 1, :k_done]
        x, r = correct(x)
        if np.linalg.norm(r) <= tol:
            break
    relres = np.linalg.norm(proj(M(b - matvec(x)))) / max(norm_ref, 1e-300)
    return x, iters, relres, last_V, last_H


def harmonic_ritz(V, H, k):
    """k smallest harmonic Ritz vectors from an Arnoldi relation
    span(V_m), H_(m+1,m) — the GCRO-DR recycling candidates."""
    m = H.shape[1]
    if m < k + 1:
        return None
    Hm = H[:m, :]
    hm1 = H[m, m - 1]
    # harmonic: solve (Hm + hm1^2 * Hm^{-T} e_m e_m^T) y = theta y
    em = np.zeros(m)
    em[-1] = 1.0
    try:
        f = np.linalg.solve(Hm.T, em)
    except np.linalg.LinAlgError:
        return None
    Hh = Hm + (hm1 ** 2) * np.outer(f, em)
    w, y = np.linalg.eig(Hh)
    idx = np.argsort(np.abs(w))[:k]
    Y = np.real(y[:, idx])
    return V[:, :m] @ Y


# ---------------------------------------------------------------------------


def build(mesh_spec, config, reassemble_p=False):
    import jax.numpy as jnp

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import (generate_tissue_geometry,
                                                 generate_square_geometry)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI

    cfg = load_config(config)
    if mesh_spec.startswith("tissue"):
        body = mesh_spec[len("tissue"):]
        n, c = body.split("x")
        mesh, tagger = generate_tissue_geometry(int(n), int(c.rstrip("c")))
    else:
        mesh, tagger = generate_square_geometry(int(mesh_spec))
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(build_models(problem))
    return problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="tissue16x8c")
    ap.add_argument("--config", default="configs/tissue/test_8c.yaml")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--skip", type=int, default=2,
                    help="report iterations from this step on (warm steps)")
    ap.add_argument("--rtol", type=float, default=1e-9)
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--out", default="")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    import jax.numpy as jnp

    from knp_emi_cgx_tpu.models.gating import rush_larsen_update
    from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley
    from knp_emi_cgx_tpu.solvers.precond import build_monolithic_precond
    from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG

    t0 = time.perf_counter()
    problem = build(args.mesh, args.config)
    a = problem.assembler
    p = problem.params
    state = problem.initial_state()
    hh = next(m for m in problem.ionic_models if isinstance(m, HodgkinHuxley))
    has_neumann = not a.has_bcs
    ns = None
    if has_neumann:
        nsv = np.asarray(a.nullspace_np, np.float64)
        ns = nsv / np.linalg.norm(nsv)
    print(f"[lab] {args.mesh}: n_dofs={a.n_dofs}, neumann={has_neumann}, "
          f"setup {time.perf_counter() - t0:.1f} s", flush=True)

    # ---- trajectory with exact solves --------------------------------
    u = np.array(state.u, dtype=np.float64)       # writable copies
    phi_m = np.array(state.phi_m, dtype=np.float64)
    gates = {k: np.asarray(getattr(state, k), np.float64)
             for k in ("n", "m", "h")}
    fd = a.field_dof
    traj = []
    t = 0.0
    for i in range(1, args.steps + 1):
        t_new = t + p.dt
        dt_ode = p.dt / hh.time_steps_ode
        n_, m_, h_ = rush_larsen_update(
            jnp.asarray(gates["n"]), jnp.asarray(gates["m"]),
            jnp.asarray(gates["h"]), jnp.asarray(phi_m), p.phi_rest,
            dt_ode, hh.time_steps_ode)
        gates = {"n": np.asarray(n_, np.float64),
                 "m": np.asarray(m_, np.float64),
                 "h": np.asarray(h_, np.float64)}
        vals, b = a.assemble(jnp.asarray(u), jnp.asarray(phi_m),
                             {k: jnp.asarray(v) for k, v in gates.items()},
                             t_new)
        A = sp.csr_matrix((np.asarray(vals, np.float64),
                           np.asarray(a.csr_cols_np),
                           np.asarray(a.indptr_np)),
                          shape=(a.n_dofs, a.n_dofs))
        bb = np.asarray(b, np.float64)
        tic = time.perf_counter()
        if has_neumann:
            K = sp.bmat([[A, ns[:, None]], [ns[None, :], None]],
                        format="csc")
            xx = spla.splu(K).solve(np.concatenate([bb, [0.0]]))[:-1]
        else:
            xx = spla.splu(A.tocsc()).solve(bb)
        lu_s = time.perf_counter() - tic
        for f in range(a.nf):
            act = np.nonzero(fd[f] >= 0)[0]
            u[f, act] = xx[fd[f, act]]
        phi_m = u[a.PHI_I] - u[a.PHI_E]
        traj.append({"A": A, "b": bb, "x": xx, "u": u.copy(),
                     "gates": dict(gates)})
        t = t_new
        print(f"[lab] step {i}: exact solve {lu_s:.1f} s, "
              f"max|phi_m|={np.abs(phi_m).max():.4e}", flush=True)

    # ---- preconditioners (built once from the initial state, like the
    # reference's reassemble_P=False default) -------------------------
    u0 = np.asarray(problem.initial_state().u, np.float64)
    P_block, _, _ = build_monolithic_precond(a, u0, joint_phi=False)
    P_jphi, comp, pairs = build_monolithic_precond(a, u0, joint_phi=True)
    lu_block = spla.splu(P_block.tocsc())
    lu_jphi = spla.splu(P_jphi.tocsc())

    # ---- block Gauss-Seidel (triangular) FORMS -----------------------
    # The block-diagonal FORM floors at ~18.8 warm its (measured round 4
    # session 2); the coupling it drops is the ion<->phi drift/flux
    # off-diagonal blocks of A.  A triangular form keeps HALF of that
    # coupling at the same apply cost family (forward substitution by
    # field blocks).  P_tri = A0 masked to the field-block lower triangle
    # under a chosen field ORDER, with the (phi_i, phi_e) pair kept as a
    # full 2x2 diagonal block (membrane coupling, the jphi lesson).  Built
    # ONCE from the step-1 operator (reassemble_P=False semantics).
    A0 = traj[0]["A"].tocoo()
    dof_field = np.full(a.n_dofs, -1, np.int32)
    for f in range(a.nf):
        act = np.nonzero(fd[f] >= 0)[0]
        dof_field[fd[f, act]] = f
    ions = [f for f in range(a.nf) if f not in (a.PHI_I, a.PHI_E)]

    def tri_matrix(order_ranks):
        rank = np.asarray(order_ranks, np.int32)[dof_field]
        keep = rank[A0.row] >= rank[A0.col]
        return sp.csr_matrix((A0.data[keep],
                              (A0.row[keep], A0.col[keep])),
                             shape=A0.shape)

    ranks_ionfirst = np.zeros(a.nf, np.int32)   # ions 0.., phis last (==)
    for j, f in enumerate(ions):
        ranks_ionfirst[f] = j
    ranks_ionfirst[a.PHI_I] = ranks_ionfirst[a.PHI_E] = len(ions)
    ranks_phifirst = np.ones(a.nf, np.int32)    # phis first (==0)
    ranks_phifirst[a.PHI_I] = ranks_phifirst[a.PHI_E] = 0
    for j, f in enumerate(ions):
        ranks_phifirst[f] = 1 + j
    # phis first but SEQUENTIAL (phi_i, then phi_e seeing the membrane
    # coupling one-way, then ions) — the form a per-field batched lattice
    # hierarchy can realize without a joint (phi_i, phi_e) pair solve
    ranks_phiseq = np.asarray(ranks_phifirst) + 1
    ranks_phiseq[a.PHI_I] = 0
    ranks_phiseq[a.PHI_E] = 1
    lu_tri_ion = spla.splu(tri_matrix(ranks_ionfirst).tocsc())
    lu_tri_phi = spla.splu(tri_matrix(ranks_phifirst).tocsc())
    lu_tri_seq = spla.splu(tri_matrix(ranks_phiseq).tocsc())

    def amg_apply_of(Pm, cycles=1, smooth_iters=2, components=None,
                     block_pairs=None, per_component_lam=False,
                     cycle_damp=1.0, **kw):
        """cycle_damp < 1 keeps the multi-cycle operator
        M_2 = M + damp*M(I - A M) nonsingular even when lam(MA) reaches 2
        (observed: undamped 2-cycle jphi STAGNATED GMRES at tissue12x2c —
        1500-it cap — while converging at 16x8c; the eigenvalue
        mu(1 + damp(1-mu)) is positive for all mu in (0,2] iff damp<1)."""
        amg = SmoothedAggregationAMG(
            Pm, dtype=jnp.float64, smooth_iters=smooth_iters,
            components=components, block_pairs=block_pairs,
            per_component_lam=per_component_lam, **kw)

        def apply(r):
            z = amg(jnp.asarray(r))
            for _ in range(cycles - 1):
                rr = r - np.asarray(Pm @ np.asarray(z, np.float64))
                z = z + cycle_damp * amg(jnp.asarray(rr))
            return np.asarray(z, np.float64)
        return apply

    VARIANTS = {
        "block_exact": dict(M=lambda r: lu_block.solve(r), pred="lin"),
        "jphi_exact": dict(M=lambda r: lu_jphi.solve(r), pred="lin"),
        "tri_ionfirst_exact": dict(M=lambda r: lu_tri_ion.solve(r),
                                   pred="lin"),
        "tri_phifirst_exact": dict(M=lambda r: lu_tri_phi.solve(r),
                                   pred="lin"),
        "tri_phiseq_exact": dict(M=lambda r: lu_tri_seq.solve(r),
                                 pred="lin"),
        "block_exact_prev": dict(M=lambda r: lu_block.solve(r), pred="prev"),
        "block_exact_quad": dict(M=lambda r: lu_block.solve(r), pred="quad"),
        "jphi_exact_quad": dict(M=lambda r: lu_jphi.solve(r), pred="quad"),
        "block_exact_defl8": dict(M=lambda r: lu_block.solve(r), pred="lin",
                                  deflate=8),
        "block_exact_defl16": dict(M=lambda r: lu_block.solve(r), pred="lin",
                                   deflate=16),
        "jphi_exact_defl16": dict(M=lambda r: lu_jphi.solve(r), pred="lin",
                                  deflate=16),
        "block_amg": dict(M=("amg", P_block, dict()), pred="lin"),
        "block_amg_s3": dict(M=("amg", P_block, dict(smooth_iters=3)),
                             pred="lin"),
        "block_amg_c2": dict(M=("amg", P_block, dict(cycles=2)), pred="lin"),
        "jphi_amg": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True)), pred="lin"),
        "jphi_amg_s3": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True, smooth_iters=3)),
            pred="lin"),
        "jphi_amg_s3c2": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True, smooth_iters=3,
                                   cycles=2)), pred="lin"),
        "jphi_amg_s3c2d": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True, smooth_iters=3,
                                   cycles=2, cycle_damp=0.7)), pred="lin"),
        "jphi_amg_quad": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True)), pred="quad"),
        "jphi_amg_defl16": dict(
            M=("amg", P_jphi, dict(components=comp, block_pairs=pairs,
                                   per_component_lam=True)), pred="lin",
            deflate=16),
        # phi-first block Gauss-Seidel realizations: z_phi = M(r|phi),
        # then ions see the drift coupling through the CURRENT step's A:
        # z_ion = M((r - A z_phi)|ion).  One extra operator matvec per
        # apply; M is the same block/jphi AMG, applied twice on masked
        # vectors (block-diagonal by component, so masking selects the
        # sub-apply).
        "tri_amg": dict(
            M=("gs", P_jphi, dict(components=comp, block_pairs=pairs,
                                  per_component_lam=True)), pred="lin"),
        "tri_amg_s3": dict(
            M=("gs", P_jphi, dict(components=comp, block_pairs=pairs,
                                  per_component_lam=True, smooth_iters=3)),
            pred="lin"),
        "tri_amg_s3c2": dict(
            M=("gs", P_jphi, dict(components=comp, block_pairs=pairs,
                                  per_component_lam=True, smooth_iters=3,
                                  cycles=2)), pred="lin"),
    }
    phi_mask = np.isin(dof_field, (a.PHI_I, a.PHI_E)).astype(np.float64)
    ion_mask = 1.0 - phi_mask
    names = args.variants or list(VARIANTS)

    results = {}
    for name in names:
        v = VARIANTS[name]
        M = v["M"]
        gs = False
        if isinstance(M, tuple):
            kind, Pm, kw = M
            gs = kind == "gs"
            tic = time.perf_counter()
            M = amg_apply_of(Pm, **kw)
            print(f"[lab] {name}: AMG setup {time.perf_counter()-tic:.1f} s",
                  flush=True)
        pred = v.get("pred", "lin")
        defl_k = v.get("deflate", 0)
        xs = []        # converged solutions seen so far
        U = AU = None
        its_all = []
        t_var = time.perf_counter()
        for i, stp in enumerate(traj, start=1):
            A, bb = stp["A"], stp["b"]
            mv = lambda x: A @ x
            if gs:
                Mstep = (lambda Ak, Mb: lambda r: (
                    lambda z1: z1 + ion_mask * Mb(
                        (r - Ak @ z1) * ion_mask))(phi_mask * Mb(
                            r * phi_mask)))(A, M)
            else:
                Mstep = M
            # predictor (solve() gate semantics: history = converged only)
            if pred == "prev" or len(xs) < 2:
                x0 = xs[-1] if xs else np.zeros_like(bb)
            elif pred == "lin" or len(xs) < 3:
                x0 = 2.0 * xs[-1] - xs[-2]
            else:
                x0 = 3.0 * xs[-1] - 3.0 * xs[-2] + xs[-3]
            x, its, relres, V, H = gmres_np(
                mv, bb, x0, Mstep, ns=ns, rtol=args.rtol,
                restart=args.restart,
                deflate_U=U if defl_k else None,
                deflate_AU=AU if defl_k else None)
            if relres > args.rtol * 1.5:
                print(f"[lab] {name}: step {i} DID NOT CERTIFY "
                      f"(relres {relres:.2e}) — variant disqualified",
                      flush=True)
                its_all.append(-its)
                break
            xs.append(stp["x"])        # exact trajectory (same for all)
            its_all.append(its)
            if defl_k and V is not None:
                Yk = harmonic_ritz(V, H, defl_k)
                if Yk is not None:
                    U = Yk
                    AU = A @ U
        warm = its_all[args.skip:]
        results[name] = {"its": its_all,
                         "warm_mean": float(np.mean(warm)) if warm else None,
                         "seconds": round(time.perf_counter() - t_var, 1)}
        print(f"[lab] {name:22s} its={its_all} warm_mean="
              f"{results[name]['warm_mean']:.1f}", flush=True)

    print(json.dumps({"mesh": args.mesh, "rtol": args.rtol,
                      "n_dofs": int(a.n_dofs), "results": results},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mesh": args.mesh, "rtol": args.rtol,
                       "n_dofs": int(a.n_dofs), "results": results}, f,
                      indent=1)


if __name__ == "__main__":
    main()
