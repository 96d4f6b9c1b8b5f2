"""Production-envelope 50-step completion on the UNSHARDED df32 path.

Companion to scripts/run_production.py (the dof-sharded variant).  On the
1-core build host the 8 virtual CPU devices serialize and the sharded df32
step costs ~45 s per Krylov iteration at 603k dofs (measured — see
PERF.md round-3 notes), which makes a 50-step sharded completion a ~20 h
job; the same physics, solver, preconditioner and rtol-1e-9 df32
certification run ~5x faster unsharded on one device.  This script
completes the >=5e5-dof, >=50-step, neuron+glia, rtol-1e-9 demonstration
(VERDICT r2 #1) on that path and records everything run_production.py
records; the dof-sharded path is separately recorded end-to-end at the
same scale for a shorter step count (run_production.py --steps N).

Durability: flushes a partial JSON after every step AND writes an atomic
state checkpoint (npz: all field/gating arrays + the df32 warm-start
vector) so an interrupted run resumes from the last completed step with
``--resume`` instead of redoing hours of Krylov work.  The mesh generator
is seeded, so the rebuilt operator is bit-identical across restarts.

Warm start: from step 3 on, the solver guess is the linear extrapolation
x_k + (x_k - x_{k-1}) of the last two solutions, computed in f64 and
re-split into the compensated (hi, lo) pair.  The certification target is
unchanged (real f64 preconditioned residual at rtol); a better guess only
reduces the iterations needed to reach it (measured ~46 -> ~30 per warm
step at 603k dofs).  Disable with --no-extrapolate.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
# NOTE on the XLA persistent compilation cache: tried and rejected.  With
# PYTHONHASHSEED pinned the cross-process key does match, but XLA:CPU AOT
# deserialization on this host hits a machine-feature mismatch
# (+prefer-no-scatter/+prefer-no-gather) and the loaded executable runs
# pathologically slowly (a 7 s step had made no progress after 9 min).
# A resumed run therefore pays one fresh jit_step compile (~8 min at 48^3)
# — bounded, and far cheaper than re-stepping.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=48)
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rtol", type=float, default=1e-9)
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--pc", default="amg")
    ap.add_argument("--config", default="configs/tissue/5m_100c.yaml")
    ap.add_argument("--out", default="output/production_unsharded.json")
    ap.add_argument("--ckpt", default=None,
                    help="state checkpoint path (default: <out>.ckpt.npz)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the checkpoint if present")
    ap.add_argument("--no-extrapolate", action="store_true",
                    help="disable the extrapolated warm start")
    args = ap.parse_args()
    ckpt_path = args.ckpt or (os.path.splitext(args.out)[0] + ".ckpt.npz")

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import geometry_from_spec
    from knp_emi_cgx_tpu.problems.knpemi import (KNPEMIState, ProblemKNPEMI,
                                                 SolverKNPEMI)
    from knp_emi_cgx_tpu.solvers.df32 import df_from_f64, df_to_f64

    spec = f"tissue{args.mesh}x{args.cells}c"
    cfg = load_config(args.config)
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": args.rtol,
                                          "pc_mode": args.pc,
                                          "precision": "df32",
                                          "restart": args.restart,
                                          "warm_start":
                                              ("previous"
                                               if args.no_extrapolate
                                               else "extrapolated"),
                                          "setup_cache": True}}
    print(f"[setup] {spec} unsharded df32 {args.pc} rtol={args.rtol}",
          flush=True)
    tic = time.perf_counter()
    mesh, tagger = geometry_from_spec(spec)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    problem.init_ionic_models(build_models(problem))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    setup_s = time.perf_counter() - tic
    a = problem.assembler
    n_dofs = a.n_dofs
    print(f"[setup] n_dofs={n_dofs}, {setup_s:.1f} s", flush=True)
    step = solver._build_step(state)
    # carry layout: df32 [2, n] pair; lattice when the stencil op is active
    state = solver.prepare_state(state)

    cons0 = {k: float(v) for k, v in problem.conservation(state).items()}
    its_series, times = [], []
    first_step_seconds = None
    start_step = 1
    x_prev = None       # [2, n] df32 solution at step k-1 (for extrapolation)
    prev_state = None   # state entering the final step (for certification)

    if args.resume and os.path.exists(ckpt_path):
        z = np.load(ckpt_path)
        state = KNPEMIState(
            u=jnp.asarray(z["u"]), phi_m=jnp.asarray(z["phi_m"]),
            n=jnp.asarray(z["n"]), m=jnp.asarray(z["m"]),
            h=jnp.asarray(z["h"]), t=jnp.asarray(z["t"][()]),
            x=jnp.asarray(z["x"]))
        x_prev = jnp.asarray(z["x_prev"]) if "x_prev" in z.files else None
        its_series = [int(v) for v in z["its"]]
        times = [float(v) for v in z["times"]]
        first_step_seconds = float(z["first_step_seconds"][()])
        start_step = int(z["step"][()]) + 1
        print(f"[resume] checkpoint at step {start_step - 1} "
              f"(t={float(z['t'][()]):.6e})", flush=True)

    result = {"spec": spec, "n_dofs": int(n_dofs), "devices": 1,
              "precision": "df32", "pc": args.pc, "rtol": args.rtol,
              "glia_tags": len(cfg.glia_tags),
              "setup_seconds": round(setup_s, 1),
              "warm_start": ("extrapolated" if not args.no_extrapolate
                             else "previous"),
              "conservation_initial": cons0, "platform": "cpu-unsharded"}

    def flush(partial=True):
        result["steps_completed"] = len(its_series)
        result["iterations"] = its_series
        if its_series:
            result["iterations_mean"] = round(float(np.mean(its_series)), 2)
        if first_step_seconds is not None:
            result["first_step_seconds"] = round(first_step_seconds, 1)
        if times:
            result["sec_per_step_warm"] = round(float(np.mean(times)), 2)
        result["partial"] = partial
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    def save_ckpt(i):
        tmp = ckpt_path + ".tmp"
        with open(tmp, "wb") as f:   # file object: savez must not append .npz
            np.savez(f, u=np.asarray(state.u),
                     phi_m=np.asarray(state.phi_m),
                     n=np.asarray(state.n), m=np.asarray(state.m),
                     h=np.asarray(state.h), t=np.float64(state.t),
                     x=np.asarray(state.x),
                     **({"x_prev": np.asarray(x_prev)} if x_prev is not None
                        else {}),
                     its=np.asarray(its_series, np.int64),
                     times=np.asarray(times, np.float64),
                     first_step_seconds=np.float64(first_step_seconds),
                     step=np.int64(i))
        os.replace(tmp, ckpt_path)

    extrap = solver.extrapolator()
    for i in range(start_step, args.steps + 1):
        tic = time.perf_counter()
        if i == args.steps:
            prev_state = state
        x_cur = state.x
        # i >= 3: both history vectors are converged solutions (at step 2
        # the older one is the initial GUESS and the predictor doubles the
        # cold-start correction)
        if extrap is not None and x_prev is not None and i >= 3:
            state = state._replace(x=extrap(x_cur, x_prev))
        state, its = step(state)
        jax.block_until_ready(state)
        dt_s = time.perf_counter() - tic
        its_series.append(int(its))
        if i == 1:
            first_step_seconds = dt_s
        else:
            times.append(dt_s)
        x_prev = x_cur
        phi_max = float(jnp.max(jnp.abs(state.phi_m)))
        print(f"[run] step {i}/{args.steps}: {int(its)} its, {dt_s:.1f} s, "
              f"max|phi_m|={phi_max:.4e}", flush=True)
        assert np.isfinite(phi_max), f"non-finite at step {i}"
        flush()
        save_ckpt(i)

    consN = {k: float(v) for k, v in problem.conservation(state).items()}
    result["conservation_final"] = consN
    result["conservation_rel_drift"] = {
        k: abs(consN[k] - cons0[k]) / abs(cons0[k]) for k in cons0}
    result["l2_norms"] = {k: float(v)
                          for k, v in problem.l2_norms(state).items()}

    # certify the real f64 preconditioned residual of the FINAL solve
    from knp_emi_cgx_tpu.solvers.df32 import repaired_ell_values

    if prev_state is None:
        print("[cert] skipped (run resumed past the final step boundary)",
              flush=True)
        flush(partial=False)
        return

    pc = solver._pc
    ell = solver._ell
    gates = {"n": state.n, "m": state.m, "h": state.h}
    vals, b = a.assemble(prev_state.u, prev_state.phi_m, gates, state.t)
    ell_h, ell_l = repaired_ell_values(ell, vals, a.phi_col_mask,
                                      a.phi_repair_slots)
    mask = (a.nullspace_np != 0).astype(np.float64)
    nsv = mask / np.linalg.norm(mask)

    def proj(v):
        return v - nsv * (nsv @ v)

    yh, yl = ell.matvec_df2(ell_h, ell_l, state.x[0], state.x[1])
    r = proj(np.asarray(b, np.float64) - np.asarray(df_to_f64(yh, yl)))
    Mr = proj(np.asarray(df_to_f64(
        *pc.apply_df(*df_from_f64(jnp.asarray(r))))))
    bp = proj(np.asarray(b, np.float64))
    Mb = proj(np.asarray(df_to_f64(
        *pc.apply_df(*df_from_f64(jnp.asarray(bp))))))
    rel = float(np.linalg.norm(Mr) / np.linalg.norm(Mb))
    result["final_real_precond_residual"] = rel
    print(f"[cert] real f64 preconditioned residual: {rel:.3e}", flush=True)
    flush(partial=False)
    print(f"[done] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
