"""Production-envelope demonstration run (VERDICT r2 #1).

Completes a many-cell 3D tissue KNP-EMI run at the reference's production
operating point — >=5e5 dofs, >=50 steps, rtol 1e-9 (real preconditioned
residual), full neuron+glia membrane stack — on the dof-sharded df32 path
over an 8-device mesh (virtual CPU devices when the TPU runtime cannot
sustain the size; the code path is the production one either way).

Reference anchors: configs/5m/100c.yaml:27-33 (the envelope),
utils/plot_scaling.py:6-8 (the reference's own timing of such a run).

Records per-step GMRES iterations, wall-clock, ion conservation drift and
the final real-f64 preconditioned residual to a JSON file consumed by
PERF.md.

Usage:
  python scripts/run_production.py --mesh 48 --cells 100 --steps 50 \
      --config configs/tissue/5m_100c.yaml --out output/prod_48_100c.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8" \
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600" \
    " --xla_cpu_collective_call_terminate_timeout_seconds=72000" \
    " --xla_cpu_collective_timeout_seconds=72000"
# The collective-timeout overrides matter on a 1-core host: the 8 virtual
# device threads timeshare one core, so heavy inter-collective segments of
# a 600k-dof df32 program exceed XLA's default 20 s warn / 40 s terminate
# rendezvous guard (observed: AllGatherThunk rendezvous F-check killed the
# first 48^3 run).  On real multi-chip hardware the defaults are fine.

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=48)
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rtol", type=float, default=1e-9)
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--precision", default="df32")
    ap.add_argument("--pc", default="amg")
    ap.add_argument("--config", default="configs/tissue/5m_100c.yaml")
    ap.add_argument("--out", default="output/production_run.json")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (virtual 8-device mesh) or default backend")
    ap.add_argument("--init-ckpt", default=None,
                    help="npz checkpoint from run_production_unsharded.py "
                         "(same mesh spec): start from its state instead of "
                         "the cold ICs — the sharded record then continues "
                         "the production run with warm-step iteration "
                         "counts instead of paying a ~190-it cold solve")
    ap.add_argument("--no-extrapolate", action="store_true",
                    help="disable the extrapolated warm start (the "
                         "2*x_k - x_{k-1} predictor)")
    ap.add_argument("--cert-reassembly-check", action="store_true",
                    help="also recompute the final residual against an "
                         "independent eager re-assembly (a reproducibility "
                         "diagnostic, NOT the certification; costs an extra "
                         "eager assembly + matvec compile at scale)")
    args = ap.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        devices = jax.devices("cpu")
    else:
        devices = jax.devices()

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.parallel.dof_sharded import build_dof_sharded_problem

    spec = f"tissue{args.mesh}x{args.cells}c"
    cfg = load_config(args.config)   # only for tag bookkeeping printout
    n_glia_tags = len(cfg.glia_tags)

    print(f"[setup] {spec}, {args.devices} devices, {args.precision} "
          f"{args.pc} rtol={args.rtol}", flush=True)
    tic = time.perf_counter()
    df32 = args.precision == "df32"
    problem, state, step, dmesh, halo = build_dof_sharded_problem(
        args.devices, devices=devices, config=args.config, mesh_spec=spec,
        precision=args.precision, pc_mode=args.pc, rtol=args.rtol,
        restart=args.restart, cache=True,
        coarse_on_device0=(args.platform == "cpu"),
        return_system=df32)
    setup_s = time.perf_counter() - tic
    a = problem.assembler
    n_dofs = a.n_dofs
    print(f"[setup] n_dofs={n_dofs}, setup {setup_s:.1f} s", flush=True)

    resumed_from = None
    x_prev = None        # [2, n_padded] sharded solution at step k-1
    converged_hist = 0   # how many of (x, x_prev) are converged solutions
    if args.init_ckpt:
        # map the unsharded checkpoint's state (original vertex/dof order)
        # through the sharded problem's vertex/dof permutations; both
        # builds generate the identical mesh (seeded), so the layouts are
        # compatible by construction
        from jax.sharding import NamedSharding, PartitionSpec as P
        from knp_emi_cgx_tpu.parallel.distributed import shard_global_array

        if args.precision != "df32":
            raise SystemExit("--init-ckpt supports the df32 path only "
                             "(the checkpoint carries a df32 (hi, lo) x)")
        z = np.load(args.init_ckpt)
        newpos_v = problem._vperm_newpos
        n_vpad = problem._n_vpad
        halo_np = np.asarray(halo.newpos)
        fdt = np.float32
        t_dt = np.asarray(state.t).dtype

        def padv(arr):
            arr = np.asarray(arr, fdt)
            out = np.zeros(arr.shape[:-1] + (n_vpad,), fdt)
            out[..., newpos_v] = arr
            return out

        axis = dmesh.axis_names[0]
        vec_sh = NamedSharding(dmesh, P(axis))
        x = np.asarray(z["x"], fdt)                      # [2, n] df32 pair
        x_pad = np.zeros((x.shape[0], halo.n_padded), fdt)
        x_pad[:, halo_np] = x
        state = state._replace(
            u=shard_global_array(padv(z["u"]),
                                 NamedSharding(dmesh, P(None, axis))),
            phi_m=shard_global_array(padv(z["phi_m"]), vec_sh),
            n=shard_global_array(padv(z["n"]), vec_sh),
            m=shard_global_array(padv(z["m"]), vec_sh),
            h=shard_global_array(padv(z["h"]), vec_sh),
            t=shard_global_array(np.asarray(z["t"][()], t_dt),
                                 NamedSharding(dmesh, P())),
            x=shard_global_array(x_pad,
                                 NamedSharding(dmesh, P(None, axis))))
        if "x_prev" in z.files:
            xp = np.asarray(z["x_prev"], fdt)
            xp_pad = np.zeros((xp.shape[0], halo.n_padded), fdt)
            xp_pad[:, halo_np] = xp
            x_prev = shard_global_array(xp_pad,
                                        NamedSharding(dmesh, P(None, axis)))
            converged_hist = 2   # ckpt x AND x_prev are converged solutions
        else:
            converged_hist = 1
        resumed_from = int(z["step"][()])
        print(f"[init] warm state from {args.init_ckpt} "
              f"(unsharded step {resumed_from}, t={float(z['t'][()]):.3e}, "
              f"x_prev={'yes' if x_prev is not None else 'no'})",
              flush=True)

    cons0 = {k: float(v) for k, v in problem.conservation(state).items()}

    # extrapolated warm start (the 2*x_k - x_{k-1} predictor): elementwise
    # and sharding-preserving, applied only once BOTH history vectors are
    # converged solutions (a ckpt with x_prev qualifies immediately)
    extrap = None
    if not args.no_extrapolate and args.precision == "df32":
        from knp_emi_cgx_tpu.problems.knpemi import make_extrapolator
        extrap = make_extrapolator(df32_mode=True)

    its_series = []
    times = []
    t_first = None
    prev_state = None
    for i in range(1, args.steps + 1):
        tic = time.perf_counter()
        if i == args.steps:
            prev_state = state   # kept for the residual certification
        x_cur = state.x
        if extrap is not None and x_prev is not None and converged_hist >= 2:
            state = state._replace(x=extrap(x_cur, x_prev))
        if df32:
            state, its, sys_solved = step(state)
            if i != args.steps:
                sys_solved = None    # keep only the final step's operator
        else:
            state, its = step(state)
        jax.block_until_ready(state)
        dt_s = time.perf_counter() - tic
        x_prev = x_cur
        converged_hist = min(converged_hist + 1, 2)
        its_series.append(int(its))
        if i == 1:
            t_first = dt_s
            print(f"[run] step 1: {int(its)} its, {dt_s:.1f} s "
                  f"(incl. compile)", flush=True)
        else:
            times.append(dt_s)
        if i > 1 and (i % 5 == 0 or i == args.steps):
            phi_max = float(jax.numpy.max(jax.numpy.abs(state.phi_m)))
            print(f"[run] step {i}: {int(its)} its, {dt_s:.2f} s, "
                  f"max|phi_m|={phi_max:.4e}", flush=True)
        assert np.isfinite(float(state.u[0, 0])), f"non-finite at step {i}"

    consN = {k: float(v) for k, v in problem.conservation(state).items()}
    norms = {k: float(v) for k, v in problem.l2_norms(state).items()}

    # certify the REAL f64 preconditioned residual of the last solve
    # (PETSc KSP semantics — the tolerance the reference's rtol refers to).
    # The operator/RHS come FROM THE STEP ITSELF (return_system): the cert
    # must evaluate the system the solver actually solved.  An eager host
    # re-assembly differs from the step's in-jit GSPMD assembly by ~1 ulp
    # of f32 per value, which the b - A x cancellation amplifies to a few
    # x at the 1e-9 residual level (the round-3 "sharded cert gap" was
    # exactly this recompute artifact, not a solver defect).
    rel = None
    rel_reassembled = None

    def write_result(rel, rel_reassembled):
        cons_drift = {k: abs(consN[k] - cons0[k]) / abs(cons0[k])
                      for k in cons0}
        result = {
            "spec": spec, "n_dofs": int(n_dofs), "steps": args.steps,
            "devices": args.devices, "precision": args.precision,
            "pc": args.pc, "rtol": args.rtol,
            "glia_tags": n_glia_tags,
            "warm_start": ("extrapolated" if extrap is not None
                           else "previous"),
            "setup_seconds": round(setup_s, 1),
            "first_step_seconds": round(t_first, 1),
            "sec_per_step_warm": (round(float(np.mean(times)), 3)
                                  if times else None),
            "iterations": its_series,
            "iterations_mean": round(float(np.mean(its_series)), 2),
            "conservation_initial": cons0,
            "conservation_final": consN,
            "conservation_rel_drift": cons_drift,
            "l2_norms": norms,
            "final_real_precond_residual": rel,
            "final_residual_vs_eager_reassembly": rel_reassembled,
            "platform": args.platform,
            "warm_started_from_unsharded_step": resumed_from,
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[done] wrote {args.out}", flush=True)
        print(json.dumps({k: v for k, v in result.items()
                          if k != "iterations"}, indent=1))

    if df32 and prev_state is not None:
        from knp_emi_cgx_tpu.solvers.df32 import df_from_f64, df_to_f64

        pc = problem._sharded_pc
        eh, el, b = sys_solved
        mask = (a.nullspace_np != 0).astype(np.float64)
        nsv = mask / np.linalg.norm(mask)

        def proj(v):
            return v - nsv * (nsv @ v)

        # jit the V-cycle application: an EAGER apply_df at production
        # scale dispatches hundreds of separate 8-way SPMD programs
        # (observed ~1 h for the cert at 603k dofs; jitted it is seconds
        # after one compile)
        apply_df_j = jax.jit(
            lambda v: df_to_f64(*pc.apply_df(*df_from_f64(v))))

        def precond_rel(yh, yl, b):
            r = proj(np.asarray(b, np.float64)
                     - np.asarray(df_to_f64(yh, yl)))
            Mr = proj(np.asarray(apply_df_j(jax.numpy.asarray(r))))
            bp = proj(np.asarray(b, np.float64))
            Mb = proj(np.asarray(apply_df_j(jax.numpy.asarray(bp))))
            return float(np.linalg.norm(Mr) / np.linalg.norm(Mb))

        yh, yl = step.matvec_A(step.bundle["mv"], eh, el,
                               state.x[0], state.x[1])
        rel = precond_rel(yh, yl, b)
        print(f"[cert] real f64 preconditioned residual of final solve: "
              f"{rel:.3e} (rtol {args.rtol})", flush=True)

        if not args.cert_reassembly_check:
            print("[cert] eager re-assembly diagnostic skipped "
                  "(--cert-reassembly-check)", flush=True)
            write_result(rel, None)
            return

        # secondary diagnostic: the same residual against an independent
        # eager re-assembly of the operator (floors at the f32 assembly-
        # reproducibility level, typically a few x rtol at rtol 1e-9)
        gates = {"n": state.n, "m": state.m, "h": state.h}
        vals2, b2 = a.assemble(prev_state.u, prev_state.phi_m, gates,
                               state.t)
        matvec_df, arrays = halo.make_matvec_df_fn(dmesh,
                                                   repair=not a.has_bcs)
        if not a.has_bcs:
            onehot, phimask = halo.ell_repair_onehot(a.phi_repair_slots_np,
                                                     a.phi_col_mask_np)
            arrays = dict(arrays, repair_onehot=onehot,
                          phi_mask_ell=phimask)
        y2h, y2l = matvec_df(arrays, vals2.reshape(args.devices, -1),
                             state.x[0], state.x[1])
        rel_reassembled = precond_rel(y2h, y2l, b2)
        print(f"[cert] vs eager re-assembly (reproducibility floor): "
              f"{rel_reassembled:.3e}", flush=True)

    write_result(rel, rel_reassembled)


if __name__ == "__main__":
    main()
