"""Per-kernel TPU timing probe at a bench point (VERDICT r4 weak #1/#2).

Times, in ONE process on the real chip, the individual components of the
production df32 step so the bench headline can be decomposed:

  * one stencil df32 matvec          (the Krylov hot op)
  * one preconditioner apply_df      (lattice AMG V-cycles or SA-AMG)
  * one full GMRES iteration proxy   (matvec + M + CGS2-equivalent work)
  * one stage_assemble launch        (gating + f32 assembly + op refresh)
  * one stage_solve launch           (launch_outer-bounded GMRES program)
  * one stage_scatter launch
  * one scalar D2H readback

Methodology: kernels are repeated K times inside a single jitted
lax.fori_loop launch and fenced with a data-dependent scalar D2H, for two
values of K — the slope (t(K2)-t(K1))/(K2-K1) is the per-kernel execution
time with launch/dispatch/D2H overhead differenced out.  This sidesteps
both axon runtime hazards: block_until_ready can no-op on chunked
launches (STATUS gotcha 8) and per-launch tunnel round-trips cost ~30 ms.

Usage: python scripts/tpu_kernel_probe.py [NxC] [pc_mode]
Writes output/tpu_kernel_probe_<point>.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def timed_fence(fn, *args):
    """Run fn(*args) and fence with a data-dependent scalar D2H."""
    tic = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.abs(leaf)))
    return time.perf_counter() - tic, out


def krep(fn_one, x0, K):
    """K applications of fn_one inside one launch (x -> fn_one(x))."""
    def body(_, x):
        return fn_one(x)

    return jax.jit(lambda x: jax.lax.fori_loop(0, K, body, x))


def slope_time(fn_one, x0, k1=8, k2=40, reps=3):
    """Per-application seconds via the two-K slope, min over reps."""
    f1, f2 = krep(fn_one, x0, k1), krep(fn_one, x0, k2)
    timed_fence(f1, x0)  # compile
    timed_fence(f2, x0)
    t1 = min(timed_fence(f1, x0)[0] for _ in range(reps))
    t2 = min(timed_fence(f2, x0)[0] for _ in range(reps))
    return (t2 - t1) / (k2 - k1), t1, t2


def main():
    point = sys.argv[1] if len(sys.argv) > 1 else "24x8"
    pc_mode = sys.argv[2] if len(sys.argv) > 2 else "amg"
    n_mesh, n_cells = (int(v) for v in point.split("x"))

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    cfg = load_config("configs/tissue/5m_100c.yaml")
    if n_cells != 100:
        cfg.intra_tags = tuple(range(2, n_cells + 2))
        cfg.gamma_tags = tuple(range(2, n_cells + 2))
        n_glia = max(1, n_cells // 12)
        cfg.glia_tags = tuple(range(n_cells + 2 - n_glia, n_cells + 2))
        cfg.neuron_tags = tuple(t for t in cfg.intra_tags
                                if t not in cfg.glia_tags)
        cfg.stimulus_tags = (cfg.intra_tags[0],)
        cfg.membrane_data_tag = cfg.intra_tags[0]
    cfg.solver_config = {"direct": False, "ksp_settings": {
        "ksp_rtol": 1e-9, "pc_mode": pc_mode, "precision": "df32",
        "warm_start": "extrapolated", "setup_cache": True,
        "split_step": True, "launch_outer": 2,
        "df_dots": os.environ.get("BENCH_DOTS", "tree"),
        "restart": int(os.environ.get("BENCH_RESTART", "30"))}}

    print(f"[probe] building {point} pc={pc_mode}", flush=True)
    tic = time.perf_counter()
    mesh, tagger = generate_tissue_geometry(n_mesh, n_cells)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    problem.init_ionic_models(build_models(problem))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    step = solver._build_step(state)
    state = solver.prepare_state(state)
    t_setup = time.perf_counter() - tic
    n_dofs = int(problem.assembler.n_dofs)
    stencil = solver._stencil
    pc = solver._pc
    print(f"[probe] setup {t_setup:.1f}s n_dofs={n_dofs} "
          f"stencil={stencil is not None} pc_lattice={solver._pc_lattice}",
          flush=True)

    out = {"point": point, "n_dofs": n_dofs, "pc": pc_mode,
           "stencil": stencil is not None,
           "pc_lattice": bool(solver._pc_lattice),
           "device": str(jax.devices()[0])}

    jA, jS, jC = step.stages

    # one real step first (compiles all three stages, warms values)
    print("[probe] compiling stages via one step", flush=True)
    tic = time.perf_counter()
    st2, its0 = step(state)
    t0, _ = timed_fence(lambda s: s.phi_m, st2)
    out["t_step_compile"] = round(time.perf_counter() - tic, 2)
    print(f"[probe] first step (compile) {out['t_step_compile']}s",
          flush=True)

    # D2H scalar
    ts = [timed_fence(lambda s: jnp.max(jnp.abs(s.phi_m)), st2)[0]
          for _ in range(5)]
    out["d2h_scalar_s"] = round(min(ts), 5)

    # timed warm steps (the split-step per-step truth, fenced per step)
    n_steps = 6
    predictor = solver.warm_predictor()
    cur = st2
    per_step = []
    its_list = [int(its0)]
    for _ in range(n_steps):
        tic = time.perf_counter()
        if predictor is not None:
            cur = cur._replace(x=predictor(cur.x))
        cur, its = step(cur)
        float(jnp.max(jnp.abs(cur.phi_m)))
        per_step.append(time.perf_counter() - tic)
        its_list.append(int(its))
    out["split_step_s"] = [round(t, 4) for t in per_step]
    out["split_step_warm_s"] = round(min(per_step), 4)
    out["its"] = its_list
    print(f"[probe] split per-step {out['split_step_s']} its={its_list}",
          flush=True)

    # stage timings on the warm state (fenced individually)
    bundle = solver._bundle
    tic = time.perf_counter()
    n_, m_, h_, t_new, op_h, op_l, b = jA(cur, bundle)
    float(jnp.max(jnp.abs(b)))
    out["stage_assemble_s"] = round(time.perf_counter() - tic, 4)
    x = cur.x
    solve_ts = []
    for _ in range(3):
        tic = time.perf_counter()
        x1, its_i = jS(bundle, op_h, op_l, b, x)
        float(jnp.max(jnp.abs(x1[0])))
        solve_ts.append(time.perf_counter() - tic)
    out["stage_solve_launch_s"] = [round(t, 4) for t in solve_ts]
    out["stage_solve_its_per_launch"] = int(its_i)
    tic = time.perf_counter()
    stc = jC(cur, bundle, n_, m_, h_, t_new, x1)
    float(jnp.max(jnp.abs(stc.phi_m)))
    out["stage_scatter_s"] = round(time.perf_counter() - tic, 4)
    print(f"[probe] stages A={out['stage_assemble_s']} "
          f"S={out['stage_solve_launch_s']} C={out['stage_scatter_s']}",
          flush=True)

    # gating-sweep cost (pure elementwise, safe to jit standalone): the
    # rest of stage_assemble is element assembly + value refresh
    a = problem.assembler
    from knp_emi_cgx_tpu.models.gating import rush_larsen_update
    from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley
    hh = next((m for m in problem.ionic_models
               if isinstance(m, HodgkinHuxley)), None)
    if hh is not None:
        dt_ode = problem.params.dt / hh.time_steps_ode
        jg = jax.jit(lambda n_, m_, h_, pm: rush_larsen_update(
            n_, m_, h_, pm, problem.params.phi_rest, dt_ode,
            hh.time_steps_ode))
        g0 = jg(cur.n, cur.m, cur.h, cur.phi_m)
        float(jnp.max(jnp.abs(g0[0])))
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            g0 = jg(cur.n, cur.m, cur.h, cur.phi_m)
            float(jnp.max(jnp.abs(g0[0])))
            ts.append(time.perf_counter() - t1)
        out["gating_sweep_s"] = round(min(ts), 4)
        print(f"[probe] gating_sweep={out['gating_sweep_s']}", flush=True)

    if stencil is not None:
        gates = {"n": cur.n, "m": cur.m, "h": cur.h}
        vals, bb = a.assemble(cur.u, cur.phi_m, gates,
                              cur.t + problem.params.dt)
        dgh, lo_rows = stencil.repaired_diag_values(vals)
        xh = x1[0]

        def mv_one(p):
            yh, yl = stencil.matvec_df(dgh, p[0], p[1], lo_rows)
            return jnp.stack([yh, yl])

        s, t1, t2 = slope_time(mv_one, x1)
        out["matvec_df_s"] = round(s, 6)
        print(f"[probe] matvec_df {s*1e3:.3f} ms (K8 {t1:.3f} K40 {t2:.3f})",
              flush=True)

        if pc is not None:
            def pc_one(p):
                yh, yl = pc.apply_df(p[0], p[1])
                return jnp.stack([yh, yl])

            s, t1, t2 = slope_time(pc_one, x1)
            out["pc_apply_df_s"] = round(s, 6)
            print(f"[probe] pc_apply_df {s*1e3:.3f} ms "
                  f"(K8 {t1:.3f} K40 {t2:.3f})", flush=True)

        # one GMRES-iteration proxy: matvec + M + 2x [31,n] row-dots +
        # 2x vecmat update (the CGS2 passes)
        from knp_emi_cgx_tpu.solvers.df32 import (df_matvec_rows, df_vecmat,
                                                  df_from_f64, df_add)
        nlat = xh.shape[0]
        Vh = jnp.zeros((31, nlat), jnp.float32).at[0].set(xh)
        Vl = jnp.zeros_like(Vh)

        def it_one(p):
            wh, wl = stencil.matvec_df(dgh, p[0], p[1], lo_rows)
            wh, wl = pc.apply_df(wh, wl) if pc is not None else (wh, wl)
            for _ in range(2):
                c = df_matvec_rows(Vh, Vl, wh, wl)
                ch, cl = df_from_f64(-c)
                uh, ul = df_vecmat(ch, cl, Vh, Vl)
                wh, wl = df_add(wh, wl, uh, ul)
            return jnp.stack([wh, wl])

        s, t1, t2 = slope_time(it_one, x1, k1=4, k2=20)
        out["gmres_iter_proxy_s"] = round(s, 6)
        print(f"[probe] gmres-iteration proxy {s*1e3:.3f} ms", flush=True)

    path = os.path.join(REPO, "output", f"tpu_kernel_probe_{point}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
