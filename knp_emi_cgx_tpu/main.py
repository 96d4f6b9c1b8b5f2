"""CLI driver: `python -m knp_emi_cgx_tpu.main --config X.yaml [--resume ckpt]`.

Mirrors the reference's `KNPEMI/main.py`: builds the problem from a YAML
config, selects the ionic-model stack (neuron-only vs neuron+glia, same rules
as main.py:27-45), runs the time loop with the configured outputs, and
reports the final potential L2 norms.  Adds `--resume` (the reference has no
resume path).
"""
from __future__ import annotations

import argparse
import os
import time


def build_models(problem, config_file: str = ""):
    """Ionic model stack selection (reference main.py:27-45)."""
    from knp_emi_cgx_tpu.models.ionic import (
        HodgkinHuxley, ATPPump, NeuronalCotransporters,
        GlialCotransporters, KirNaKPumpModel)

    cfg = problem.cfg
    if "square_config" in config_file:
        return [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()]
    if cfg.glia_flag:
        return [
            HodgkinHuxley(tags=cfg.neuron_tags),
            ATPPump(tags=cfg.neuron_tags),
            NeuronalCotransporters(tags=cfg.neuron_tags),
            GlialCotransporters(tags=cfg.glia_tags),
            KirNaKPumpModel(tags=cfg.glia_tags),
        ]
    return [HodgkinHuxley(), ATPPump(), NeuronalCotransporters()]


def main_yaml(yaml_file: str, resume: str | None = None,
              mesh=None, dtype=None, overrides: dict | None = None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.io.outputs import KNPEMIOutputs
    from knp_emi_cgx_tpu.problems.knpemi import (ProblemKNPEMI, SolverKNPEMI,
                                                 KNPEMIState)

    cfg = load_config(yaml_file)
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # allow "generate:squareN" / "generate:cubeN" / "generate:tissueNxCc"
    # pseudo-files for meshes
    if mesh is None and cfg.mesh_file and "generate:" in cfg.mesh_file:
        from knp_emi_cgx_tpu.mesh.generation import geometry_from_spec

        mesh, tagger = geometry_from_spec(cfg.mesh_file)
        mesh._facet_tagger = tagger

    if cfg.problem_type == "EMI":
        return _main_emi(cfg, mesh, dtype)

    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=dtype)
    models = build_models(problem, yaml_file)
    problem.init_ionic_models(models)

    if problem.cfg.find_initial_conditions and not cfg.mms_test:
        from knp_emi_cgx_tpu.models.ode_init import solve_steady_state

        solve_steady_state(problem)

    solver = SolverKNPEMI(problem, cfg.solver_config)
    out_flags = (cfg.solver_config or {}).get("output", {}) or {}
    if out_flags.get("save_mat"):
        state = problem.initial_state()
        solver._build_step(state)  # ensures preconditioner state etc.
        solver.dump_system(state, cfg.output_dir)
        print(f"System matrix dumped to {cfg.output_dir} (save_mat mode)")
        return problem, solver, state
    outputs = KNPEMIOutputs(problem, solver, cfg.solver_config)

    if resume:
        from knp_emi_cgx_tpu.io.checkpoint import load_state

        state, meta = load_state(resume, KNPEMIState,
                                 mesh=problem.topo.mesh, dtype=dtype,
                                 config=cfg)
        print(f"Resumed from {resume} at t={float(state.t):.6e} "
              f"(step {meta.get('step', '?')})")
    else:
        state = problem.initial_state()
    outputs.record_initial(state)

    tic = time.perf_counter()
    state = solver.solve(state, callback=outputs)
    print(f"Solved {solver.time_steps} steps in "
          f"{time.perf_counter() - tic:.2f} s")

    outputs.finalize()
    outputs.print_info()

    norms = problem.l2_norms(state)
    print(f"L2 norm phi_i = {float(norms['phi_i'])}")
    print(f"L2 norm phi_e = {float(norms['phi_e'])}")
    return problem, solver, state


def _main_emi(cfg, mesh, dtype):
    """EMI problem driver (reference EMI/main.py workflow)."""
    from knp_emi_cgx_tpu.problems.emi import (ProblemEMI, SolverEMI,
                                              EMIHodgkinHuxley,
                                              EMIPassiveModel)

    problem = ProblemEMI(cfg, mesh=mesh, dtype=dtype)
    model = (EMIHodgkinHuxley() if cfg.raw.get("ionic_model", "HH") == "HH"
             else EMIPassiveModel())
    problem.init_ionic_models([model])
    solver = SolverEMI(problem, cfg.solver_config)
    from knp_emi_cgx_tpu.io.outputs import EMIOutputs

    outputs = EMIOutputs(problem, solver, cfg.solver_config)
    state = problem.initial_state()
    outputs.record_initial(state)
    state = solver.solve(state, callback=outputs)
    outputs.finalize()
    norms = problem.l2_norms(state)
    print(f"L2 norm phi_i = {norms['phi_i']}")
    print(f"L2 norm phi_e = {norms['phi_e']}")
    return problem, solver, state


def main():
    from knp_emi_cgx_tpu.utils.parsers import CustomParser

    parser = argparse.ArgumentParser(
        description="TPU-native KNP-EMI electrodiffusion solver",
        formatter_class=CustomParser)
    parser.add_argument("--config", dest="config_file", required=True,
                        help="YAML configuration file")
    parser.add_argument("--resume", dest="resume", default=None,
                        help="npz checkpoint to resume from")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend in float64")
    parser.add_argument("--profile", default=None, metavar="LOGDIR",
                        help="capture a jax.profiler trace to LOGDIR")
    args = parser.parse_args()

    # multi-process launch (mpirun equivalent): KNPEMI_COORDINATOR /
    # KNPEMI_NUM_PROCESSES / KNPEMI_PROCESS_ID env vars; no-op otherwise
    from knp_emi_cgx_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    if args.cpu:
        import sys

        if "jax" not in sys.modules:
            # fresh process: steer via env before jax initialises
            os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    if args.profile:
        from knp_emi_cgx_tpu.utils.profiling import trace

        with trace(args.profile):
            main_yaml(args.config_file, resume=args.resume)
    else:
        main_yaml(args.config_file, resume=args.resume)


if __name__ == "__main__":
    main()
