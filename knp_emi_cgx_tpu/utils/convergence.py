"""Convergence-rate tables for MMS studies (reference utils/errors.py:8-47,
which hardcodes historical L2 norms and computes ~2nd-order rates)."""
from __future__ import annotations

import numpy as np


def convergence_table(errors_by_level: list[dict], ns: list[int]) -> str:
    """Format errors (list of {field: L2 error} per refinement level) with
    observed rates log2(e_k / e_{k+1}).  Returns a printable table."""
    fields = list(errors_by_level[0].keys())
    lines = []
    header = "N      " + "".join(f"{f:>12}" for f in fields)
    lines.append(header)
    for lvl, errs in enumerate(errors_by_level):
        row = f"{ns[lvl]:<7d}" + "".join(f"{errs[f]:>12.3e}" for f in fields)
        lines.append(row)
        if lvl > 0:
            rates = {f: np.log2(errors_by_level[lvl - 1][f] / errs[f])
                     for f in fields}
            lines.append("rate   " + "".join(f"{rates[f]:>12.2f}"
                                             for f in fields))
    return "\n".join(lines)


def run_mms_study(dims=(2,), ns=(8, 16, 32), dt=1e-5, steps=1) -> str:
    """Run the full MMS convergence study and return the formatted tables
    (the reference's errors.py equivalent, but computed live)."""
    from knp_emi_cgx_tpu.config import parse_config
    from knp_emi_cgx_tpu.models.ionic import PassiveModel
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    out = []
    for dim in dims:
        errors = []
        for N in ns:
            cfg = parse_config({
                "problem_type": "KNP-EMI",
                "dt": dt, "time_steps": steps,
                "physical_constants": {"T": 1.0, "F": 1.0, "R": 1.0},
                "C_M": 1.0,
                "ics_tags": [1], "ecs_tags": [2], "boundary_tags": [8],
                "membrane_tags": list(range(1, 2 * dim + 1)),
                "MMS_test": {"N_mesh": N, "dim": dim},
                "solver": {"direct": True, "output": {}},
            })
            problem = ProblemKNPEMI(cfg)
            problem.init_ionic_models([PassiveModel()])
            state = SolverKNPEMI(problem, cfg.solver_config).solve()
            errors.append(problem.mms_errors(state))
        out.append(f"== {dim}D MMS L2 errors ==")
        out.append(convergence_table(errors, list(ns)))
    return "\n".join(out)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    print(run_mms_study())
