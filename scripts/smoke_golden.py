"""Dev smoke test: run the golden direct-solver problem and compare the
phi norms to the reference values modulo the nullspace constant."""
import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_platform_name", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)

REF_PHI_I = 2.6337161145147203e-08  # direct (MUMPS) reference
REF_PHI_E = 1.5258564901943312e-08
REF_IT_PHI_I = 3.510994056704844e-08   # iterative reference
REF_IT_PHI_E = 6.369472309249516e-11


def run(diagonal):
    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(32, diagonal=diagonal)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    models = [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()]
    problem.init_ionic_models(models)
    solver = SolverKNPEMI(problem, cfg.solver_config)
    t0 = time.perf_counter()
    state = solver.solve()
    print(f"[{diagonal}] solved in {time.perf_counter()-t0:.2f}s")
    norms = problem.l2_norms(state)
    phi_i = float(norms["phi_i"])
    phi_e = float(norms["phi_e"])
    print(f"[{diagonal}] ||phi_i|| = {phi_i:.16e}")
    print(f"[{diagonal}] ||phi_e|| = {phi_e:.16e}")

    # Fit the nullspace constant: our solution family is u + c on both phis.
    # ||phi+c||^2 = ||phi||^2 + 2c*int(phi) + c^2*|Omega|
    a = problem.assembler
    u = np.asarray(state.u)
    for name, ref_i, ref_e in (("direct", REF_PHI_I, REF_PHI_E),
                               ("iterative", REF_IT_PHI_I, REF_IT_PHI_E)):
        si, se = a._sides
        M_i, M_e_ = np.asarray(si["M_e"]), np.asarray(se["M_e"])
        Vt_i, Vt_e = np.asarray(si["Vt"]), np.asarray(se["Vt"])
        pi, pe = u[a.PHI_I][Vt_i], u[a.PHI_E][Vt_e]
        n2_i = np.einsum("cab,ca,cb->", M_i, pi, pi)
        n2_e = np.einsum("cab,ca,cb->", M_e_, pe, pe)
        int_i = np.einsum("cab,cb->", M_i, pi)
        int_e = np.einsum("cab,cb->", M_e_, pe)
        vol_i = M_i.sum()
        vol_e = M_e_.sum()
        # solve ||phi_e + c||^2 = ref_e^2 for c (two roots)
        A_, B_, C_ = vol_e, 2 * int_e, n2_e - ref_e ** 2
        disc = B_ ** 2 - 4 * A_ * C_
        if disc < 0:
            print(f"  [{name}] no real shift fits phi_e (disc={disc:.3e})")
            continue
        for c in ((-B_ + np.sqrt(disc)) / (2 * A_), (-B_ - np.sqrt(disc)) / (2 * A_)):
            got_i = np.sqrt(max(n2_i + 2 * c * int_i + c ** 2 * vol_i, 0.0))
            rel = abs(got_i - ref_i) / ref_i
            print(f"  [{name}] shift c={c:+.8e}: ||phi_i+c||={got_i:.10e} "
                  f"(ref {ref_i:.10e}, rel err {rel:.3e})")


if __name__ == "__main__":
    for diag in ("right", "left"):
        run(diag)
