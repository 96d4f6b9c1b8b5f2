from knp_emi_cgx_tpu.solvers.direct import dense_solve, dense_solve_deflated  # noqa: F401
from knp_emi_cgx_tpu.solvers.krylov import gmres  # noqa: F401
from knp_emi_cgx_tpu.solvers.precond import BlockDiagonalPreconditioner  # noqa: F401
