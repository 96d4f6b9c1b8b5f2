"""knp_emi_cgx_tpu — a TPU-native (JAX/XLA/Pallas) framework for KNP-EMI / EMI
ionic electrodiffusion in cellular geometries.

This is a ground-up, TPU-first re-design of the capabilities of the reference
CGx library (hherlyng/knp-emi-cgx): multi-compartment Kirchhoff–Nernst–Planck
electrodiffusion (KNP-EMI) and EMI equations on unstructured simplicial meshes,
with membrane physics (Hodgkin–Huxley, pumps, cotransporters), implicit-Euler
time stepping with semi-implicit linearisation, direct and Krylov solvers, MMS
verification, and multi-chip mesh sharding over a `jax.sharding.Mesh`.

Architecture (TPU-first, not a port):
  * host-side numpy mesh layer (generation, tags, connectivity, membrane
    facet pairs, partitioning) — the DOLFINx-C++-core equivalent
  * device-side assembly: closed-form P1 element tensors + batched facet
    quadrature kernels scattered with segment_sum into a static-sparsity CSR
    operator (the UFL→FFCx→C equivalent, but trace+jit instead of codegen)
  * solvers: dense direct (with nullspace deflation) for golden parity, and
    jittable restarted GMRES with a block-diagonal preconditioner (the
    PETSc/hypre equivalent)
  * everything in the hot loop is one jitted step over an HBM-resident pytree
"""

__version__ = "0.1.0"

from knp_emi_cgx_tpu.config import load_config, SimulationConfig  # noqa: F401
