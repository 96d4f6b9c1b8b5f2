"""Membrane flux diagnostics.

Equivalent of the reference's `utils/calc_fluxes.py`: per-ion molar flux
J_k . n integrated across a chosen membrane tag, evaluated from both the
intra and extra sides.  P1 gradients are constant per cell, so the facet
integral is exact; normals point out of the intracellular compartment
('+' convention).
"""
from __future__ import annotations

import numpy as np

from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry, facet_quadrature
from knp_emi_cgx_tpu.ops.assembly import KNPEMIAssembler


def membrane_fluxes(problem, state, tag: int | None = None) -> dict:
    """Total molar flux [mol/s] of each ion across the membrane (or one
    membrane tag), per side:

        J_k = -D grad(k) - (D z / psi) k grad(phi)       (create_flux_forms,
                                                          calc_fluxes.py:8-92)
    Returns {ion: {"intra": float, "extra": float}}.
    """
    topo = problem.topo
    mesh = topo.mesh
    p = problem.params
    a = problem.assembler
    u = np.asarray(state.u, dtype=np.float64)

    mask = np.ones(len(topo.membrane_facets), dtype=bool)
    if tag is not None:
        mask = topo.membrane_tags == tag
    mverts = topo.membrane_verts[mask]
    cell_i = topo.membrane_cell_intra[mask]
    cell_e = topo.membrane_cell_extra[mask]

    grads, _ = cell_geometry(mesh.points, mesh.cells)
    areas = facet_geometry(mesh.points, mverts)
    Nq, wq = facet_quadrature(mesh.dim, degree=10)

    # oriented normals (out of intra)
    intra_centroid = mesh.points[mesh.cells[cell_i]].mean(axis=1)
    normals = KNPEMIAssembler._oriented_normals(mesh.points, mverts,
                                                intra_centroid)

    out = {}
    for k, ion in enumerate(p.ion_list):
        res = {}
        for side, cells_adj, f_k, f_phi, D in (
            ("intra", cell_i, k, a.PHI_I, ion["Di"]),
            ("extra", cell_e, a.nvar + k, a.PHI_E, ion["De"]),
        ):
            cv = mesh.cells[cells_adj]                  # [nf, nv]
            g = grads[cells_adj]                        # [nf, nv, dim]
            grad_k = np.einsum("fad,fa->fd", g, u[f_k][cv])
            grad_phi = np.einsum("fad,fa->fd", g, u[f_phi][cv])
            # concentration at facet quadrature points (P1 trace)
            k_q = np.einsum("fa,qa->fq", u[f_k][mverts], Nq)
            k_bar = np.einsum("fq,q->f", k_q, wq)       # facet average
            J = (-D * grad_k
                 - (D * ion["z"] / p.psi) * k_bar[:, None] * grad_phi)
            res[side] = float(np.einsum("fd,fd,f->", J, normals, areas))
        out[ion["name"]] = res
    return out
