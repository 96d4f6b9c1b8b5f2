"""Point evaluation of P1 fields (scifem.evaluate_function equivalent,
KNPEMIx_solver.py:612-643).

Setup (host): locate each evaluation point's containing cell by barycentric
test and store the interpolation weights.  Evaluation is then a tiny
gather+dot, cheap enough to run every step on device or host.
"""
from __future__ import annotations

import numpy as np

from knp_emi_cgx_tpu.fem.p1 import cell_geometry


class PointEvaluator:
    def __init__(self, mesh, points: np.ndarray, cells_subset=None, tol=1e-10):
        points = np.atleast_2d(np.asarray(points, dtype=float))[:, : mesh.dim]
        cells = mesh.cells if cells_subset is None else mesh.cells[cells_subset]
        grads, vols = cell_geometry(mesh.points, cells)
        self.vertex_ids = np.zeros((len(points), mesh.dim + 1), dtype=np.int64)
        self.weights = np.zeros((len(points), mesh.dim + 1))
        # containing cell per point, in the ORIGINAL mesh numbering (used by
        # geometry/tag slicing in the plot scripts)
        self.cell_ids = np.zeros(len(points), dtype=np.int64)
        subset = (np.arange(mesh.num_cells) if cells_subset is None
                  else np.asarray(cells_subset))
        x0 = mesh.points[cells[:, 0]]
        for i, pt in enumerate(points):
            # barycentric coordinates via the P1 gradients:
            # lambda_a(x) = lambda_a(x0) + g_a . (x - x0), lambda_0(x0)=1
            lam = np.einsum("cad,cd->ca", grads, pt[None, :] - x0)
            lam[:, 0] += 1.0
            inside = np.all(lam >= -tol, axis=1) & np.all(lam <= 1 + tol, axis=1)
            idx = np.nonzero(inside)[0]
            if len(idx) == 0:
                # fall back to the cell with the least-negative coordinate
                idx = [int(np.argmax(lam.min(axis=1)))]
            c = idx[0]
            self.vertex_ids[i] = cells[c]
            self.cell_ids[i] = subset[c]
            self.weights[i] = np.clip(lam[c], 0.0, 1.0)
            self.weights[i] /= self.weights[i].sum()

    def __call__(self, vertex_values) -> np.ndarray:
        """Evaluate a [nV] field (or [..., nV]) at the stored points."""
        vals = np.asarray(vertex_values)
        return np.einsum("...pa,pa->...p", vals[..., self.vertex_ids],
                         self.weights)
