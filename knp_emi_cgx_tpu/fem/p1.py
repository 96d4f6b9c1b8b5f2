"""P1 Lagrange finite elements on simplices: closed-form element tensors,
cell/facet geometry, and quadrature rules.

TPU-first counterpart of the reference's UFL/basix/FFCx pipeline
(`KNPEMIx_problem.py:38-48` creates CG-1 spaces; FFCx generates C kernels).
For P1 simplices every *polynomial* form integral is closed-form in the cell
Jacobian, so volume assembly is quadrature-free and exact:

    mass      M_e[a,b] = vol_e * (1 + delta_ab) / (d+1)(d+2)
    stiffness K_e[a,b] = vol_e * (g_a . g_b)         (g = const P1 gradients)
    weighted  W_e(c)   = K_e * mean(c at vertices)   (P1 coefficient c)

Only membrane-facet integrands (Nernst logs, pump rationals — see
`KNPEMIx_problem.py:516`, `KNPEMIx_ionic_model.py`) are non-polynomial; they
use Gauss rules matching the reference's quadrature_degree=10 measures
(`mixed_dim_problem.py:732-733`), where any degree-10-exact rule agrees to
roundoff for these near-constant smooth fields.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Cell geometry
# ---------------------------------------------------------------------------

def cell_geometry(points: np.ndarray, cells: np.ndarray):
    """Per-cell P1 basis gradients and volumes (host, numpy, float64).

    Returns
    -------
    grads : [n_cells, dim+1, dim] — constant gradient of each nodal basis fn
    vols  : [n_cells] — simplex measure (area in 2D, volume in 3D)
    """
    dim = points.shape[1]
    x = points[cells]                       # [nc, dim+1, dim]
    x0 = x[:, 0, :]
    J = np.stack([x[:, i + 1, :] - x0 for i in range(dim)], axis=-1)  # [nc, dim, dim]
    detJ = np.linalg.det(J)
    vols = np.abs(detJ) / _factorial(dim)
    Jinv = np.linalg.inv(J)                 # [nc, dim, dim]
    # Reference gradients: lambda_0 = 1 - sum(xi); lambda_i = xi_i
    gref = np.zeros((dim + 1, dim))
    gref[0, :] = -1.0
    gref[1:, :] = np.eye(dim)
    # physical gradient g_a = Jinv^T @ gref_a
    grads = np.einsum("nij,aj->nai", np.transpose(Jinv, (0, 2, 1)), gref)
    return grads, vols


def facet_geometry(points: np.ndarray, facet_verts: np.ndarray):
    """Measure (length in 2D / area in 3D) of facets given vertex ids."""
    fp = points[facet_verts]                 # [nf, dim, dim]
    if points.shape[1] == 2:
        d = fp[:, 1, :] - fp[:, 0, :]
        return np.sqrt((d ** 2).sum(axis=1))
    e1 = fp[:, 1, :] - fp[:, 0, :]
    e2 = fp[:, 2, :] - fp[:, 0, :]
    n = np.cross(e1, e2)
    return 0.5 * np.sqrt((n ** 2).sum(axis=1))


def _factorial(n: int) -> int:
    out = 1
    for i in range(2, n + 1):
        out *= i
    return out


# ---------------------------------------------------------------------------
# Reference element tensors
# ---------------------------------------------------------------------------

def reference_mass(dim: int) -> np.ndarray:
    """M̂[a,b] such that M_e = vol_e * M̂ for P1 on a dim-simplex."""
    nv = dim + 1
    M = np.full((nv, nv), 1.0)
    M += np.eye(nv)
    return M / (_factorial(dim + 2) / _factorial(dim))  # (d+1)(d+2)


# ---------------------------------------------------------------------------
# Quadrature
# ---------------------------------------------------------------------------

def interval_quadrature(degree: int):
    """Gauss–Legendre rule on [0,1] exact to the given degree.
    Returns (points [nq], weights [nq]) with sum(weights) = 1."""
    n = (degree + 2) // 2
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def triangle_quadrature(degree: int):
    """Collapsed (Duffy) Gauss rule on the reference triangle
    {(x,y): x,y>=0, x+y<=1}, exact for total degree <= degree.
    Returns (points [nq,2], weights [nq]) with sum(weights) = 1/2."""
    n = (degree + 2) // 2 + 1  # +1 absorbs the Duffy Jacobian degree bump
    gx, gw = np.polynomial.legendre.leggauss(n)
    gx = 0.5 * (gx + 1.0)
    gw = 0.5 * gw
    pts = []
    wts = []
    for i in range(n):
        for j in range(n):
            xi, eta = gx[i], gx[j]
            x = xi * (1.0 - eta)
            y = eta
            w = gw[i] * gw[j] * (1.0 - eta)
            pts.append((x, y))
            wts.append(w)
    return np.array(pts), np.array(wts)


def tetrahedron_quadrature(degree: int):
    """Collapsed (triple-Duffy) Gauss rule on the reference tetrahedron,
    exact for total degree <= degree.  Returns (points [nq,3], weights) with
    sum(weights) = 1/6."""
    n = (degree + 2) // 2 + 1
    gx, gw = np.polynomial.legendre.leggauss(n)
    gx = 0.5 * (gx + 1.0)
    gw = 0.5 * gw
    pts, wts = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                a, b, c = gx[i], gx[j], gx[k]
                # map unit cube -> tet via collapsed coordinates
                x = a * (1 - b) * (1 - c)
                y = b * (1 - c)
                z = c
                w = gw[i] * gw[j] * gw[k] * (1 - b) * (1 - c) ** 2
                pts.append((x, y, z))
                wts.append(w)
    return np.array(pts), np.array(wts)


def cell_quadrature(dim: int, degree: int = 10):
    """Cell quadrature in barycentric form: returns (N [nq, dim+1], w [nq])
    with sum(w) = 1 (multiply by the cell measure to integrate) — N are the
    P1 shape values at the quadrature points."""
    if dim == 2:
        pts, w = triangle_quadrature(degree)
        N = np.column_stack([1.0 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]])
        return N, w * 2.0
    pts, w = tetrahedron_quadrature(degree)
    N = np.column_stack([1.0 - pts.sum(axis=1), pts[:, 0], pts[:, 1], pts[:, 2]])
    return N, w * 6.0


def facet_quadrature(dim: int, degree: int = 10):
    """Quadrature on a membrane facet in barycentric form.

    Returns (N [nq, dim], w [nq]) where N are the P1 facet shape function
    values at the quadrature points (dim = #facet vertices: 2 in 2D, 3 in 3D)
    and w are weights normalised so that sum(w) = 1 (multiply by the facet
    measure to integrate).
    """
    if dim == 2:
        x, w = interval_quadrature(degree)
        N = np.column_stack([1.0 - x, x])
        return N, w
    pts, w = triangle_quadrature(degree)
    N = np.column_stack([1.0 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]])
    # normalise: reference triangle area is 1/2
    return N, w * 2.0
