"""P1 element tensor and quadrature correctness."""
import numpy as np

from knp_emi_cgx_tpu.fem.p1 import (
    cell_geometry, reference_mass, interval_quadrature, triangle_quadrature,
    facet_quadrature)


def test_reference_mass():
    M2 = reference_mass(2)
    np.testing.assert_allclose(M2, (np.ones((3, 3)) + np.eye(3)) / 12.0)
    M3 = reference_mass(3)
    np.testing.assert_allclose(M3, (np.ones((4, 4)) + np.eye(4)) / 20.0)


def test_stiffness_exact_triangle():
    # right triangle (0,0),(1,0),(0,1): K = 0.5*[[2,-1,-1],[-1,1,0],[-1,0,1]]
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2]])
    g, v = cell_geometry(pts, cells)
    K = np.einsum("cai,cbi->cab", g, g)[0] * v[0]
    expected = 0.5 * np.array([[2.0, -1, -1], [-1, 1, 0], [-1, 0, 1]])
    np.testing.assert_allclose(K, expected, atol=1e-14)


def test_gradients_partition_of_unity():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4, 3))
    cells = np.array([[0, 1, 2, 3]])
    g, v = cell_geometry(pts, cells)
    np.testing.assert_allclose(g.sum(axis=1), 0.0, atol=1e-12)
    # gradient of coordinate function x_i is e_i: sum_a g_a x_a^i = e_i
    G = np.einsum("ak,ai->ki", pts[cells[0]], g[0])
    np.testing.assert_allclose(G, np.eye(3), atol=1e-12)


def test_interval_quadrature_degree():
    x, w = interval_quadrature(10)
    for p in range(12):
        np.testing.assert_allclose((w * x ** p).sum(), 1.0 / (p + 1),
                                   rtol=1e-13, err_msg=f"degree {p}")


def test_triangle_quadrature_degree():
    pts, w = triangle_quadrature(10)
    # exact: int_T x^a y^b = a! b! / (a+b+2)!
    from math import factorial
    for a in range(0, 11):
        for b in range(0, 11 - a):
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
            got = (w * pts[:, 0] ** a * pts[:, 1] ** b).sum()
            np.testing.assert_allclose(got, exact, rtol=1e-12,
                                       err_msg=f"x^{a} y^{b}")


def test_facet_quadrature_normalised():
    for dim in (2, 3):
        N, w = facet_quadrature(dim)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-13)
        np.testing.assert_allclose(N.sum(axis=1), 1.0, rtol=1e-13)
        # shape-function mass: int N_a N_b over reference with unit measure
        NN = np.einsum("q,qa,qb->ab", w, N, N)
        if dim == 2:
            exact = np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0
        else:
            exact = (np.ones((3, 3)) + np.eye(3)) / 12.0
        np.testing.assert_allclose(NN, exact, rtol=1e-13)
