"""Native C++ kernel tests: parity with the numpy fallbacks."""
import numpy as np
import pytest

from knp_emi_cgx_tpu import native
from knp_emi_cgx_tpu.mesh.generation import (generate_square_geometry,
                                             generate_cube_geometry)


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native library unavailable")


@needs_native
def test_build_facets_matches_numpy():
    for gen, n in ((generate_square_geometry, 16), (generate_cube_geometry, 6)):
        mesh, _ = gen(n)
        facets, fcells = native.build_facets(mesh.cells)
        # numpy reference
        dim = mesh.dim
        nv = dim + 1
        idx = [[j for j in range(nv) if j != i] for i in range(nv)]
        cf = mesh.cells[:, np.array(idx)]
        all_f = np.sort(cf.reshape(-1, dim), axis=1)
        uniq = np.unique(all_f, axis=0)
        order = np.lexsort(facets.T[::-1])
        np.testing.assert_array_equal(facets[order], uniq)
        # adjacency sanity: boundary facets have one -1 neighbour
        ext = (fcells[:, 1] < 0).sum()
        if dim == 2:
            assert ext == 4 * n
        else:
            assert ext == 6 * n * n * 2


@needs_native
def test_aggregate_covers_all_nodes():
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 500
    # random symmetric sparsity
    A = sp.random(n, n, density=0.01, random_state=0)
    A = (A + A.T).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    agg, n_agg = native.aggregate(A.indptr, A.indices)
    assert agg.min() >= 0
    assert agg.max() == n_agg - 1
    assert n_agg < n


@needs_native
def test_partition_balanced_and_connected():
    from knp_emi_cgx_tpu.mesh.topology import build_topology

    mesh, tagger = generate_square_geometry(32)
    topo = build_topology(mesh, facet_tagger=tagger)
    # cell dual graph from facet adjacency
    import scipy.sparse as sp

    interior = topo.facet_cells[:, 1] >= 0
    r = topo.facet_cells[interior, 0]
    c = topo.facet_cells[interior, 1]
    n = mesh.num_cells
    G = sp.csr_matrix((np.ones(2 * len(r)), (np.concatenate([r, c]),
                                             np.concatenate([c, r]))),
                      shape=(n, n))
    part = native.partition(G.indptr, G.indices, 8)
    assert part.min() == 0 and part.max() == 7
    counts = np.bincount(part, minlength=8)
    assert counts.max() <= 1.5 * counts.min() + 8
