"""Neighbour-halo ppermute SpMV: exact match vs serial on the 8-device CPU
mesh, and the halo volume must be a small fraction of the global vector."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.mesh.topology import build_topology
from knp_emi_cgx_tpu.parallel.halo_spmv import HaloSpMV

N_DEV = 8


@pytest.fixture(scope="module")
def device_mesh():
    devs = [d for d in jax.devices() if d.platform == "cpu"][:N_DEV]
    if len(devs) < N_DEV:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs), ("cells",))


def _laplacian():
    """Scalar P1 Laplacian + mass on the 32x32 square (one field block)."""
    import scipy.sparse as sp

    from knp_emi_cgx_tpu.fem.p1 import cell_geometry, reference_mass

    mesh, tagger = generate_square_geometry(32)
    build_topology(mesh, facet_tagger=tagger)
    g, v = cell_geometry(mesh.points, mesh.cells)
    K = np.einsum("cai,cbi->cab", g, g) * v[:, None, None]
    M = v[:, None, None] * reference_mass(2)[None]
    blk = (K + M).ravel()
    R = np.broadcast_to(mesh.cells[:, :, None], K.shape).ravel()
    C = np.broadcast_to(mesh.cells[:, None, :], K.shape).ravel()
    A = sp.csr_matrix((blk, (R, C)), shape=(mesh.num_points,) * 2)
    A.sum_duplicates()
    return A


def test_halo_spmv_exact(device_mesh):
    A = _laplacian()
    n = A.shape[0]
    op = HaloSpMV(A.indptr, A.indices, n, N_DEV)
    mv = op.make_matvec(device_mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=n))
    vals = jnp.asarray(A.data)
    y = op.unpad_vector(mv(op.shard_values(vals), op.pad_vector(x)))
    y_ref = A @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-12, atol=1e-14)


def test_halo_volume_is_small(device_mesh):
    """The point of halos: exchanged data << global vector size."""
    A = _laplacian()
    op = HaloSpMV(A.indptr, A.indices, A.shape[0], N_DEV)
    halo_total = sum(op.halo_width.values())
    all_gather_volume = (N_DEV - 1) * op.rows_per
    # exchanged data must be well below what all_gather would ship
    assert halo_total < 0.2 * all_gather_volume, (op.halo_width, op.rows_per)
    assert len(op.deltas) <= N_DEV - 1
