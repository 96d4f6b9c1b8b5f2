"""Pallas gating kernel equivalence vs the lax implementation (interpret
mode on the CPU test backend; compiled Mosaic on TPU)."""
import numpy as np
import jax.numpy as jnp

from knp_emi_cgx_tpu.models.gating import rush_larsen_update
from knp_emi_cgx_tpu.ops.pallas_gating import rush_larsen_pallas


def test_pallas_gating_matches_lax():
    rng = np.random.default_rng(0)
    nV = 3000  # not a multiple of the tile — exercises padding
    phi = jnp.asarray(-0.07 + 0.02 * rng.normal(size=nV))
    n = jnp.asarray(rng.uniform(0.1, 0.9, nV))
    m = jnp.asarray(rng.uniform(0.01, 0.2, nV))
    h = jnp.asarray(rng.uniform(0.3, 0.9, nV))
    args = (n, m, h, phi, -0.065, 1e-6, 25)
    ref = rush_larsen_update(*args)
    got = rush_larsen_pallas(*args, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-12)
