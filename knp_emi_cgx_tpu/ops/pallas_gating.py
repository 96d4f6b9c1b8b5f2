"""Pallas TPU kernel for the Hodgkin–Huxley Rush–Larsen gating sweep.

The gating update (models/gating.py, reference KNPEMIx_ionic_model.py:605-671)
is the purest VPU workload in the step: ~10 transcendentals per dof to build
the rate coefficients, then `time_steps_ode` fused multiply-adds per gate.
The XLA version is already fused; this kernel exists to (a) pin the whole
sweep into one VMEM-resident pass with explicit tiling, and (b) serve as the
template for further Pallas offloads.  Selected via
`HodgkinHuxley(use_pallas=True)` or the `pallas_gating` ksp setting; the
lax/XLA path remains the default (bit-identical to the reference's update
order).

Falls back transparently to the XLA implementation on platforms where
Mosaic is unavailable (e.g. the CPU test backend runs it in interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 1024  # rows per grid step (8 sublanes x 128 lanes)


def _gating_kernel(phi_ref, n_ref, m_ref, h_ref,
                   n_out, m_out, h_out,
                   *, phi_rest: float, dt_ode: float, num_substeps: int):
    V = 1000.0 * (phi_ref[:] - phi_rest)
    alpha_n = 0.01e3 * (10.0 - V) / (jnp.exp((10.0 - V) / 10.0) - 1.0)
    beta_n = 0.125e3 * jnp.exp(-V / 80.0)
    alpha_m = 0.1e3 * (25.0 - V) / (jnp.exp((25.0 - V) / 10.0) - 1.0)
    beta_m = 4.0e3 * jnp.exp(-V / 18.0)
    alpha_h = 0.07e3 * jnp.exp(-V / 20.0)
    beta_h = 1.0e3 / (jnp.exp((30.0 - V) / 10.0) + 1.0)

    tau_n = 1.0 / (alpha_n + beta_n)
    tau_m = 1.0 / (alpha_m + beta_m)
    tau_h = 1.0 / (alpha_h + beta_h)
    inf_n = alpha_n * tau_n
    inf_m = alpha_m * tau_m
    inf_h = alpha_h * tau_h
    exp_n = jnp.exp(-dt_ode / tau_n)
    exp_m = jnp.exp(-dt_ode / tau_m)
    exp_h = jnp.exp(-dt_ode / tau_h)

    def body(_, carry):
        n_, m_, h_ = carry
        return (inf_n + (n_ - inf_n) * exp_n,
                inf_m + (m_ - inf_m) * exp_m,
                inf_h + (h_ - inf_h) * exp_h)

    n_, m_, h_ = jax.lax.fori_loop(
        0, num_substeps, body, (n_ref[:], m_ref[:], h_ref[:]))
    n_out[:] = n_
    m_out[:] = m_
    h_out[:] = h_


@functools.partial(jax.jit, static_argnames=("phi_rest", "dt_ode",
                                             "num_substeps", "interpret"))
def rush_larsen_pallas(n, m, h, phi_m, phi_rest: float, dt_ode: float,
                       num_substeps: int, interpret: bool = False):
    """Pallas variant of models.gating.rush_larsen_update (same math)."""
    from jax.experimental.pallas import tpu as pltpu

    nV = n.shape[0]
    pad = (-nV) % TILE
    def prep(x):
        # [rows, 128] layout; each grid step handles an (8, 128) tile
        return jnp.pad(x, (0, pad)).reshape(-1, 128)

    phi_p, n_p, m_p, h_p = map(prep, (phi_m, n, m, h))
    grid = (phi_p.shape[0] // 8,)
    spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_gating_kernel, phi_rest=float(phi_rest),
                               dt_ode=float(dt_ode),
                               num_substeps=int(num_substeps))
    out_shape = jax.ShapeDtypeStruct(phi_p.shape, n.dtype)
    n2, m2, h2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(phi_p, n_p, m_p, h_p)

    def unprep(x):
        return x.reshape(-1)[:nV]

    return unprep(n2), unprep(m2), unprep(h2)
