"""Hodgkin–Huxley gating-variable ODE sweeps (n, m, h) — jittable.

TPU-native counterpart of the reference's numpy Rush–Larsen loop
(`KNPEMIx_ionic_model.py:605-671`): rate coefficients are computed once per
PDE step from the membrane potential, then `time_steps_ode` substeps advance
the gates.  The substep loop is a `lax.fori_loop` over whole arrays resident
in HBM — pure VPU work, fused by XLA with the surrounding step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hh_rate_coefficients(phi_m, phi_rest):
    """Classic HH alpha/beta rates. Input potentials in volts; the rates use
    V_M = 1000*(phi_m - phi_rest) in mV and are expressed per second
    (the 1e3 factors), matching KNPEMIx_ionic_model.py:617-625."""
    V_M = 1000.0 * (phi_m - phi_rest)
    alpha_n = 0.01e3 * (10.0 - V_M) / (jnp.exp((10.0 - V_M) / 10.0) - 1.0)
    beta_n = 0.125e3 * jnp.exp(-V_M / 80.0)
    alpha_m = 0.1e3 * (25.0 - V_M) / (jnp.exp((25.0 - V_M) / 10.0) - 1.0)
    beta_m = 4.0e3 * jnp.exp(-V_M / 18.0)
    alpha_h = 0.07e3 * jnp.exp(-V_M / 20.0)
    beta_h = 1.0e3 / (jnp.exp((30.0 - V_M) / 10.0) + 1.0)
    return (alpha_n, beta_n), (alpha_m, beta_m), (alpha_h, beta_h)


def rush_larsen_update(n, m, h, phi_m, phi_rest, dt_ode, num_substeps: int):
    """Advance (n, m, h) by `num_substeps` Rush–Larsen steps of size dt_ode.

    The rates are frozen at the current phi_m for all substeps (exactly as
    the reference does), so the iteration is a geometric relaxation towards
    y_inf.  We keep the explicit substep loop for bitwise-comparable results
    with the reference rather than collapsing to exp(-k*dt/tau).
    """
    (an, bn), (am, bm), (ah, bh) = hh_rate_coefficients(phi_m, phi_rest)

    tau_n = 1.0 / (an + bn)
    tau_m = 1.0 / (am + bm)
    tau_h = 1.0 / (ah + bh)
    inf_n = an * tau_n
    inf_m = am * tau_m
    inf_h = ah * tau_h
    exp_n = jnp.exp(-dt_ode / tau_n)
    exp_m = jnp.exp(-dt_ode / tau_m)
    exp_h = jnp.exp(-dt_ode / tau_h)

    def body(_, ymh):
        n_, m_, h_ = ymh
        return (
            inf_n + (n_ - inf_n) * exp_n,
            inf_m + (m_ - inf_m) * exp_m,
            inf_h + (h_ - inf_h) * exp_h,
        )

    return jax.lax.fori_loop(0, num_substeps, body, (n, m, h))


def forward_euler_update(n, m, h, phi_m, phi_rest, dt_ode, num_substeps: int):
    """Forward-Euler variant (reference's use_Rush_Larsen=False branch)."""
    (an, bn), (am, bm), (ah, bh) = hh_rate_coefficients(phi_m, phi_rest)
    an, bn, am, bm, ah, bh = (r * dt_ode for r in (an, bn, am, bm, ah, bh))

    def body(_, ymh):
        n_, m_, h_ = ymh
        return (
            n_ + an * (1.0 - n_) - bn * n_,
            m_ + am * (1.0 - m_) - bm * m_,
            h_ + ah * (1.0 - h_) - bh * h_,
        )

    return jax.lax.fori_loop(0, num_substeps, body, (n, m, h))
