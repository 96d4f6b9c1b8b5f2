"""Ionic model unit tests against hand-computed values from the reference
formulas (KNPEMIx_ionic_model.py)."""
import numpy as np
import jax.numpy as jnp

from knp_emi_cgx_tpu.models.gating import hh_rate_coefficients, rush_larsen_update
from knp_emi_cgx_tpu.models.ionic import (ATPPump, HodgkinHuxley,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.models.params import KNPEMIParams


def _params():
    ions = [
        {"name": "Na", "z": 1.0, "Di": 1.33e-9, "De": 1.33e-9,
         "g_leak": 0.3, "g_leak_g": 1.0, "ki_init": 12.0, "ke_init": 140.0,
         "ki_init_g": 15.0, "f_i": 0.0, "f_e": 0.0},
        {"name": "K", "z": 1.0, "Di": 1.96e-9, "De": 1.96e-9,
         "g_leak": 0.1, "g_leak_g": 16.96, "ki_init": 130.0, "ke_init": 4.0,
         "ki_init_g": 100.0, "f_i": 0.0, "f_e": 0.0},
        {"name": "Cl", "z": -1.0, "Di": 2.03e-9, "De": 2.03e-9,
         "g_leak": 0.25, "g_leak_g": 2.0, "ki_init": 5.0, "ke_init": 125.0,
         "ki_init_g": 5.0, "f_i": 0.0, "f_e": 0.0},
    ]
    return KNPEMIParams(
        F=96485.0, R=8.314, T=300.0, psi=8.314 * 300 / 96485.0, C_M=0.02,
        dt=2.5e-5, ion_list=ions,
        ion_index={"Na": 0, "K": 1, "Cl": 2}, K_e_init=4.0)


def _qp(params):
    shape = (2, 3)
    c_i = [jnp.full(shape, ion["ki_init"]) for ion in params.ion_list]
    c_e = [jnp.full(shape, ion["ke_init"]) for ion in params.ion_list]
    q = {
        "c_i": c_i, "c_e": c_e,
        "phi_m": jnp.full(shape, -0.070),
        "n": jnp.full(shape, 0.276),
        "m": jnp.full(shape, 0.0379),
        "h": jnp.full(shape, 0.688),
    }
    q["E"] = [(params.psi / ion["z"]) * jnp.log(c_e[k] / c_i[k])
              for k, ion in enumerate(params.ion_list)]
    return q


def test_atp_pump_values():
    p = _params()
    q = _qp(p)
    atp = ATPPump()
    I = float(atp.current(0, p.ion_list[0], q, p)[0, 0])
    # I_ATP = I_hat / ((1 + 1.5/4)^2 (1 + 10/12)^3), Na gets 3x
    I_atp = 0.25 / ((1 + 1.5 / 4.0) ** 2 * (1 + 10.0 / 12.0) ** 3)
    np.testing.assert_allclose(I, 3 * I_atp, rtol=1e-12)
    I_K = float(atp.current(1, p.ion_list[1], q, p)[0, 0])
    np.testing.assert_allclose(I_K, -2 * I_atp, rtol=1e-12)
    I_Cl = float(atp.current(2, p.ion_list[2], q, p)[0, 0])
    assert I_Cl == 0.0


def test_hh_current_values():
    p = _params()
    q = _qp(p)
    hh = HodgkinHuxley()
    E_Na = p.psi * np.log(140.0 / 12.0)
    g = 0.3 + 1200.0 * 0.0379 ** 3 * 0.688
    np.testing.assert_allclose(
        float(hh.current(0, p.ion_list[0], q, p)[0, 0]),
        g * (-0.070 - E_Na), rtol=1e-12)
    E_K = p.psi * np.log(4.0 / 130.0)
    gk = 0.1 + 360.0 * 0.276 ** 4
    np.testing.assert_allclose(
        float(hh.current(1, p.ion_list[1], q, p)[0, 0]),
        gk * (-0.070 - E_K), rtol=1e-12)


def test_neuronal_cotransporters_nkcc1_dead():
    """NKCC1 must contribute zero by default (reference behaviour — its
    silencer always returns zero, KNPEMIx_ionic_model.py:62-69)."""
    p = _params()
    q = _qp(p)
    ct = NeuronalCotransporters()
    I_KCC2 = 0.0068 * np.log((130.0 * 5.0) / (4.0 * 125.0))
    np.testing.assert_allclose(float(ct.current(0, p.ion_list[0], q, p)[0, 0]),
                               0.0, atol=1e-15)  # Na: -I_NKCC1 = 0
    np.testing.assert_allclose(float(ct.current(1, p.ion_list[1], q, p)[0, 0]),
                               I_KCC2, rtol=1e-12)
    np.testing.assert_allclose(float(ct.current(2, p.ion_list[2], q, p)[0, 0]),
                               -I_KCC2, rtol=1e-12)


def test_gating_steady_state():
    """At the true HH resting potential the gates converge to n_inf etc."""
    phi_m = jnp.full((5,), -0.065)  # phi_rest => V_M = 0
    n = jnp.full((5,), 0.3)
    m = jnp.full((5,), 0.05)
    h = jnp.full((5,), 0.6)
    (an, bn), (am, bm), (ah, bh) = hh_rate_coefficients(phi_m, -0.065)
    n_inf = float(an[0] / (an[0] + bn[0]))
    # long relaxation
    n2, m2, h2 = rush_larsen_update(n, m, h, phi_m, -0.065, 1e-3, 100)
    np.testing.assert_allclose(np.asarray(n2), n_inf, rtol=1e-6)


def test_gating_reference_initial_values():
    """The reference class defaults n/m/h (KNPEMIx_problem.py:964-966) are
    the steady state at phi_m = -70 mV with phi_rest = -65 mV."""
    phi_m = jnp.full((1,), -0.070)
    (an, bn), (am, bm), (ah, bh) = hh_rate_coefficients(phi_m, -0.065)
    np.testing.assert_allclose(float(an[0] / (an[0] + bn[0])),
                               0.24458654944007155, rtol=1e-10)
    np.testing.assert_allclose(float(am[0] / (am[0] + bm[0])),
                               0.028905534475191896, rtol=1e-10)
    np.testing.assert_allclose(float(ah[0] / (ah[0] + bh[0])),
                               0.7540796658225248, rtol=1e-10)
