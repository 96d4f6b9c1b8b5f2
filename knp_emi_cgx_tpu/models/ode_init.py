"""0-D membrane ODE systems: find steady-state resting initial conditions.

Re-implementation of the reference's `utils/membrane_ODE_systems.py`
(935 LoC): compartment-averaged membrane dynamics (two-compartment
neuron+ECS, `:585-827`; three-compartment neuron+glia+ECS, `:118-582`)
integrated with stiff Radau steps in 1 ms chunks until the RHS vanishes.
The resulting equilibrium becomes the PDE initial conditions when the YAML
config provides none (`KNPEMIx_problem.py:224-325`).

Runs once on the host (scipy) — exactly like the reference, which computes
it on MPI rank 0 and broadcasts.
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp


def _hh_rates(V_m):
    alpha_n = 0.01e3 * (10. - V_m) / (np.exp((10. - V_m) / 10.) - 1.)
    beta_n = 0.125e3 * np.exp(-V_m / 80.)
    alpha_m = 0.1e3 * (25. - V_m) / (np.exp((25. - V_m) / 10.) - 1)
    beta_m = 4.e3 * np.exp(-V_m / 18.)
    alpha_h = 0.07e3 * np.exp(-V_m / 20.)
    beta_h = 1.e3 / (np.exp((30. - V_m) / 10.) + 1)
    return alpha_n, beta_n, alpha_m, beta_m, alpha_h, beta_h


def _f_nkcc1(K_e, K_e_0, K_min=3.0, eps=1e-6, cap=1.0):
    """Band-limited NKCC1 silencer (membrane_ODE_systems.py:104-115 — note
    this numpy version works, unlike the dead UFL variant)."""
    if K_e <= K_min or K_e >= K_e_0:
        return 0.0
    denom = max(K_e - K_e_0, eps)
    val = 1.0 / (1.0 + (0.03 / denom) ** 10)
    return min(max(val, 0.0), cap)


def compartment_volumes_and_areas(topo):
    """Volumes of each compartment and membrane surface areas, split by
    neuron/glia tags (calculate_compartment_volumes_and_surface_areas,
    mixed_dim_problem.py:813-848) — exact geometric integrals."""
    from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry

    mesh = topo.mesh
    _, vols = cell_geometry(mesh.points, mesh.cells)
    areas = facet_geometry(mesh.points, topo.membrane_verts)
    return vols, areas


def _solve_to_steady(rhs, init, timestep=1e-3, max_time=500.0,
                     rtol=1e-6, atol=1e-8, verbose=False):
    sol_ = np.asarray(init, dtype=float)
    t = 0.0
    while t < max_time:
        sol = solve_ivp(rhs, [t, t + timestep], sol_, method="Radau",
                        rtol=rtol, atol=atol)
        sol_ = sol.y[:, -1]
        t += timestep
        if np.any(np.isnan(sol_)):
            raise RuntimeError("NaN values in membrane ODE solution")
        if np.allclose(rhs(t, sol_), 0.0, rtol=1e-8, atol=1e-10):
            if verbose:
                print(f"Steady state reached at t = {t:.3f} s")
            return sol_, True
    return sol_, False


def two_compartment_steady_state(params, vol_i, vol_e, area,
                                 stimulus=False, timestep=1e-3,
                                 max_time=500.0):
    """Returns (phi_m, Na_i, Na_e, K_i, K_e, Cl_i, Cl_e, n, m, h) at the
    neuron+ECS equilibrium (membrane_ODE_systems.py:643-827)."""
    p = params
    R, F, T, C_m = p.R, p.F, p.T, p.C_M
    psi = R * T / F
    I_hat, P_Na_i, P_K_e = 0.25, 10.0, 1.5
    S_KCC2, S_NKCC1 = 0.0068, 0.00023

    ions = {i["name"]: i for i in p.ion_list}
    g_Na_leak = ions["Na"]["g_leak"]
    g_K_leak = ions["K"]["g_leak"]
    g_Cl_leak = ions["Cl"]["g_leak"]

    phi0 = p.phi_m_init
    V0 = (phi0 - p.phi_rest) * 1e3
    an, bn, am, bm, ah, bh = _hh_rates(V0)
    n0, m0, h0 = an / (an + bn), am / (am + bm), ah / (ah + bh)
    K_e_0 = ions["K"]["ke_init"]

    if stimulus:
        def g_stim(t):
            return p.g_syn_bar * np.exp(-np.mod(t + 1e-10, p.T_stim) / p.a_syn)
    else:
        def g_stim(t):
            return 0.0

    def E(z, ci, ce):
        return psi / z * np.log(ce / ci)

    def rhs(t, x):
        phi, Na_i, Na_e, K_i, K_e, Cl_i, Cl_e, n, m, h = x
        Vg = (phi - p.phi_rest) * 1e3
        I_ATP = I_hat / ((1 + P_K_e / K_e) ** 2 * (1 + P_Na_i / Na_i) ** 3)
        I_NK = S_NKCC1 * _f_nkcc1(K_e, K_e_0) * np.log(
            (Na_e * K_e * Cl_e ** 2) / (Na_i * K_i * Cl_i ** 2))
        I_KC = S_KCC2 * np.log((K_i * Cl_i) / (K_e * Cl_e))
        I_Na = ((g_Na_leak + p.g_Na_bar * m ** 3 * h + g_stim(t))
                * (phi - E(1, Na_i, Na_e)) + 3 * I_ATP - I_NK)
        I_K = ((g_K_leak + p.g_K_bar * n ** 4) * (phi - E(1, K_i, K_e))
               - 2 * I_ATP - I_NK + I_KC)
        I_Cl = g_Cl_leak * (phi - E(-1, Cl_i, Cl_e)) + 2 * I_NK - I_KC
        I_tot = I_Na + I_K + I_Cl
        an, bn, am, bm, ah, bh = _hh_rates(Vg)
        s = area / F
        return [
            -I_tot / C_m,
            -I_Na * s / vol_i, I_Na * s / vol_e,
            -I_K * s / vol_i, I_K * s / vol_e,
            I_Cl * s / vol_i, -I_Cl * s / vol_e,   # z_Cl = -1
            an * (1 - n) - bn * n,
            am * (1 - m) - bm * m,
            ah * (1 - h) - bh * h,
        ]

    init = [phi0,
            ions["Na"]["ki_init"], ions["Na"]["ke_init"],
            ions["K"]["ki_init"], ions["K"]["ke_init"],
            ions["Cl"]["ki_init"], ions["Cl"]["ke_init"],
            n0, m0, h0]
    sol, converged = _solve_to_steady(rhs, init, timestep, max_time)
    return sol, converged


def three_compartment_steady_state(params, vol_i_n, vol_i_g, vol_e,
                                   area_n, area_g, timestep=1e-3,
                                   max_time=500.0):
    """Neuron + glia + ECS equilibrium (membrane_ODE_systems.py:187-475).
    State: (phi_n, Na_i_n, Na_e, K_i_n, K_e, Cl_i_n, Cl_e,
            phi_g, Na_i_g, K_i_g, Cl_i_g, n, m, h)."""
    p = params
    R, F, T, C_m = p.R, p.F, p.T, p.C_M
    psi = R * T / F
    I_hat, P_Na_i, P_K_e = 0.25, 10.0, 1.5
    S_KCC2, S_NKCC1 = 0.0068, 0.00023
    rho_pump = 1.1 * 1.12e-6
    S_KCC1 = 7e-2 * psi
    S_NKCC1_g = 2e-2 * psi

    ions = {i["name"]: i for i in p.ion_list}
    K_e_0 = ions["K"]["ke_init"]
    K_i_0 = ions["K"]["ki_init"]

    def E(z, ci, ce):
        return psi / z * np.log(ce / ci)

    E_K_0 = E(1, K_i_0, K_e_0)
    A_kir = 1 + np.exp(0.433)
    B_kir = 1 + np.exp(-(0.1186 + E_K_0) / 0.0441)

    phi0 = p.phi_m_init
    V0 = (phi0 - p.phi_rest) * 1e3
    an, bn, am, bm, ah, bh = _hh_rates(V0)
    n0, m0, h0 = an / (an + bn), am / (am + bm), ah / (ah + bh)

    def rhs(t, x):
        (phi_n, Na_i_n, Na_e, K_i_n, K_e, Cl_i_n, Cl_e,
         phi_g, Na_i_g, K_i_g, Cl_i_g, n, m, h) = x
        Vg = (phi_n - p.phi_rest) * 1e3
        # neuron
        I_ATP = I_hat / ((1 + P_K_e / K_e) ** 2 * (1 + P_Na_i / Na_i_n) ** 3)
        I_NK = S_NKCC1 * _f_nkcc1(K_e, K_e_0) * np.log(
            (Na_e * K_e * Cl_e ** 2) / (Na_i_n * K_i_n * Cl_i_n ** 2))
        I_KC = S_KCC2 * np.log((K_i_n * Cl_i_n) / (K_e * Cl_e))
        I_Na_n = (ions["Na"]["g_leak"] + p.g_Na_bar * m ** 3 * h) \
            * (phi_n - E(1, Na_i_n, Na_e)) + 3 * I_ATP - I_NK
        I_K_n = (ions["K"]["g_leak"] + p.g_K_bar * n ** 4) \
            * (phi_n - E(1, K_i_n, K_e)) - 2 * I_ATP - I_NK + I_KC
        I_Cl_n = ions["Cl"]["g_leak"] * (phi_n - E(-1, Cl_i_n, Cl_e)) \
            + 2 * I_NK - I_KC
        I_ion_n = I_Na_n + I_K_n + I_Cl_n
        # glia
        E_K_g = E(1, K_i_g, K_e)
        dphi_K = phi_g - E_K_g
        C_kir = 1 + np.exp((dphi_K + 0.0185) / 0.0425)
        D_kir = 1 + np.exp(-(0.1186 + phi_g) / 0.0441)
        f_kir = A_kir * B_kir / (C_kir * D_kir) * np.sqrt(K_e / K_e_0)
        I_ATP_g = rho_pump * F * (1 / (1 + (P_Na_i / Na_i_g) ** 1.5)) \
            * (1 / (1 + P_K_e / K_e))
        I_NK_g = S_NKCC1_g * _f_nkcc1(K_e, K_e_0) * np.log(
            (Na_e * K_e * Cl_e ** 2) / (Na_i_g * K_i_g * Cl_i_g ** 2))
        I_KC1 = S_KCC1 * np.log((K_i_g * Cl_i_g) / (K_e * Cl_e))
        I_Na_g = ions["Na"]["g_leak_g"] * (phi_g - E(1, Na_i_g, Na_e)) \
            + 3 * I_ATP_g - I_NK_g
        I_K_g = ions["K"]["g_leak_g"] * f_kir * (phi_g - E_K_g) \
            - 2 * I_ATP_g - I_NK_g + I_KC1
        I_Cl_g = ions["Cl"]["g_leak_g"] * (phi_g - E(-1, Cl_i_g, Cl_e)) \
            + 2 * I_NK_g - I_KC1
        I_ion_g = I_Na_g + I_K_g + I_Cl_g

        an, bn, am, bm, ah, bh = _hh_rates(Vg)
        sn = area_n / F
        sg = area_g / F
        return [
            -I_ion_n / C_m,
            -I_Na_n * sn / vol_i_n,
            (I_Na_n * sn + I_Na_g * sg) / vol_e,
            -I_K_n * sn / vol_i_n,
            (I_K_n * sn + I_K_g * sg) / vol_e,
            I_Cl_n * sn / vol_i_n,
            -(I_Cl_n * sn + I_Cl_g * sg) / vol_e,
            -I_ion_g / C_m,
            -I_Na_g * sg / vol_i_g,
            -I_K_g * sg / vol_i_g,
            I_Cl_g * sg / vol_i_g,
            an * (1 - n) - bn * n,
            am * (1 - m) - bm * m,
            ah * (1 - h) - bh * h,
        ]

    init = [phi0,
            ions["Na"]["ki_init"], ions["Na"]["ke_init"],
            ions["K"]["ki_init"], ions["K"]["ke_init"],
            ions["Cl"]["ki_init"], ions["Cl"]["ke_init"],
            p.phi_m_g_init,
            ions["Na"]["ki_init_g"], ions["K"]["ki_init_g"],
            ions["Cl"]["ki_init_g"],
            n0, m0, h0]
    sol, converged = _solve_to_steady(rhs, init, timestep, max_time)
    return sol, converged


def solve_steady_state(problem, timestep=1e-3, max_time=500.0):
    """Find steady-state resting conditions and write them into
    problem.params (the reference's `set_initial_conditions` ODE branch,
    KNPEMIx_problem.py:224-325)."""
    from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry

    topo = problem.topo
    mesh = topo.mesh
    _, vols = cell_geometry(mesh.points, mesh.cells)
    areas = facet_geometry(mesh.points, topo.membrane_verts)
    cfg = problem.cfg
    p = problem.params
    ct = mesh.cell_tags
    neuron_mask = np.isin(ct, cfg.neuron_tags)
    vol_e = vols[np.isin(ct, cfg.extra_tag)].sum()

    ions = {i["name"]: i for i in p.ion_list}
    if not cfg.glia_flag:
        vol_i = vols[neuron_mask].sum()
        area = areas.sum()
        sol, _ = two_compartment_steady_state(
            p, vol_i, vol_e, area, timestep=timestep, max_time=max_time)
        (p.phi_m_init, ions["Na"]["ki_init"], ions["Na"]["ke_init"],
         ions["K"]["ki_init"], ions["K"]["ke_init"],
         ions["Cl"]["ki_init"], ions["Cl"]["ke_init"],
         p.n_init, p.m_init, p.h_init) = sol
    else:
        glia_mask = np.isin(ct, cfg.glia_tags)
        vol_i_n = vols[neuron_mask].sum()
        vol_i_g = vols[glia_mask].sum()
        neuron_fmask = np.isin(topo.membrane_tags, cfg.neuron_tags)
        glia_fmask = np.isin(topo.membrane_tags, cfg.glia_tags)
        area_n = areas[neuron_fmask].sum()
        area_g = areas[glia_fmask].sum()
        sol, _ = three_compartment_steady_state(
            p, vol_i_n, vol_i_g, vol_e, area_n, area_g,
            timestep=timestep, max_time=max_time)
        (p.phi_m_init, ions["Na"]["ki_init"], ions["Na"]["ke_init"],
         ions["K"]["ki_init"], ions["K"]["ke_init"],
         ions["Cl"]["ki_init"], ions["Cl"]["ke_init"],
         p.phi_m_g_init, ions["Na"]["ki_init_g"], ions["K"]["ki_init_g"],
         ions["Cl"]["ki_init_g"],
         p.n_init, p.m_init, p.h_init) = sol
    p.K_e_init = ions["K"]["ke_init"]
    p.K_i_g_init = ions["K"]["ki_init_g"]
    return sol
