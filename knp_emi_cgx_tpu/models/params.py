"""Physical/model parameter bundle for KNP-EMI problems.

Collects what the reference scatters across `ProblemKNPEMI.setup_constants`
(KNPEMIx_problem.py:909-981) and `read_config_file` into one plain container
whose values become jit-time constants (closure-captured — they never change
during a run, so XLA folds them).
"""
from __future__ import annotations

import dataclasses

from knp_emi_cgx_tpu.config import SimulationConfig, DEFAULT_INITIAL


@dataclasses.dataclass
class KNPEMIParams:
    # core physical constants
    F: float = 96485.0
    R: float = 8.314
    T: float = 300.0
    psi: float = 0.0258520495  # R*T/F
    C_M: float = 0.02
    dt: float = 2.5e-5
    phi_rest: float = -0.065   # KNPEMIx_problem.py:932

    # HH / stimulus conductances [S/m^2]
    g_Na_bar: float = 1200.0
    g_K_bar: float = 360.0
    g_syn_bar: float = 40.0
    a_syn: float = 5e-4
    T_stim: float = 1.0
    scale_stimulus: bool = False
    tau_syn_rise: float | None = None
    tau_syn_decay: float | None = None

    # ions: list of dicts with keys
    #   name, z, Di, De, g_leak, g_leak_g, ki_init, ke_init, ki_init_g, f_i, f_e
    ion_list: list = dataclasses.field(default_factory=list)
    ion_index: dict = dataclasses.field(default_factory=dict)

    # initial conditions
    phi_m_init: float = -0.070
    phi_m_g_init: float = -0.085
    n_init: float = DEFAULT_INITIAL["n"]
    m_init: float = DEFAULT_INITIAL["m"]
    h_init: float = DEFAULT_INITIAL["h"]

    # model thresholds needed by glial mechanisms
    K_e_init: float = 3.0
    K_i_g_init: float = 100.0

    # stimulus placement (tags/region resolved from config)
    stimulus_tags: tuple | None = None
    stimulus_region_range: object = None
    stimulus_region_directions: list | None = None

    @property
    def N_ions(self) -> int:
        return len(self.ion_list)


def params_from_config(cfg: SimulationConfig) -> KNPEMIParams:
    """Build the parameter bundle, resolving initial conditions exactly like
    the reference's `set_initial_conditions` (KNPEMIx_problem.py:326-353):
    explicit config values win; neuronal keys accept `X_i` or `X_i_n`."""
    ic = dict(DEFAULT_INITIAL)
    ic.update(cfg.initial_conditions or {})

    def ic_get(*names):
        for nm in names:
            if nm in ic and ic[nm] is not None:
                return float(ic[nm])
        raise KeyError(f"Missing initial condition: {names}")

    leaks = {
        "Na": (cfg.g_Na_leak, cfg.g_Na_leak_g),
        "K": (cfg.g_K_leak, cfg.g_K_leak_g),
        "Cl": (cfg.g_Cl_leak, cfg.g_Cl_leak_g),
    }

    ion_list = []
    for ion in cfg.ion_list:
        name = ion["name"]
        g_leak, g_leak_g = leaks.get(name, (0.0, 0.0))
        ki = ion.get("ki_init")
        ke = ion.get("ke_init")
        entry = {
            "name": name,
            "z": float(ion["z"]),
            "Di": float(ion["Di"]),
            "De": float(ion["De"]),
            "g_leak": g_leak,
            "g_leak_g": g_leak_g,
            "ki_init": float(ki) if ki is not None else ic_get(f"{name}_i", f"{name}_i_n"),
            "ke_init": float(ke) if ke is not None else ic_get(f"{name}_e"),
            "ki_init_g": float(ic.get(f"{name}_i_g", ic.get(f"{name}_i", 0.0))),
            "f_i": float(ion.get("f_i", 0.0)),
            "f_e": float(ion.get("f_e", 0.0)),
        }
        ion_list.append(entry)

    p = KNPEMIParams(
        F=cfg.F_value, R=cfg.R_value, T=cfg.T_value,
        psi=cfg.psi_value, C_M=cfg.C_M_value, dt=cfg.dt,
        g_Na_bar=cfg.g_Na_bar, g_K_bar=cfg.g_K_bar,
        g_syn_bar=cfg.g_syn_bar, a_syn=cfg.a_syn, T_stim=cfg.T_stim,
        scale_stimulus=cfg.scale_stimulus,
        tau_syn_rise=cfg.tau_syn_rise, tau_syn_decay=cfg.tau_syn_decay,
        ion_list=ion_list,
        ion_index={ion["name"]: i for i, ion in enumerate(ion_list)},
        phi_m_init=ic_get("phi_m", "phi_m_n"),
        phi_m_g_init=float(ic.get("phi_m_g", -0.085)),
        n_init=float(ic["n"]), m_init=float(ic["m"]), h_init=float(ic["h"]),
        stimulus_tags=cfg.stimulus_tags,
        stimulus_region_range=(cfg.stimulus_region_range
                               if cfg.stimulus_region else None),
        stimulus_region_directions=(cfg.stimulus_region_directions
                                    if cfg.stimulus_region else None),
    )
    if "K" in p.ion_index:
        p.K_e_init = p.ion_list[p.ion_index["K"]]["ke_init"]
        p.K_i_g_init = p.ion_list[p.ion_index["K"]]["ki_init_g"]
    return p
