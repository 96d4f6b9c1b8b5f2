"""YAML configuration parsing — schema-compatible with the reference CGx
(`mixed_dim_problem.py:86-374`), so reference config files run unmodified.

Supports the custom ``!range`` tag (misc.py:33-37), the full key set
(problem_type, dt, time_steps|T, physical_constants, C_M, mesh/tag files,
ics/ecs/boundary/membrane/glia/stimulus tags, mesh_conversion_factor,
fem_order, dirichlet_bcs, MMS_test, sigma_i/sigma_e, ion_species,
source_terms, point_evaluation, stimulus{conductance...}, stimulus_region,
initial_conditions, membrane_data_tag, solver{direct, view_ksp,
ksp_settings{...}, output{...}}), and the same defaults.
"""
from __future__ import annotations

import dataclasses
import os
import pathlib
from typing import Any

import numpy as np
import yaml


def _range_constructor(loader, node):
    """Handle `!range` in YAML configs (reference misc.py:33-37)."""
    args = loader.construct_sequence(node)
    return list(range(*args))


yaml.add_constructor("!range", _range_constructor, Loader=yaml.FullLoader)


# Default diffusivities [m^2/s] (KNPEMIx_problem.py:929-931)
DEFAULT_IONS = {
    "Na": {"z": 1.0, "D": 1.33e-9},
    "K": {"z": 1.0, "D": 1.96e-9},
    "Cl": {"z": -1.0, "D": 2.03e-9},
}

# Default initial conditions (KNPEMIx_problem.py:940-966)
DEFAULT_INITIAL = {
    "phi_m": -0.070,
    "Na_i": 10.0, "Na_e": 145.0,
    "K_i": 130.0, "K_e": 3.0,
    "Cl_i": 5.0, "Cl_e": 134.0,
    "n": 0.24458654944007155,
    "m": 0.028905534475191896,
    "h": 0.7540796658225248,
    # glial variants (KNPEMIx_problem.py:954-961)
    "phi_m_g": -0.085,
    "Na_i_g": 15.0, "K_i_g": 100.0, "Cl_i_g": 5.0,
}

# Conductance defaults WITH a stimulus block (mixed_dim_problem.py:311-318)
STIM_COND_DEFAULTS = {
    "g_Na_bar": 1200.0, "g_K_bar": 360.0,
    "g_Na_leak": 0.3, "g_Na_leak_g": 1.0,
    "g_K_leak": 0.1, "g_K_leak_g": 16.96,
    "g_Cl_leak": 0.25, "g_Cl_leak_g": 2.0,
}

# Defaults WITHOUT a stimulus block (mixed_dim_problem.py:319-332)
NO_STIM_DEFAULTS = {
    "g_syn_bar": 40.0, "a_syn": 5e-4, "T_stim": 1.0, "scale": False,
    "g_Na_bar": 1200.0, "g_K_bar": 360.0,
    "g_Na_leak": 1.0, "g_Na_leak_g": 1.0,
    "g_K_leak": 4.0, "g_K_leak_g": 16.96,
    "g_Cl_leak": 0.25, "g_Cl_leak_g": 0.50,
}

AXES = {"x": 0, "y": 1, "z": 2}


@dataclasses.dataclass
class SimulationConfig:
    """Parsed configuration. Field names track the reference attributes."""

    problem_type: str = "KNP-EMI"
    dt: float = 1e-5
    time_steps: int = 1

    # physical constants
    T_value: float = 1.0
    R_value: float = 1.0
    F_value: float = 1.0
    psi_value: float = 1.0
    C_M_value: float = 1.0

    # mesh
    input_dir: str = "./"
    output_dir: str = "./output/"
    mesh_file: str | None = None
    facet_file: str | None = None
    mesh_conversion_factor: float = 1.0
    fem_order: int = 1

    # tags
    intra_tags: tuple = (1,)
    extra_tag: tuple = (2,)
    boundary_tags: tuple = (3,)
    gamma_tags: tuple = (4,)
    stimulus_tags: tuple = (4,)
    glia_tags: tuple | None = None
    neuron_tags: tuple = (1,)
    glia_flag: bool = False
    membrane_data_tag: int = 4

    # BCs / verification
    dirichlet_bcs: bool = False
    pin_ecs_potential: bool = False
    mms_test: bool = False
    mms_n_mesh: int = 16
    mms_dim: int = 2

    # EMI conductivities
    sigma_i: float = 1.0
    sigma_e: float = 1.0

    # ions: list of dicts {name, z, Di, De, ki_init, ke_init, f_i, f_e}
    ion_list: list = dataclasses.field(default_factory=list)

    # source terms & points
    source_terms: str | None = None
    point_evaluation: bool = False
    ics_points: np.ndarray | None = None
    ecs_points: np.ndarray | None = None
    gamma_points: np.ndarray | None = None

    # stimulus
    g_syn_bar: float = 40.0
    a_syn: float = 5e-4
    T_stim: float = 1.0
    scale_stimulus: bool = False
    tau_syn_rise: float | None = None
    tau_syn_decay: float | None = None
    g_Na_bar: float = 1200.0
    g_K_bar: float = 360.0
    g_Na_leak: float = 1.0
    g_Na_leak_g: float = 1.0
    g_K_leak: float = 4.0
    g_K_leak_g: float = 16.96
    g_Cl_leak: float = 0.25
    g_Cl_leak_g: float = 0.50

    # stimulus region
    stimulus_region: bool = False
    stimulus_region_range: np.ndarray | None = None
    stimulus_region_directions: list = dataclasses.field(default_factory=list)
    multiple_stimulus_directions: bool = False

    # initial conditions
    initial_conditions: dict = dataclasses.field(default_factory=dict)
    find_initial_conditions: bool = False

    # solver
    solver_config: dict = dataclasses.field(default_factory=dict)

    raw: dict = dataclasses.field(default_factory=dict)


def load_config(config_file: str | os.PathLike) -> SimulationConfig:
    with open(config_file, "r") as fh:
        config = yaml.load(fh, Loader=yaml.FullLoader)
    return parse_config(config, base_dir=os.path.dirname(str(config_file)))


def parse_config(config: dict[str, Any], base_dir: str = ".") -> SimulationConfig:
    c = SimulationConfig(raw=config)
    c.problem_type = config.get("problem_type", "KNP-EMI")

    if "solver" not in config:
        raise RuntimeError("Provide solver configuration in input file.")
    c.solver_config = config["solver"]

    input_dir = config.get("input_dir", "./")
    c.input_dir = input_dir
    if "output_dir" in config:
        c.output_dir = config["output_dir"]
        pathlib.Path(c.output_dir).mkdir(parents=True, exist_ok=True)

    if "cell_tag_file" in config and "facet_tag_file" in config:
        c.mesh_file = os.path.join(input_dir, config["cell_tag_file"])
        c.facet_file = os.path.join(input_dir, config["facet_tag_file"])
    elif "mesh_file" in config:
        # superset of the reference schema: a standalone mesh_file key
        # (the reference requires the cell/facet tag-file pair,
        # mixed_dim_problem.py:107-112; generated-mesh specs don't)
        c.mesh_file = os.path.join(input_dir, config["mesh_file"])
        if "facet_tag_file" in config:
            c.facet_file = os.path.join(input_dir, config["facet_tag_file"])

    if "dt" not in config:
        raise RuntimeError("Provide dt (timestep size) field in input file.")
    c.dt = float(config["dt"])
    if "time_steps" in config:
        c.time_steps = int(config["time_steps"])
    elif "T" in config:
        c.time_steps = int(float(config["T"]) / c.dt)
    else:
        raise RuntimeError("Provide final time T or time_steps field in input file.")

    # --- tags ---
    if "ics_tags" not in config:
        raise RuntimeError("Provide ics_tags field in input file.")
    c.intra_tags = tuple(np.atleast_1d(config["ics_tags"]).tolist())
    c.extra_tag = tuple(np.atleast_1d(config.get("ecs_tags", [1])).tolist())
    c.boundary_tags = tuple(np.atleast_1d(config.get("boundary_tags", [1])).tolist())
    c.gamma_tags = tuple(np.atleast_1d(config.get("membrane_tags", config["ics_tags"])).tolist())
    c.stimulus_tags = tuple(np.atleast_1d(config.get("stimulus_tags", list(c.gamma_tags))).tolist())
    if "glia_tags" in config:
        c.glia_tags = tuple(np.atleast_1d(config["glia_tags"]).tolist())
        c.glia_flag = len(c.glia_tags) > 0
        c.neuron_tags = tuple(t for t in c.intra_tags if t not in c.glia_tags)
    else:
        c.neuron_tags = c.intra_tags

    # --- physical constants ---
    if "physical_constants" in config:
        consts = config["physical_constants"]
        c.T_value = float(consts.get("T", 1.0))
        c.R_value = float(consts.get("R", 1.0))
        c.F_value = float(consts.get("F", 1.0))
        c.psi_value = c.R_value * c.T_value / c.F_value
    c.C_M_value = float(config.get("C_M", 1.0))
    c.mesh_conversion_factor = float(config.get("mesh_conversion_factor", 1.0))
    c.fem_order = int(config.get("fem_order", 1))
    if c.fem_order not in (1, 2):
        # advertised schema surface must not silently no-op: P1/P2 exist
        # (the reference parses fem_order too but all its configs use 1 and
        # order>1 silently no-ops there, mixed_dim_problem.py:207-208; our
        # fem/p2.py makes order 2 actually work)
        raise RuntimeError(
            f"fem_order={c.fem_order} is not supported (P1/P2 only)")
    c.dirichlet_bcs = bool(config.get("dirichlet_bcs", False))
    c.pin_ecs_potential = bool(config.get("pin_ecs_potential", False))

    if "MMS_test" in config:
        c.mms_test = True
        c.dirichlet_bcs = True
        c.mms_n_mesh = int(config["MMS_test"]["N_mesh"])
        c.mms_dim = int(config["MMS_test"]["dim"])

    c.sigma_i = float(config.get("sigma_i", 1.0))
    c.sigma_e = float(config.get("sigma_e", 1.0))

    # --- ions ---
    if "ion_species" in config:
        for name, p in config["ion_species"].items():
            for key in ("valence", "diffusivity", "initial"):
                if key not in p:
                    raise RuntimeError(f"{key} of ion {name} must be provided.")
            ion = {
                "name": name,
                "z": float(p["valence"]),
                "Di": float(p["diffusivity"]),
                "De": float(p["diffusivity"]),
                "ki_init": float(p["initial"]["ics"]),
                "ke_init": float(p["initial"]["ecs"]),
                "f_i": float(p.get("source", {}).get("ics", 0.0)),
                "f_e": float(p.get("source", {}).get("ecs", 0.0)),
            }
            c.ion_list.append(ion)
    elif c.problem_type == "KNP-EMI":
        # Default 3-ion setup; init values filled from initial_conditions later.
        for name, d in DEFAULT_IONS.items():
            c.ion_list.append({
                "name": name, "z": d["z"], "Di": d["D"], "De": d["D"],
                "ki_init": None, "ke_init": None, "f_i": 0.0, "f_e": 0.0,
            })

    c.source_terms = config.get("source_terms", None)

    if "point_evaluation" in config:
        c.point_evaluation = True
        pe = config["point_evaluation"]
        c.ics_points = np.asarray(pe["ics_points"], dtype=float) * c.mesh_conversion_factor
        c.ecs_points = np.asarray(pe["ecs_points"], dtype=float) * c.mesh_conversion_factor
        if "gamma_points" in pe:
            c.gamma_points = np.asarray(pe["gamma_points"], dtype=float) * c.mesh_conversion_factor

    # --- stimulus ---
    if "stimulus" in config:
        stim = config["stimulus"]
        if "conductance" not in stim:
            raise RuntimeError("Provide conductance dictionary in stimulus config.")
        g = stim["conductance"]
        c.g_syn_bar = float(g["g_syn_bar"])
        c.a_syn = float(stim["a_syn"])
        c.T_stim = float(stim["T_stim"])
        if "tau_syn_rise" in stim or "tau_syn_decay" in stim:
            c.tau_syn_rise = float(stim["tau_syn_rise"])
            c.tau_syn_decay = float(stim["tau_syn_decay"])
        if "scale" not in stim:
            raise RuntimeError("Provide whether to scale stimulus strength in config.")
        c.scale_stimulus = bool(stim["scale"])
        for key, default in STIM_COND_DEFAULTS.items():
            setattr(c, key, float(g.get(key, default)))
    else:
        for key, default in NO_STIM_DEFAULTS.items():
            attr = {"scale": "scale_stimulus"}.get(key, key)
            setattr(c, attr, default)

    if "stimulus_region" in config:
        sr = config["stimulus_region"]
        c.stimulus_region = True
        c.stimulus_region_range = np.asarray(sr["range"], dtype=float) * c.mesh_conversion_factor
        if sr.get("multiple", False):
            c.multiple_stimulus_directions = True
            c.stimulus_region_directions = [AXES[str(d)] for d in sr["direction"]]
        else:
            c.stimulus_region_directions = [AXES[str(sr["direction"])]]

    # --- initial conditions ---
    if "initial_conditions" in config:
        c.initial_conditions = dict(config["initial_conditions"])
        c.find_initial_conditions = False
    else:
        c.initial_conditions = {}
        c.find_initial_conditions = True

    if "membrane_data_tag" in config:
        c.membrane_data_tag = int(config["membrane_data_tag"])
    else:
        c.membrane_data_tag = (c.stimulus_tags or c.gamma_tags)[0]

    return c
