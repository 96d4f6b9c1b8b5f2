"""Emit the full dense-tissue config grid — analogs of every reference
tissue config (`/root/reference/src/CGx/KNPEMI/configs/{5m,10m,20m,30m}/
*.yaml`, 35 files) with meshes generated in-process instead of read from
the cluster filesystem.

The reference grid has two regimes (visible in its dt/C_M/source pattern):
  * <=50-cell configs: ion-injection studies — dt 50 us, C_M 0.02,
    `source_terms: ion_injection`, no synaptic stimulus (e.g. 10m/25c.yaml)
  * >=100-cell configs: synaptic-stimulus production runs — dt 25 us,
    C_M 0.01, g_syn stimulus on a mid-box cell (e.g. 30m/100c.yaml)
plus per-file time_steps quirks, reproduced from the table below.

Existing files are never overwritten (the hand-tuned production configs
keep their provenance comments).

Usage: python scripts/make_tissue_configs.py [--dry]
"""
from __future__ import annotations

import argparse
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "tissue")

# box -> (mesh N, conversion factor [m])
BOX = {"5m": (32, 5e-6), "10m": (64, 1e-5), "20m": (64, 2e-5),
       "30m": (80, 3e-5)}

# cells per box directory (the reference's exact grid)
CELLS = {
    "5m": [5, 10, 25, 50, 100, 200],
    "10m": [5, 10, 25, 50, 100, 200, 300, 400, 500],
    "20m": [5, 10, 25, 50, 100, 200, 300, 400, 500, 1000],
    "30m": [5, 10, 25, 50, 100, 200, 300, 400, 500, 1000],
}

# per-file time_steps overrides (reference values; default: stim 200/inj 500)
TS_OVERRIDE = {("5m", 5): 50, ("5m", 10): 40, ("5m", 100): 100,
               ("10m", 10): 10, ("20m", 10): 50, ("30m", 10): 50}

# 10-25-cell+ stimulus exceptions: the reference's 5m/10c is a stimulus
# config despite its size (dt 5e-5, C_M 0.02, stim tag 5)
FORCE_STIM = {("5m", 10)}

IC_NEURON = """\
initial_conditions :
  phi_m_n : -0.071476574037297763
  Na_i_n : 10.268351217499580130
  Na_e : 144.740072668359516683
  K_i_n : 129.811642546718417179
  K_e : 3.049044160053175467
  Cl_i_n : 5.081337524756735391
  Cl_e : 133.785333554356469676
  n : 0.224681342597906120
  m : 0.024051779454228470
  h : 0.792151725333791079
"""

IC_NEURON_GLIA = """\
initial_conditions :
  phi_m_n : -0.07147657403729776
  Na_i_n : 10.26835121749958
  Na_e : 144.74007266835952
  K_i_n : 129.81164254671842
  K_e : 3.0490441600531755
  Cl_i_n : 5.081337524756735
  Cl_e : 133.78533355435647
  phi_m_g : -0.08499682130774006
  Na_i_g : 13.543440659897849
  K_i_g : 101.41417302883353
  Cl_i_g : 4.957608889044861
  n : 0.22468134259790612
  m : 0.02405177945422847
  h : 0.7921517253337911
"""


def render(box: str, n_cells: int) -> str:
    n_mesh, conv = BOX[box]
    stim = n_cells >= 100 or (box, n_cells) in FORCE_STIM
    if stim:
        dt, c_m = 2.5e-05, 0.01
        ts = TS_OVERRIDE.get((box, n_cells), 200)
    else:
        dt, c_m = 5e-05, 0.02
        ts = TS_OVERRIDE.get((box, n_cells), 500)
    if (box, n_cells) in FORCE_STIM:          # 5m/10c quirk
        dt, c_m = 5e-05, 0.02
    spec = f"generate:tissue{n_mesh}x{n_cells}c"
    hi = n_cells + 2
    lines = [
        f"# Dense-tissue grid config ({box} box, {n_cells} cells) — "
        f"reference configs/{box}/{n_cells}c.yaml analog",
        f"# ({'synaptic-stimulus production run' if stim else 'ion-injection study'}; "
        f"mesh generated in-process: {n_mesh}^3x6 tets).",
        'problem_type : "KNP-EMI"',
        "",
        f'output_dir : "output/tissue_{box}_{n_cells}c"',
        "",
        f"dt : {dt}",
        f"time_steps : {ts}",
        "",
        "physical_constants:",
        "  T : 300",
        "  F : 96485",
        "  R : 8.314",
        "",
        f"C_M : {c_m}",
        "",
        f'mesh_file      : "{spec}"',
        f'cell_tag_file  : "{spec}"',
        f'facet_tag_file : "{spec}"',
        f"mesh_conversion_factor : {conv}",
        "",
        f"ics_tags  : !range [2, {hi}]",
        "ecs_tags  : [1]",
        "boundary_tags : [1001]",
        f"membrane_tags : !range [2, {hi}]",
    ]
    glia = list(range(26, hi, 25)) if stim else []   # every 25th cell
    if stim:
        mid = 2 + n_cells // 2
        lines += [
            *( [f"glia_tags : {glia}"] if glia else [] ),
            f"stimulus_tags : [{mid}]",
            f"membrane_data_tag : {mid}",
            "",
            "stimulus :",
            "  conductance :",
            "    g_syn_bar : 500",
            "  a_syn : 5e-4",
            "  T_stim : 20e-3",
            "  scale : False",
        ]
    else:
        lines += [
            "stimulus_tags : []",
            "",
            'source_terms : "ion_injection"',
        ]
    lines += [
        "",
        "solver :",
        "  direct : False",
        "  ksp_settings :",
        "    ksp_rtol : 1e-9",
        "    pc_mode : amg",
        "    precision : df32",
        "    warm_start : extrapolated",
        "  output :",
        "    save_xdmf : False",
        "    save_cpoints : False",
        "    save_pngs : True",
        "    save_dat : True",
        "    save_interval : 10",
        "",
        IC_NEURON_GLIA if glia else IC_NEURON,
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()
    written, skipped = [], []
    for box, counts in CELLS.items():
        for c in counts:
            path = os.path.join(OUT, f"{box}_{c}c.yaml")
            if os.path.exists(path):
                skipped.append(os.path.basename(path))
                continue
            if args.dry:
                written.append(os.path.basename(path))
                continue
            with open(path, "w") as f:
                f.write(render(box, c))
            written.append(os.path.basename(path))
    print(f"wrote {len(written)}: {written}")
    print(f"kept existing {len(skipped)}: {skipped}")


if __name__ == "__main__":
    main()
