"""Output orchestration for KNP-EMI runs: traces, figures, XDMF, checkpoints,
point evaluation, npy export and the end-of-run summary.

Mirrors the reference solver's output machinery (KNPEMIx_solver.py:551-867):
same flags (save_xdmf / save_pngs / save_cpoints / save_dat / save_interval),
same artefact names (v.png, gating.png, stimulus.png, iterations.png,
timings.png, phi_m.npy, n/m/h.npy, iterations.npy, assembly_time.npy,
solve_time.npy, solution.xdmf), plus resumable npz checkpoints the reference
lacks.
"""
from __future__ import annotations

import os

import numpy as np

from knp_emi_cgx_tpu.io.pointeval import PointEvaluator


def find_membrane_measurement_vertex(topo, membrane_data_tag=None,
                                     stimulus_filter=None):
    """Membrane vertex closest to the mesh bounding-box centre
    (find_membrane_point_closest_to_centroid, mixed_dim_problem.py:542-632)."""
    mesh = topo.mesh
    center = 0.5 * (mesh.points.min(axis=0) + mesh.points.max(axis=0))
    mask = np.ones(len(topo.membrane_facets), dtype=bool)
    if membrane_data_tag is not None:
        mask = topo.membrane_tags == membrane_data_tag
        if not mask.any():
            mask = np.ones(len(topo.membrane_facets), dtype=bool)
    verts = np.unique(topo.membrane_verts[mask].ravel())
    coords = mesh.points[verts]
    if stimulus_filter is not None:
        keep = stimulus_filter(coords)
        if keep.any():
            verts, coords = verts[keep], coords[keep]
    d2 = ((coords - center) ** 2).sum(axis=1)
    return int(verts[np.argmin(d2)])


class KNPEMIOutputs:
    """Attach to SolverKNPEMI.solve(...) as the per-step callback."""

    def __init__(self, problem, solver, solver_config: dict | None = None):
        self.problem = problem
        self.solver = solver
        sc = solver_config or problem.cfg.solver_config or {}
        out = sc.get("output", {}) or {}
        self.save_xdmf = bool(out.get("save_xdmf", False))
        self.save_pngs = bool(out.get("save_pngs", False))
        self.save_cpoints = bool(out.get("save_cpoints", False))
        self.save_dat = bool(out.get("save_dat", False))
        self.save_interval = int(out.get("save_interval", 20))
        self.out_dir = problem.cfg.output_dir
        os.makedirs(self.out_dir, exist_ok=True)

        topo = problem.topo
        self.png_vertex = find_membrane_measurement_vertex(
            topo, problem.cfg.membrane_data_tag)
        self.v_t: list[float] = []
        self.n_t: list[float] = []
        self.m_t: list[float] = []
        self.h_t: list[float] = []
        self.times: list[float] = []

        cfg = problem.cfg
        self._pe_ics = self._pe_ecs = self._pe_gamma = None
        if cfg.point_evaluation:
            mesh = topo.mesh
            self._pe_ics = PointEvaluator(mesh, cfg.ics_points)
            self._pe_ecs = PointEvaluator(mesh, cfg.ecs_points)
            gp = cfg.gamma_points
            if gp is None:
                gp = mesh.points[self.png_vertex][None, :]
            self._pe_gamma = PointEvaluator(mesh, gp)
            self.ics_vals: list[np.ndarray] = []
            self.ecs_vals: list[np.ndarray] = []
            self.gamma_vals: list[np.ndarray] = []

        self._writer = None
        if self.save_xdmf:
            from knp_emi_cgx_tpu.io.xdmf_impl import XDMFWriter

            self._writer = XDMFWriter(
                os.path.join(self.out_dir, "solution.xdmf"), topo.mesh)

        self._field_names = []
        a = problem.assembler
        for k, ion in enumerate(problem.params.ion_list):
            self._field_names.append((k, f"{ion['name']}_i"))
        self._field_names.append((a.PHI_I, "phi_i"))
        for k, ion in enumerate(problem.params.ion_list):
            self._field_names.append((a.nvar + k, f"{ion['name']}_e"))
        self._field_names.append((a.PHI_E, "phi_e"))

    # ------------------------------------------------------------------
    def record_initial(self, state):
        self._record_traces(state)
        if self._writer is not None:
            self._write_xdmf(state)

    def __call__(self, i, state):
        self._record_traces(state)
        if self._writer is not None and i % self.save_interval == 0:
            self._write_xdmf(state)
        if self.save_cpoints and i % self.save_interval == 0:
            from knp_emi_cgx_tpu.io.checkpoint import save_state

            save_state(os.path.join(self.out_dir, f"checkpoint_{i:06d}.npz"),
                       state, mesh=self.problem.topo.mesh, step=i,
                       config=self.problem.cfg)

    def _record_traces(self, state):
        v = float(np.asarray(state.phi_m[self.png_vertex]))
        self.v_t.append(1000.0 * v)
        self.times.append(float(state.t) * 1000.0)
        if self.problem.gating_variables:
            self.n_t.append(float(np.asarray(state.n[self.png_vertex])))
            self.m_t.append(float(np.asarray(state.m[self.png_vertex])))
            self.h_t.append(float(np.asarray(state.h[self.png_vertex])))
        if self._pe_ics is not None:
            # vertex prefix: for fem_order=2 the state lives on the node
            # space (vertices first) — writers/point-eval are vertex-based
            nV = self.problem.topo.mesh.num_points
            u = np.asarray(state.u)[:, :nV]
            a = self.problem.assembler
            nvar = a.nvar
            self.ics_vals.append(self._pe_ics(u[:nvar]))
            self.ecs_vals.append(self._pe_ecs(u[nvar:]))
            self.gamma_vals.append(
                self._pe_gamma(np.asarray(state.phi_m)[:nV]))

    def _write_xdmf(self, state):
        nV = self.problem.topo.mesh.num_points
        u = np.asarray(state.u)[:, :nV]
        fields = {name: u[f] for f, name in self._field_names}
        fields["phi_m"] = np.asarray(state.phi_m)[:nV]
        self._writer.write_fields(float(state.t), fields)

    # ------------------------------------------------------------------
    def finalize(self):
        if self._writer is not None:
            self._writer.close()
        if self.save_pngs:
            self.print_figures()
        if self.save_dat:
            self.export_data()

    def print_figures(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        times = np.asarray(self.times)
        fig, ax = plt.subplots()
        ax.plot(times, self.v_t)
        ax.set_xlabel("Time [ms]")
        ax.set_ylabel("Membrane potential [mV]")
        fig.savefig(os.path.join(self.out_dir, "v.png"))
        plt.close(fig)

        if self.n_t:
            fig, ax = plt.subplots()
            for vals, label in ((self.n_t, "n"), (self.m_t, "m"), (self.h_t, "h")):
                ax.plot(times, vals, label=label)
            ax.set_xlabel("Time [ms]")
            ax.legend()
            fig.savefig(os.path.join(self.out_dir, "gating.png"))
            plt.close(fig)

        solver = self.solver
        if solver.iterations:
            fig, ax = plt.subplots()
            ax.plot(solver.iterations)
            ax.set_xlabel("Timestep")
            ax.set_ylabel("Number of iterations")
            fig.savefig(os.path.join(self.out_dir, "iterations.png"))
            plt.close(fig)

        fig, ax = plt.subplots()
        ax.plot(solver.solve_time, label="solve")
        ax.set_xlabel("Timestep")
        ax.set_ylabel("Time [s]")
        ax.legend()
        fig.savefig(os.path.join(self.out_dir, "timings.png"))
        plt.close(fig)

        if self._pe_ics is not None:
            ics = np.asarray(self.ics_vals)   # [T, nvar, npts]
            ecs = np.asarray(self.ecs_vals)
            for k, ion in enumerate(self.problem.params.ion_list):
                fig, ax1 = plt.subplots()
                ax2 = ax1.twinx()
                ax1.plot(times, ics[:, k, :], color="tab:blue")
                ax2.plot(times, ecs[:, k, :], "--", color="tab:red")
                ax1.set_xlabel("Time [ms]")
                ax1.set_ylabel(f"ICS {ion['name']} [mM]", color="tab:blue")
                ax2.set_ylabel(f"ECS {ion['name']} [mM]", color="tab:red")
                fig.savefig(os.path.join(
                    self.out_dir, f"point_evaluation_{ion['name']}.png"))
                plt.close(fig)
            gamma = np.asarray(self.gamma_vals)
            fig, ax = plt.subplots()
            ax.plot(times, 1e3 * gamma, color="green")
            ax.set_xlabel("Time [ms]")
            ax.set_ylabel("Membrane potential [mV]")
            fig.savefig(os.path.join(self.out_dir, "point_evaluation_phi_m.png"))
            plt.close(fig)

    def export_data(self):
        np.save(os.path.join(self.out_dir, "phi_m.npy"), np.asarray(self.v_t))
        if self.n_t:
            np.save(os.path.join(self.out_dir, "n.npy"), np.asarray(self.n_t))
            np.save(os.path.join(self.out_dir, "m.npy"), np.asarray(self.m_t))
            np.save(os.path.join(self.out_dir, "h.npy"), np.asarray(self.h_t))
        solver = self.solver
        np.save(os.path.join(self.out_dir, "solve_time.npy"),
                np.asarray(solver.solve_time))
        if solver.iterations:
            np.save(os.path.join(self.out_dir, "iterations.npy"),
                    np.asarray(solver.iterations))
        if self._pe_ics is not None:
            np.save(os.path.join(self.out_dir, "ics_point_values.npy"),
                    np.asarray(self.ics_vals))
            np.save(os.path.join(self.out_dir, "ecs_point_values.npy"),
                    np.asarray(self.ecs_vals))
            np.save(os.path.join(self.out_dir, "gamma_point_values.npy"),
                    np.asarray(self.gamma_vals))

    def print_info(self):
        """End-of-run summary (print_info, KNPEMIx_solver.py:504-548)."""
        p = self.problem
        a = p.assembler
        solver = self.solver
        print("\n#------------ PROBLEM -------------#")
        print(f"Global # mesh cells = {p.topo.mesh.num_cells}")
        print(f"System size (global # dofs) = {a.n_dofs}")
        print(f"FEM order = {p.cfg.fem_order}")
        print(f"# Time steps = {solver.time_steps}")
        print(f"dt = {p.params.dt}")
        print("Using Dirichlet BCs." if p.cfg.dirichlet_bcs
              else "Using Neumann BCs.")
        print("\n#------------ SOLVER -------------#")
        if solver.direct:
            print("Using direct (deflated dense) solver.")
        else:
            print(f"Solver: GMRES + block-diagonal P ({solver.pc_mode})")
            print(f"Tolerance: {solver.rtol:.2e}")
            if solver.iterations:
                print("Average iterations: "
                      f"{sum(solver.iterations) / len(solver.iterations)}")
        print(f"Total solve time: {sum(solver.solve_time):.4f} s")


class EMIOutputs:
    """Per-step output recorder for SolverEMI — the EMI counterpart of
    KNPEMIOutputs (reference: the EMI solver's XDMF/png/npy paths,
    EMIx_solver.py:313-346,348-420): phi_i/phi_e/phi_m XDMF snapshots on
    the save_interval cadence, the membrane-potential trace at the
    measurement vertex, and npy export."""

    def __init__(self, problem, solver, solver_config: dict | None = None):
        self.problem = problem
        self.solver = solver
        sc = solver_config or problem.cfg.solver_config or {}
        out = sc.get("output", {}) or {}
        self.save_xdmf = bool(out.get("save_xdmf", False))
        self.save_pngs = bool(out.get("save_pngs", False))
        self.save_dat = bool(out.get("save_dat", False))
        self.save_interval = int(out.get("save_interval", 20))
        self.out_dir = problem.cfg.output_dir
        os.makedirs(self.out_dir, exist_ok=True)

        self.png_vertex = find_membrane_measurement_vertex(
            problem.topo, problem.cfg.membrane_data_tag)
        self.v_t: list[float] = []
        self.times: list[float] = []

        self._writer = None
        if self.save_xdmf:
            from knp_emi_cgx_tpu.io.xdmf_impl import XDMFWriter

            self._writer = XDMFWriter(
                os.path.join(self.out_dir, "solution.xdmf"),
                problem.topo.mesh)

    def record_initial(self, state):
        self._record(0, state, force=True)

    def __call__(self, i, state):
        self._record(i, state)

    def _record(self, i, state, force=False):
        v = float(np.asarray(state.phi_m[self.png_vertex]))
        self.v_t.append(1000.0 * v)
        self.times.append(float(state.t) * 1000.0)
        if self._writer is not None and (force or i % self.save_interval == 0):
            # vertex prefix (fem_order=2 states live on the node space)
            nV = self.problem.topo.mesh.num_points
            phi = np.asarray(state.phi)[:, :nV]
            self._writer.write_fields(float(state.t), {
                "phi_i": phi[0], "phi_e": phi[1],
                "phi_m": np.asarray(state.phi_m)[:nV]})

    def finalize(self):
        if self._writer is not None:
            self._writer.close()
        if self.save_pngs:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 4))
            ax.plot(self.times, self.v_t)
            ax.set_xlabel("time (ms)")
            ax.set_ylabel("membrane potential (mV)")
            fig.savefig(os.path.join(self.out_dir, "phi_m.png"), dpi=120)
            plt.close(fig)
        if self.save_dat:
            np.save(os.path.join(self.out_dir, "phi_m.npy"),
                    np.asarray(self.v_t))
            np.save(os.path.join(self.out_dir, "times.npy"),
                    np.asarray(self.times))
            if self.solver.iterations:
                np.save(os.path.join(self.out_dir, "iterations.npy"),
                        np.asarray(self.solver.iterations))
