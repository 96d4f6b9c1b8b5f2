"""Method-of-manufactured-solutions verification for KNP-EMI.

Replicates the reference's symbolic MMS machinery
(`utils/setup_mms.py:15-157`), but derives everything once with sympy on the
host and lambdifies to jax.numpy so the time-dependent source terms evaluate
INSIDE the jitted step at the traced time (the reference re-evaluates UFL
coefficients through FFCx at each assembly).

Exact fields (setup_mms.py:29-74), with all physical constants equal to one
(`setup_MMS_params` asserts this, KNPEMIx_problem.py:750):

    2D: s(x,y,t) = sin(2 pi x) sin(2 pi y) exp(-t),  p = cos(2 pi x) cos(2 pi y)
    Na_i = 0.7+0.3 s   Na_e = 1.0+0.6 s
    K_i  = 0.3+0.3 s   K_e  = 1.0+0.2 s
    Cl_i = 1.0+0.6 s   Cl_e = 2.0+0.8 s
    phi_i = p (1+exp(-t)),  phi_e = p

Sources follow setup_mms.py:92-137: per-species f = dk/dt + div(J) with
J = -grad(k) - z k grad(phi); potential sources f_phi = -sum z div(J);
membrane corrections f_phi_k = d(phi_m)/dt + Ich_k - n.(sum z J_k_i) and
f_gamma = n.(sum z J_k_i) - n.(sum z J_k_e), with n the membrane normal
pointing OUT of the intracellular compartment ('+' side).
"""
from __future__ import annotations

import numpy as np
import sympy as sp
import jax.numpy as jnp


_JNP_MODULE = {
    "sin": jnp.sin, "cos": jnp.cos, "exp": jnp.exp, "pi": np.pi,
    "sqrt": jnp.sqrt, "log": jnp.log,
}


class _SymbolicMMS:
    """Shared sympy→jnp lambdification machinery (scalar/vector fields of
    (x[,y,z], t)).  Subclasses populate `_scalars`, `_vectors`, `exact_sym`."""

    def _setup_coords(self, dim: int):
        self.dim = dim
        self._t = sp.Symbol("t")
        self._xs = sp.symbols("x y") if dim == 2 else sp.symbols("x y z")
        self._fn_cache = {}
        return self._t, self._xs

    def _lambdify(self, expr):
        return sp.lambdify((*self._xs, self._t), expr,
                           modules=[_JNP_MODULE, jnp])

    def scalar(self, name):
        """Return callable(pts, t) -> array; pts shape [..., dim]."""
        if ("s", name) not in self._fn_cache:
            self._fn_cache[("s", name)] = self._lambdify(self._scalars[name])
        f = self._fn_cache[("s", name)]

        def call(pts, t):
            coords = [pts[..., d] for d in range(self.dim)]
            out = f(*coords, t)
            return jnp.broadcast_to(out, pts.shape[:-1])

        return call

    def vector(self, name):
        """Return callable(pts, t) -> array [..., dim]."""
        if ("v", name) not in self._fn_cache:
            self._fn_cache[("v", name)] = [
                self._lambdify(c) for c in self._vectors[name]]
        fs = self._fn_cache[("v", name)]

        def call(pts, t):
            coords = [pts[..., d] for d in range(self.dim)]
            comps = [jnp.broadcast_to(f(*coords, t), pts.shape[:-1])
                     for f in fs]
            return jnp.stack(comps, axis=-1)

        return call

    def exact_numpy(self, name, pts, t):
        """Host evaluation of an exact field (for ICs / errors)."""
        f = sp.lambdify((*self._xs, self._t), self.exact_sym[name],
                        modules="numpy")
        coords = [pts[..., d] for d in range(self.dim)]
        return np.broadcast_to(f(*coords, t), pts.shape[:-1]).astype(float)


class KNPEMIMMS(_SymbolicMMS):
    ION_NAMES = ("Na", "K", "Cl")
    ZS = {"Na": 1, "K": 1, "Cl": -1}

    def __init__(self, dim: int):
        t, xs = self._setup_coords(dim)
        if dim == 2:
            s = sp.sin(2 * sp.pi * xs[0]) * sp.sin(2 * sp.pi * xs[1]) * sp.exp(-t)
            p = sp.cos(2 * sp.pi * xs[0]) * sp.cos(2 * sp.pi * xs[1])
        else:
            s = (sp.sin(2 * sp.pi * xs[0]) * sp.sin(2 * sp.pi * xs[1])
                 * sp.sin(2 * sp.pi * xs[2]) * sp.exp(-t))
            p = (sp.cos(2 * sp.pi * xs[0]) * sp.cos(2 * sp.pi * xs[1])
                 * sp.cos(2 * sp.pi * xs[2]))

        exact = {
            "Na_i": 0.7 + 0.3 * s, "Na_e": 1.0 + 0.6 * s,
            "K_i": 0.3 + 0.3 * s, "K_e": 1.0 + 0.2 * s,
            "Cl_i": 1.0 + 0.6 * s, "Cl_e": 2.0 + 0.8 * s,
            "phi_i": p * (1 + sp.exp(-t)), "phi_e": p,
        }
        self.exact_sym = exact
        phi_m = exact["phi_i"] - exact["phi_e"]

        def grad(f):
            return [sp.diff(f, c) for c in xs]

        def div(v):
            return sum(sp.diff(v[i], xs[i]) for i in range(dim))

        J = {}
        for name in self.ION_NAMES:
            z = self.ZS[name]
            for side in ("i", "e"):
                k = exact[f"{name}_{side}"]
                phi = exact[f"phi_{side}"]
                J[f"{name}_{side}"] = [
                    -g - z * k * gp for g, gp in zip(grad(k), grad(phi))]

        sources = {}
        for name in self.ION_NAMES:
            for side in ("i", "e"):
                key = f"{name}_{side}"
                sources[f"f_{key}"] = sp.diff(exact[key], t) + div(J[key])
        sources["f_phi_i"] = -sum(
            self.ZS[n] * div(J[f"{n}_i"]) for n in self.ION_NAMES)
        sources["f_phi_e"] = -sum(
            self.ZS[n] * div(J[f"{n}_e"]) for n in self.ION_NAMES)

        # vector fluxes needed on facets / boundary
        total_flux_intra = [
            sum(self.ZS[n] * J[f"{n}_i"][d] for n in self.ION_NAMES)
            for d in range(dim)]
        total_flux_extra_vec = [
            sum(self.ZS[n] * J[f"{n}_e"][d] for n in self.ION_NAMES)
            for d in range(dim)]

        # scalar pieces of the membrane corrections (setup_mms.py:122-137);
        # Ich_k = phi_m (PassiveModel)
        dphi_m_dt = sp.diff(phi_m, t)
        self._scalars = dict(sources)
        self._scalars.update(exact)
        self._scalars["dphi_m_dt"] = dphi_m_dt
        self._scalars["phi_m"] = phi_m

        self._vectors = {"total_flux_intra": total_flux_intra,
                         "total_flux_extra": total_flux_extra_vec}
        for name in self.ION_NAMES:
            self._vectors[f"J_{name}_e"] = J[f"{name}_e"]


class EMIMMS(_SymbolicMMS):
    """Manufactured solutions for the 2-field EMI system.

    The reference's EMI MMS driver is broken (stale imports, SURVEY §2.1);
    its working verification is the hardcoded sin·sin solution in
    `EMI/tests/square_test.py`.  Here the same exact fields are derived
    symbolically — sources via -div(sigma grad u), membrane correction for
    the passive model via g = C_M dphi_m/dt + phi_m - (-sigma_i grad(ui)·n)
    — so any exact solution / conductivity can be dropped in.

    Defaults reproduce square_test.py:
        ui = sin(2 pi x) sin(2 pi y) (1 + exp(-t)),  ue = sin(2 pi x) sin(2 pi y)
        f_i = 8 pi^2 ui,  f_e = 8 pi^2 ue  (sigma_i = sigma_e = 1)
    """

    def __init__(self, dim: int = 2, sigma_i: float = 1.0,
                 sigma_e: float = 1.0, C_M: float = 1.0,
                 exact: str = "sinsin"):
        """exact="sinsin": the reference square_test.py fields (zero on the
        unit-square boundary; consistent there because the membrane planes
        sit on zero-flux lines of sin·sin).  exact="radial": a FULLY
        CONSISTENT manufactured pair for the circle geometry (membrane ring
        r_m = 1/2, grounded unit-circle boundary) — the reference's
        EMI/tests/circle_test.py:275-280 grounds a boundary where its
        sin·sin solution is NOT zero, so its errors cannot converge; this
        pair can.  Construction: radial profiles with ZERO normal flux at
        r_m on both sides (g'(r_m) = h'(r_m) = 0, so current continuity is
        trivial), h(1) = 0 (grounded BC exact), and a membrane potential
        v(t) = v0 exp(-t) solving the passive-channel balance
        C_M dv/dt + v = -sigma_i dui/dn = 0 exactly (C_M = 1):

            g = (r^2 - r_m^2)^2,  h = g - (1 - r_m^2)^2
            ui = (1 + exp(-t)) g,  ue = exp(-t) h
        """
        t, xs = self._setup_coords(dim)
        if exact == "radial":
            r2 = sum(c * c for c in xs)
            rm2 = sp.Rational(1, 4)
            g = (r2 - rm2) ** 2
            h = g - (1 - rm2) ** 2
            ui = (1 + sp.exp(-t)) * g
            ue = sp.exp(-t) * h
        else:
            s = sp.sin(2 * sp.pi * xs[0]) * sp.sin(2 * sp.pi * xs[1])
            if dim == 3:
                s = s * sp.sin(2 * sp.pi * xs[2])
            ui = s * (1 + sp.exp(-t))
            ue = s
        phi_m = ui - ue

        def laplacian(f):
            return sum(sp.diff(f, c, 2) for c in xs)

        f_i = -sigma_i * laplacian(ui)
        f_e = -sigma_e * laplacian(ue)

        self.exact_sym = {"phi_i": ui, "phi_e": ue}
        self._scalars = {
            "f_phi_i": f_i, "f_phi_e": f_e,
            "phi_i": ui, "phi_e": ue, "phi_m": phi_m,
            "dphi_m_dt": sp.diff(phi_m, t),
            # scalar part of the passive-model membrane correction; the full
            # correction is g + J_i·n with n the membrane normal (use
            # vector("J_i") at the facet quadrature points)
            "g_membrane": C_M * sp.diff(phi_m, t) + phi_m,
        }
        self._vectors = {
            "J_i": [-sigma_i * sp.diff(ui, c) for c in xs],
            "J_e": [-sigma_e * sp.diff(ue, c) for c in xs],
        }
