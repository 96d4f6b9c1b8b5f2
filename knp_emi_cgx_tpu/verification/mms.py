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


class KNPEMIMMS:
    ION_NAMES = ("Na", "K", "Cl")
    ZS = {"Na": 1, "K": 1, "Cl": -1}

    def __init__(self, dim: int):
        self.dim = dim
        t = sp.Symbol("t")
        if dim == 2:
            xs = sp.symbols("x y")
            s = sp.sin(2 * sp.pi * xs[0]) * sp.sin(2 * sp.pi * xs[1]) * sp.exp(-t)
            p = sp.cos(2 * sp.pi * xs[0]) * sp.cos(2 * sp.pi * xs[1])
        else:
            xs = sp.symbols("x y z")
            s = (sp.sin(2 * sp.pi * xs[0]) * sp.sin(2 * sp.pi * xs[1])
                 * sp.sin(2 * sp.pi * xs[2]) * sp.exp(-t))
            p = (sp.cos(2 * sp.pi * xs[0]) * sp.cos(2 * sp.pi * xs[1])
                 * sp.cos(2 * sp.pi * xs[2]))
        self._t = t
        self._xs = xs

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

        # lambdify everything to jnp callables f(pts[..., dim], t)
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def _lambdify(self, expr):
        f = sp.lambdify((*self._xs, self._t), expr, modules=[_JNP_MODULE, jnp])
        return f

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
