"""Membrane ionic-current models as pure functions over quadrature-point data.

TPU-native redesign of the reference's UFL ionic model library
(`KNPEMIx_ionic_model.py`).  Each model evaluates the channel current density
I_ch [A/m^2] for a given ion at membrane-facet quadrature points, given the
previous-step fields interpolated there.  Models carry membrane-tag subsets;
per-facet boolean masks select where each model applies, so the whole
membrane evaluates in one vectorised sweep (no per-tag Python loops on the
hot path).

Quadrature-point field bundle `q` (all arrays of shape [n_facets, nq]):
    q["c_i"][k], q["c_e"][k] : intra/extra concentration of ion k [mol/m^3]
    q["phi_m"]               : membrane potential at previous step [V]
    q["n"], q["m"], q["h"]   : gating variables
    q["E"][k]                : Nernst potential of ion k [V]

Reference-parity note: the reference's NKCC1 "silencer" `f_NKCC1`
(KNPEMIx_ionic_model.py:50-75) truth-tests a UFL conditional with a Python
`if`, which is always truthy, so it *always returns zero* — NKCC1 currents
are dead code there.  We default to the same behaviour
(``nkcc1_active=False``) for golden parity and expose the intended smooth
silencer behind the flag.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass
class IonicModel:
    """Base ionic model: applies on a subset of membrane tags
    (None = all membrane tags, as in KNPEMIx_ionic_model.py:29-34)."""

    tags: tuple | None = None

    def resolve_tags(self, gamma_tags: Sequence[int]) -> tuple:
        if self.tags is None:
            return tuple(gamma_tags)
        if isinstance(self.tags, int):
            return (self.tags,)
        return tuple(self.tags)

    @property
    def has_gating(self) -> bool:
        return False

    def current(self, ion_idx: int, ion: dict, q: dict, params) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass
class PassiveModel(IonicModel):
    """I_ch = phi_m (reference PassiveModel, KNPEMIx_ionic_model.py:77-91)."""

    def current(self, ion_idx, ion, q, params):
        return q["phi_m"]


@dataclasses.dataclass
class HodgkinHuxley(IonicModel):
    """Hodgkin–Huxley conductances (KNPEMIx_ionic_model.py:426-515):
    I_k = (g_leak_k + gated) * (phi_m - E_k), with gated = g_Na_bar*m^3*h for
    Na and g_K_bar*n^4 for K.  The synaptic stimulus is handled separately by
    the assembler (it has tag/region masks and area scaling)."""

    use_rush_larsen: bool = True
    time_steps_ode: int = 25
    use_pallas: bool = False   # gate the sweep through the Pallas kernel

    @property
    def has_gating(self) -> bool:
        return True

    def current(self, ion_idx, ion, q, params):
        name = ion["name"]
        g = ion["g_leak"]
        if name == "Na":
            g = g + params.g_Na_bar * q["m"] ** 3 * q["h"]
        elif name == "K":
            g = g + params.g_K_bar * q["n"] ** 4
        return g * (q["phi_m"] - q["E"][ion_idx])


@dataclasses.dataclass
class ATPPump(IonicModel):
    """Neuronal 3:2 Na/K ATPase pump (KNPEMIx_ionic_model.py:371-424)."""

    I_hat: float = 0.25     # max pump strength [A/m^2]
    P_K_e: float = 1.5      # ECS K+ threshold [mM]
    P_Na_i: float = 10.0    # ICS Na+ threshold [mM]

    def current(self, ion_idx, ion, q, params):
        name = ion["name"]
        if name == "Cl":
            return jnp.zeros_like(q["phi_m"])
        na_i = q["c_i"][params.ion_index["Na"]]
        k_e = q["c_e"][params.ion_index["K"]]
        par_1 = 1.0 + self.P_K_e / k_e
        par_2 = 1.0 + self.P_Na_i / na_i
        I_ATP = self.I_hat / (par_1 ** 2 * par_2 ** 3)
        return 3.0 * I_ATP if name == "Na" else -2.0 * I_ATP


def _nkcc1_silencer(K_e, K_e_0, nkcc1_active: bool, K_min: float = 3.0,
                    eps: float = 1e-6, cap: float = 1.0):
    """The *intended* NKCC1 silencer of KNPEMIx_ionic_model.py:50-75.
    With nkcc1_active=False (default) returns 0 exactly, replicating the
    reference's actual behaviour (see module docstring)."""
    if not nkcc1_active:
        return jnp.zeros_like(K_e)
    denom = jnp.maximum(K_e - K_e_0, eps)
    val = 1.0 / (1.0 + (0.03 / denom) ** 10)
    val = jnp.clip(val, 0.0, cap)
    in_band = (K_e >= K_min) & (K_e <= K_e_0)
    return jnp.where(in_band, val, 0.0)


@dataclasses.dataclass
class _Cotransporters(IonicModel):
    """Shared KCC/NKCC1 machinery (KNPEMIx_ionic_model.py:224-369)."""

    S_KCC: float = 0.0
    S_NKCC1: float = 0.0
    nkcc1_active: bool = False
    # Cl sign convention differs between glial (+2 NKCC1) and neuronal
    cl_nkcc1_factor: float = 1.0

    def current(self, ion_idx, ion, q, params):
        ii = params.ion_index
        c_Na_i, c_K_i, c_Cl_i = (q["c_i"][ii[n]] for n in ("Na", "K", "Cl"))
        c_Na_e, c_K_e, c_Cl_e = (q["c_e"][ii[n]] for n in ("Na", "K", "Cl"))
        I_KCC = self.S_KCC * jnp.log((c_K_i * c_Cl_i) / (c_K_e * c_Cl_e))
        silence = _nkcc1_silencer(c_K_e, params.K_e_init, self.nkcc1_active)
        I_NKCC1 = self.S_NKCC1 * silence * jnp.log(
            (c_Na_e * c_K_e * c_Cl_e ** 2) / (c_Na_i * c_K_i * c_Cl_i ** 2)
        )
        name = ion["name"]
        if name == "Na":
            return -I_NKCC1
        if name == "K":
            return -I_NKCC1 + I_KCC
        return self.cl_nkcc1_factor * I_NKCC1 - I_KCC


@dataclasses.dataclass
class NeuronalCotransporters(_Cotransporters):
    """KCC2/NKCC1 (KNPEMIx_ionic_model.py:300-369): S_KCC2=0.0068,
    S_NKCC1=0.0023 A/m^2; Cl current = I_NKCC1 - I_KCC2."""

    S_KCC: float = 0.0068
    S_NKCC1: float = 0.0023
    cl_nkcc1_factor: float = 1.0


@dataclasses.dataclass
class GlialCotransporters(_Cotransporters):
    """KCC1/NKCC1 (KNPEMIx_ionic_model.py:224-298): S = g * psi with
    g_KCC1=7e-2, g_NKCC1=2e-2 S/m^2; Cl current = 2*I_NKCC1 - I_KCC1.
    S values are finalised from params at problem init (need psi)."""

    S_KCC: float | None = None
    S_NKCC1: float | None = None
    cl_nkcc1_factor: float = 2.0
    g_KCC1: float = 7e-2
    g_NKCC1: float = 2e-2

    def finalize(self, params):
        if self.S_KCC is None:
            self.S_KCC = self.g_KCC1 * params.psi
        if self.S_NKCC1 is None:
            self.S_NKCC1 = self.g_NKCC1 * params.psi


@dataclasses.dataclass
class KirNaKPumpModel(IonicModel):
    """Glial Kir4.1 inward-rectifying K current + Na/K ATPase pump
    (KNPEMIx_ionic_model.py:93-222, f_Kir from Halnes et al. 2013)."""

    rho_pump: float = 1.1 * 1.12e-6  # max pump rate [mol/m^2/s]
    P_Na_i: float = 10.0
    P_K_e: float = 1.5

    def _pump_coeff(self, q, params):
        ii = params.ion_index
        c_Na_i = q["c_i"][ii["Na"]]
        c_K_e = q["c_e"][ii["K"]]
        return (
            (1.0 / (1.0 + (self.P_Na_i / c_Na_i) ** 1.5))
            * (1.0 / (1.0 + self.P_K_e / c_K_e))
            * self.rho_pump
        )

    def _f_kir(self, q, params, ion_idx):
        ii = params.ion_index
        K_e = q["c_e"][ii["K"]]
        E_K_init = params.psi * jnp.log(params.K_e_init / params.K_i_g_init)
        delta_phi = q["phi_m"] - q["E"][ion_idx]
        phi_m = q["phi_m"]
        A = 1.0 + jnp.exp(0.433)
        B = 1.0 + jnp.exp(-(0.1186 + E_K_init) / 0.0441)
        C = 1.0 + jnp.exp((delta_phi + 0.0185) / 0.0425)
        D = 1.0 + jnp.exp(-(0.1186 + phi_m) / 0.0441)
        return jnp.sqrt(K_e / params.K_e_init) * A * B / (C * D)

    def current(self, ion_idx, ion, q, params):
        name = ion["name"]
        z = ion["z"]
        F = params.F
        pump = self._pump_coeff(q, params)
        if name == "K":
            f_kir = self._f_kir(q, params, ion_idx)
            I_ATP = -2.0 * z * F * pump
        elif name == "Na":
            f_kir = 1.0
            I_ATP = 3.0 * z * F * pump
        else:
            f_kir = 1.0
            I_ATP = 0.0
        I_kir = f_kir * ion["g_leak_g"] * (q["phi_m"] - q["E"][ion_idx])
        return I_kir + I_ATP
