"""0D lumped circulatory models.

Parity: ``src/modeling/fluid/lumped.jl`` — ``RSAFDQ2022LumpedCicuitModel``
(12-state windkessel + 4 chambers, ``lumped.jl:111-175``; driver ``:263``;
activation transient ``Phi_RSAFDQ2022:80``) from Regazzoni, Salvador,
Africa, Fedele, Dede & Quarteroni 2022, with the reference's exact default
parameters (kPa/ms/mL units), and ``DummyLumpedCircuitModel`` (``:61``).

TPU-native: the RHS is branch-free jnp (valve diodes as `where`), so it
jits, vmaps and differentiates; the chamber pressures can be replaced by
external inputs for 3D-0D coupling (``num_unknown_pressures``,
``lumped.jl:196``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp


def activation_transient(t, tC, tR, TC, TR, THB):
    """Phi_RSAFDQ2022: raised-cosine contraction/relaxation transient."""
    tc = jnp.mod(t - tC, THB)
    tr = jnp.mod(t - tR, THB)
    phi_c = 0.5 * (1.0 - jnp.cos(jnp.pi / TC * tc))
    phi_r = 0.5 * (1.0 + jnp.cos(jnp.pi / TR * tr))
    return jnp.where(tc < TC, phi_c, jnp.where(tr < TR, phi_r, 0.0))


def elastance(t, Epass, Emax, tC, TC, TR, THB):
    return Epass + Emax * activation_transient(t, tC, tC + TC, TC, TR, THB)


@dataclass(frozen=True)
class RSAFDQ2022LumpedCircuitModel:
    """State (12): (V_la, V_lv, V_ra, V_rv, p_sys_ar, p_sys_ven, p_pul_ar,
    p_pul_ven, Q_sys_ar, Q_sys_ven, Q_pul_ar, Q_pul_ven).

    `*_pressure_given=False` turns that chamber's pressure into an external
    input (the 3D-0D coupling multiplier)."""

    lv_pressure_given: bool = True
    rv_pressure_given: bool = True
    la_pressure_given: bool = True
    ra_pressure_given: bool = True
    # systemic circuit (kPa ms / mL etc.)
    Rsys_ar: float = 106.6578947368421
    Csys_ar: float = 9.000740192450037
    Lsys_ar: float = 666.6118421052632
    Rsys_ven: float = 34.66381578947368
    Csys_ven: float = 1200.098692326671
    Lsys_ven: float = 66.66118421052632
    # pulmonary circuit
    Rpul_ar: float = 21.66488486842105
    Cpul_ar: float = 75.00616827041698
    Lpul_ar: float = 66.66118421052632
    Rpul_ven: float = 21.66488486842105
    Cpul_ven: float = 120.0098692326671
    Lpul_ven: float = 66.66118421052632
    # valves
    Rmin: float = 1.0
    Rmax: float = 9.999e6
    # left atrium
    Epass_la: float = 0.011999013157894737
    Eactmax_la: float = 0.009332565789473684
    V0_la: float = 4.0
    tC_la: float = 600.0
    TC_la: float = 104.0
    TR_la: float = 680.0
    # right atrium
    Epass_ra: float = 0.009332565789473684
    Eactmax_ra: float = 0.007999342105263157
    V0_ra: float = 4.0
    tC_ra: float = 64.0
    TC_ra: float = 640.0
    TR_ra: float = 560.0
    # right ventricle
    Epass_rv: float = 0.0066661184210526315
    Eactmax_rv: float = 0.07332730263157895
    V0_rv: float = 10.0
    tC_rv: float = 0.0
    TC_rv: float = 272.0
    TR_rv: float = 120.0
    # left ventricle
    Epass_lv: float = 0.01066578947368421
    Eactmax_lv: float = 0.3666365131578947
    V0_lv: float = 5.0
    tC_lv: float = 0.0
    TC_lv: float = 340.0
    TR_lv: float = 170.0
    # global
    p_ex: float = 0.0
    THB: float = 800.0

    nstates = 12
    state_symbols = ("V_la", "V_lv", "V_ra", "V_rv", "p_sys_ar", "p_sys_ven",
                     "p_pul_ar", "p_pul_ven", "Q_sys_ar", "Q_sys_ven",
                     "Q_pul_ar", "Q_pul_ven")

    def num_unknown_pressures(self):
        return sum(int(not g) for g in (
            self.lv_pressure_given, self.rv_pressure_given,
            self.la_pressure_given, self.ra_pressure_given))

    def pressure_input_index(self, chamber: str) -> int:
        """Slot of an external chamber pressure within the input vector
        (order lv, rv, la, ra; parity ``lumped.jl:225-260``)."""
        order = [("lv", self.lv_pressure_given), ("rv", self.rv_pressure_given),
                 ("la", self.la_pressure_given), ("ra", self.ra_pressure_given)]
        i = 0
        for name, given in order:
            if name == chamber:
                if given:
                    raise ValueError(f"{chamber} pressure is not external")
                return i
            if not given:
                i += 1
        raise KeyError(chamber)

    def volume_index(self, chamber: str) -> int:
        return {"la": 0, "lv": 1, "ra": 2, "rv": 3}[chamber]

    def default_initial_state(self):
        # pre-paced state (``lumped.jl:219``)
        return np.array([65.0, 120.0, 65.0, 145.0, 10.66, 4.0, 4.67, 3.2,
                         0.0, 0.0, 0.0, 0.0])

    def chamber_pressures(self, u, t, external=()):
        V_la, V_lv, V_ra, V_rv = u[0], u[1], u[2], u[3]
        p_lv = elastance(t, self.Epass_lv, self.Eactmax_lv, self.tC_lv,
                         self.TC_lv, self.TR_lv, self.THB) * (V_lv - self.V0_lv)
        p_rv = elastance(t, self.Epass_rv, self.Eactmax_rv, self.tC_rv,
                         self.TC_rv, self.TR_rv, self.THB) * (V_rv - self.V0_rv)
        p_la = elastance(t, self.Epass_la, self.Eactmax_la, self.tC_la,
                         self.TC_la, self.TR_la, self.THB) * (V_la - self.V0_la)
        p_ra = elastance(t, self.Epass_ra, self.Eactmax_ra, self.tC_ra,
                         self.TC_ra, self.TR_ra, self.THB) * (V_ra - self.V0_ra)
        out = []
        i = 0
        for name, given, p_int in (("lv", self.lv_pressure_given, p_lv),
                                   ("rv", self.rv_pressure_given, p_rv),
                                   ("la", self.la_pressure_given, p_la),
                                   ("ra", self.ra_pressure_given, p_ra)):
            if given:
                out.append(p_int)
            else:
                out.append(external[i])
                i += 1
        return tuple(out)  # (p_lv, p_rv, p_la, p_ra)

    def rhs(self, u, t, external=()):
        """du/dt (eq. system (6) of the paper; ``lumped_driver!:263``)."""
        (V_la, V_lv, V_ra, V_rv, p_sys_ar, p_sys_ven, p_pul_ar, p_pul_ven,
         Q_sys_ar, Q_sys_ven, Q_pul_ar, Q_pul_ven) = (u[i] for i in range(12))
        p_lv, p_rv, p_la, p_ra = self.chamber_pressures(u, t, external)

        def Q(p1, p2):
            R = jnp.where(p1 > p2, self.Rmin, self.Rmax)
            return (p1 - p2) / R

        Q_mv = Q(p_la, p_lv)
        Q_av = Q(p_lv, p_sys_ar)
        Q_tv = Q(p_ra, p_rv)
        Q_pv = Q(p_rv, p_pul_ar)

        du = [
            Q_pul_ven - Q_mv,                        # V_la
            Q_mv - Q_av,                             # V_lv
            Q_sys_ven - Q_tv,                        # V_ra
            Q_tv - Q_pv,                             # V_rv
            (Q_av - Q_sys_ar) / self.Csys_ar,
            (Q_sys_ar - Q_sys_ven) / self.Csys_ven,
            (Q_pv - Q_pul_ar) / self.Cpul_ar,
            (Q_pul_ar - Q_pul_ven) / self.Cpul_ven,
            -self.Rsys_ar / self.Lsys_ar
            * (Q_sys_ar + (p_sys_ven - p_sys_ar) / self.Rsys_ar),
            -self.Rsys_ven / self.Lsys_ven
            * (Q_sys_ven + (p_ra - p_sys_ven) / self.Rsys_ven),
            -self.Rpul_ar / self.Lpul_ar
            * (Q_pul_ar + (p_pul_ven - p_pul_ar) / self.Rpul_ar),
            -self.Rpul_ven / self.Lpul_ven
            * (Q_pul_ven + (p_la - p_pul_ven) / self.Rpul_ven),
        ]
        return jnp.stack(du)


@dataclass(frozen=True)
class DummyLumpedCircuitModel:
    """Locks the chamber volume to `volume_fun(t)` (``lumped.jl:61``)."""
    volume_fun: Any

    nstates = 1
    state_symbols = ("V",)

    def num_unknown_pressures(self):
        return 1

    def volume_index(self, chamber: str) -> int:
        return 0

    def pressure_input_index(self, chamber: str) -> int:
        return 0

    def default_initial_state(self):
        return np.array([float(self.volume_fun(0.0))])

    def rhs(self, u, t, external=()):
        return jnp.stack([self.volume_fun(t) - u[0]])


# The ModelingToolkit-backed circuit variant (``lumped-mtk.jl`` +
# ``ext/ThunderboltMTKExt.jl``) is covered by the declarative
# CircuitBuilder/SymbolicCircuitModel in
# thunderbolt_tpu/models/fluid/circuit.py — symbolic composition at setup
# time producing a branch-free jnp rhs (the JAX analog of MTK codegen).
