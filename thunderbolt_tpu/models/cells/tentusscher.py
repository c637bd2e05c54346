"""ten Tusscher & Panfilov 2006 human ventricular model (19 states).

The reference repo has NO ten Tusscher model (SURVEY.md §1 L2 note) but the
driver's Niederer-2011 EP benchmark requires one (BASELINE.md config 2), so
this is implemented directly from the published equations:

  K.H.W.J. ten Tusscher, A.V. Panfilov, "Alternans and spiral breakup in a
  human ventricular tissue model", Am J Physiol Heart Circ Physiol 291:
  H1088-H1100, 2006 (+ 2004 companion paper for shared currents).

Units: mV, ms, mM; current output in V/s equivalent (dV/dt in mV/ms).
Cell types: "epi" (default), "endo", "m" — differing in G_to, G_Ks and the
s-gate time constant, per the paper.

State order: (V, xr1, xr2, xs, m, h, j, d, f, f2, fCass, s, r,
              Rq, Ca_i, Ca_SR, Ca_ss, Na_i, K_i); gates at indices 1..12
expose (inf, tau) for Rush-Larsen.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.cells.base import CellModel

# physical constants
_R = 8314.472      # J/(kmol K)
_T = 310.0         # K
_F = 96485.3415    # C/mol
_RTF = _R * _T / _F


@dataclass(frozen=True)
class TenTusscherPanfilov2006Model(CellModel):
    celltype: str = "epi"
    # conductances (nS/pF) and exchanger/pump parameters (2006 paper, Table 1)
    g_Na: float = 14.838
    g_K1: float = 5.405
    g_Kr: float = 0.153
    g_CaL: float = 3.98e-5
    g_pCa: float = 0.1238
    g_pK: float = 0.0146
    g_bNa: float = 0.00029
    g_bCa: float = 0.000592
    P_NaK: float = 2.724
    K_mK: float = 1.0
    K_mNa: float = 40.0
    k_NaCa: float = 1000.0
    gamma: float = 0.35
    K_mCa: float = 1.38
    K_mNai: float = 87.5
    k_sat: float = 0.1
    alpha_naca: float = 2.5
    K_pCa: float = 0.0005
    # external concentrations (mM)
    Na_o: float = 140.0
    K_o: float = 5.4
    Ca_o: float = 2.0
    pKNa: float = 0.03
    # geometry / capacitance (2006 paper)
    Cm: float = 0.185
    V_c: float = 0.016404
    V_sr: float = 0.001094
    V_ss: float = 0.00005468
    # SR calcium handling
    Vmax_up: float = 0.006375
    K_up: float = 0.00025
    V_rel: float = 0.102
    V_xfer: float = 0.0038
    V_leak: float = 0.00036
    k1p: float = 0.15
    k2p: float = 0.045
    k3: float = 0.060
    k4: float = 0.005
    EC: float = 1.5
    max_sr: float = 2.5
    min_sr: float = 1.0
    # buffers
    Buf_c: float = 0.2
    K_buf_c: float = 0.001
    Buf_sr: float = 10.0
    K_buf_sr: float = 0.3
    Buf_ss: float = 0.4
    K_buf_ss: float = 0.00025

    phi_index = 0
    gating_indices = tuple(range(1, 13))

    @property
    def g_to(self):
        return {"epi": 0.294, "m": 0.294, "endo": 0.073}[self.celltype]

    @property
    def g_Ks(self):
        return {"epi": 0.392, "m": 0.098, "endo": 0.392}[self.celltype]

    @property
    def state_symbols(self):
        return ("phi_m", "xr1", "xr2", "xs", "m", "h", "j", "d", "f", "f2",
                "fCass", "s", "r", "Rq", "Ca_i", "Ca_SR", "Ca_ss",
                "Na_i", "K_i")

    def default_initial_state(self):
        # paper/CellML steady-paced initial conditions (epi)
        return np.array([
            -85.23,      # V
            0.00621, 0.4712, 0.0095,          # xr1 xr2 xs
            0.00172, 0.7444, 0.7045,          # m h j
            3.373e-5, 0.7888, 0.9755, 0.9953,  # d f f2 fCass
            0.999998, 2.42e-8,                 # s r
            0.9073,                            # Rq
            0.000126, 3.64, 0.00036,           # Ca_i Ca_SR Ca_ss
            8.604, 136.89,                     # Na_i K_i
        ])

    # ------------------------------------------------------------------

    def gating_inf_tau(self, u, x, t):
        V = u[0]
        Ca_ss = u[16]
        e = jnp.exp

        xr1_inf = 1.0 / (1.0 + e((-26.0 - V) / 7.0))
        a = 450.0 / (1.0 + e((-45.0 - V) / 10.0))
        b = 6.0 / (1.0 + e((V + 30.0) / 11.5))
        tau_xr1 = a * b

        xr2_inf = 1.0 / (1.0 + e((V + 88.0) / 24.0))
        a = 3.0 / (1.0 + e((-60.0 - V) / 20.0))
        b = 1.12 / (1.0 + e((V - 60.0) / 20.0))
        tau_xr2 = a * b

        xs_inf = 1.0 / (1.0 + e((-5.0 - V) / 14.0))
        a = 1400.0 / jnp.sqrt(1.0 + e((5.0 - V) / 6.0))
        b = 1.0 / (1.0 + e((V - 35.0) / 15.0))
        tau_xs = a * b + 80.0

        m_inf = 1.0 / (1.0 + e((-56.86 - V) / 9.03)) ** 2
        a = 1.0 / (1.0 + e((-60.0 - V) / 5.0))
        b = 0.1 / (1.0 + e((V + 35.0) / 5.0)) \
            + 0.1 / (1.0 + e((V - 50.0) / 200.0))
        tau_m = a * b

        h_inf = 1.0 / (1.0 + e((V + 71.55) / 7.43)) ** 2
        lo = V < -40.0
        a_h = jnp.where(lo, 0.057 * e(-(V + 80.0) / 6.8), 0.0)
        b_h = jnp.where(lo,
                        2.7 * e(0.079 * V) + 3.1e5 * e(0.3485 * V),
                        0.77 / (0.13 * (1.0 + e(-(V + 10.66) / 11.1))))
        tau_h = 1.0 / (a_h + b_h)

        j_inf = h_inf
        # guard the V>=-40 branch against overflow in the V<-40 exponentials
        Vc = jnp.where(lo, V, -40.0)
        a_j = jnp.where(
            lo,
            (-2.5428e4 * e(0.2444 * Vc) - 6.948e-6 * e(-0.04391 * Vc))
            * (Vc + 37.78) / (1.0 + e(0.311 * (Vc + 79.23))),
            0.0)
        b_j = jnp.where(
            lo,
            0.02424 * e(-0.01052 * V) / (1.0 + e(-0.1378 * (V + 40.14))),
            0.6 * e(0.057 * V) / (1.0 + e(-0.1 * (V + 32.0))))
        tau_j = 1.0 / (a_j + b_j)

        d_inf = 1.0 / (1.0 + e((-8.0 - V) / 7.5))
        a = 1.4 / (1.0 + e((-35.0 - V) / 13.0)) + 0.25
        b = 1.4 / (1.0 + e((V + 5.0) / 5.0))
        c = 1.0 / (1.0 + e((50.0 - V) / 20.0))
        tau_d = a * b + c

        f_inf = 1.0 / (1.0 + e((V + 20.0) / 7.0))
        tau_f = 1102.5 * e(-((V + 27.0) ** 2) / 225.0) \
            + 200.0 / (1.0 + e((13.0 - V) / 10.0)) \
            + 180.0 / (1.0 + e((V + 30.0) / 10.0)) + 20.0

        f2_inf = 0.67 / (1.0 + e((V + 35.0) / 7.0)) + 0.33
        tau_f2 = 562.0 * e(-((V + 27.0) ** 2) / 240.0) \
            + 31.0 / (1.0 + e((25.0 - V) / 10.0)) \
            + 80.0 / (1.0 + e((V + 30.0) / 10.0))

        fCass_inf = 0.6 / (1.0 + (Ca_ss / 0.05) ** 2) + 0.4
        tau_fCass = 80.0 / (1.0 + (Ca_ss / 0.05) ** 2) + 2.0

        if self.celltype == "endo":
            s_inf = 1.0 / (1.0 + e((V + 28.0) / 5.0))
            tau_s = 1000.0 * e(-((V + 67.0) ** 2) / 1000.0) + 8.0
        else:
            s_inf = 1.0 / (1.0 + e((V + 20.0) / 5.0))
            tau_s = 85.0 * e(-((V + 45.0) ** 2) / 320.0) \
                + 5.0 / (1.0 + e((V - 20.0) / 5.0)) + 3.0

        r_inf = 1.0 / (1.0 + e((20.0 - V) / 6.0))
        tau_r = 9.5 * e(-((V + 40.0) ** 2) / 1800.0) + 0.8

        inf = jnp.stack([xr1_inf, xr2_inf, xs_inf, m_inf, h_inf, j_inf,
                         d_inf, f_inf, f2_inf, fCass_inf, s_inf, r_inf])
        tau = jnp.stack([tau_xr1, tau_xr2, tau_xs, tau_m, tau_h, tau_j,
                         tau_d, tau_f, tau_f2, tau_fCass, tau_s, tau_r])
        return inf, tau

    # ------------------------------------------------------------------

    def _currents(self, u):
        (V, xr1, xr2, xs, m, h, j, d, f, f2, fCass, s, r, Rq,
         Ca_i, Ca_SR, Ca_ss, Na_i, K_i) = (u[i] for i in range(19))
        e = jnp.exp
        E_Na = _RTF * jnp.log(self.Na_o / Na_i)
        E_K = _RTF * jnp.log(self.K_o / K_i)
        E_Ks = _RTF * jnp.log((self.K_o + self.pKNa * self.Na_o)
                              / (K_i + self.pKNa * Na_i))
        E_Ca = 0.5 * _RTF * jnp.log(self.Ca_o / Ca_i)

        I_Na = self.g_Na * m ** 3 * h * j * (V - E_Na)

        a_K1 = 0.1 / (1.0 + e(0.06 * (V - E_K - 200.0)))
        b_K1 = (3.0 * e(0.0002 * (V - E_K + 100.0))
                + e(0.1 * (V - E_K - 10.0))) / (1.0 + e(-0.5 * (V - E_K)))
        xK1 = a_K1 / (a_K1 + b_K1)
        sqKo = jnp.sqrt(self.K_o / 5.4)
        I_K1 = self.g_K1 * xK1 * sqKo * (V - E_K)
        I_to = self.g_to * r * s * (V - E_K)
        I_Kr = self.g_Kr * sqKo * xr1 * xr2 * (V - E_K)
        I_Ks = self.g_Ks * xs ** 2 * (V - E_Ks)

        # L-type Ca current with removable singularity at V = 15 mV
        z = 2.0 * (V - 15.0) / _RTF
        ez = e(z)
        num = 0.25 * Ca_ss * ez - self.Ca_o
        frac = jnp.where(jnp.abs(z) < 1e-5,
                         num / (1.0 + 0.5 * z),      # series limit
                         num * z / (ez - 1.0))
        I_CaL = self.g_CaL * d * f * f2 * fCass * 2.0 * _F * frac

        vf = V / _RTF
        I_NaCa = self.k_NaCa * (
            e(self.gamma * vf) * Na_i ** 3 * self.Ca_o
            - e((self.gamma - 1.0) * vf) * self.Na_o ** 3 * Ca_i
            * self.alpha_naca
        ) / ((self.K_mNai ** 3 + self.Na_o ** 3) * (self.K_mCa + self.Ca_o)
             * (1.0 + self.k_sat * e((self.gamma - 1.0) * vf)))
        I_NaK = self.P_NaK * self.K_o * Na_i / (
            (self.K_o + self.K_mK) * (Na_i + self.K_mNa)
            * (1.0 + 0.1245 * e(-0.1 * vf) + 0.0353 * e(-vf)))
        I_pCa = self.g_pCa * Ca_i / (Ca_i + self.K_pCa)
        I_pK = self.g_pK * (V - E_K) / (1.0 + e((25.0 - V) / 5.98))
        I_bNa = self.g_bNa * (V - E_Na)
        I_bCa = self.g_bCa * (V - E_Ca)
        return (I_Na, I_K1, I_to, I_Kr, I_Ks, I_CaL, I_NaCa, I_NaK,
                I_pCa, I_pK, I_bNa, I_bCa)

    def rhs(self, u, x, t):
        (V, xr1, xr2, xs, m, h, j, d, f, f2, fCass, s, r, Rq,
         Ca_i, Ca_SR, Ca_ss, Na_i, K_i) = (u[i] for i in range(19))
        (I_Na, I_K1, I_to, I_Kr, I_Ks, I_CaL, I_NaCa, I_NaK,
         I_pCa, I_pK, I_bNa, I_bCa) = self._currents(u)

        dV = -(I_Na + I_K1 + I_to + I_Kr + I_Ks + I_CaL + I_NaCa + I_NaK
               + I_pCa + I_pK + I_bNa + I_bCa)

        inf, tau = self.gating_inf_tau(u, x, t)
        dgates = (inf - u[1:13]) / tau

        # SR release (RyR) dynamics
        kcasr = self.max_sr - (self.max_sr - self.min_sr) \
            / (1.0 + (self.EC / Ca_SR) ** 2)
        k1 = self.k1p / kcasr
        k2 = self.k2p * kcasr
        O = k1 * Ca_ss ** 2 * Rq / (self.k3 + k1 * Ca_ss ** 2)
        dRq = -k2 * Ca_ss * Rq + self.k4 * (1.0 - Rq)
        I_rel = self.V_rel * O * (Ca_SR - Ca_ss)
        I_up = self.Vmax_up / (1.0 + (self.K_up / Ca_i) ** 2)
        I_leak = self.V_leak * (Ca_SR - Ca_i)
        I_xfer = self.V_xfer * (Ca_ss - Ca_i)

        cmf = self.Cm / (2.0 * self.V_c * _F)
        buf_c = 1.0 / (1.0 + self.Buf_c * self.K_buf_c
                       / (Ca_i + self.K_buf_c) ** 2)
        dCa_i = buf_c * ((I_leak - I_up) * self.V_sr / self.V_c + I_xfer
                         - (I_bCa + I_pCa - 2.0 * I_NaCa) * cmf)
        buf_sr = 1.0 / (1.0 + self.Buf_sr * self.K_buf_sr
                        / (Ca_SR + self.K_buf_sr) ** 2)
        dCa_SR = buf_sr * (I_up - I_rel - I_leak)
        buf_ss = 1.0 / (1.0 + self.Buf_ss * self.K_buf_ss
                        / (Ca_ss + self.K_buf_ss) ** 2)
        dCa_ss = buf_ss * (-I_xfer * self.V_c / self.V_ss
                           + I_rel * self.V_sr / self.V_ss
                           - I_CaL * self.Cm / (2.0 * self.V_ss * _F))
        dNa_i = -(I_Na + I_bNa + 3.0 * I_NaK + 3.0 * I_NaCa) \
            * self.Cm / (self.V_c * _F)
        dK_i = -(I_K1 + I_to + I_Kr + I_Ks - 2.0 * I_NaK + I_pK) \
            * self.Cm / (self.V_c * _F)

        return jnp.concatenate([
            dV[None], dgates, dRq[None], dCa_i[None], dCa_SR[None],
            dCa_ss[None], dNa_i[None], dK_i[None]])


def TenTusscherPanfilov2006EpiModel(**kw):
    """Epicardial parameter set of ten Tusscher-Panfilov 2006."""
    return TenTusscherPanfilov2006Model(celltype="epi", **kw)


def TenTusscherPanfilov2006EndoModel(**kw):
    """Endocardial parameter set of ten Tusscher-Panfilov 2006."""
    return TenTusscherPanfilov2006Model(celltype="endo", **kw)


def TenTusscherPanfilov2006MModel(**kw):
    """Midmyocardial (M-cell) parameter set of ten Tusscher-Panfilov 2006."""
    return TenTusscherPanfilov2006Model(celltype="m", **kw)
