"""Pathmanathan-Cordeiro-Gray 2019 canine ventricular model (7 states).

Parity: ``ParametrizedPCG2019Model`` (``src/modeling/cells/pcg2019.jl:4-152``)
— the published minimal ventricular model of Pathmanathan, Cordeiro & Gray
(2019), identical default parameters, rewritten as a fused array kernel with
Hodgkin-Huxley gate structure exposed for Rush-Larsen.
State ordering: (phi, h, m, f, s, xs, xr); phi at index 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.cells.base import CellModel


def _sigmoid(phi, E, k, sign):
    return 1.0 / (1.0 + jnp.exp(sign * (phi - E) / k))


def _sigmoid_np(phi, E, k, sign):
    return 1.0 / (1.0 + np.exp(sign * (phi - E) / k))


@dataclass(frozen=True)
class PCG2019Model(CellModel):
    # I_Na
    g_Na: float = 12.0
    E_m: float = -52.244
    k_m: float = 6.5472
    tau_m: float = 0.12
    E_h: float = -78.7
    k_h: float = 5.93
    delta_h: float = 0.799163
    tau_h0: float = 6.80738
    # I_K1
    g_K1: float = 0.73893
    E_z: float = -91.9655
    k_z: float = 12.4997
    # I_to
    g_to: float = 0.1688
    E_r: float = 14.3116
    k_r: float = 11.462
    E_s: float = -47.9286
    k_s: float = 4.9314
    tau_s: float = 9.90669
    # I_CaL
    g_CaL: float = 0.11503
    E_d: float = 0.7
    k_d: float = 4.3
    E_f: float = -15.7
    k_f: float = 4.6
    tau_f: float = 30.0
    # I_Kr
    g_Kr: float = 0.056
    E_xr: float = -26.6
    k_xr: float = 6.5
    tau_xr: float = 334.0
    E_y: float = -49.6
    k_y: float = 23.5
    # I_Ks
    g_Ks: float = 0.008
    E_xs: float = 24.6
    k_xs: float = 12.1
    tau_xs: float = 628.0
    # reversal potentials
    E_Na: float = 65.0
    E_K: float = -85.0
    E_Ca: float = 50.0

    phi_index = 0
    gating_indices = (1, 2, 3, 4, 5, 6)

    @property
    def state_symbols(self):
        return ("phi_m", "h", "m", "f", "s", "xs", "xr")

    def default_initial_state(self):
        phi0 = self.E_K
        return np.array([
            phi0,
            _sigmoid_np(phi0, self.E_h, self.k_h, 1.0),
            _sigmoid_np(phi0, self.E_m, self.k_m, -1.0),
            _sigmoid_np(phi0, self.E_f, self.k_f, 1.0),
            _sigmoid_np(phi0, self.E_s, self.k_s, 1.0),
            _sigmoid_np(phi0, self.E_xs, self.k_xs, -1.0),
            _sigmoid_np(phi0, self.E_xr, self.k_xr, -1.0),
        ])

    def _currents(self, phi, h, m, f, s, xs, xr):
        r_inf = _sigmoid(phi, self.E_r, self.k_r, -1.0)
        d_inf = _sigmoid(phi, self.E_d, self.k_d, -1.0)
        z_inf = _sigmoid(phi, self.E_z, self.k_z, 1.0)
        y_inf = _sigmoid(phi, self.E_y, self.k_y, 1.0)
        I_Na = self.g_Na * m * m * m * h * h * (phi - self.E_Na)
        I_K1 = self.g_K1 * z_inf * (phi - self.E_K)
        I_to = self.g_to * r_inf * s * (phi - self.E_K)
        I_CaL = self.g_CaL * d_inf * f * (phi - self.E_Ca)
        I_Kr = self.g_Kr * xr * y_inf * (phi - self.E_K)
        I_Ks = self.g_Ks * xs * (phi - self.E_K)
        return I_Na + I_K1 + I_to + I_CaL + I_Kr + I_Ks

    def gating_inf_tau(self, u, x, t):
        phi = u[0]
        tau_h = (2.0 * self.tau_h0
                 * jnp.exp(self.delta_h * (phi - self.E_h) / self.k_h)) \
            / (1.0 + jnp.exp((phi - self.E_h) / self.k_h))
        inf = jnp.stack([
            _sigmoid(phi, self.E_h, self.k_h, 1.0),
            _sigmoid(phi, self.E_m, self.k_m, -1.0),
            _sigmoid(phi, self.E_f, self.k_f, 1.0),
            _sigmoid(phi, self.E_s, self.k_s, 1.0),
            _sigmoid(phi, self.E_xs, self.k_xs, -1.0),
            _sigmoid(phi, self.E_xr, self.k_xr, -1.0),
        ])
        ones = jnp.ones_like(phi)
        tau = jnp.stack([
            tau_h, self.tau_m * ones, self.tau_f * ones, self.tau_s * ones,
            self.tau_xs * ones, self.tau_xr * ones,
        ])
        return inf, tau

    def rhs(self, u, x, t):
        phi, h, m, f, s, xs, xr = (u[i] for i in range(7))
        I_total = self._currents(phi, h, m, f, s, xs, xr)
        dphi = -I_total  # C_m = 1
        inf, tau = self.gating_inf_tau(u, x, t)
        dgates = (inf - u[1:7]) / tau
        return jnp.concatenate([dphi[None], dgates])
