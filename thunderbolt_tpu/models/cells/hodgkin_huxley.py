"""Classic Hodgkin-Huxley 1952 squid-axon model (4 states).

Parity: the HH scaffolding of ``src/modeling/electrophysiology.jl:19-93``
(the reference keeps it as the didactic example model). Published
parameters; units mV/ms/uF/mS per cm^2. Gates exposed for Rush-Larsen.
State order (V, n, m, h); phi at index 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.cells.base import CellModel


def _vtrap(x, y):
    """x / (exp(x/y) - 1) with the removable singularity handled."""
    z = x / y
    return jnp.where(jnp.abs(z) < 1e-6, y * (1.0 - z / 2.0),
                     x / (jnp.exp(z) - 1.0))


@dataclass(frozen=True)
class HodgkinHuxleyModel(CellModel):
    g_Na: float = 120.0
    g_K: float = 36.0
    g_L: float = 0.3
    E_Na: float = 50.0
    E_K: float = -77.0
    E_L: float = -54.387
    Cm: float = 1.0

    phi_index = 0
    gating_indices = (1, 2, 3)

    @property
    def state_symbols(self):
        return ("phi_m", "n", "m", "h")

    def default_initial_state(self):
        return np.array([-65.0, 0.3177, 0.0529, 0.5961])

    def _rates(self, V):
        an = 0.01 * _vtrap(-(V + 55.0), 10.0)
        bn = 0.125 * jnp.exp(-(V + 65.0) / 80.0)
        am = 0.1 * _vtrap(-(V + 40.0), 10.0)
        bm = 4.0 * jnp.exp(-(V + 65.0) / 18.0)
        ah = 0.07 * jnp.exp(-(V + 65.0) / 20.0)
        bh = 1.0 / (1.0 + jnp.exp(-(V + 35.0) / 10.0))
        return (an, bn), (am, bm), (ah, bh)

    def gating_inf_tau(self, u, x, t):
        V = u[0]
        (an, bn), (am, bm), (ah, bh) = self._rates(V)
        inf = jnp.stack([an / (an + bn), am / (am + bm), ah / (ah + bh)])
        tau = jnp.stack([1.0 / (an + bn), 1.0 / (am + bm), 1.0 / (ah + bh)])
        return inf, tau

    def rhs(self, u, x, t):
        V, n, m, h = u[0], u[1], u[2], u[3]
        I_Na = self.g_Na * m ** 3 * h * (V - self.E_Na)
        I_K = self.g_K * n ** 4 * (V - self.E_K)
        I_L = self.g_L * (V - self.E_L)
        dV = -(I_Na + I_K + I_L) / self.Cm
        inf, tau = self.gating_inf_tau(u, x, t)
        dgates = (inf - u[1:4]) / tau
        return jnp.concatenate([dV[None], dgates])
