"""FitzHugh-Nagumo and Aliev-Panfilov phenomenological models.

Parity: ``ParametrizedFHNModel`` (``src/modeling/cells/fhn.jl:6-34``) and
``ParametrizedAlievPanfilovModel`` (``src/modeling/cells/aliev-panfilov.jl:
1-32``) — same published equations and default parameters, rewritten as
vectorized array kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.cells.base import CellModel


@dataclass(frozen=True)
class FHNModel(CellModel):
    """du1 = f*(phi(1-phi)(phi-a) - s); du2 = e*(b*phi - c*s - d)."""

    a: float = 0.1
    b: float = 0.5
    c: float = 1.0
    d: float = 0.0
    e: float = 0.01
    f: float = 1.0

    phi_index = 0

    @property
    def state_symbols(self):
        return ("phi_m", "s")

    def default_initial_state(self):
        return np.array([0.0, 0.0])

    def rhs(self, u, x, t):
        phi, s = u[0], u[1]
        dphi = self.f * (phi * (1 - phi) * (phi - self.a) - s)
        ds = self.e * (self.b * phi - self.c * s - self.d)
        return jnp.stack([dphi, ds])


@dataclass(frozen=True)
class AlievPanfilovModel(CellModel):
    """Aliev & Panfilov 1996 two-variable model. Note the reference keeps
    the recovery variable first, phi at index 2 (1-based)
    (``aliev-panfilov.jl:14``) — we preserve that ordering."""

    ct: float = 1.0 / 12.9
    k: float = 8.0
    a: float = 0.05
    eps0: float = 0.002
    mu1: float = 0.2
    mu2: float = 0.3

    phi_index = 1

    @property
    def state_symbols(self):
        return ("s", "phi_m")

    def default_initial_state(self):
        return np.array([0.0, 0.0])

    def rhs(self, u, x, t):
        s, phi = u[0], u[1]
        eps = self.eps0 + s * self.mu1 / (phi + self.mu2)
        dphi = self.ct * (self.k * phi * (phi - 1.0) * (phi - self.a) - phi * s)
        ds = self.ct * eps * (-s - self.k * phi * (phi - self.a - 1.0))
        return jnp.stack([ds, dphi])
