"""Step-size controllers: PID and the reaction-tangent heuristic.

Parity: ``PIDController`` (``src/solver/time/controllers.jl:43-160``) and
``ReactionTangentController`` (``src/solver/time/rtc.jl:23-165``, the
adaptive operator-splitting dt heuristic of Ogiermann et al. 2023:
dt = sigma(R) mapped between [dt_min, dt_max] from the maximal reaction
tangent R = max d(phi_m)/dt).

TPU-native: the RTC law is a branch-free jnp map, so the whole adaptive
splitting march stays inside one jitted ``lax.scan`` with dt in the carry
(see splitting.make_adaptive_step / integrator.AdaptiveSplitIntegrator).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Callable, Tuple

import numpy as np
import jax.numpy as jnp


def default_dt_factor_limiter(x):
    return 1.0 + np.arctan(x - 1.0) if not hasattr(x, "shape") \
        else 1.0 + jnp.arctan(x - 1.0)


@dataclass
class PIDController:
    """Proportional-integral-derivative step-size control on a scaled local
    error estimate (EEst <= 1 means within tolerance)."""

    beta: Tuple[float, float, float] = (0.7, -0.4, 0.0)
    accept_safety: float = 0.81
    limiter: Callable = default_dt_factor_limiter

    def __post_init__(self):
        self._err = (1.0, 1.0, 1.0)

    def propose_factor(self, EEst, order):
        """dt factor for the current attempt; call once per attempt."""
        k = order + 1
        EEst = max(float(EEst), np.finfo(float).eps)
        self._err = (1.0 / EEst, self._err[1], self._err[2])
        b = self.beta
        factor = (self._err[0] ** (b[0] / k) * self._err[1] ** (b[1] / k)
                  * self._err[2] ** (b[2] / k))
        return float(self.limiter(factor))

    def should_accept(self, factor):
        return factor >= self.accept_safety

    def accept(self):
        self._err = (self._err[0], self._err[0], self._err[1])

    def reinit(self):
        self._err = (1.0, 1.0, 1.0)


@dataclass(frozen=True)
class ReactionTangentController:
    """Adaptive Lie-Trotter splitting: dt from the maximal reaction tangent.

    dt_next = (1 - 1/(1 + exp((sigma_c - R) sigma_s))) (dt_max - dt_min)
              + dt_min   (``rtc.jl:120-127``)

    Wraps the inner algorithms exactly like the reference wraps
    LieTrotterGodunov."""

    algorithms: Tuple
    sigma_s: float = 1.0
    sigma_c: float = 0.0
    dt_bounds: Tuple[float, float] = (0.01, 1.0)

    def next_dt(self, R):
        lo, hi = self.dt_bounds
        if np.isinf(self.sigma_s):
            return jnp.where(R > self.sigma_c, lo, hi)
        s = 1.0 - 1.0 / (1.0 + jnp.exp((self.sigma_c - R) * self.sigma_s))
        return s * (hi - lo) + lo
