"""Sarcomere / contraction models (steady-state tier).

Parity: ``src/modeling/solid/contraction.jl`` —
``PelceSunLangeveld1995Model`` (``:302``), ``ConstantStretchModel``
(``:316``), ``CaDrivenInternalSarcomereModel`` (``:166``),
steady-state scaling ``N(state, ...) = state`` (``:103``). The rate-
dependent ``RDQ20MFModel`` lives in ``contraction_rdq20.py``.

Protocol (array-native): a steady-state model maps the calcium value to the
active stretch ``lambda_a(Ca)`` and the activation scale ``N(Ca) = Ca``;
stateful models expose ``nstates``, ``default_initial_state``, and
``rhs(Q, lam, dlam_dt, Ca, t)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax.numpy as jnp


class SteadyStateSarcomereModel:
    """Stateless sarcomere: everything is a function of the driving value."""

    nstates = 0

    def compute_lambda_a(self, Ca):
        raise NotImplementedError

    def activation_scale(self, Ca, F=None, frame=None):
        """The reference's N(state, F, coeff, model) = state for
        steady-state models (``contraction.jl:103``)."""
        return Ca


@dataclass(frozen=True)
class PelceSunLangeveld1995Model(SteadyStateSarcomereModel):
    """Steady-state active stretch lambda_a(Ca) (Pelce, Sun & Langeveld
    1995): 1 / (1 + f(Ca) (1/lam_max - 1)), f = 0.5 + atan(beta log Ca)/pi."""
    beta: float = 3.0
    lambda_max: float = 0.7

    def compute_lambda_a(self, Ca):
        safe = jnp.maximum(Ca, 1e-30)
        f = jnp.where(Ca > 0.0,
                      0.5 + jnp.arctan(self.beta * jnp.log(safe)) / jnp.pi,
                      0.0)
        return 1.0 / (1.0 + f * (1.0 / self.lambda_max - 1.0))


@dataclass(frozen=True)
class ConstantStretchModel(SteadyStateSarcomereModel):
    """Debug model: fixed active stretch (``contraction.jl:316``)."""
    lam: float = 1.0

    def compute_lambda_a(self, Ca):
        return jnp.full_like(jnp.asarray(Ca, jnp.result_type(float)), self.lam) \
            if hasattr(Ca, "shape") else self.lam


@dataclass(frozen=True)
class CaDrivenInternalSarcomereModel:
    """Pairs a sarcomere model with the calcium field driving it
    (``contraction.jl:166``). `calcium_field` is a Coefficient evaluated at
    the quadrature points at setup/step time."""
    model: Any
    calcium_field: Any

    @property
    def nstates(self):
        return getattr(self.model, "nstates", 0)

    def compute_lambda_a(self, Ca):
        return self.model.compute_lambda_a(Ca)

    def activation_scale(self, Ca, F=None, frame=None):
        return self.model.activation_scale(Ca, F, frame)
