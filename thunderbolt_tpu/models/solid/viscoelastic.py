"""Viscoelastic materials: linear Maxwell element with condensed internal
strain.

Parity: ``LinearMaxwellMaterial`` (``src/modeling/solid/materials.jl:1817``)
— a generalized-Maxwell branch on the small-strain tensor with a condensed
per-qp internal variable. The backward-Euler local update is linear, so the
condensed solve has a closed form and the consistent tangent falls out of AD
automatically:

    sigma = C0 : E + C1 : (E - Ev),   tau dEv/dt = (E - Ev)
    Ev_{n+1} = (Ev_n + (dt/tau) E_{n+1}) / (1 + dt/tau)

with E = sym(F) - I (small strain) and isotropic C_i(E) = 2 mu_i E +
lambda_i tr(E) I.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.models.solid.materials import MaterialModel
from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient)


def _iso_stress(E, mu, lam):
    return 2.0 * mu * E + lam * jnp.trace(E) * jnp.eye(3, dtype=E.dtype)


@dataclass(frozen=True)
class LinearMaxwellMaterial(MaterialModel):
    """E0 spring in parallel with an (E1, tau) Maxwell branch."""

    E0: float = 70e3
    E1: float = 20e3
    mu: float = 0.3       # Poisson ratio of both branches
    tau: float = 100.0    # relaxation time [ms]

    def _lame(self, E):
        lam = E * self.mu / ((1 + self.mu) * (1 - 2 * self.mu))
        mu = E / (2 * (1 + self.mu))
        return mu, lam

    @property
    def has_internal_state(self):
        return True

    def internal_template(self, batch):
        nc, nqp = batch.xq.shape[:2]
        # condensed state: the 9 components of Ev (stored flat) — reuse the
        # (Qprev, lam_prev) threading of the mechanics layer; lam_prev is
        # unused ballast here.
        return {"Qprev": jnp.zeros((nc, nqp, 9), batch.xq.dtype),
                "lam_prev": jnp.ones((nc, nqp), batch.xq.dtype)}

    def setup(self, batch):
        return super().setup(batch)

    def aux(self, cache, t, state=None):
        out = {}
        nc, nqp = cache["frames"].shape[:2]
        if state is not None:
            out["Qprev"] = state["Qprev"]
            out["lam_prev"] = state["lam_prev"]
            out["dt"] = jnp.broadcast_to(state["dt"], (nc, nqp))
            out["t"] = jnp.broadcast_to(state["t"], (nc, nqp))
        return out

    def _condensed_state(self, F, frame, aux):
        E = 0.5 * (F + F.T) - jnp.eye(3, dtype=F.dtype)
        a = aux["dt"] / self.tau
        Ev_prev = aux["Qprev"].reshape(3, 3)
        Ev = (Ev_prev + a * E) / (1.0 + a)
        return Ev.reshape(9), jnp.asarray(0.0, F.dtype)

    def first_piola(self, F, frame, aux):
        E = 0.5 * (F + F.T) - jnp.eye(3, dtype=F.dtype)
        mu0, lam0 = self._lame(self.E0)
        mu1, lam1 = self._lame(self.E1)
        if "Qprev" in aux:
            Ev_flat, _ = self._condensed_state(F, frame, aux)
            Ev = Ev_flat.reshape(3, 3)
        else:
            Ev = jnp.zeros((3, 3), F.dtype)
        return _iso_stress(E, mu0, lam0) + _iso_stress(E - Ev, mu1, lam1)
