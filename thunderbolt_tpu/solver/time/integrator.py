"""Time integrator: init / step / solve / TimeChoiceIterator.

Parity: ``ThunderboltTimeIntegrator`` (``src/solver/time/integrator/
type.jl:79-547``) in its fixed-dt role, plus the ``TimeChoiceIterator``
driver of the tutorials (``ep01_spiral-wave.jl:183``).

TPU-native: the hot loop is a single jitted ``lax.scan`` over a chunk of
steps (SURVEY.md §7 "one jit-compiled program per scan chunk of steps");
the host only touches state at save points. Adaptive stepping/rollback land
with the controller layer (controllers.py) — the scan chunk is the
fixed-cadence fast path the reference reserves for EP workloads.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class IntegratorStats:
    """Parity: ``IntegratorStats`` (``type.jl:1-7``)."""
    naccept: int = 0
    nreject: int = 0


class Integrator:
    """Fixed-dt integrator wrapping a jitted multi-step advance."""

    def __init__(self, fn, alg, u0, tspan, dt):
        self.fn = fn
        self.alg = alg
        self.dt = float(dt)
        self.t = float(tspan[0])
        self.tspan = (float(tspan[0]), float(tspan[1]))
        self.u = u0
        self.stats = IntegratorStats()
        self._step = alg.make_step(fn, self.dt)
        self._advance = jax.jit(self._make_advance(), static_argnums=2)

    def _make_advance(self):
        step = self._step

        def advance(u, t0, nsteps):
            def body(carry, i):
                u, = carry
                u = step(u, t0 + i * self.dt)
                return (u,), None

            (u,), _ = jax.lax.scan(body, (u,), jnp.arange(nsteps))
            return u

        return advance

    def step(self, nsteps: int = 1):
        self.u = self._advance(self.u, self.t, int(nsteps))
        self.t += nsteps * self.dt
        self.stats.naccept += nsteps
        return self

    def advance_to(self, t_target: float, rtol=1e-8):
        delta = t_target - self.t
        if delta <= rtol * self.dt:
            return self
        nsteps = int(round(delta / self.dt))
        if abs(nsteps * self.dt - delta) > 1e-6 * max(1.0, abs(delta)):
            raise ValueError(
                f"save time {t_target} is not a multiple of dt={self.dt} "
                f"from t={self.t}; choose saveat on the dt grid")
        self.step(nsteps)
        self.t = t_target  # kill fp drift
        return self

    def solve(self):
        self.advance_to(self.tspan[1])
        return self.u


def init(fn, alg, u0, tspan, dt) -> Integrator:
    """SciML-style entry (``type.jl:253`` __init)."""
    return Integrator(fn, alg, u0, tspan, dt)


def solve(fn, alg, u0, tspan, dt, saveat=None):
    """Integrate; returns (ts, us) at `saveat` (default: tspan ends)."""
    integ = init(fn, alg, u0, tspan, dt)
    if saveat is None:
        saveat = [tspan[1]]
    ts, us = [], []
    for t, u in TimeChoiceIterator(integ, saveat):
        ts.append(t)
        us.append(u)
    return np.asarray(ts), us


def TimeChoiceIterator(integ: Integrator, ts):
    """Yield (t, u) at the requested times, advancing in jitted chunks."""
    for t in ts:
        integ.advance_to(float(t))
        yield integ.t, integ.u
