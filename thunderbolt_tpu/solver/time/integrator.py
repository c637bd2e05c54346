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


class ReturnCode:
    """SciML-style return codes (parity: ``check_error`` mapping,
    ``diffeq-interface.jl:280``)."""
    Success = "Success"
    Unstable = "Unstable"
    MaxIters = "MaxIters"


class StepController:
    """Generic accept/reject/adapt protocol for ANY stepper (parity:
    ``should_accept_step`` / ``reject_step!`` / ``adapt_dt!`` /
    ``rollback_state!``, ``type.jl:508-543`` + the step_footer dispatch,
    ``diffeq-interface.jl:374-399``). Subclass and attach to an
    :class:`Integrator` via ``controller=``; ``step_controlled`` then
    drives accept/reject on the generic path instead of fixed-dt chunks.

    The division of labor mirrors the reference exactly: restoring state
    on rejection is the SCHEME's business (``Integrator.rollback_state``,
    overridable by schemes with extra state), proposing the retry/next
    step size is the CONTROLLER's (:meth:`adapt_dt`)."""

    def should_accept_step(self, integ, u_new, u_prev, t, dt) -> bool:
        """Accept the proposed state? Default: accept anything finite
        (the reference's fallback accepts unless the step failed)."""
        return bool(jnp.isfinite(u_new).all())

    def adapt_dt(self, integ, accepted: bool, dt: float) -> float:
        """Next step size. The reference's generic fallback ERRORS for
        adaptive algorithms without a controller (``type.jl:538``); here
        the no-controller path simply never calls this. Default: halve on
        reject, keep on accept."""
        return dt if accepted else 0.5 * dt


class Integrator:
    """Fixed-dt integrator wrapping a jitted multi-step advance."""

    def __init__(self, fn, alg, u0, tspan, dt):
        self.fn = fn
        self.alg = alg
        self.dt = float(dt)
        self.t = float(tspan[0])
        self.tspan = (float(tspan[0]), float(tspan[1]))
        self.u = u0
        self.u0 = u0
        self.stats = IntegratorStats()
        # (alg, dt)-keyed jit cache on the function object: a fresh
        # Integrator over the same (fn, alg, dt) reuses the compiled
        # advance instead of re-tracing (remote TPU compiles are 20-90 s
        # and uncached, so retrace-per-init is a real cost). Solver algs
        # are frozen dataclasses of scalars -> hashable; anything
        # unhashable just skips the cache.
        try:
            key = (type(alg), alg, round(self.dt, 12))
            hash(key)
        except TypeError:
            key = None
        cache = fn.__dict__.setdefault("_integ_jit_cache", {}) \
            if key is not None and hasattr(fn, "__dict__") else None
        if cache is not None and key in cache:
            self._step, self._advance, self._partial_steps = cache[key]
        else:
            self._step = alg.make_step(fn, self.dt)
            self._advance = jax.jit(self._make_advance())
            #: remainder-dt step closures for save times off the dt grid
            #: (tstop fitting, ref ``diffeq-interface.jl:226``
            #: step_header!); keyed on the rounded remainder so a regular
            #: saveat grid compiles its partial step once
            self._partial_steps = {}
            if cache is not None:
                cache[key] = (self._step, self._advance,
                              self._partial_steps)

    def _make_advance(self):
        step = self._step
        dt = self.dt

        def advance(u, t0, nsteps):
            # nsteps is TRACED (fori_loop), so any step count reuses the one
            # compiled program — a static count would recompile per change.
            def body(i, u):
                return step(u, t0 + i * dt)

            return jax.lax.fori_loop(0, nsteps, body, u)

        return advance

    def step(self, nsteps: int = 1):
        self.u = self._advance(self.u, self.t, int(nsteps))
        self.t += nsteps * self.dt
        self.stats.naccept += nsteps
        return self

    def advance_to(self, t_target: float, rtol=1e-8):
        """Advance to ``t_target``, fitting the final step to land exactly
        on it when the target is off the dt grid (tstop fitting — parity:
        ``step_header!``, ``diffeq-interface.jl:226``). Full steps run in
        one jitted fori_loop; the remainder re-makes the step closure for
        the partial dt (cheap: A = M - dt K re-forms, mirroring the
        reference's dt-change path, ``euler.jl:110-116``) and caches it."""
        delta = t_target - self.t
        if delta <= rtol * self.dt:
            return self
        nsteps = int(np.floor(delta / self.dt + 1e-9))
        rem = delta - nsteps * self.dt
        if nsteps > 0:
            self.step(nsteps)
        if rem > rtol * self.dt:
            key = round(rem, 12)
            pstep = self._partial_steps.get(key)
            if pstep is None:
                # bounded cache: irregular save grids would otherwise
                # compile and RETAIN one executable per distinct remainder
                if len(self._partial_steps) >= 8:
                    self._partial_steps.pop(
                        next(iter(self._partial_steps)))
                pstep = jax.jit(self.alg.make_step(self.fn, rem))
                self._partial_steps[key] = pstep
            self.u = pstep(self.u, jnp.asarray(self.t, self.u.dtype))
            self.stats.naccept += 1
        self.t = t_target  # kill fp drift
        return self

    # -- generic controller protocol (type.jl:508-543) -------------------

    def rollback_state(self, u_prev):
        """Restore the state a rejected step advanced (parity:
        ``rollback_state!``, ``type.jl:517-533``). The fallback restores
        the solution vector; a scheme whose state is not fully contained
        in it (e.g. a cached acceleration) overrides this."""
        self.u = u_prev

    def step_controlled(self, t_target, controller: "StepController",
                        dt0=None, dt_min_factor: float = 1e-6,
                        max_steps: int = 100_000):
        """Generic controller-driven march to ``t_target``: per step,
        propose u(t+dt) with one jitted step, ask the controller to
        accept; on reject roll back and retry at the controller's dt
        (parity: the step_footer accept/reject dispatch,
        ``diffeq-interface.jl:374-399``). Returns self; ``self.stats``
        carries naccept/nreject. Raises on dt underflow — the analog of
        the reference's dtmin abort."""
        dt = float(dt0 if dt0 is not None else self.dt)
        dt_min = dt * dt_min_factor
        for _ in range(max_steps):
            if self.t >= t_target - 1e-12 * max(1.0, abs(t_target)):
                return self
            h = min(dt, t_target - self.t)
            key = round(h, 12)
            pstep = self._partial_steps.get(key)
            if pstep is None:
                if len(self._partial_steps) >= 8:
                    self._partial_steps.pop(next(iter(self._partial_steps)))
                pstep = jax.jit(self.alg.make_step(self.fn, h))
                self._partial_steps[key] = pstep
            u_prev = self.u
            u_new = pstep(u_prev, jnp.asarray(self.t, u_prev.dtype))
            if controller.should_accept_step(self, u_new, u_prev,
                                             self.t, h):
                self.u = u_new
                self.t += h
                self.stats.naccept += 1
                dt = float(controller.adapt_dt(self, True, h))
            else:
                self.rollback_state(u_prev)
                self.stats.nreject += 1
                dt = float(controller.adapt_dt(self, False, h))
                if dt < dt_min:
                    raise RuntimeError(
                        f"step controller underflowed dt ({dt:.3e} < "
                        f"{dt_min:.3e}) at t={self.t}")
        raise RuntimeError(f"step_controlled exceeded {max_steps} steps")

    def reinit(self, u0=None, t0=None, tf=None):
        """Reset for a fresh solve on the same compiled machinery (parity:
        ``reinit!``, ``diffeq-interface.jl:91-121``). ``u0`` defaults to
        the initial condition this integrator was built with."""
        self.u = self.u0 if u0 is None else u0
        self.t = float(self.tspan[0] if t0 is None else t0)
        if tf is not None:
            self.tspan = (self.t, float(tf))
        self.stats = IntegratorStats()
        return self

    def solve(self):
        self.advance_to(self.tspan[1])
        return self.u

    def check_error(self):
        """Numerical-failure surfacing (parity: ``check_error``,
        ``diffeq-interface.jl:280``): Unstable when the state left the
        finite range."""
        if not bool(jnp.isfinite(self.u).all()):
            return ReturnCode.Unstable
        return ReturnCode.Success


def init(fn, alg, u0, tspan, dt) -> "Integrator":
    """SciML-style entry (``type.jl:253`` __init). A
    ReactionTangentController algorithm yields the adaptive split
    integrator."""
    from thunderbolt_tpu.solver.time.controllers import (
        ReactionTangentController)
    if isinstance(alg, ReactionTangentController):
        return AdaptiveSplitIntegrator(fn, alg, u0, tspan, dt)
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


class AdaptiveSplitIntegrator:
    """Reaction-tangent-controlled operator splitting: the entire adaptive
    march (variable dt in the carry, sigma(R) step-size law) runs inside one
    jitted ``lax.while_loop`` — the TPU-native form of the reference's
    controller-driven split integrator (``src/solver/time/rtc.jl``;
    SURVEY.md §7 "adaptive dt under jit").
    """

    def __init__(self, fn, rtc, u0, tspan, dt0=None):
        from thunderbolt_tpu.disc.functions import GenericSplitFunction
        assert isinstance(fn, GenericSplitFunction)
        self.fn = fn
        self.rtc = rtc
        self.u = u0
        self.u0 = u0
        self.t = float(tspan[0])
        self.tspan = tspan
        self.dt0 = float(dt0 if dt0 is not None else rtc.dt_bounds[1])
        self.dt = self.dt0
        self.stats = IntegratorStats()

        from thunderbolt_tpu.disc.functions import PointwiseMultiODEFunction
        heat, cells = fn.functions
        hr, cr = fn.ranges
        heat_step = rtc.algorithms[0].make_step_dt(heat)
        cell_step = rtc.algorithms[1].make_step_dt(cells)

        if isinstance(cells, PointwiseMultiODEFunction):
            # multi-subdomain EP: reaction tangent is the max d(phi)/dt
            # over ALL subdomains' ionic models (each part gathers its own
            # phi slice from the shared dof vector)
            def reaction_tangent(uc, t):
                R = -jnp.inf
                for part in cells.parts:
                    U = part.gather(uc)
                    R = jnp.maximum(
                        R, jnp.max(part.ion.rhs(U, part.x, t)
                                   [part.ion.phi_index]))
                return R
        else:
            ion = cells.ion
            p = ion.phi_index

            def reaction_tangent(uc, t):
                return jnp.max(ion.rhs(cells.reshape(uc), cells.x, t)[p])

        def advance(u, t, dt, t_target):
            def cond(s):
                u, t, dt, n = s
                return t < t_target - 1e-9

            def body(s):
                u, t, dt, n = s
                dtc = jnp.minimum(dt, t_target - t)
                u = u.at[hr].set(heat_step(u[hr], t, dtc))
                u = u.at[cr].set(cell_step(u[cr], t, dtc))
                # reaction tangent: max d(phi)/dt after the step (rtc.jl:52)
                R = reaction_tangent(u[cr], t + dtc)
                return (u, t + dtc, rtc.next_dt(R), n + 1)

            return jax.lax.while_loop(
                cond, body,
                (u, jnp.asarray(t, u.dtype), jnp.asarray(dt, u.dtype),
                 jnp.asarray(0, jnp.int32)))

        self._advance = jax.jit(advance)

    def advance_to(self, t_target):
        u, t, dt, n = self._advance(self.u, self.t, self.dt,
                                    float(t_target))
        self.u = u
        self.t = float(t)
        self.dt = float(dt)
        self.stats.naccept += int(n)
        return self

    def reinit(self, u0=None, t0=None, tf=None):
        """Parity: ``reinit!`` (``diffeq-interface.jl:91-121``)."""
        self.u = self.u0 if u0 is None else u0
        self.t = float(self.tspan[0] if t0 is None else t0)
        if tf is not None:
            self.tspan = (self.t, float(tf))
        self.dt = self.dt0
        self.stats = IntegratorStats()
        return self

    def check_error(self):
        if not bool(jnp.isfinite(self.u).all()):
            return ReturnCode.Unstable
        return ReturnCode.Success

    def solve(self):
        self.advance_to(self.tspan[1])
        return self.u
