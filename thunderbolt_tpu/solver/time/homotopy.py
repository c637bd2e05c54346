"""Load-stepping / pseudo-time continuation for quasi-static problems.

Parity: ``HomotopyPathSolver`` (``src/solver/time/homotopy.jl:7-399``) with
the full discrete-continuation controller family:

* ``Deuflhard2004DiscreteContinuationController``
  (``homotopy.jl:219-283``) — convergence-RATE-driven control. The Newton
  solve records per-iteration rates ``Theta_k = min(|r_k|/|r_{k-1}|,
  |du_k|/|du_{k-1}|)`` (``newton_raphson.jl:276-282``; exposed here as
  ``NewtonStats.thetas``); the controller rejects a step whose worst rate
  exceeds ``theta_reject`` and predicts the next increment from Deuflhard
  2004 Eq. 5.24: ``q = clamp(gamma * (g(theta_bar)/(2*Theta_0))**(1/p),
  qmin, qmax)`` with ``g(x) = sqrt(1+4x) - 1``.
* ``Deuflhard2004_B_DiscreteContinuationControllerVariant``
  (``homotopy.jl:283-345``) — identical except the a-priori growth uses
  ``g(Theta_0)`` in the denominator instead of ``2*Theta_0``.
* ``ExperimentalDiscreteContinuationController`` (``homotopy.jl:345-399``)
  — rejects on ``max(Theta_k)`` and adapts from ``mean(Theta_k)``.
* ``IterationCountContinuationController`` — the repo's documented
  FALLBACK heuristic (iteration counts instead of rates; rates are the
  finer signal — iteration counts saturate at the budget, Theta_k does
  not). Not a reference controller.

Reference step-failure semantics are preserved: a Newton *failure*
(non-convergence) shrinks dt by ``1/failfactor`` exactly once per attempt
(``post_newton_controller!``, ``diffeq-interface.jl:553-560`` +
``homotopy.jl:251`` guard), while a Theta-based *rejection* of a converged
solve shrinks via the controller's rate formula (``reject_step!``,
``homotopy.jl:243-265``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.solver.nonlinear.newton import NewtonRaphsonSolver


@dataclass
class HomotopySolveReport:
    t_reached: float
    steps: int = 0
    rejects: int = 0
    newton_iterations: int = 0
    converged: bool = False
    #: load increment in effect when the march ended (one shrink per
    #: rejected attempt — the invariant the reference pins in
    #: test_solid_mechanics.jl:960 "shrinks dt once, not twice")
    dt_final: float = 0.0


def _g(x):
    """g(x) = sqrt(1+4x) - 1 (Deuflhard 2004 Eq. 5.24 helper,
    ``homotopy.jl:253``)."""
    return np.sqrt(1.0 + 4.0 * x) - 1.0


@dataclass(frozen=True)
class _ThetaControllerBase:
    """Shared fields + accept test of the three reference controllers
    (``homotopy.jl:219-399``: all three ``should_accept_step`` methods are
    identical)."""

    theta_min: float = 0.125
    p: int = 1
    theta_reject: float = 0.95
    theta_bar: float = 0.5
    gamma: float = 0.95
    qmin: float = 0.2
    qmax: float = 5.0
    #: mirror of the reference Newton's ``enforce_monotonic_convergence``
    #: read by ``should_accept_step`` — when False only non-finite rates
    #: reject
    enforce_monotonic_convergence: bool = True

    def _q(self, theta):
        return float(np.clip(
            self.gamma * (_g(self.theta_bar) / _g(theta)) ** (1.0 / self.p),
            self.qmin, self.qmax))

    def should_accept(self, thetas) -> bool:
        """``should_accept_step`` (``homotopy.jl:231-243``): every observed
        rate at most ``theta_reject`` (monotonic mode) / finite."""
        th = np.asarray(thetas, float) if len(thetas) else np.zeros(0)
        if self.enforce_monotonic_convergence:
            return bool(np.all(th <= self.theta_reject))
        return bool(np.all(np.isfinite(th)))

    def on_reject(self, dt: float, thetas) -> float:
        """``reject_step!`` (``homotopy.jl:243-265``): shrink by the Eq. 5.24
        factor of the FIRST offending rate."""
        for theta in thetas:
            if theta > self.theta_reject:
                return self._q(theta) * dt
        return dt


@dataclass(frozen=True)
class Deuflhard2004DiscreteContinuationController(_ThetaControllerBase):
    """Deuflhard 2004 ch. 5 discrete continuation, rate-driven (parity:
    ``Deuflhard2004DiscreteContinuationController``,
    ``src/solver/time/homotopy.jl:219-283``)."""

    def on_accept(self, dt: float, thetas) -> float:
        """``adapt_dt!`` (``homotopy.jl:267-280``): a-priori prediction from
        the first-iteration rate, ``q = gamma*(g(theta_bar)/(2*Theta_0))^
        (1/p)``."""
        theta0 = max(float(thetas[0]), self.theta_min) if len(thetas) \
            else self.theta_min
        q = float(np.clip(
            self.gamma * (_g(self.theta_bar) / (2.0 * theta0))
            ** (1.0 / self.p),
            self.qmin, self.qmax))
        return q * dt


@dataclass(frozen=True)
class Deuflhard2004_B_DiscreteContinuationControllerVariant(
        _ThetaControllerBase):
    """B-variant (``homotopy.jl:283-345``): the reference's DEFAULT
    homotopy controller (``homotopy.jl:406``, ``theta_min=1/8, p=1``);
    growth uses ``g(Theta_0)`` instead of ``2*Theta_0``."""

    def on_accept(self, dt: float, thetas) -> float:
        theta0 = max(float(thetas[0]), self.theta_min) if len(thetas) \
            else self.theta_min
        q = float(np.clip(
            self.gamma * (_g(self.theta_bar) / _g(theta0)) ** (1.0 / self.p),
            self.qmin, self.qmax))
        return q * dt


@dataclass(frozen=True)
class ExperimentalDiscreteContinuationController(_ThetaControllerBase):
    """Experimental variant (``homotopy.jl:345-399``): reject on the WORST
    rate, adapt from the MEAN rate; softer defaults
    (``theta_reject=0.9, theta_bar=0.75``)."""

    theta_reject: float = 0.9
    theta_bar: float = 0.75

    def on_reject(self, dt: float, thetas) -> float:
        theta = max(thetas) if len(thetas) else 0.0
        return self._q(max(theta, 1e-12)) * dt

    def on_accept(self, dt: float, thetas) -> float:
        theta0 = max(float(np.mean(np.asarray(thetas, float))),
                     self.theta_min) if len(thetas) else self.theta_min
        q = float(np.clip(
            self.gamma * (_g(self.theta_bar) / (2.0 * theta0))
            ** (1.0 / self.p),
            self.qmin, self.qmax))
        return q * dt


@dataclass(frozen=True)
class IterationCountContinuationController:
    """Iteration-count heuristic (the repo's fallback, NOT a reference
    controller): scale the increment by
    ``gamma * sqrt(target_iterations / iters)`` on acceptance, contract
    geometrically on rejection. Coarser than the Theta_k controllers —
    iteration counts saturate at the budget while rates keep resolving —
    but needs no rate history (e.g. solvers that report only counts)."""

    target_iterations: int = 4
    gamma: float = 0.95
    max_growth: float = 2.0
    shrink_min: float = 0.25

    def on_accept(self, dt: float, iters: int) -> float:
        f = self.gamma * np.sqrt(self.target_iterations / max(iters, 1))
        return dt * float(np.clip(f, self.shrink_min, self.max_growth))

    def on_reject(self, dt: float, maxiter: int) -> float:
        # NOTE: HomotopyPathSolver.solve never calls this — an
        # iteration-count controller can only reject by Newton FAILURE,
        # and failure shrink is always dt/failfactor there. Kept for
        # callers driving the controller protocol directly.
        f = self.gamma * np.sqrt(self.target_iterations / max(maxiter, 1))
        return dt * float(np.clip(f, self.shrink_min, 0.5))


def _is_theta_controller(ctrl) -> bool:
    return isinstance(ctrl, _ThetaControllerBase) or \
        hasattr(ctrl, "should_accept")


@dataclass(frozen=True)
class HomotopyPathSolver:
    """March the load parameter t over [t0, t1]; at each step solve the
    quasi-static problem with the previous solution as predictor.
    ``controller=None`` keeps the fixed halve/grow rule; pass one of the
    ``*DiscreteContinuationController``s for reference-parity rate-driven
    control, or ``IterationCountContinuationController`` for the count
    heuristic."""

    newton: NewtonRaphsonSolver = NewtonRaphsonSolver()
    adaptive: bool = True
    dt_min_factor: float = 1e-4   # smallest allowed dt as fraction of initial
    growth: float = 2.0
    controller: Optional[Any] = None
    #: Newton-failure shrink divisor (``post_newton_controller!``:
    #: ``integrator.dt /= failfactor``; OrdinaryDiffEqCore default)
    failfactor: float = 2.0

    def solve(self, fn, u0, tspan, dt, monitor=None, store=None):
        """Returns (u at t1, HomotopySolveReport)."""
        t0, t1 = float(tspan[0]), float(tspan[1])
        dt0 = float(dt)
        dt_min = dt0 * self.dt_min_factor
        t = t0
        u = u0
        rep = HomotopySolveReport(t_reached=t0)
        dt_cur = dt0
        ctrl = self.controller
        theta_mode = ctrl is not None and _is_theta_controller(ctrl)
        while t < t1 - 1e-12 * max(1.0, abs(t1)):
            dt_cur = min(dt_cur, t1 - t)
            t_try = t + dt_cur
            if getattr(fn, "internal", None) is not None:
                fn.internal_dt = dt_cur
                fn.internal_t = t
            u_new, stats = self.newton.solve(fn, u, t_try, monitor=monitor)
            rep.newton_iterations += stats.iterations
            # a converged solve may still be REJECTED on its convergence
            # rates (``should_accept_step``); a failed solve always is
            accepted = stats.converged and (
                not theta_mode or ctrl.should_accept(stats.thetas))
            if accepted:
                t = t_try
                u = u_new
                if getattr(fn, "internal", None) is not None:
                    fn.update_internal_state(u, t, dt_cur)
                rep.steps += 1
                rep.t_reached = t
                if store is not None:
                    store(t, u)
                if theta_mode:
                    dt_cur = min(ctrl.on_accept(dt_cur, stats.thetas),
                                 t1 - t0)
                elif ctrl is not None:
                    dt_cur = min(ctrl.on_accept(dt_cur, stats.iterations),
                                 t1 - t0)
                elif self.adaptive and stats.iterations <= 5:
                    dt_cur = min(dt_cur * self.growth, dt0)
            else:
                rep.rejects += 1
                if not self.adaptive:
                    rep.dt_final = dt_cur
                    return u, rep
                if stats.converged:
                    # only a Theta-rate controller can reject a CONVERGED
                    # solve (``should_accept`` above) — for every other
                    # configuration accepted == stats.converged, so this
                    # branch is Theta-mode by construction
                    dt_cur = ctrl.on_reject(dt_cur, stats.thetas)
                else:
                    # solve failure: the step-footer's shrink
                    # (``post_newton_controller!``), one division per
                    # attempt — no controller rate formula stacks on top
                    # (``homotopy.jl:251`` force_stepfail guard), i.e.
                    # failure shrink is ALWAYS dt/failfactor
                    dt_cur = dt_cur / self.failfactor
                if dt_cur < dt_min:
                    rep.dt_final = dt_cur
                    return u, rep
        rep.converged = True
        rep.dt_final = dt_cur
        return u, rep


def _flatten_internal(internal, dt, t, dtype):
    """newton_extra layout from an explicit internal-state pytree:
    sorted-key leaves per stateful batch + the (dt, t) step context."""
    flat = []
    for st in internal:
        if st is not None:
            for key in sorted(st):
                flat.append(st[key])
    flat.append(jnp.asarray(dt, dtype))
    flat.append(jnp.asarray(t, dtype))
    return tuple(flat)


def march_fixed_ladder(newton, fn, u0, tspan, nsteps):
    """Device-resident FIXED homotopy ladder: ``nsteps`` equally spaced
    load steps, each a full embedded Newton solve, inside ONE jitted
    ``lax.scan`` — the production fast path when the ramp is known to
    converge at fixed increments (the adaptive/Theta_k controllers above
    are the host path that discovers a working ladder; a latency-bound
    chip pays ~40-90 ms per host dispatch, so a 4-step ramp costs more in
    round-trips than in compute below ~10k dofs).

    Stateful functions (condensed sarcomere state) carry their committed
    state through the scan via ``internal_after_step``. A step whose
    Newton fails is recorded and the march continues from its (unconverged)
    state — callers check ``converged.all()``.

    Returns ``(u, iterations [nsteps], converged [nsteps])``."""
    import jax

    core = newton.make_device_core(fn)
    t0, t1 = float(tspan[0]), float(tspan[1])
    dt = (t1 - t0) / int(nsteps)
    internal0 = getattr(fn, "internal", None)
    stateful = internal0 is not None
    dtype = u0.dtype

    from thunderbolt_tpu.utils.hoist import hoist_enabled, hoisted_jit
    hoist = hoist_enabled()
    cache_key = ("_homotopy_ladder_jit", newton, int(nsteps), t0, t1, hoist)
    run = fn.__dict__.get(cache_key)
    if run is None:
        def run(u0, internal):
            def body(carry, k):
                u, internal = carry
                t = t0 + (k + 1) * dt
                extra = _flatten_internal(internal, dt, t, dtype) \
                    if stateful else ()
                u, it, rn, conv, status, hist, ihist = core(u, t, extra)
                if stateful:
                    internal = fn.internal_after_step(u, t, dt, internal)
                return (u, internal), (it, conv)

            (u, internal), (its, convs) = jax.lax.scan(
                body, (u0, internal),
                jnp.arange(int(nsteps), dtype=jnp.int32))
            return u, internal, its, convs

        if hoist:
            # tunnel deployments: lift the FEM tables out of the HLO
            # constants so the remote compile request stays small
            # (utils/hoist.py; BASELINE.md 353k-dof note)
            example_internal = [None if st is None else dict(st)
                                for st in internal0] if stateful else None
            run = hoisted_jit(run, u0, example_internal)
        else:
            run = jax.jit(run)
        fn.__dict__[cache_key] = run

    internal_in = [None if st is None else dict(st)
                   for st in internal0] if stateful else None
    u, internal, its, convs = run(u0, internal_in)
    if stateful and bool(convs.all()):
        # commit ONLY on a fully converged march: the documented fallback
        # ("check converged.all() and retry with the host driver") must
        # start from the intact pre-march state, not a corrupted one
        fn.internal = [None if st is None else dict(st) for st in internal]
    return u, its, convs
