"""Load-stepping / pseudo-time continuation for quasi-static problems.

Parity: ``HomotopyPathSolver`` (``src/solver/time/homotopy.jl:7-399``) with
the Deuflhard-style adaptive step control in its simple form: accept a step
when Newton converges; on failure halve the load increment and retry; grow
the increment again after successes (the discrete continuation controllers
``homotopy.jl:219-341`` refine the growth/shrink factors — here fixed 2x).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np

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


@dataclass(frozen=True)
class Deuflhard2004DiscreteContinuationController:
    """Predictive load-increment control from observed Newton effort
    (Deuflhard 2004 ch. 5 discrete continuation; parity:
    ``Deuflhard2004DiscreteContinuationController``,
    ``src/solver/time/homotopy.jl:219-283``).

    On acceptance the increment scales by
    ``gamma * sqrt(target_iterations / iters)`` (few iterations -> the
    path is mildly nonlinear here -> grow; many -> shrink), clipped to
    [shrink_min, max_growth]. On rejection the same prediction is applied
    with the iteration budget as the observed effort, so repeated
    rejections contract geometrically."""

    target_iterations: int = 4
    gamma: float = 0.95
    max_growth: float = 2.0
    shrink_min: float = 0.25

    def on_accept(self, dt: float, iters: int) -> float:
        f = self.gamma * np.sqrt(self.target_iterations / max(iters, 1))
        return dt * float(np.clip(f, self.shrink_min, self.max_growth))

    def on_reject(self, dt: float, maxiter: int) -> float:
        f = self.gamma * np.sqrt(self.target_iterations / max(maxiter, 1))
        return dt * float(np.clip(f, self.shrink_min, 0.5))


@dataclass(frozen=True)
class HomotopyPathSolver:
    """March the load parameter t over [t0, t1]; at each step solve the
    quasi-static problem with the previous solution as predictor.
    ``controller=None`` keeps the fixed halve/grow rule; pass a
    ``Deuflhard2004DiscreteContinuationController`` for predictive
    increments."""

    newton: NewtonRaphsonSolver = NewtonRaphsonSolver()
    adaptive: bool = True
    dt_min_factor: float = 1e-4   # smallest allowed dt as fraction of initial
    growth: float = 2.0
    controller: Optional[Any] = None

    def solve(self, fn, u0, tspan, dt, monitor=None, store=None):
        """Returns (u at t1, HomotopySolveReport)."""
        t0, t1 = float(tspan[0]), float(tspan[1])
        dt0 = float(dt)
        dt_min = dt0 * self.dt_min_factor
        t = t0
        u = u0
        rep = HomotopySolveReport(t_reached=t0)
        dt_cur = dt0
        while t < t1 - 1e-12 * max(1.0, abs(t1)):
            dt_cur = min(dt_cur, t1 - t)
            t_try = t + dt_cur
            if getattr(fn, "internal", None) is not None:
                fn.internal_dt = dt_cur
                fn.internal_t = t
            u_new, stats = self.newton.solve(fn, u, t_try, monitor=monitor)
            rep.newton_iterations += stats.iterations
            if stats.converged:
                t = t_try
                u = u_new
                if getattr(fn, "internal", None) is not None:
                    fn.update_internal_state(u, t, dt_cur)
                rep.steps += 1
                rep.t_reached = t
                if store is not None:
                    store(t, u)
                if self.controller is not None:
                    dt_cur = min(self.controller.on_accept(
                        dt_cur, stats.iterations), t1 - t0)
                elif self.adaptive and stats.iterations <= 5:
                    dt_cur = min(dt_cur * self.growth, dt0)
            else:
                rep.rejects += 1
                if not self.adaptive:
                    rep.dt_final = dt_cur
                    return u, rep
                if self.controller is not None:
                    dt_cur = self.controller.on_reject(
                        dt_cur, self.newton.max_iter)
                else:
                    dt_cur *= 0.5
                if dt_cur < dt_min:
                    rep.dt_final = dt_cur
                    return u, rep
        rep.converged = True
        rep.dt_final = dt_cur
        return u, rep
