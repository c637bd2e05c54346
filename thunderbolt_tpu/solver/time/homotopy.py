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


@dataclass(frozen=True)
class HomotopyPathSolver:
    """March the load parameter t over [t0, t1]; at each step solve the
    quasi-static problem with the previous solution as predictor."""

    newton: NewtonRaphsonSolver = NewtonRaphsonSolver()
    adaptive: bool = True
    dt_min_factor: float = 1e-4   # smallest allowed dt as fraction of initial
    growth: float = 2.0

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
                if self.adaptive and stats.iterations <= 5:
                    dt_cur = min(dt_cur * self.growth, dt0)
            else:
                rep.rejects += 1
                if not self.adaptive:
                    return u, rep
                dt_cur *= 0.5
                if dt_cur < dt_min:
                    return u, rep
        rep.converged = True
        return u, rep
