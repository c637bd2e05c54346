"""Operator splitting: Lie-Trotter-Godunov and Strang.

Parity: ``LieTrotterGodunov`` of OrdinaryDiffEqOperatorSplitting as used by
the reference (``src/Thunderbolt.jl:82-84``; child construction
``src/solver/time/integrator/operatorsplitting-interface.jl:23-232``).

TPU-native: the reference's recursive split-integrator tree (children
aliasing slices of the parent vector) becomes a *composed jitted step*: each
sub-solver's step closure operates on its slice of the flat state; slices
may overlap (the phi block, fem.jl:532-534) and sequential application
propagates updates exactly like the aliased views do.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from thunderbolt_tpu.disc.functions import GenericSplitFunction


@dataclass(frozen=True)
class Substepped:
    """Child gearing: run ``alg`` at a finer dt inside each outer split step.

    Parity: per-child dt in the reference's split-integrator tree
    (``operatorsplitting-interface.jl:23-232``; exercised by
    ``test/test_os_gearing.jl``) — children march at their own dt and
    synchronize at outer split boundaries. TPU-native form: the child's
    substep loop is a jitted ``fori_loop`` inside the composed outer step,
    so gearing costs no extra dispatches.

    Either give ``substeps`` (outer dt is divided evenly) or ``dt_max``
    (substep count is fitted so the child dt never exceeds it — the
    reference's tstop-fitting of a child whose dt does not divide the
    outer dt).
    """

    alg: object
    substeps: int = 1
    dt_max: Optional[float] = None

    def make_step(self, fn, dt):
        n = int(self.substeps)
        if self.dt_max is not None:
            n = max(n, int(math.ceil(dt / self.dt_max - 1e-12)))
        if n < 1:
            raise ValueError(f"substeps must be >= 1, got {n}")
        dti = dt / n
        inner = self.alg.make_step(fn, dti)
        if n == 1:
            return inner

        def step(u, t):
            def body(i, u):
                return inner(u, t + i * dti)

            return jax.lax.fori_loop(0, n, body, u)

        return step


@dataclass(frozen=True)
class LieTrotterGodunov:
    """First-order sequential splitting over the split function's children."""

    algorithms: Tuple

    def make_step(self, fn: GenericSplitFunction, dt):
        assert len(self.algorithms) == len(fn.functions)
        subs = [alg.make_step(f, dt)
                for alg, f in zip(self.algorithms, fn.functions)]
        ranges = fn.ranges

        def step(u, t):
            for sstep, rng in zip(subs, ranges):
                u = u.at[rng].set(sstep(u[rng], t))
            return u

        return step


@dataclass(frozen=True)
class StrangSplitting:
    """Second-order A(dt/2) B(dt) A(dt/2) splitting for two children."""

    algorithms: Tuple

    def make_step(self, fn: GenericSplitFunction, dt):
        assert len(self.algorithms) == len(fn.functions) == 2
        a_half = self.algorithms[0].make_step(fn.functions[0], dt / 2)
        b_full = self.algorithms[1].make_step(fn.functions[1], dt)
        ra, rb = fn.ranges

        def step(u, t):
            u = u.at[ra].set(a_half(u[ra], t))
            u = u.at[rb].set(b_full(u[rb], t))
            u = u.at[ra].set(a_half(u[ra], t + dt / 2))
            return u

        return step
