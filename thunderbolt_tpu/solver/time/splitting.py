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

from dataclasses import dataclass
from typing import Tuple

from thunderbolt_tpu.disc.functions import GenericSplitFunction


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
