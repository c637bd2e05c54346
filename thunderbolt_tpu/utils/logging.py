"""Monitors, structured logging, profiling scopes.

Parity: ``src/solver/logging.jl`` — ``DefaultProgressMonitor`` (``:3``),
``VTKNewtonMonitor`` (``:101``), the structured log groups
(:timeintegration/:nlsolve/:linsolve, ``:18-98``) — plus the
``TimerOutputs.@timeit_debug`` taxonomy of SURVEY.md §5.1 as named host
timers + ``jax.named_scope`` for device traces (inspect with
``jax.profiler``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field as dfield
from typing import Dict

import jax

log_nlsolve = logging.getLogger("thunderbolt_tpu.nlsolve")
log_linsolve = logging.getLogger("thunderbolt_tpu.linsolve")
log_timeintegration = logging.getLogger("thunderbolt_tpu.timeintegration")


@dataclass
class DefaultProgressMonitor:
    """Callable Newton monitor: logs per-iteration residual norms."""

    name: str = "newton"

    def __call__(self, it, rnorm):
        log_nlsolve.debug("%s it=%d |r|=%.3e", self.name, it, rnorm)


@dataclass
class VTKNewtonMonitor:
    """Dump the residual + increment fields per Newton iteration to VTU
    (parity: ``src/solver/logging.jl:101-120`` — per-iteration
    ``newton-monitor-<step>-<iter>.vtu`` debug files).

    Pass as ``monitor=`` to ``NewtonRaphsonSolver.solve``; the host Newton
    loop logs ``__call__(it, rnorm)`` and feeds the residual and Newton
    increment vectors to :meth:`step_fields`, which reorders the primary
    field's dofs to mesh-node order and writes one VTU per iteration.
    """

    mesh: object
    fn: object
    outdir: str = "./newton-debug"
    basename: str = "newton-monitor"
    #: bumped once per nonlinear solve so files from successive time/load
    #: steps don't collide
    solve_count: int = 0

    def __post_init__(self):
        import os
        os.makedirs(self.outdir, exist_ok=True)

    def new_solve(self):
        self.solve_count += 1

    def __call__(self, it, rnorm):
        log_nlsolve.debug("vtk-newton it=%d |r|=%.3e", it, rnorm)

    def _field_to_nodes(self, vec):
        """Reorder the primary field's slice of a dof vector to
        [nnodes(, ncomp)] mesh-node order (unset nodes -> 0)."""
        import numpy as np
        fi = self.fn.dh.fields[self.fn.field]
        vals = np.asarray(vec)[fi.offset:fi.offset + fi.ndofs]
        vals = vals.reshape(fi.nentities, fi.ncomponents)
        out = np.zeros((self.mesh.nnodes, fi.ncomponents), vals.dtype)
        mask = fi.entity_nodes >= 0
        out[fi.entity_nodes[mask]] = vals[mask]
        return out if fi.ncomponents > 1 else out[:, 0]

    def step_fields(self, it, u, r, du):
        from thunderbolt_tpu.io.vtk import write_vtu
        import os
        path = os.path.join(
            self.outdir, f"{self.basename}-{self.solve_count}-{it}.vtu")
        write_vtu(path, self.mesh, point_data={
            "residual": self._field_to_nodes(r),
            "increment": self._field_to_nodes(du),
            "u": self._field_to_nodes(u),
        })
        log_nlsolve.debug("vtk-newton wrote %s", path)


# ---------------------------------------------------------------------------
# profiling: host timers + device named scopes
# ---------------------------------------------------------------------------

_TIMINGS: Dict[str, list] = defaultdict(list)
_ENABLED = False


def enable_debug_timings(flag: bool = True):
    """Parity: ``TimerOutputs.enable_debug_timings`` (benchmarking how-to,
    ``docs/src/howto/benchmarking.md``)."""
    global _ENABLED
    _ENABLED = flag


@contextlib.contextmanager
def timeit(name: str):
    """Named host timer + jax.named_scope so the region is labeled in XLA
    profiles. Zero-cost when disabled."""
    if not _ENABLED:
        with jax.named_scope(name):
            yield
        return
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    _TIMINGS[name].append(time.perf_counter() - t0)


def reset_timers():
    """Clear all accumulated `timeit` timings."""
    _TIMINGS.clear()


def print_timers(stream=None):
    """Print the accumulated `timeit` table (TimerOutputs-style)."""
    import sys
    stream = stream or sys.stdout
    rows = sorted(_TIMINGS.items(), key=lambda kv: -sum(kv[1]))
    stream.write(f"{'section':<32}{'ncalls':>8}{'total s':>12}{'avg ms':>12}\n")
    for name, vals in rows:
        tot = sum(vals)
        stream.write(f"{name:<32}{len(vals):>8}{tot:>12.4f}"
                     f"{1000 * tot / len(vals):>12.3f}\n")


def get_timers():
    return {k: list(v) for k, v in _TIMINGS.items()}
