"""Reverse-mode differentiation of the PRODUCTION EP march.

Round-2 shipped :class:`~thunderbolt_tpu.ad.ep.DifferentiableMonodomain`,
a self-contained scan-kernel monodomain (single field, own DIA assembly)
— fast, but a parallel mini-stack. This module closes the gap from the
other side: it makes the ORDINARY semidiscretized objects — a
``ReactionDiffusionSplit`` through ``semidiscretize`` with
multi-subdomain ionic models, stimulation protocols and Dirichlet
constraints — marchable under ``jax.grad``, by (1) validating that every
child solver of the splitting algorithm is reverse-mode-safe (fixed
iteration counts: Chebyshev backward Euler, fixed-substep cell solvers —
adaptive ``while_loop`` drivers cannot be reversed) and (2) wrapping each
step in ``jax.checkpoint`` so an ``nsteps``-long march stores O(1) states
per step instead of every solver intermediate.

``DifferentiableMonodomain`` remains the specialized scan-kernel backend
for conductivity/parameter identification (traced assembly); this is the
generic path for gradients w.r.t. the STATE (initial conditions, data
assimilation adjoints) over the full production feature set.

The reference has no counterpart (its solvers are mutating Julia loops);
reference-parity anchor for the *objects* being differentiated:
``semidiscretize`` (``src/discretization/fem.jl``) +
``ReactionDiffusionSplit`` (``src/modeling/electrophysiology.jl``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thunderbolt_tpu.solver.time.euler import (
    BackwardEulerSolver, ForwardEulerCellSolver, RushLarsenCellSolver,
    AdaptiveForwardEulerSubstepper)
from thunderbolt_tpu.solver.time.splitting import (
    Substepped, LieTrotterGodunov, StrangSplitting)


def _validate_reverse_safe(alg):
    """Raise with a precise fix when a child solver's inner loop cannot be
    reverse-differentiated (data-dependent ``while_loop`` trip counts)."""
    if isinstance(alg, (LieTrotterGodunov, StrangSplitting)):
        for child in alg.algorithms:
            _validate_reverse_safe(child)
        return
    if isinstance(alg, Substepped):
        _validate_reverse_safe(alg.alg)
        return
    if isinstance(alg, BackwardEulerSolver):
        if alg.solver != "chebyshev":
            raise ValueError(
                "reverse-mode through the EP march needs a fixed-count "
                "heat solve: use BackwardEulerSolver(solver='chebyshev') "
                "(the adaptive CG while_loop cannot be reversed)")
        return
    if isinstance(alg, AdaptiveForwardEulerSubstepper):
        raise ValueError(
            "AdaptiveForwardEulerSubstepper steps inside a data-dependent "
            "while_loop; use ForwardEulerCellSolver(substeps=k) or "
            "RushLarsenCellSolver(substeps=k) for differentiable marches")
    if isinstance(alg, (ForwardEulerCellSolver, RushLarsenCellSolver)):
        return
    # unknown solver: fall through (the user may supply their own fixed-
    # count stepper); reverse-mode will fail loudly at trace time if not


def make_differentiable_ep_march(odeform, alg, dt, nsteps, *,
                                 checkpoint=True, probe=None):
    """Build ``march(u0, t0=0.0) -> u_T`` (or ``(u_T, trace)`` with a
    ``probe``) over the PRODUCTION semidiscretized split function,
    reverse-differentiable w.r.t. ``u0``.

    ``odeform``: the ``GenericSplitFunction`` from
    ``semidiscretize(ReactionDiffusionSplit(model), ...)`` — any number of
    subdomains, stimuli, Dirichlet constraints.
    ``alg``: a splitting algorithm whose children are fixed-count
    (validated; see :func:`_validate_reverse_safe`).
    ``probe(u, t) -> pytree`` is recorded after every step (activation
    maps, electrode traces) and is differentiated alongside.
    ``checkpoint=True`` wraps the step in ``jax.checkpoint`` —
    re-computing each step's forward pass during the backward sweep
    instead of storing every Chebyshev/reaction intermediate, the
    standard remat trade for O(nsteps)-deep reverse marches.
    """
    _validate_reverse_safe(alg)
    step = alg.make_step(odeform, float(dt))
    if checkpoint:
        step = jax.checkpoint(step)
    dt = float(dt)
    nsteps = int(nsteps)

    def march(u0, t0=0.0):
        def body(u, k):
            u = step(u, t0 + k * dt)
            return u, (None if probe is None else probe(u, t0 + (k + 1) * dt))

        u, trace = jax.lax.scan(body, u0,
                                jnp.arange(nsteps, dtype=u0.dtype))
        return u if probe is None else (u, trace)

    return march
