"""Fused Pallas TPU kernels for the pointwise cell-ODE substep chains.

The XLA-unrolled substep chain (solver/time/euler.py:_substep_chain) already
fuses well, but each substep still streams the SoA state through vector
registers one rhs at a time; staging a [nstates, B] block in VMEM and
running the WHOLE chain (all substeps + the adaptive select) in one kernel
removes the remaining traffic (measured on a v5e chip, 256^2 FHN adaptive
stage: 38 -> 25 us/step; the stage is then VPU-flop-bound).

This is the TPU analog of the reference's fused CUDA pointwise kernels
(``ext/CuThunderboltExt.jl:103-146``,
``src/solver/time/partitioned_solver.jl:38-100``) — one launch per step
instead of one per substep.

Eligibility (else the caller falls back to the XLA chain):
* float32 state (TPU Pallas has no f64),
* the ionic model does not read per-point coordinates
  (``ion.uses_coordinates`` is False — true for every shipped model),
* running on a TPU backend (or ``interpret=True`` for CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: points per grid block: [nstates, 8192] f32 = 32 kB/state-row — deep in
#: VMEM, and measured fastest among {8k, 16k, 32k} on v5e
_BLOCK = 8192


def _supported(ion, u_dtype, interpret):
    if getattr(ion, "uses_coordinates", False):
        return False
    if u_dtype != jnp.float32:
        return False
    if interpret:
        return True
    return jax.default_backend() == "tpu"


def _launch(kernel, ns, npts, dtype, u2d, t, interpret):
    grid = (npts + _BLOCK - 1) // _BLOCK
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1,), lambda i: (0,)),
                  pl.BlockSpec((ns, _BLOCK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((ns, _BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ns, npts), dtype),
        interpret=interpret,
    )(jnp.asarray([t], dtype), u2d)


def make_adaptive_substep_kernel(ion, npoints, dt, substeps, threshold,
                                 dtype=jnp.float32, interpret=False):
    """Fused AdaptiveForwardEulerSubstepper step (compute-both-and-select);
    returns ``step(u, t) -> u`` on the flat SoA block, or None if the
    configuration is not Pallas-eligible."""
    if not _supported(ion, dtype, interpret):
        return None
    ns = ion.nstates
    h = dt / substeps
    p = ion.phi_index

    def kernel(t_ref, u_ref, o_ref):
        U = u_ref[...]
        t = t_ref[0]
        dU = ion.rhs(U, None, t)
        coarse = U + dt * dU
        need = jnp.abs(dU[p]) > threshold
        Uf = U + h * dU
        for i in range(1, substeps):
            Uf = Uf + h * ion.rhs(Uf, None, t + i * h)
        o_ref[...] = jnp.where(need[None, :], Uf, coarse)

    def step(u, t):
        out = _launch(kernel, ns, npoints, dtype,
                      u.reshape(ns, npoints), t, interpret)
        return out.reshape(-1)

    return step


def make_forward_euler_kernel(ion, npoints, dt, substeps,
                              dtype=jnp.float32, interpret=False):
    """Fused fixed-substep forward-Euler chain."""
    if not _supported(ion, dtype, interpret):
        return None
    ns = ion.nstates
    h = dt / substeps

    def kernel(t_ref, u_ref, o_ref):
        U = u_ref[...]
        t = t_ref[0]
        for i in range(substeps):
            U = U + h * ion.rhs(U, None, t + i * h)
        o_ref[...] = U

    def step(u, t):
        out = _launch(kernel, ns, npoints, dtype,
                      u.reshape(ns, npoints), t, interpret)
        return out.reshape(-1)

    return step


def make_rush_larsen_kernel(ion, npoints, dt, substeps,
                            dtype=jnp.float32, interpret=False):
    """Fused Rush-Larsen chain: exponential gate update + Euler rest."""
    if not _supported(ion, dtype, interpret):
        return None
    if len(ion.gating_indices) == 0:
        return None
    ns = ion.nstates
    h = dt / substeps
    gidx = tuple(int(i) for i in ion.gating_indices)

    gpos = {g: k for k, g in enumerate(gidx)}

    def kernel(t_ref, u_ref, o_ref):
        U = u_ref[...]
        t = t_ref[0]
        for i in range(substeps):
            ti = t + i * h
            dU = ion.rhs(U, None, ti)
            inf, tau = ion.gating_inf_tau(U, None, ti)
            # per-row static select (Pallas kernels cannot capture index
            # arrays): gates get the exponential update from the PRE-step
            # state — matches RushLarsenCellSolver's substep exactly
            rows = []
            for r in range(ns):
                if r in gpos:
                    k = gpos[r]
                    rows.append(inf[k] + (U[r] - inf[k])
                                * jnp.exp(-h / tau[k]))
                else:
                    rows.append(U[r] + h * dU[r])
            U = jnp.stack(rows)
        o_ref[...] = U

    def step(u, t):
        out = _launch(kernel, ns, npoints, dtype,
                      u.reshape(ns, npoints), t, interpret)
        return out.reshape(-1)

    return step
