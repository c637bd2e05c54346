"""Reverse-differentiable monodomain electrophysiology.

The production EP path (``solver/time/euler.py``) adapts its linear solves
(CG reduction loops, ``while_loop`` controllers) — ideal forward
throughput, but not reverse-differentiable. This module builds the SAME
operator-split physics as a single static XLA program:

* conductivity assembly stays traced: D -> element matrices ->
  ``segment_sum`` CSR values -> DIA diagonals, all jnp;
* the backward-Euler heat solve is the fixed-count Jacobi-Chebyshev
  iteration (``solver/linear.py:chebyshev``) — a static chain of SpMV +
  axpy with NO inner products and NO data-dependent control flow, so its
  transpose is just another static chain;
* reaction substeps are an unrolled explicit-Euler chain on the SoA cell
  state;
* the march is a ``lax.scan`` with per-step ``jax.checkpoint``
  (rematerialization bounds the reverse-pass memory at O(state) per step
  instead of storing every Chebyshev/substep intermediate).

Result: ``jax.grad`` of any functional of the trajectory w.r.t. the
conductivity tensor (or stimulus parameters threaded through ``stim``)
in one forward + one backward pass — conductivity identification from
activation maps, on TPU, with the same kernels the forward solver uses.

The Chebyshev spectral interval must be STATIC (host floats), so it is
estimated once at construction on a reference conductivity and widened by
``bounds_safety``; gradients do not flow through the interval (it is a
preconditioner parameter — any covering interval gives the exact same
fixed point, only the per-step solve error changes, and that error is
driven below ``rtol`` by the iteration count).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_dia, DIAMatrix
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_mass, element_diffusion, scatter_matrix)
from thunderbolt_tpu.solver.linear import (
    chebyshev, chebyshev_iterations, lanczos_bounds, jacobi_preconditioner)


class DifferentiableMonodomain:
    """Operator-split monodomain march, reverse-differentiable in the
    diffusivity.

    chi*Cm dphi/dt = div(kappa grad phi) + chi*(I_ion + I_stim): pass the
    folded diffusivity D = kappa/(chi*Cm) (scalar or [sdim, sdim] tensor;
    traced) to :meth:`march` — the same folding ``semidiscretize`` applies
    (``disc/semidiscretize.py``, ref ``fem.jl:415``).

    Parameters: ``ion`` is any :class:`CellModel`; ``stim(x, t)`` an
    optional additive current evaluated at the dof coordinates during the
    reaction substeps; ``D_ref`` the (concrete) reference diffusivity used
    to fix the static Chebyshev interval; ``rtol`` the per-solve error the
    fixed iteration count targets.
    """

    def __init__(self, mesh, ion, dt, *, substeps: int = 4,
                 order: int = 1, dtype=jnp.float64, rtol: float = 1e-8,
                 stim: Optional[Any] = None, D_ref: Any = 1.0,
                 bounds_safety: float = 1.5, degree: Optional[int] = None,
                 remat: bool = True):
        self.ion, self.dt, self.substeps = ion, float(dt), int(substeps)
        self.stim, self.remat = stim, remat
        dh = DofHandler(mesh).add_field("phi_m", order=order).close()
        self.dh = dh
        subs = dh.subdata("phi_m")
        self.pattern = build_sparsity([s.cell_dofs for s in subs], dh.ndofs)
        self.batches = [make_form_batch(dh, s, degree=degree, dtype=dtype)
                        for s in subs]
        self.elem_maps = [jnp.asarray(em) for em in self.pattern.elem_maps]
        mvals = jnp.zeros(self.pattern.nnz, dtype)
        for batch, em in zip(self.batches, self.elem_maps):
            mvals = mvals + scatter_matrix(element_mass(batch), em,
                                           self.pattern.nnz)
        self.M = csr_to_dia(self.pattern, mvals)
        if self.M is None:
            raise ValueError(
                "dof ordering too scattered for the DIA fast path — "
                "renumber the mesh (mesh/tools.py:reorder_mesh_rcm) first")
        self.coords = jnp.asarray(dh.fields["phi_m"].entity_coords, dtype)
        self.npoints = dh.fields["phi_m"].ndofs

        # static spectral interval + iteration count from D_ref
        A_ref = self.assemble_A(jnp.asarray(D_ref, dtype))
        diag = A_ref.diagonal()
        s = 1.0 / jnp.sqrt(jnp.abs(diag))
        lmin, lmax = lanczos_bounds(lambda v: s * A_ref.mv(s * v),
                                    diag.shape[0], diag.dtype)
        self.lam_min = 0.9 * float(lmin) / bounds_safety
        self.lam_max = 1.02 * float(lmax) * bounds_safety
        self.cheb_iters = chebyshev_iterations(self.lam_max / self.lam_min,
                                               rtol)

    # -- traced assembly ---------------------------------------------------

    def assemble_A(self, D) -> DIAMatrix:
        """A = M - dt*K with K(D) assembled under trace (K carries the
        -int grad N . D grad N sign, so A is SPD)."""
        kvals = jnp.zeros(self.pattern.nnz, self.M.diags.dtype)
        for batch, em in zip(self.batches, self.elem_maps):
            kvals = kvals + scatter_matrix(element_diffusion(batch, D), em,
                                           self.pattern.nnz)
        K = csr_to_dia(self.pattern, kvals)
        return DIAMatrix(self.M.offsets, self.M.diags - self.dt * K.diags,
                         self.M.n)

    # -- the march -----------------------------------------------------------

    def initial_states(self, dtype=None):
        """[nstates, npoints] default initial state of the ionic model."""
        dtype = dtype or self.M.diags.dtype
        return jnp.asarray(self.ion.initial_state_array(self.npoints),
                           dtype)

    def march(self, D, states0, nsteps: int, t0: float = 0.0, probe=None,
              stim_params=None):
        """March ``nsteps`` Lie-Trotter steps (heat then reaction, as the
        production ``LieTrotterGodunov((BackwardEulerSolver, cells))``
        ordering). Returns ``(states, trace)`` where ``trace`` is the
        per-step phi at the ``probe`` dof indices (``None`` -> no trace).

        Fully reverse-differentiable in ``D`` and ``stim_params`` (when
        given, ``stim`` is called as ``stim(x, t, stim_params)``). Also a
        pure function of its traced arguments, so **ensembles vmap**:

            jax.vmap(lambda d: dm.march(d, states0, n, probe=p)[1])(Ds)

        runs a whole parameter population as one batched XLA program —
        the TPU-native form of population-of-models sweeps."""
        A = self.assemble_A(D)
        Minv = jacobi_preconditioner(A.diagonal())
        ion, pi = self.ion, self.ion.phi_index
        h = self.dt / self.substeps
        x = self.coords if getattr(ion, "uses_coordinates", False) else None

        def one_step(states, t):
            phi = states[pi]
            b = self.M.mv(phi)
            phi = chebyshev(A.mv, b, x0=phi, lam_min=self.lam_min,
                            lam_max=self.lam_max, iters=self.cheb_iters,
                            Minv=Minv)
            states = states.at[pi].set(phi)
            for i in range(self.substeps):
                ts = t + i * h
                du = ion.rhs(states, x, ts)
                if self.stim is not None:
                    cur = (self.stim(self.coords, ts) if stim_params is None
                           else self.stim(self.coords, ts, stim_params))
                    du = du.at[pi].add(cur)
                states = states + h * du
            return states

        step = jax.checkpoint(one_step) if self.remat else one_step

        def body(states, i):
            t = t0 + i * self.dt
            s = step(states, t)
            y = s[pi, probe] if probe is not None else 0.0
            return s, y

        states, trace = jax.lax.scan(
            body, states0, jnp.arange(nsteps, dtype=self.M.diags.dtype))
        return states, (trace if probe is not None else None)
