"""ECG forward models: Plonsey pseudo-ECG, Poisson reconstruction,
Geselowitz lead fields.

Parity: ``src/modeling/electrophysiology/ecg.jl`` —
``Plonsey1964ECGGaussCache`` (``:55-163``),
``PoissonECGReconstructionCache`` (``:166-356``),
``Geselowitz1989ECGLeadCache`` (``:382-617``), shared
``update_ecg!``/``evaluate_ecg`` protocol.

TPU-native: the Plonsey integral is one fused einsum over all quadrature
points x electrodes (jitted); lead fields are precomputed CG solves against
the shared ELL pattern; per-step evaluation is one SpMV + dot per lead.
Heart == torso mesh in this tier; distinct torso meshes arrive with the
intergrid transfer operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_diffusion, scatter_matrix, _normalize_tensor)
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
from thunderbolt_tpu.fem.constraints import (
    Dirichlet, close_constraints, ConstraintHandler)
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner
from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient)
from thunderbolt_tpu.fem.forms import FormBatch


def _assemble_kappa(dh, field, kappa, dtype):
    subs = dh.subdata(field)
    pattern = build_sparsity([s.cell_dofs for s in subs], dh.ndofs)
    kvals = jnp.zeros(pattern.nnz, dtype)
    batches = []
    for s, em in zip(subs, pattern.elem_maps):
        batch = make_form_batch(dh, s, dtype=dtype)
        batches.append(batch)
        D = evaluate_coefficient(setup_coefficient_cache(kappa, batch), 0.0)
        kvals = kvals + scatter_matrix(element_diffusion(batch, D),
                                       jnp.asarray(em), pattern.nnz)
    return pattern, csr_to_ell(pattern, kvals), batches


class Plonsey1964ECGGaussCache:
    """Infinite-domain pseudo-ECG from quadrature fluxes:

    phi_e(x) = -1/(4 pi k_t) \\int k_i grad(phi_m) . (y - x)/|y - x|^3 dy
    (``ecg.jl:80-137``)."""

    def __init__(self, heat_fn, kappa_i=None, dtype=jnp.float64):
        """heat_fn: the EP split's AffineODEFunction (or any scalar-field
        function with dh/field); kappa_i defaults to the conductivity used
        in the heat operator (pass explicitly for distinct intracellular
        tensors)."""
        dh, field = heat_fn.dh, heat_fn.field
        self.dh, self.field = dh, field
        subs = dh.subdata(field)
        self.batches = [make_form_batch(dh, s, dtype=dtype) for s in subs]
        self.D = []
        for batch in self.batches:
            if kappa_i is None:
                self.D.append(None)
            else:
                self.D.append(evaluate_coefficient(
                    setup_coefficient_cache(kappa_i, batch), 0.0))
        self._flux = None

        def compute_fluxes(phi):
            out = []
            for batch, D in zip(self.batches, self.D):
                dNdx, detJw = batch.geometry()
                pe = phi[batch.cell_dofs]
                grad = jnp.einsum("cqbK,cb->cqK", dNdx, pe)
                if D is not None:
                    # scalar kappa means kappa*I (NOT a kappa-filled matrix,
                    # which would mix gradient components across axes)
                    nc, nqp = detJw.shape
                    Dn = _normalize_tensor(D, nc, nqp, grad.shape[-1],
                                           grad.dtype)
                    grad = jnp.einsum("cqij,cqj->cqi", Dn, grad)
                out.append((grad, detJw, batch.xq))
            return out

        self._compute_fluxes = jax.jit(compute_fluxes)

    def update_ecg(self, phi):
        self._flux = self._compute_fluxes(jnp.asarray(phi))
        return self

    def evaluate_ecg(self, electrodes, kappa_t: float):
        """electrodes: [ne, sdim]; returns [ne] potentials."""
        x = jnp.asarray(electrodes, self.batches[0].xq.dtype)
        phi_e = jnp.zeros(x.shape[0], x.dtype)
        for grad, detJw, xq in self._flux:
            rel = xq[None] - x[:, None, None]          # [ne, nc, nqp, sdim]
            r3 = jnp.linalg.norm(rel, axis=-1) ** 3
            contrib = jnp.einsum("cqk,ecqk,cq->e", grad, rel / r3[..., None],
                                 detJw)
            phi_e = phi_e + contrib
        return np.asarray(-phi_e / (4 * jnp.pi * kappa_t))


class Geselowitz1989ECGLeadCache:
    """Lead-field (adjoint) ECG: solve div(k grad Z) = +-1 at the electrode
    pair once; then V(t) = \\int grad Z . k_i grad phi_m dx per step
    (``ecg.jl:382-617``)."""

    def __init__(self, heat_fn, kappa, kappa_i, electrode_pairs,
                 ground=None, dtype=jnp.float64, rtol=1e-10,
                 torso_mesh=None):
        """electrode_pairs: sequence of ((x+, x-)) positions; ground: a
        nodeset name or position pinning the potential (defaults to the
        first electrode of the first pair).

        With ``torso_mesh`` given, the lead fields Z are solved on the torso
        volume conductor (electrodes/ground located on torso coordinates,
        conductivity ``kappa`` on the torso) and transferred torso -> heart
        ONCE by nodal interpolation; the per-step lead integral stays on the
        heart (adjoint trick — cheaper than transferring phi_m per step).
        Mirrors the embedded-heart setup of the reference's ep04 tutorial
        (``docs/src/literate-tutorials/ep04_geselowitz-ecg.jl``)."""
        heart_dh, field = heat_fn.dh, heat_fn.field
        self.dh = heart_dh
        patt_i, self.Ki, _ = _assemble_kappa(heart_dh, field, kappa_i, dtype)
        if torso_mesh is not None:
            from thunderbolt_tpu.fem.points import NodalIntergridTransfer
            dh = DofHandler(torso_mesh).add_field(field).close()
        else:
            dh = heart_dh
        pattern, K, batches = _assemble_kappa(dh, field, kappa, dtype)
        fi = dh.fields[field]
        coords = fi.entity_coords

        A_raw = ELL_neg(K)
        gpos = np.asarray(ground if ground is not None
                          else electrode_pairs[0][0], float)
        gdof = int(np.argmin(np.linalg.norm(coords - gpos, axis=1)))
        free = np.ones(dh.ndofs, bool)
        free[gdof] = False
        ch = ConstraintHandler(jnp.asarray(free),
                               jnp.asarray([gdof], jnp.int32),
                               jnp.zeros(1, dtype))
        A = ch.apply_operator(A_raw)
        Minv = jacobi_preconditioner(A.diagonal())
        Z = []
        for (xp, xm) in electrode_pairs:
            dp = int(np.argmin(np.linalg.norm(coords - np.asarray(xp), axis=1)))
            dm = int(np.argmin(np.linalg.norm(coords - np.asarray(xm), axis=1)))
            f = jnp.zeros(dh.ndofs, dtype).at[dp].set(-1.0).at[dm].set(1.0)
            f = ch.apply_zero(f)
            z, info = cg(A.mv, f, Minv=Minv, rtol=rtol, atol=1e-14,
                         maxiter=20000)
            if not bool(info.converged):
                raise RuntimeError(f"lead-field solve failed: {info}")
            Z.append(z)
        Z = jnp.stack(Z)  # [nleads, torso or heart ndofs]
        if torso_mesh is not None:
            # transfer each lead field to the heart dof locations once
            from thunderbolt_tpu.fem.points import NodalIntergridTransfer
            hcoords = heart_dh.fields[field].entity_coords
            xfer = NodalIntergridTransfer(torso_mesh, dh, field, hcoords)
            Z = jnp.stack([jnp.asarray(
                np.nan_to_num(np.asarray(xfer.transfer(z)))) for z in Z])
        self.Z = Z  # [nleads, heart ndofs]
        self._V = None

        @jax.jit
        def leads(phi):
            # int grad Z . k_i grad phi = -Z^T K_i phi  (K carries the -)
            return -(self.Z @ self.Ki.mv(phi))

        self._leads = leads

    def update_ecg(self, phi):
        self._V = self._leads(jnp.asarray(phi))
        return self

    def evaluate_ecg(self):
        return np.asarray(self._V)


class PoissonECGReconstructionCache:
    """Volume-conductor reconstruction: solve
    div(k grad phi_e) = -div(k_i grad phi_m) with a grounded electrode, then
    read phi_e at the electrodes (``ecg.jl:166-356``)."""

    def __init__(self, heat_fn, kappa, kappa_i, electrodes, ground=None,
                 dtype=jnp.float64, rtol=1e-8, torso_mesh=None):
        """With `torso_mesh` given, phi_m is transferred heart -> torso by
        nodal intergrid interpolation (zeros outside the heart — the
        reference clears the resulting NaNs the same way, ``ecg.jl:344``)
        and the volume conductor problem is solved on the torso."""
        if torso_mesh is not None:
            from thunderbolt_tpu.fem.dofs import DofHandler
            from thunderbolt_tpu.fem.points import NodalIntergridTransfer
            heart_dh, hfield = heat_fn.dh, heat_fn.field
            tdh = DofHandler(torso_mesh).add_field(hfield).close()
            tcoords = tdh.fields[hfield].entity_coords
            self._transfer = NodalIntergridTransfer(
                heat_fn.dh.mesh, heart_dh, hfield, tcoords)

            class _TorsoFn:
                pass
            tf = _TorsoFn()
            tf.dh, tf.field = tdh, hfield
            heat_fn = tf
        else:
            self._transfer = None
        dh, field = heat_fn.dh, heat_fn.field
        self.dh = dh
        pattern, K, _ = _assemble_kappa(dh, field, kappa, dtype)
        patt_i, Ki, _ = _assemble_kappa(dh, field, kappa_i, dtype)
        fi = dh.fields[field]
        coords = fi.entity_coords
        self.edofs = np.asarray([
            int(np.argmin(np.linalg.norm(coords - np.asarray(e), axis=1)))
            for e in electrodes])
        gpos = np.asarray(ground if ground is not None else electrodes[0],
                          float)
        gdof = int(np.argmin(np.linalg.norm(coords - gpos, axis=1)))
        free = np.ones(dh.ndofs, bool)
        free[gdof] = False
        ch = ConstraintHandler(jnp.asarray(free),
                               jnp.asarray([gdof], jnp.int32),
                               jnp.zeros(1, dtype))
        A_raw = ELL_neg(K)
        A = ch.apply_operator(A_raw)
        Minv = jacobi_preconditioner(A.diagonal())
        self.phi_e = jnp.zeros(dh.ndofs, dtype)

        def solve(phi, phi_e0):
            b = ch.apply_zero(Ki.mv(phi))
            x, info = cg(A.mv, b, x0=phi_e0, Minv=Minv, rtol=rtol,
                         atol=1e-12, maxiter=20000)
            return x

        self._solve = jax.jit(solve)

    def update_ecg(self, phi):
        if self._transfer is not None:
            phi_t = self._transfer.transfer(phi)
            phi = np.nan_to_num(phi_t, nan=0.0)
        self.phi_e = self._solve(jnp.asarray(phi), self.phi_e)
        return self

    def evaluate_ecg(self):
        return np.asarray(self.phi_e)[self.edofs]


def ELL_neg(K):
    from thunderbolt_tpu.fem.sparsity import ELLMatrix
    return ELLMatrix(K.cols, -K.vals, K.diag_pos)
