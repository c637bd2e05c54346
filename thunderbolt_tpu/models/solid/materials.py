"""Material composites: stress = AD of energy (+ active parts).

Parity: ``src/modeling/solid/materials.jl`` — ``PK1Model`` (``:993``),
``GeneralizedHillModel`` (``:1054``), ``ExtendedHillModel`` (``:1126``),
``ActiveStressModel`` (``:1200``), ``PrestressedMechanicalModel`` (``:789``)
and the AD-first ``material_routine`` design (``:302-573``): stresses come
from ``jax.grad`` of scalar energies, tangents from ``jax.jacfwd`` of the
stress map — the JAX analog of ``Tensors.hessian``.

Per-qp protocol consumed by the element kernels (disc/mechanics.py):

* ``setup(batch)`` -> cache (microstructure frames materialized, coefficient
  caches for calcium etc.),
* ``aux(cache, t)`` -> dict of per-(cell, qp) driving arrays (traced in t),
* ``first_piola(F, frame, aux_q)`` -> P at one qp (vmapped outside).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.utils.smallmat import mmul, mv, vdot

from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient)
from thunderbolt_tpu.models.solid.energies import NullEnergyModel


def _frames_for(batch, microstructure, dtype):
    """Materialize the (f, s, n) frame array [nc, nqp, k, 3] (or a default
    Cartesian frame when no microstructure is given)."""
    if microstructure is None:
        eye = np.eye(3)
        nc, nqp = batch.xq.shape[:2]
        return jnp.broadcast_to(jnp.asarray(eye, dtype), (nc, nqp, 3, 3))
    cache = setup_coefficient_cache(microstructure, batch)
    basis = evaluate_coefficient(cache, 0.0)
    nc, nqp = batch.xq.shape[:2]
    return jnp.broadcast_to(basis, (nc, nqp) + basis.shape[-2:]).astype(dtype)


class MaterialModel:
    """Base composite; subclasses define `first_piola`."""

    microstructure_model: Any = None

    def setup(self, batch):
        frames = _frames_for(batch, self.microstructure_model,
                             batch.xq.dtype)
        return {"frames": frames}

    def aux(self, cache, t):
        """Per-(cell, qp) driving values at time t (empty by default)."""
        return {}

    def first_piola(self, F, frame, aux):
        raise NotImplementedError


@dataclass(frozen=True)
class PK1Model(MaterialModel):
    """Passive hyperelastic material: P = dPsi/dF (``materials.jl:993``)."""
    material_model: Any
    microstructure_model: Any = None

    def first_piola(self, F, frame, aux):
        return jax.grad(lambda Fad: self.material_model.psi(Fad, frame))(F)


def _steady_ca(contraction_model, batch, t_independent_ok=True):
    """Coefficient cache for the calcium/activation field of a
    CaDrivenInternalSarcomereModel (or a bare steady-state model driven
    externally)."""
    field = getattr(contraction_model, "calcium_field", None)
    if field is None:
        return None
    return setup_coefficient_cache(field, batch)


@dataclass(frozen=True)
class ActiveStressModel(MaterialModel):
    """P = dPsi_passive/dF + N(.) T^a(F, frame) (``materials.jl:1200``,
    ``stress_and_tangent:1255``).

    With a STATEFUL sarcomere (RDQ20MF etc., nstates > 0) the condensed
    per-qp state Q is solved locally inside the stress evaluation (backward
    Euler through ``local_solve``) and differentiated through — the
    TPU-native multilevel Newton (SURVEY.md §7; reference
    ``multilevel_newton_raphson.jl``). The previous state/stretch arrive via
    the function's internal-state threading (disc/mechanics.py)."""
    material_model: Any
    active_stress_model: Any
    contraction_model: Any
    microstructure_model: Any = None

    @property
    def has_internal_state(self):
        return getattr(self.contraction_model, "nstates", 0) > 0

    def internal_template(self, batch):
        """Initial per-qp condensed state arrays."""
        nc, nqp = batch.xq.shape[:2]
        ns = self.contraction_model.nstates
        import numpy as _np
        q0 = _np.asarray(self.contraction_model.model.default_initial_state())
        Q = jnp.broadcast_to(jnp.asarray(q0, batch.xq.dtype),
                             (nc, nqp, ns))
        lam = jnp.ones((nc, nqp), batch.xq.dtype)
        return {"Qprev": Q, "lam_prev": lam}

    def setup(self, batch):
        cache = super().setup(batch)
        cache["ca"] = _steady_ca(self.contraction_model, batch)
        return cache

    def aux(self, cache, t, state=None):
        out = {}
        nc, nqp = cache["frames"].shape[:2]
        if cache["ca"] is not None:
            ca = evaluate_coefficient(cache["ca"], t)
            out["Ca"] = jnp.broadcast_to(ca, (nc, nqp))
        if state is not None:
            if "Ca" in state:
                # simulated calcium (coupled EP drive) overrides the
                # prescribed coefficient — see disc/electromechanics.py
                out["Ca"] = jnp.broadcast_to(state["Ca"], (nc, nqp))
            out["Qprev"] = state["Qprev"]
            out["lam_prev"] = state["lam_prev"]
            out["dt"] = jnp.broadcast_to(state["dt"], (nc, nqp))
            out["t"] = jnp.broadcast_to(state["t"], (nc, nqp))
        return out

    def _condensed_state(self, F, frame, aux):
        cm = self.contraction_model
        f = mv(F, frame[0])
        lam = jnp.sqrt(vdot(f, f))
        Q = cm.model.local_solve(aux["Qprev"], lam, aux["lam_prev"],
                                 aux.get("Ca", 0.0), aux["t"], aux["dt"])
        return Q, lam

    def first_piola(self, F, frame, aux):
        P = jax.grad(lambda Fad: self.material_model.psi(Fad, frame))(F)
        if self.has_internal_state and "Qprev" in aux:
            Q, lam = self._condensed_state(F, frame, aux)
            scale = self.contraction_model.model.activation_scale(Q, F, frame)
        else:
            Ca = aux.get("Ca", 0.0)
            scale = self.contraction_model.activation_scale(Ca, F, frame)
        return P + scale * self.active_stress_model.stress(F, frame)


@dataclass(frozen=True)
class GeneralizedHillModel(MaterialModel):
    """Active strain: psi = psi_p(F) + psi_a(F, F^a)
    (``materials.jl:1054``). `active_model` is an ActiveMaterialAdapter."""
    passive_model: Any
    active_model: Any
    active_deformation_gradient_model: Any
    contraction_model: Any
    microstructure_model: Any = None

    def setup(self, batch):
        cache = super().setup(batch)
        cache["ca"] = _steady_ca(self.contraction_model, batch)
        return cache

    def aux(self, cache, t):
        if cache["ca"] is None:
            return {}
        nc, nqp = cache["frames"].shape[:2]
        ca = evaluate_coefficient(cache["ca"], t)
        return {"Ca": jnp.broadcast_to(ca, (nc, nqp))}

    def _psi(self, F, frame, aux):
        Ca = aux.get("Ca", 0.0)
        lam_a = self.contraction_model.compute_lambda_a(Ca)
        Fa = self.active_deformation_gradient_model.compute_Fa(lam_a, frame)
        return (self.passive_model.psi(F, frame)
                + self.active_model.psi(F, Fa, frame))

    def first_piola(self, F, frame, aux):
        return jax.grad(lambda Fad: self._psi(Fad, frame, aux))(F)


@dataclass(frozen=True)
class ExtendedHillModel(GeneralizedHillModel):
    """psi = psi_p(F) + N(Ca) psi_a(F, F^a) (``materials.jl:1126``)."""

    def _psi(self, F, frame, aux):
        Ca = aux.get("Ca", 0.0)
        lam_a = self.contraction_model.compute_lambda_a(Ca)
        Fa = self.active_deformation_gradient_model.compute_Fa(lam_a, frame)
        scale = self.contraction_model.activation_scale(Ca, F, frame)
        return (self.passive_model.psi(F, frame)
                + scale * self.active_model.psi(F, Fa, frame))


@dataclass(frozen=True)
class PrestressedMechanicalModel(MaterialModel):
    """Multiplicative prestress: the inner model sees F_total = F F0
    (``materials.jl:789``). `prestress_field` is a coefficient yielding
    [3, 3] per qp (default identity)."""
    inner_model: Any
    prestress_field: Any = None

    @property
    def microstructure_model(self):
        return self.inner_model.microstructure_model

    def setup(self, batch):
        cache = self.inner_model.setup(batch)
        if self.prestress_field is not None:
            c0 = setup_coefficient_cache(self.prestress_field, batch)
            nc, nqp = cache["frames"].shape[:2]
            cache["F0"] = jnp.broadcast_to(
                evaluate_coefficient(c0, 0.0), (nc, nqp, 3, 3))
        return cache

    def aux(self, cache, t):
        out = dict(self.inner_model.aux(cache, t))
        if "F0" in cache:
            out["F0"] = cache["F0"]
        return out

    def first_piola(self, F, frame, aux):
        F0 = aux.get("F0", jnp.eye(3, dtype=F.dtype))
        inner_aux = {k: v for k, v in aux.items() if k != "F0"}
        # chain rule: P = P_inner(F F0) F0^T
        P_in = self.inner_model.first_piola(mmul(F, F0), frame, inner_aux)
        return mmul(P_in, jnp.swapaxes(F0, -1, -2))


@dataclass(frozen=True)
class FieldParametrizedMaterial(MaterialModel):
    """Constitutive parameters varying PER CELL (or per qp): heterogeneous
    stiffness maps (infarct scars, fibrotic gradients) without subdomain
    splitting, and — with traced field arrays — differentiable stiffness
    MAPS through the adjoint equilibrium solve (``ad/parametric.py``).

    The reference expresses heterogeneity only through per-subdomain
    materials (``fem.jl:843-895``, one compiled integrator per region); here
    the parameter fields ride the per-(cell, qp) ``aux`` channel of ONE
    vmapped kernel, so a million-cell map costs the same dispatch as a
    homogeneous material.

    ``fields`` maps name -> array ``[ncells]`` or ``[ncells, nqp]`` (cells
    ordered as the batch the material is assembled over); ``build(base,
    values)`` receives the base material and the per-qp scalar values and
    returns the material used at that point — typically nested
    ``dataclasses.replace``::

        mat = FieldParametrizedMaterial(
            base=PK1Model(NeoHookeanModel(mu=1.0, lam=2.0)),
            fields={"mu": mu_per_cell},
            build=lambda m, v: dc.replace(m, material_model=dc.replace(
                m.material_model, mu=v["mu"])))
    """
    base: Any
    fields: Dict[str, Any]
    build: Any

    @property
    def microstructure_model(self):
        return self.base.microstructure_model

    @property
    def has_internal_state(self):
        return getattr(self.base, "has_internal_state", False)

    def internal_template(self, batch):
        return self.base.internal_template(batch)

    def setup(self, batch):
        return self.base.setup(batch)

    def aux(self, cache, t, state=None):
        if state is not None:
            out = dict(self.base.aux(cache, t, state))
        else:
            out = dict(self.base.aux(cache, t))
        nc, nqp = cache["frames"].shape[:2]
        for name, arr in self.fields.items():
            a = jnp.asarray(arr)
            if a.ndim == 1:
                a = a[:, None]
            out[name] = jnp.broadcast_to(a, (nc, nqp))
        return out

    def _built(self, aux):
        return self.build(self.base, {k: aux[k] for k in self.fields})

    def _condensed_state(self, F, frame, aux):
        return self._built(aux)._condensed_state(F, frame, aux)

    def first_piola(self, F, frame, aux):
        return self._built(aux).first_piola(F, frame, aux)
