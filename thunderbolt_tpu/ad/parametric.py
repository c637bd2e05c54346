"""Material-parameter gradients through quasi-static equilibrium solves.

Extends the adjoint equilibrium differentiation (``ad/implicit.py``) from
the scalar load parameter ``t`` to an arbitrary pytree ``theta`` of
CONSTITUTIVE parameters (energy moduli, active-stress scalings, spring
stiffnesses living on the material composite) — the inverse-problem
workhorse (ex-vivo stiffness identification, personalization from imaged
deflections). The reference's assembly bakes material constants into
compiled element routines and has no gradient story; here theta rides
Newton's traced ``extra`` channel:

* ``ParametricQuasiStaticFunction`` wraps a semidiscretized
  ``QuasiStaticFunction``; its ``newton_extra()`` appends theta's leaves,
  and ``residual``/``assemble``/``assemble_operator`` split them back off
  and REBIND the materials (``apply_params(material, theta)`` +
  ``make_material_kernels`` rebuild — trace-time-only closure work, zero
  runtime cost). The jitted one-dispatch Newton loop therefore compiles
  ONCE and takes theta as a runtime operand — a theta sweep or an
  optimizer loop never recompiles.
* ``make_parametric_equilibrium_solve`` returns ``solve(u0, t, theta)``
  whose reverse mode is the implicit-function-theorem adjoint: one
  transposed-tangent linear solve, then ONE reverse pass through the
  (stress-only) residual gives every component of d(QoI)/d(theta)
  simultaneously — cost independent of the number of parameters.

Scope: theta must enter through the material composites (volume terms),
or — with ``frame_angles`` — through the microstructure frames (helix/
transversal/sheetlet angles, re-evaluated tracably from the setup-time
geometry via ``traced_rule_frames``). Weak-BC parameters (pressure
magnitudes etc.) are driven by ``t``; Dirichlet values are assumed
(t, theta)-independent. Within one equilibrium solve the condensed
internal sarcomere state is frozen at its pre-step value (as in
``implicit.py``); across a MARCH its advance is theta-differentiated via
``internal_after_step_theta`` (see ``ad/em.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from thunderbolt_tpu.disc.mechanics import make_material_kernels


class ParametricQuasiStaticFunction:
    """A ``QuasiStaticFunction`` view whose materials depend on a traced
    parameter pytree.

    ``apply_params(material, theta) -> material`` rebuilds each (possibly
    per-subdomain) material composite with theta's values spliced in —
    typically nested ``dataclasses.replace`` on the frozen energy
    dataclasses. Geometry, dof layout, sparsity, microstructure frames and
    coefficient caches are reused from the base function (theta must not
    change them)."""

    def __init__(self, fn, apply_params, theta=None, frame_angles=None):
        self._fn = fn
        self._apply = apply_params
        self.theta = theta
        # optional fiber-angle channel: frame_angles(theta) -> dict of
        # ODB25LT angle overrides (traced values ok); rebound() then
        # re-evaluates the microstructure frames with TRACED angles via
        # traced_rule_frames, so d(QoI)/d(helix angle) is exact instead of
        # frozen at the setup-time frames (VERDICT r3 item 9)
        self._frame_angles = frame_angles
        self._frame_geoms_cache = None
        if frame_angles is not None:
            # eager: geometry extraction is numpy on concrete setup data
            # and must not run inside a jit trace (first rebound happens
            # while tracing the Newton core)
            self._frame_geoms()

    def __getattr__(self, name):
        # delegate everything not overridden (dh, pattern, constraints,
        # solution_size, variables, ...) to the base function
        return getattr(self.__dict__["_fn"], name)

    # -- theta threading ----------------------------------------------------

    def newton_extra(self):
        base = tuple(self._fn.newton_extra())
        leaves = jax.tree_util.tree_leaves(self.theta)
        return base + tuple(jnp.asarray(v) for v in leaves)

    def _split(self, extra):
        treedef = jax.tree_util.tree_structure(self.theta)
        n = treedef.num_leaves
        if n == 0:
            return extra, self.theta
        theta = jax.tree_util.tree_unflatten(treedef, extra[len(extra) - n:])
        return extra[: len(extra) - n], theta

    def _frame_geoms(self):
        """Per-batch angle-independent frame geometry, computed once."""
        if self._frame_geoms_cache is None:
            from thunderbolt_tpu.models.microstructure import frame_geometry
            fn = self._fn
            mats = fn.materials if fn.materials is not None \
                else [fn.material] * len(fn.batches)
            self._frame_geoms_cache = [
                frame_geometry(m.microstructure_model, b)
                for m, b in zip(mats, fn.batches)]
        return self._frame_geoms_cache

    def rebound(self, theta):
        """The base function with ``theta`` bound into its materials —
        a shallow dataclass copy sharing geometry/pattern/plan caches."""
        from thunderbolt_tpu.models.microstructure import (
            ANGLE_PARAM_NAMES, traced_rule_frames)
        fn = self._fn
        mats = fn.materials if fn.materials is not None \
            else [fn.material] * len(fn.batches)
        new_mats = [self._apply(m, theta) for m in mats]
        internal = fn.internal if fn.internal is not None \
            else [None] * len(fn.batches)
        frame_over = (dict(self._frame_angles(theta))
                      if self._frame_angles is not None else None)
        geoms = self._frame_geoms() if frame_over is not None else None
        new_caches = []
        for bi, (cache, nm, st, m_old) in enumerate(
                zip(fn.mat_caches, new_mats, internal, mats)):
            c = dict(cache)
            if frame_over is not None:
                base_p = m_old.microstructure_model.params
                angles = {k: frame_over.get(k, getattr(base_p, k))
                          for k in ANGLE_PARAM_NAMES}
                c["frames"] = traced_rule_frames(
                    geoms[bi], angles, cache["frames"].dtype)
            # recompute the aux-key set from the REBOUND material: theta may
            # splice in a FieldParametrizedMaterial whose parameter fields
            # ride new aux entries the setup-time kernels never saw
            if st is not None:
                # key-generic: besides Qprev/lam_prev the state may carry
                # per-step driving fields (e.g. "Ca" from a coupled EP
                # solve) whose aux threading the kernels must see
                aux0 = nm.aux(cache, 0.0, {
                    **st, "dt": jnp.asarray(1.0), "t": jnp.asarray(0.0)})
            else:
                aux0 = nm.aux(cache, 0.0)
            c["aux_keys"] = tuple(aux0.keys())
            c["kernels"] = make_material_kernels(nm, c["frames"],
                                                 c["aux_keys"])
            new_caches.append(c)
        fn2 = dataclasses.replace(
            fn, material=new_mats[0], mat_caches=new_caches,
            materials=new_mats if fn.materials is not None else None)
        # instance-level caches that replace() does not carry
        fn2._lattice_plan = getattr(fn, "_lattice_plan", None)
        if "_bdia_builder" in fn.__dict__:
            fn2.__dict__["_bdia_builder"] = fn.__dict__["_bdia_builder"]
        if hasattr(fn, "M_bdia"):
            fn2.M_bdia = fn.M_bdia
        return fn2

    # -- jit-safe closures (signatures match QuasiStaticFunction) -----------

    def residual(self, u, t, *extra):
        base, theta = self._split(extra)
        return self.rebound(theta).residual(u, t, *base)

    def assemble(self, u, t, *extra):
        base, theta = self._split(extra)
        return self.rebound(theta).assemble(u, t, *base)

    def assemble_operator(self, u, t, *extra):
        base, theta = self._split(extra)
        return self.rebound(theta).assemble_operator(u, t, *base)

    def element_matrices(self, u, t, *extra):
        base, theta = self._split(extra)
        return self.rebound(theta).element_matrices(u, t, *base)

    def update_internal_state(self, u, t, dt):
        new = self.rebound(self.theta)
        new.internal = self._fn.internal
        new.update_internal_state(u, t, dt)
        self._fn.internal = new.internal

    def internal_after_step_theta(self, u, t, dt, internal, theta):
        """PURE committed-state advance with ``theta`` bound in: theta
        flows into the evolution law (activation-law parameters) AND —
        with ``frame_angles`` set — the frames (fiber angles), so reverse
        mode through a marched QoI gets exact gradients through the
        condensed-state channel instead of base-function values."""
        return self.rebound(theta).internal_after_step(u, t, dt, internal)


def make_parametric_equilibrium_solve(fn, solver, apply_params, *,
                                      frame_angles=None,
                                      adjoint_rtol=1e-10, adjoint_atol=0.0,
                                      adjoint_maxiter=4000,
                                      adjoint_precon=None):
    """Build ``solve(u0, t, theta) -> u*``, reverse-differentiable in both
    the load parameter ``t`` and the material-parameter pytree ``theta``.

    ``fn`` is a semidiscretized ``QuasiStaticFunction`` (or subclass),
    ``solver`` a ``NewtonRaphsonSolver``, ``apply_params`` the material
    rebinding callable (see ``ParametricQuasiStaticFunction``). One
    persistent wrapper instance carries Newton's jit cache, so gradient
    descent over theta re-executes ONE compiled Newton loop. The cotangent
    w.r.t. ``u0`` is zero (the equilibrium forgets its initial guess)."""
    from thunderbolt_tpu.solver.linear import gmres, jacobi_preconditioner

    ch = getattr(fn, "constraints", None)
    pfn = ParametricQuasiStaticFunction(fn, apply_params,
                                        frame_angles=frame_angles)

    def _apply_zero(v):
        return ch.apply_zero(v) if ch is not None else v

    def _solve_impl(u0, t, theta):
        pfn.theta = theta
        u, _ = solver.solve(pfn, u0, t)
        return u

    @jax.custom_vjp
    def solve(u0, t, theta):
        return _solve_impl(u0, t, theta)

    def fwd(u0, t, theta):
        u = _solve_impl(u0, t, theta)
        return u, (u, jnp.asarray(t), theta)

    def bwd(res, gu):
        u, t, theta = res
        base_extra = tuple(fn.newton_extra())
        fn_th = pfn.rebound(theta)
        A_raw, _ = fn_th.assemble_operator(u, t, *base_extra)
        A = ch.apply_operator(A_raw) if ch is not None else A_raw
        gz = _apply_zero(gu)

        def At_mv(v):
            return jax.linear_transpose(A.mv, jnp.zeros_like(v))(v)[0]

        if adjoint_precon is not None:
            Minv = adjoint_precon(A, u, t, base_extra)
        elif hasattr(A, "block_jacobi_inv"):
            Minv = A.block_jacobi_inv()
        else:
            Minv = jacobi_preconditioner(A.diagonal())
        lam, _ = gmres(At_mv, gz, Minv=Minv, rtol=adjoint_rtol,
                       atol=adjoint_atol, maxiter=adjoint_maxiter)

        # one reverse pass through the stress-only residual yields both
        # cotangents: d(g.u*)/dp = -lam . dr/dp for p in (t, theta)
        def res_of(tt, th):
            return _apply_zero(pfn.rebound(th).residual(u, tt, *base_extra))

        _, vjp_fn = jax.vjp(res_of, t, theta)
        tbar, thbar = vjp_fn(-lam)
        return jnp.zeros_like(u), tbar.astype(t.dtype), thbar

    solve.defvjp(fwd, bwd)
    return solve
