"""Electromechanics functional gradients through the 3D-0D coupled march.

Composes the adjoint (implicit-function-theorem) equilibrium machinery
(``ad/implicit.py``) with the blocked 3D-0D step (``disc/coupled.py``):
each coupled step's converged blocked Newton solve — the tied saddle
system R(w; V_targets, theta) = 0 with w = [u_mech; p_chambers] — gets a
``custom_vjp`` whose backward pass is ONE transposed-tangent GMRES solve
(J^T obtained exactly via ``jax.vjp`` of the all-jnp blocked residual, no
transposed storage format), and the 0D circuit substeps plus any
condensed-state advance are differentiated by ordinary reverse mode. The
whole beat marches inside ``lax.scan``, so d(QoI)/d(theta) for PV-loop
functionals (stroke volume, peak pressure, ejected work) costs one
forward march + one adjoint sweep — independent of theta's size.

theta rides Newton's traced ``extra`` channel exactly as in
``ad/parametric.py`` (``ParametricQuasiStaticFunction``): the compiled
march takes theta as a runtime operand, so optimizer loops never
recompile.

Scope: theta enters through the MECHANICS materials (active-stress
scalings, passive moduli, activation-law parameters) and — when
``frame_angles`` is given to :func:`parametric_coupled_function` — the
microstructure frames themselves (helix/transversal/sheetlet angles,
re-evaluated tracably via ``traced_rule_frames``). The condensed
internal-state evolution is differentiated exactly: each scan step
rebinds theta into ``internal_after_step`` (``internal_after_step_theta``),
so fiber-stretch histories carry theta sensitivity across steps.
Dirichlet values are (t, theta)-independent.

The reference has no gradient story for ANY of its solvers; the parity
anchor for the objects differentiated is ``src/modeling/rsafdq2022.jl``
+ ``src/solver/linear/schur.jl``.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.ad.parametric import ParametricQuasiStaticFunction


def parametric_coupled_function(fn3d, apply_params, theta0,
                                frame_angles=None):
    """An ``RSAFDQ20223DFunction`` view whose mechanics block takes a
    traced material-parameter pytree (shallow copy; geometry/pattern/
    tying caches shared). Pass ``frame_angles(theta) -> {angle-name:
    value}`` to also re-evaluate the microstructure frames from traced
    helix/transversal/sheetlet angles (fiber-angle gradients)."""
    pm = ParametricQuasiStaticFunction(fn3d.mech, apply_params, theta0,
                                       frame_angles=frame_angles)
    return dataclasses.replace(fn3d, mech=pm)


def make_coupled_step_adjoint(fn3d, solver, *, adjoint_rtol=1e-10,
                              adjoint_atol=0.0, adjoint_maxiter=8000):
    """``step_solve(w0, t, V_targets, extra) -> w*`` — the blocked 3D-0D
    Newton solve with an implicit-function-theorem VJP.

    ``extra`` is the flattened traced operand tuple the blocked core
    expects (condensed-state leaves + (dt, t) + theta leaves for a
    parametric ``fn3d``). The cotangent w.r.t. ``w0`` is zero (the
    equilibrium forgets its predictor); cotangents flow to ``t``,
    ``V_targets`` and every ``extra`` leaf."""
    from thunderbolt_tpu.solver.linear import gmres

    core = solver.newton.make_device_core(fn3d)
    ch = fn3d.mech.constraints
    n = fn3d.nmech

    def project(v):
        """Zero the Dirichlet-constrained u-rows (their w* entries are
        prescribed constants, outside the implicit function)."""
        if ch is None:
            return v
        return jnp.concatenate([ch.apply_zero(v[:n]), v[n:]])

    def R(w, t, V_targets, extra):
        B, r_u, r_p = fn3d.residual(w, t, V_targets, *extra)
        if ch is not None:
            r_u = ch.apply_zero(r_u)
        return jnp.concatenate([r_u, r_p])

    @jax.custom_vjp
    def step_solve(w0, t, V_targets, extra):
        w, it, rn, conv = core(w0, t, V_targets, extra)
        return w

    def fwd(w0, t, V_targets, extra):
        w = step_solve(w0, t, V_targets, extra)
        return w, (w, jnp.asarray(t), V_targets, extra)

    def bwd(res, gw):
        w, t, V_targets, extra = res
        gz = project(gw)
        _, vjp_w = jax.vjp(lambda ww: R(ww, t, V_targets, extra), w)

        def Jt_mv(v):
            # J^T on the free subspace; identity on constrained rows so
            # the operator is invertible (lam there = gz there = 0)
            y = project(vjp_w(project(v))[0])
            return y + (v - project(v))

        lam, _ = gmres(Jt_mv, gz, rtol=adjoint_rtol, atol=adjoint_atol,
                       maxiter=adjoint_maxiter)
        lam = project(lam)
        _, vjp_in = jax.vjp(
            lambda tt, V_, ex: R(w, tt, V_, ex), t, V_targets, extra)
        gt, gV, gex = vjp_in(-lam)
        return jnp.zeros_like(w), gt, gV, gex

    step_solve.defvjp(fwd, bwd)
    return step_solve


def make_differentiable_coupled_march(fn3d, circuit, solver, dt, nsteps, *,
                                      circuit_substeps=100,
                                      adjoint_rtol=1e-10,
                                      adjoint_maxiter=8000):
    """``march(w0, c0, theta) -> (w, c, volumes, pressures)`` over
    ``nsteps`` coupled steps, reverse-differentiable in ``theta`` (and in
    ``w0``/``c0`` through the circuit/tying path).

    ``fn3d`` must be a :func:`parametric_coupled_function` view; its
    ``theta`` pytree structure defines what ``march`` accepts. Chamber
    volumes/pressures are recorded per step, so PV-loop functionals are
    plain differentiable reductions of the outputs."""
    mech = fn3d.mech
    step_solve = make_coupled_step_adjoint(
        fn3d, solver, adjoint_rtol=adjoint_rtol,
        adjoint_maxiter=adjoint_maxiter)
    vol_ix = np.array([circuit.volume_index(ch.lumped_symbol)
                       for ch in fn3d.chambers])
    pix = np.array([circuit.pressure_input_index(ch.lumped_symbol)
                    for ch in fn3d.chambers])
    n = fn3d.nmech
    dt = float(dt)
    nsub = int(circuit_substeps)
    internal0 = getattr(mech, "internal", None)
    stateful = internal0 is not None and any(
        st is not None for st in internal0)

    def flat_extra(internal, t, theta, dtype):
        flat = []
        if stateful:
            for st in internal:
                if st is not None:
                    for key in sorted(st):
                        flat.append(st[key])
            flat.append(jnp.asarray(dt, dtype))
            flat.append(jnp.asarray(t, dtype))
        flat.extend(jnp.asarray(v) for v in
                    jax.tree_util.tree_leaves(theta))
        return tuple(flat)

    def march(w0, c0, theta):
        internal = [None if st is None else dict(st)
                    for st in internal0] if stateful else None

        def body(carry, k):
            w, c, internal = carry
            t = (k + 1) * dt
            extra = flat_extra(internal, t, theta, w.dtype)
            V_targets = c[vol_ix].astype(w.dtype)
            w = step_solve(w, t, V_targets, extra)
            if stateful:
                # rebind theta into the state advance: activation-law
                # parameters and (with frame_angles) fiber angles get
                # exact gradients through the condensed-state channel
                if isinstance(mech, ParametricQuasiStaticFunction):
                    internal = mech.internal_after_step_theta(
                        w[:n], t, dt, internal, theta)
                else:
                    internal = mech.internal_after_step(w[:n], t, dt,
                                                        internal)
            p = w[n:]
            ext = jnp.zeros(circuit.num_unknown_pressures(),
                            c.dtype).at[pix].set(p.astype(c.dtype))
            h = dt / nsub

            def sub(cc, i):
                ti = t - dt + i * h
                k1 = circuit.rhs(cc, ti, ext)
                k2 = circuit.rhs(cc + 0.5 * h * k1, ti + 0.5 * h, ext)
                return cc + h * k2, None

            c, _ = jax.lax.scan(sub, c, jnp.arange(nsub))
            return (w, c, internal), (c[vol_ix], p)

        (w, c, internal), (vols, ps) = jax.lax.scan(
            body, (w0, c0, internal), jnp.arange(nsteps))
        return w, c, vols, ps

    return march
