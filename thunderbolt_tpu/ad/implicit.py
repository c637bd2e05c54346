"""Adjoint differentiation of quasi-static equilibrium solves.

The reference's quasi-static stack (``src/solver/nonlinear/newton_raphson.jl``
driving ``update_linearization!``) has no gradient story at all; here the
implicit function theorem turns any converged Newton solve into a
differentiable map. For r(u*, t) = 0 with tangent J = dr/du:

    du*/dt = -J(u*, t)^-1 dr/dt
    d(g . u*)/dt = -lambda . dr/dt   with   J^T lambda = g

so reverse-mode costs ONE linear adjoint solve with the transposed
tangent — not a differentiation through the Newton iteration history
(which while_loop could not reverse anyway). The transpose of the
assembled operator's matvec is obtained exactly via
``jax.linear_transpose`` (every sparse format's ``mv`` is linear jnp
code), so no transposed storage format is needed.

Scope: gradients w.r.t. the scalar load/time parameter ``t`` that drives
coefficients (pressure ramps, calcium transients, homotopy parameters).
Dirichlet values are assumed t-independent (inhomogeneous-BC sensitivity
would add a boundary term). The condensed internal-state path
(``newton_extra``) is treated as frozen at its pre-step value — correct
for the single-solve sensitivities this targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _newton_extra(fn):
    return tuple(fn.newton_extra()) if hasattr(fn, "newton_extra") else ()


def _assemble_operator(fn, u, t, extra):
    """(A with constraints applied, raw residual) at a linearization."""
    if hasattr(fn, "assemble_operator"):
        A_raw, r = fn.assemble_operator(u, t, *extra)
    else:
        kvals, r = fn.assemble(u, t, *extra)
        A_raw = fn.jacobian_matrix(kvals)
    ch = getattr(fn, "constraints", None)
    A = ch.apply_operator(A_raw) if ch is not None else A_raw
    return A, r


def make_equilibrium_solve(fn, solver, *, adjoint_rtol=1e-10,
                           adjoint_atol=0.0, adjoint_maxiter=4000,
                           adjoint_precon=None):
    """Build ``solve(u0, t) -> u*`` with a custom adjoint VJP.

    ``fn`` is a semidiscretized quasi-static function, ``solver`` a
    ``NewtonRaphsonSolver`` (host or jitted path). The returned callable is
    reverse-differentiable in ``t``; the cotangent w.r.t. ``u0`` is zero
    (the equilibrium forgets its initial guess). ``adjoint_precon``
    overrides the preconditioner for the transposed-tangent GMRES solve
    (default: (block-)Jacobi of the tangent, which is its own transpose
    up to block transposition).
    """
    from thunderbolt_tpu.solver.linear import gmres, jacobi_preconditioner

    ch = getattr(fn, "constraints", None)

    def _apply_zero(v):
        return ch.apply_zero(v) if ch is not None else v

    def _residual(u, t, extra):
        if hasattr(fn, "assemble_operator"):
            _, r = fn.assemble_operator(u, t, *extra)
        else:
            _, r = fn.assemble(u, t, *extra)
        return _apply_zero(r)

    @jax.custom_vjp
    def solve(u0, t):
        u, _ = solver.solve(fn, u0, t)
        return u

    def fwd(u0, t):
        u, _ = solver.solve(fn, u0, t)
        return u, (u, jnp.asarray(t))

    def bwd(res, gu):
        u, t = res
        extra = _newton_extra(fn)
        A, _ = _assemble_operator(fn, u, t, extra)
        gz = _apply_zero(gu)

        def At_mv(v):
            return jax.linear_transpose(A.mv, jnp.zeros_like(v))(v)[0]

        if adjoint_precon is not None:
            Minv = adjoint_precon(A, u, t, extra)
        elif hasattr(A, "block_jacobi_inv"):
            Minv = A.block_jacobi_inv()
        else:
            Minv = jacobi_preconditioner(A.diagonal())
        lam, _ = gmres(At_mv, gz, Minv=Minv, rtol=adjoint_rtol,
                       atol=adjoint_atol, maxiter=adjoint_maxiter)
        _, rdot = jax.jvp(lambda tt: _residual(u, tt, extra),
                          (t,), (jnp.ones_like(t),))
        tbar = -jnp.vdot(lam, rdot)
        return jnp.zeros_like(u), tbar.astype(t.dtype)

    solve.defvjp(fwd, bwd)
    return solve
