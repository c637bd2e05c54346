"""Newton-Raphson with Eisenstat-Walker forcing and backtracking.

Parity: ``NewtonRaphsonSolver`` (``src/solver/nonlinear/newton_raphson.jl:
44-302``): assembled-Jacobian Newton with adaptive inner (Krylov) forcing
(``EisenstatWalkerForcing:16``), a monotonic-convergence guard via the
convergence-rate history Theta_k (``:273-291``), and max-iteration abort.

TPU-native: assembly + linear solve are one jitted call per iteration; the
outer loop stays on host for logging/divergence control (a fully jitted
while_loop variant is a planned fast path). The Jacobian is the shared-
pattern ELL matrix; Dirichlet constraints are eliminated symmetrically.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.solver.linear import cg, bicgstab, jacobi_preconditioner


@dataclass
class NewtonStats:
    iterations: int = 0
    residual_norm: float = np.inf
    converged: bool = False
    history: tuple = ()


@dataclass(frozen=True)
class EisenstatWalkerForcing:
    """Inner tolerance eta_k = gamma (|r_k|/|r_{k-1}|)^2, clamped."""
    gamma: float = 0.9
    eta_max: float = 0.1
    eta_min: float = 1e-8


@dataclass(frozen=True)
class NewtonRaphsonSolver:
    tol: float = 1e-8          # absolute residual norm
    rtol: float = 0.0          # relative to initial residual
    max_iter: int = 50
    inner_rtol: float = 1e-6
    inner_atol: float = 1e-12
    inner_maxiter: int = 2000
    inner: str = "cg"          # hyperelastic tangents are symmetric
    forcing: Optional[EisenstatWalkerForcing] = None
    max_backtracks: int = 6
    #: consecutive residual-growth iterations tolerated before aborting —
    #: Newton on soft structures is non-monotone; strict monotone guards
    #: (reference Theta_k checks) stall on slender-beam problems
    max_growth_iters: int = 6

    def solve(self, fn, u0, t, monitor=None):
        """Solve fn.residual(u, t) = 0 from u0; returns (u, NewtonStats).

        The jitted assembly closures are cached ON the function object and
        take (u, t, extra) as traced arguments, so repeated solves across
        load/time steps never recompile. Stage functions (Newmark etc.)
        thread their per-step parameters through ``fn.newton_extra()``."""
        ch = fn.constraints
        extra = fn.newton_extra() if hasattr(fn, "newton_extra") else ()

        jits = fn.__dict__.get("_newton_jits") if hasattr(fn, "__dict__") \
            else None
        if jits is None:
            @jax.jit
            def assemble_j(u, t, extra):
                kvals, r = fn.assemble(u, t, *extra)
                A_raw = fn.jacobian_matrix(kvals)
                A = ch.apply_operator(A_raw) if ch is not None else A_raw
                r = ch.apply_zero(r) if ch is not None else r
                return A, r

            @jax.jit
            def rnorm_j(u, t, extra):
                r = fn.residual(u, t, *extra)
                r = ch.apply_zero(r) if ch is not None else r
                return jnp.linalg.norm(r)

            # Inner Krylov solves MUST be jitted with the matrix as a
            # pytree ARGUMENT: calling cg eagerly with a fresh `A.mv`
            # closure re-traces (and on TPU re-compiles) the while_loop at
            # EVERY Newton iteration — measured seconds per iteration on a
            # remote chip vs milliseconds once cached here.
            from functools import partial

            @partial(jax.jit, static_argnames=("maxiter", "method"))
            def krylov_j(A, r, eta, atol, maxiter, method):
                Minv = A.block_jacobi_inv() \
                    if hasattr(A, "block_jacobi_inv") \
                    else jacobi_preconditioner(A.diagonal())
                f = cg if method == "cg" else bicgstab
                return f(A.mv, r, Minv=Minv, rtol=eta, atol=atol,
                         maxiter=maxiter)

            jits = (assemble_j, rnorm_j, krylov_j)
            try:
                fn.__dict__["_newton_jits"] = jits
            except (AttributeError, TypeError):
                pass
        assemble_j, rnorm_j, krylov_j = jits

        def assemble(u):
            return assemble_j(u, t, extra)

        def rnorm_only(u):
            return rnorm_j(u, t, extra)

        if self.inner == "lu":
            from thunderbolt_tpu.fem.sparsity import any_to_scipy
            import scipy.sparse.linalg as spla

            def solver(mv_A, r, Minv=None, rtol=None, atol=None,
                       maxiter=None, _A_holder=[]):
                A_sp = any_to_scipy(solver.current_A)
                x = spla.spsolve(A_sp.tocsc(), np.asarray(r))
                return jnp.asarray(x, r.dtype), None
        else:
            solver = None  # jitted krylov_j path below

        u = ch.apply(u0) if ch is not None else u0
        history = []
        rnorm_prev = None
        eta = self.inner_rtol
        growth = 0
        for it in range(self.max_iter):
            A, r = assemble(u)
            rnorm = float(jnp.linalg.norm(r))
            history.append(rnorm)
            if monitor is not None:
                monitor(it, rnorm)
            target = max(self.tol, self.rtol * history[0])
            if rnorm <= target:
                return u, NewtonStats(it, rnorm, True, tuple(history))
            if not np.isfinite(rnorm):
                return u, NewtonStats(it, rnorm, False, tuple(history))
            if rnorm_prev is not None and rnorm >= rnorm_prev:
                growth += 1
                if growth >= self.max_growth_iters:
                    return u, NewtonStats(it, rnorm, False, tuple(history))
            else:
                growth = 0
            if self.forcing is not None and rnorm_prev is not None:
                f = self.forcing
                eta = float(np.clip(f.gamma * (rnorm / rnorm_prev) ** 2,
                                    f.eta_min, f.eta_max))
            if self.inner == "lu":
                solver.current_A = A
                du, info = solver(A.mv, r)
            else:
                du, info = krylov_j(A, r, eta, self.inner_atol,
                                    self.inner_maxiter, self.inner)
            # line search: prefer decrease, but fall back to the FULL step
            # (non-monotone Newton) rather than a crippled tiny step
            u_full = u - du
            rn_full = float(rnorm_only(u_full))
            if np.isfinite(rn_full) and rn_full <= 0.9 * rnorm:
                u = u_full
            else:
                alpha, best_u, best_rn = 0.5, None, np.inf
                for bt in range(self.max_backtracks):
                    u_try = u - alpha * du
                    rn = float(rnorm_only(u_try))
                    if np.isfinite(rn) and rn < rnorm:
                        best_u, best_rn = u_try, rn
                        break
                    alpha *= 0.5
                if best_u is not None:
                    u = best_u
                elif np.isfinite(rn_full):
                    u = u_full  # accept growth; quadratic phase may follow
                else:
                    u = u - (2.0 ** -self.max_backtracks) * du
            rnorm_prev = rnorm
        rnorm = float(rnorm_only(u))
        return u, NewtonStats(self.max_iter, rnorm, rnorm <= self.tol,
                              tuple(history))
