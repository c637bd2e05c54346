"""Newton-Raphson with Eisenstat-Walker forcing and backtracking.

Parity: ``NewtonRaphsonSolver`` (``src/solver/nonlinear/newton_raphson.jl:
44-302``): assembled-Jacobian Newton with adaptive inner (Krylov) forcing
(``EisenstatWalkerForcing:16``), a monotonic-convergence guard via the
convergence-rate history Theta_k (``:273-291``), and max-iteration abort.

TPU-native: the default path runs the WHOLE Newton solve — assembly,
Krylov, line search, forcing, divergence guards — inside one jitted
``lax.while_loop`` (`solve_jitted`): one dispatch and one host readback per
solve. This matters doubly on remote-tunneled chips where every
device->host scalar sync costs tens of milliseconds; the reference's
host-side loop structure (``newton_raphson.jl:212-291``) survives as the
`monitor`/LU fallback path for logging and host direct solvers.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.solver.linear import (
    cg, bicgstab, gmres, jacobi_preconditioner)


def _krylov_fn(inner: str):
    """inner -> solver callable ('cg' | 'bicgstab' | 'gmres')."""
    try:
        return {"cg": cg, "bicgstab": bicgstab, "gmres": gmres}[inner]
    except KeyError:
        raise ValueError(f"unknown inner solver {inner!r}; expected "
                         "'cg', 'bicgstab', 'gmres', 'dense' or 'lu'"
                         ) from None


def _dense_solve(A, r):
    """Direct on-device solve: materialize the operator and LU-factor it
    on the MXU. The TPU-native small-problem path — below ~15k dofs a
    single dense factorization (one large fused kernel) beats hundreds of
    sequential Krylov steps whose per-iteration latency dominates at this
    size (measured: config-3 LV, 1k dofs)."""
    from thunderbolt_tpu.fem.sparsity import operator_to_dense
    return jnp.linalg.solve(operator_to_dense(A), r)


@dataclass
class NewtonStats:
    iterations: int = 0
    residual_norm: float = np.inf
    converged: bool = False
    history: tuple = ()
    #: per-iteration convergence rates Theta_k = min(|r_k|/|r_{k-1}|,
    #: |du_k|/|du_{k-1}|) for k >= 1 (``newton_raphson.jl:277``); the
    #: continuation controllers' input signal
    thetas: tuple = ()


def _thetas_from(history, increments, converged):
    """Theta_k list from residual + increment norm histories (the host-side
    analog of the reference's in-loop push, ``newton_raphson.jl:276-282``):
    an entry per iteration k >= 1 that applied an update, plus the
    reference's terminal sentinel — 0.0 on convergence (``:246``), Inf on
    failure (``:249,253``)."""
    thetas = []
    for k in range(1, len(increments)):
        rprev, rcur = history[k - 1], history[k]
        iprev, icur = increments[k - 1], increments[k]
        if rprev == 0.0 or iprev == 0.0:
            thetas.append(0.0)
        else:
            thetas.append(float(min(rcur / rprev, icur / iprev)))
    thetas.append(0.0 if converged else np.inf)
    return tuple(thetas)


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
    #: optional preconditioner factory ``(A, u, t, extra) -> Minv`` called
    #: at every linearization point (e.g. ``MechanicsGMGPreconditioner``);
    #: None keeps the block-Jacobi/Jacobi default
    precon: Any = None
    #: simplified (chord) Newton: assemble the Jacobian and build the
    #: preconditioner ONCE at iteration 0, then iterate with residual-only
    #: updates against the frozen tangent (``newton_raphson.jl:67,223-242``
    #: ``simplified_newton=true``). Linear convergence, but each iteration
    #: drops the tangent assembly + preconditioner setup — the cheap-
    #: tangent lever for tightly-stepped coupled marches.
    simplified_newton: bool = False

    def solve(self, fn, u0, t, monitor=None):
        """Solve fn.residual(u, t) = 0 from u0; returns (u, NewtonStats).

        Dispatches to the fully jitted device loop unless a host `monitor`
        or the host-LU inner solver is requested."""
        if monitor is None and self.inner != "lu":
            return self.solve_jitted(fn, u0, t)
        return self.solve_host(fn, u0, t, monitor=monitor)

    def solve_jitted(self, fn, u0, t):
        """One-dispatch Newton: the entire solve runs on device inside a
        ``lax.while_loop``; only the final state and stats cross the host
        boundary. Line search: accept the full step on a 10% decrease,
        else backtrack (halving, bounded), else take the full
        (non-monotone) step — same policy as the host loop."""
        extra = fn.newton_extra() if hasattr(fn, "newton_extra") else ()

        # cache key includes the solver config: two NewtonRaphsonSolvers
        # with different tolerances solving the same function object must
        # not share a compiled loop that baked in the first one's settings
        cache_key = ("_newton_jit_full", self)
        run = fn.__dict__.get(cache_key) \
            if hasattr(fn, "__dict__") else None
        if run is None:
            run = jax.jit(self.make_device_core(fn))
            try:
                fn.__dict__[cache_key] = run
            except (AttributeError, TypeError):
                pass

        u, it, rnorm, converged, status, hist, ihist = run(u0, t, extra)
        # ONE batched host readback — separate scalar pulls each pay a
        # full device round-trip (tens of ms on tunneled chips)
        it, rnorm, converged, status, hist, ihist = jax.device_get(
            (it, rnorm, converged, status, hist, ihist))
        # loop `it` counts body executions; the terminating body (status
        # set) performed no update, matching the host loop's returned
        # iteration index `it - 1`
        nhist = int(it)
        it = nhist - (1 if int(status) != 0 else 0)
        history = tuple(hist[:nhist].tolist())
        thetas = _thetas_from(history, list(ihist[:it]), bool(converged))
        return u, NewtonStats(it, float(rnorm), bool(converged), history,
                              thetas)

    def make_device_core(self, fn):
        """The TRACEABLE one-dispatch Newton
        ``core(u0, t, extra) -> (u, it, rnorm, converged, status, hist,
        ihist)`` — no jit wrapper, so device marches (homotopy ladders,
        Newmark scans, coupled beats) can embed whole Newton solves inside
        their own ``lax.scan`` bodies and pay one dispatch for the march
        instead of one per solve."""
        ch = fn.constraints
        cfg = self

        def assemble(u, t, extra):
            if hasattr(fn, "assemble_operator"):
                A_raw, r = fn.assemble_operator(u, t, *extra)
            else:
                kvals, r = fn.assemble(u, t, *extra)
                A_raw = fn.jacobian_matrix(kvals)
            A = ch.apply_operator(A_raw) if ch is not None else A_raw
            r = ch.apply_zero(r) if ch is not None else r
            return A, r

        def resid_of(u, t, extra):
            r = fn.residual(u, t, *extra)
            return ch.apply_zero(r) if ch is not None else r

        def rnorm_of(u, t, extra):
            return jnp.linalg.norm(resid_of(u, t, extra))

        def make_minv(A, u, t, extra):
            if cfg.precon is not None:
                return cfg.precon(A, u, t, extra)
            if hasattr(A, "block_jacobi_inv"):
                return A.block_jacobi_inv()
            return jacobi_preconditioner(A.diagonal())

        def core(u0, t, extra):
            u0 = ch.apply(u0) if ch is not None else u0
            dt_ = u0.dtype
            rnorm0 = rnorm_of(u0, t, extra)
            target = jnp.maximum(jnp.asarray(cfg.tol, dt_),
                                 cfg.rtol * rnorm0)
            if cfg.simplified_newton:
                # frozen tangent + preconditioner from the predictor
                # state; the loop body only re-evaluates residuals
                A_frozen, _ = assemble(u0, t, extra)
                if cfg.inner == "dense":
                    from thunderbolt_tpu.fem.sparsity import (
                        operator_to_dense)
                    lu_frozen = jax.scipy.linalg.lu_factor(
                        operator_to_dense(A_frozen))
                    Minv_frozen = None
                else:
                    Minv_frozen = make_minv(A_frozen, u0, t, extra)
            # hist[i] = residual at the START of iteration i (host-loop
            # semantics); written in the body, no duplicate seed
            hist0 = jnp.zeros(cfg.max_iter + 1, dt_)
            ihist0 = jnp.zeros(cfg.max_iter + 1, dt_)
            # status: 0 running / 1 converged / 2 nonfinite / 3 growth
            carry0 = (u0, rnorm0, jnp.asarray(cfg.inner_rtol, dt_),
                      jnp.asarray(0, jnp.int32),   # growth count
                      jnp.asarray(0, jnp.int32),   # iteration
                      jnp.asarray(0, jnp.int32),   # status
                      hist0, ihist0)

            def cond(c):
                _, _, _, _, it, status, _, _ = c
                return (status == 0) & (it < cfg.max_iter)

            def body(c):
                u, rnorm_prev, eta, growth, it, status, hist, ihist = c
                if cfg.simplified_newton:
                    A = A_frozen
                    r = resid_of(u, t, extra)
                else:
                    A, r = assemble(u, t, extra)
                rnorm = jnp.linalg.norm(r)
                finite = jnp.isfinite(rnorm)
                grew = (rnorm >= rnorm_prev) & (it > 0)
                growth = jnp.where(grew, growth + 1, 0)
                # priority mirrors the host loop: converged > nonfinite
                # > growth abort
                i32 = lambda v: jnp.asarray(v, jnp.int32)
                status = jnp.where(
                    rnorm <= target, i32(1), jnp.where(
                        ~finite, i32(2), jnp.where(
                            growth >= cfg.max_growth_iters,
                            i32(3), i32(0))))
                if cfg.forcing is not None:
                    f = cfg.forcing
                    eta = jnp.where(
                        it > 0,
                        jnp.clip(f.gamma * (rnorm / rnorm_prev) ** 2,
                                 f.eta_min, f.eta_max),
                        eta).astype(dt_)
                def solve_and_search(_):
                    # the whole inner stage — preconditioner setup
                    # (MG rediscretizes every coarse level), Krylov
                    # solve, line search — is gated behind the status
                    # check: the terminating iteration's update is
                    # discarded anyway, so this work would be dead
                    if cfg.inner == "dense":
                        du = jax.scipy.linalg.lu_solve(lu_frozen, r) \
                            if cfg.simplified_newton \
                            else _dense_solve(A, r)
                    else:
                        Minv = Minv_frozen if cfg.simplified_newton \
                            else make_minv(A, u, t, extra)
                        kfun = _krylov_fn(cfg.inner)
                        du, _ = kfun(A.mv, r, Minv=Minv, rtol=eta,
                                     atol=cfg.inner_atol,
                                     maxiter=cfg.inner_maxiter)
                    # a Krylov breakdown must not poison the carry: a
                    # NaN step fails the line search and backtracking
                    # cleanly only if du itself stays finite
                    du = jnp.where(jnp.isfinite(du), du, 0.0)
                    u_full = u - du
                    rn_full = rnorm_of(u_full, t, extra)

                    def backtrack(_):
                        def bt_cond(s):
                            alpha, rn, k = s
                            return (~(jnp.isfinite(rn) & (rn < rnorm))
                                    ) & (k < cfg.max_backtracks)

                        def bt_body(s):
                            alpha, _, k = s
                            rn = rnorm_of(u - alpha * du, t, extra)
                            return (alpha * 0.5, rn, k + 1)

                        a0 = jnp.asarray(0.5, dt_)
                        alpha, rn, k = jax.lax.while_loop(
                            bt_cond, bt_body,
                            (a0, jnp.asarray(jnp.inf, dt_),
                             jnp.asarray(0, jnp.int32)))
                        # bt loop leaves alpha already halved past the
                        # accepted value
                        alpha_acc = alpha * 2.0
                        good = jnp.isfinite(rn) & (rn < rnorm)
                        return jnp.where(
                            good, u - alpha_acc * du,
                            jnp.where(jnp.isfinite(rn_full), u_full,
                                      u - (2.0 ** -cfg.max_backtracks
                                           ) * du))

                    accept_full = jnp.isfinite(rn_full) & \
                        (rn_full <= 0.9 * rnorm)
                    return jax.lax.cond(
                        accept_full, lambda _: u_full, backtrack,
                        operand=None)

                u_new = jax.lax.cond(status == 0, solve_and_search,
                                     lambda _: u, operand=None)
                hist = hist.at[it].set(rnorm)
                ihist = ihist.at[it].set(jnp.linalg.norm(u_new - u))
                return (u_new, rnorm, eta, growth, it + 1, status,
                        hist, ihist)

            u, rnorm_last, eta, growth, it, status, hist, ihist = \
                jax.lax.while_loop(cond, body, carry0)
            rnorm_fin = rnorm_of(u, t, extra)
            converged = (status == 1) | (rnorm_fin <= target)
            return u, it, rnorm_fin, converged, status, hist, ihist
        return core


    def solve_host(self, fn, u0, t, monitor=None):
        """Host-loop Newton (per-iteration logging / host LU path).

        The jitted assembly closures are cached ON the function object and
        take (u, t, extra) as traced arguments, so repeated solves across
        load/time steps never recompile. Stage functions (Newmark etc.)
        thread their per-step parameters through ``fn.newton_extra()``."""
        ch = fn.constraints
        extra = fn.newton_extra() if hasattr(fn, "newton_extra") else ()

        jits_key = ("_newton_jits_v2", self.inner, self.precon)
        jits = fn.__dict__.get(jits_key) if hasattr(fn, "__dict__") \
            else None
        if jits is None:
            # host-LU needs the CSR values; the lattice BlockDIA operator
            # only supports mv/diagonal
            cfg_inner_not_lu = self.inner != "lu"

            @jax.jit
            def assemble_j(u, t, extra):
                if hasattr(fn, "assemble_operator") and \
                        cfg_inner_not_lu:
                    A_raw, r = fn.assemble_operator(u, t, *extra)
                else:
                    kvals, r = fn.assemble(u, t, *extra)
                    A_raw = fn.jacobian_matrix(kvals)
                A = ch.apply_operator(A_raw) if ch is not None else A_raw
                r = ch.apply_zero(r) if ch is not None else r
                return A, r

            @jax.jit
            def resid_j(u, t, extra):
                r = fn.residual(u, t, *extra)
                return ch.apply_zero(r) if ch is not None else r

            @jax.jit
            def rnorm_j(u, t, extra):
                return jnp.linalg.norm(resid_j(u, t, extra))

            # Inner Krylov solves MUST be jitted with the matrix as a
            # pytree ARGUMENT: calling cg eagerly with a fresh `A.mv`
            # closure re-traces (and on TPU re-compiles) the while_loop at
            # EVERY Newton iteration — measured seconds per iteration on a
            # remote chip vs milliseconds once cached here.
            from functools import partial
            cfg_precon = self.precon

            @partial(jax.jit, static_argnames=("maxiter", "method"))
            def krylov_j(A, u, t, extra, r, eta, atol, maxiter, method):
                if method == "dense":
                    return _dense_solve(A, r), None
                if cfg_precon is not None:
                    Minv = cfg_precon(A, u, t, extra)
                elif hasattr(A, "block_jacobi_inv"):
                    Minv = A.block_jacobi_inv()
                else:
                    Minv = jacobi_preconditioner(A.diagonal())
                f = _krylov_fn(method)
                return f(A.mv, r, Minv=Minv, rtol=eta, atol=atol,
                         maxiter=maxiter)

            jits = (assemble_j, resid_j, rnorm_j, krylov_j)
            try:
                fn.__dict__[jits_key] = jits
            except (AttributeError, TypeError):
                pass
        assemble_j, resid_j, rnorm_j, krylov_j = jits

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
        increments = []
        rnorm_prev = None
        eta = self.inner_rtol
        growth = 0
        A_frozen = None

        def _stats(it, rnorm, conv):
            return NewtonStats(it, rnorm, conv, tuple(history),
                               _thetas_from(history, increments, conv))

        for it in range(self.max_iter):
            if self.simplified_newton and A_frozen is not None:
                A = A_frozen
                r = resid_j(u, t, extra)
            else:
                A, r = assemble(u)
                A_frozen = A
            rnorm = float(jnp.linalg.norm(r))
            history.append(rnorm)
            if monitor is not None:
                monitor(it, rnorm)
            target = max(self.tol, self.rtol * history[0])
            if rnorm <= target:
                return u, _stats(it, rnorm, True)
            if not np.isfinite(rnorm):
                return u, _stats(it, rnorm, False)
            if rnorm_prev is not None and rnorm >= rnorm_prev:
                growth += 1
                if growth >= self.max_growth_iters:
                    return u, _stats(it, rnorm, False)
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
                du, info = krylov_j(A, u, t, extra, r, eta,
                                    self.inner_atol,
                                    self.inner_maxiter, self.inner)
            if monitor is not None and hasattr(monitor, "step_fields"):
                # per-iteration residual/increment field dumps
                # (VTKNewtonMonitor; ref src/solver/logging.jl:101-120)
                monitor.step_fields(it, u, r, du)
            # line search: prefer decrease, but fall back to the FULL step
            # (non-monotone Newton) rather than a crippled tiny step
            u_prev = u
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
            increments.append(float(jnp.linalg.norm(u - u_prev)))
            rnorm_prev = rnorm
        rnorm = float(rnorm_only(u))
        # same convergence target as the jitted path: max(tol, rtol*r0)
        target = max(self.tol, self.rtol * history[0]) if history \
            else self.tol
        return u, _stats(self.max_iter, rnorm, rnorm <= target)
