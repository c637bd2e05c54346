"""First-order time steppers: backward Euler (heat) and pointwise cell
solvers (forward Euler / adaptive substepping / Rush-Larsen).

Parity: ``BackwardEulerSolver`` with its A = M - dt*K stage re-formed only
when dt changes (``src/solver/time/euler.jl:4-179``), and
``ForwardEulerCellSolver`` / ``AdaptiveForwardEulerSubstepper``
(``src/solver/time/partitioned_solver.jl:57-324``).

TPU-native design: a solver is a *factory* — ``make_step(fn, dt)`` composes
a jit-safe ``step(u, t) -> u`` closure at setup time. dt is static per
compiled step (re-making on dt change mirrors the reference's cheap A
re-forming, euler.jl:110-116). Pointwise kernels are fused SoA array ops —
per-point adaptivity becomes compute-both-and-select, which on the VPU is
cheaper than divergent control flow.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

import jax
import jax.numpy as jnp

from thunderbolt_tpu.disc.functions import (
    AffineODEFunction, PointwiseODEFunction, PointwiseMultiODEFunction)


def _make_multi_step(solver, fn: PointwiseMultiODEFunction, dt):
    """Compose per-part SoA kernels over a PointwiseMultiODEFunction."""
    substeps = []
    for part in fn.parts:
        sub_fn = PointwiseODEFunction(ion=part.ion, npoints=part.npoints,
                                      x=part.x)
        kernel = solver.make_step(sub_fn, dt)
        substeps.append((part, kernel))

    def step(u, t):
        for part, kernel in substeps:
            U = part.gather(u)
            U2 = kernel(U.reshape(-1), t).reshape(U.shape)
            u = part.scatter(u, U2)
        return u

    return step


def _make_multi_step_dt(solver, fn: PointwiseMultiODEFunction):
    """Traced-dt variant of :func:`_make_multi_step` (RTC adaptive path on
    multi-subdomain EP)."""
    substeps = []
    for part in fn.parts:
        sub_fn = PointwiseODEFunction(ion=part.ion, npoints=part.npoints,
                                      x=part.x)
        kernel = solver.make_step_dt(sub_fn)
        substeps.append((part, kernel))

    def step(u, t, dt):
        for part, kernel in substeps:
            U = part.gather(u)
            U2 = kernel(U.reshape(-1), t, dt).reshape(U.shape)
            u = part.scatter(u, U2)
        return u

    return step
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner


@dataclass(frozen=True)
class BackwardEulerSolver:
    """(M - dt K) u_{n+1} = M u_n + dt f(t_{n+1}); CG inner solve.

    Parity: ``BackwardEulerSolver`` + ``perform_backward_euler_step!``
    (``euler.jl:4-179``); the inner solver spec mirrors
    ``KrylovJL_CG(atol, rtol)`` (``ep01_spiral-wave.jl:128``)."""

    rtol: float = 1e-5
    atol: float = 1e-6
    maxiter: int = 500
    preconditioner: str = "jacobi"
    #: "cg" (adaptive, reduction-per-iteration) or "chebyshev" (fixed
    #: count from setup-time Lanczos eigenbounds — NO inner products, the
    #: whole solve is one fusible SpMV/axpy chain; right for the
    #: well-conditioned fixed-dt heat systems of operator splitting)
    solver: str = "cg"
    #: chebyshev only: run the polynomial iterations inside
    #: temporally-blocked VMEM-resident Pallas tiles (diagonals read from
    #: HBM once per segment instead of once per iteration). MEASURED
    #: SLOWER than the XLA chain on the v5e chip (1024^2: 1.92 vs 1.43
    #: ms/solve; 512^2: 0.46 vs 0.33) — XLA's fused stencil already runs
    #: at effective-HBM roofline, and Mosaic lowers each stencil shift to
    #: full-buffer VMEM copies that outweigh the HBM savings. Kept as
    #: opt-in infrastructure (exact to 5e-8, interpret-tested) for
    #: hardware where the roofline trade differs.
    use_pallas: bool = False

    def _ops(self, fn):
        """Prefer the DIA fast path (no gathers) when available; upgrade a
        symmetric DIA pair to half-traffic SymDIA storage (measured 1.36x /
        1.75x on the 512^2 / 1024^2 Chebyshev chains — fem/sparsity.py)."""
        if fn.M_dia is not None and fn.constraints is None:
            sym = fn.__dict__.get("_sym_dia_ops", "unset")
            if sym == "unset":
                from thunderbolt_tpu.fem.sparsity import dia_to_symmetric
                Ms = dia_to_symmetric(fn.M_dia)
                Ks = dia_to_symmetric(fn.K_dia) if Ms is not None else None
                # axpby needs matching offset sets
                sym = (Ms, Ks) if (Ks is not None
                                   and Ms.offsets == Ks.offsets) else None
                fn.__dict__["_sym_dia_ops"] = sym
            if sym is not None:
                return sym
            return fn.M_dia, fn.K_dia
        return fn.M, fn.K

    def _bidomain_ops(self, fn):
        if fn.M_dia is not None:
            sym = fn.__dict__.get("_sym_dia_ops", "unset")
            if sym == "unset":
                from thunderbolt_tpu.fem.sparsity import dia_to_symmetric
                parts = [dia_to_symmetric(a) for a in
                         (fn.M_dia, fn.K_i_dia, fn.K_e_dia)]
                sym = tuple(parts) if all(p is not None for p in parts) \
                    else None
                fn.__dict__["_sym_dia_ops"] = sym
            if sym is not None:
                return sym
            return fn.M_dia, fn.K_i_dia, fn.K_e_dia
        return fn.M, fn.K_i, fn.K_e

    def _make_bidomain_step(self, fn, dt=None):
        """One backward-Euler step of the coupled parabolic-elliptic
        bidomain block system (see BidomainFunction). If ``dt`` is None the
        returned step takes dt as a traced argument. phi_e is gauged to
        zero mean after the solve; CG iterates stay in the range space
        automatically (row 2 of the operator maps everything to zero-mean,
        and the rhs's second block is zero)."""
        import jax.lax as lax
        from thunderbolt_tpu.disc.functions import PPBidomainFunction
        M, Ki, Ke = self._bidomain_ops(fn)
        n = fn.ndofs_field
        po, eo = fn.phi_offset, fn.e_offset
        source = fn.source
        pp = isinstance(fn, PPBidomainFunction)

        def step(U, t, dt):
            u = lax.dynamic_slice(U, (po,), (n,))
            v = lax.dynamic_slice(U, (eo,), (n,))

            if pp:
                # untransformed (phi_i, phi_e) block system — SPD up to
                # the shared-potential nullvector [1; 1] (b is orthogonal
                # to it by construction: the two blocks are +-(M phi_m))
                def Amv(z):
                    zu, zv = z[:n], z[n:]
                    w = M.mv(zu - zv)
                    return jnp.concatenate([
                        w - dt * Ki.mv(zu),
                        -w - dt * Ke.mv(zv),
                    ])

                d = jnp.concatenate([
                    M.diagonal() - dt * Ki.diagonal(),
                    M.diagonal() - dt * Ke.diagonal(),
                ])
            else:
                def Amv(z):
                    zu, zv = z[:n], z[n:]
                    kiw = Ki.mv(zu + zv)
                    return jnp.concatenate([
                        M.mv(zu) - dt * kiw,
                        -dt * (kiw + Ke.mv(zv)),
                    ])

                d = jnp.concatenate([
                    M.diagonal() - dt * Ki.diagonal(),
                    -dt * (Ki.diagonal() + Ke.diagonal()),
                ])
            Minv = jacobi_preconditioner(d) \
                if self.preconditioner == "jacobi" else None
            b1 = M.mv(u)
            if source is not None:
                b1 = b1 + dt * source(t + dt)
            if pp:
                b = jnp.concatenate([b1, -b1])
                x0 = jnp.concatenate([u + v, v])   # phi_i = phi_m + phi_e
            else:
                b = jnp.concatenate([b1, jnp.zeros_like(b1)])
                x0 = jnp.concatenate([u, v])
            x, info = cg(Amv, b, x0=x0, Minv=Minv,
                         rtol=self.rtol, atol=self.atol,
                         maxiter=self.maxiter)
            if pp:
                phii, vn = x[:n], x[n:]
                un = phii - vn                     # gauge-invariant
                vn = vn - jnp.mean(vn)
            else:
                un, vn = x[:n], x[n:]
                vn = vn - jnp.mean(vn)
            U = lax.dynamic_update_slice(U, un, (po,))
            U = lax.dynamic_update_slice(U, vn, (eo,))
            return U

        if dt is None:
            return step
        dt_c = dt
        return lambda U, t: step(U, t, dt_c)

    def make_step(self, fn: AffineODEFunction, dt):
        from thunderbolt_tpu.disc.functions import BidomainFunction
        if isinstance(fn, BidomainFunction):
            return self._make_bidomain_step(fn, dt)
        M, K = self._ops(fn)
        A_raw = M.axpby(1.0, K, -dt)
        ch = fn.constraints
        A = ch.apply_operator(A_raw) if ch is not None else A_raw
        Minv = jacobi_preconditioner(A.diagonal()) \
            if self.preconditioner == "jacobi" else None
        source = fn.source

        if self.solver == "chebyshev":
            if self.preconditioner != "jacobi":
                # the Lanczos bounds below are for the Jacobi-symmetrized
                # operator; Chebyshev has no residual check, so running on
                # a different spectral interval would diverge SILENTLY
                raise ValueError(
                    "solver='chebyshev' requires preconditioner='jacobi' "
                    "(spectral bounds are estimated on the Jacobi-scaled "
                    "operator)")
            from thunderbolt_tpu.solver.linear import (
                lanczos_bounds, chebyshev, chebyshev_iterations)
            diag = A.diagonal()
            s = 1.0 / jnp.sqrt(jnp.abs(diag))
            lmin, lmax = lanczos_bounds(
                lambda v: s * A.mv(s * v), diag.shape[0], diag.dtype)
            # widen: Lanczos approximates extremal eigenvalues from inside
            lmin, lmax = 0.9 * lmin, 1.02 * lmax
            iters = chebyshev_iterations(lmax / lmin, self.rtol)

            fused = None
            from thunderbolt_tpu.fem.sparsity import DIAMatrix
            if self.use_pallas and isinstance(A, DIAMatrix) \
                    and jax.default_backend() == "tpu":
                from thunderbolt_tpu.ops.pallas_dia import (
                    cheb_fused_fits, chebyshev_dia_fused)
                if cheb_fused_fits(A, iters):
                    sinv = 1.0 / diag

                    def fused(b, u):
                        return chebyshev_dia_fused(
                            A, b, u, lam_min=lmin, lam_max=lmax,
                            iters=iters, sinv=sinv)

            def step(u, t):
                b = M.mv(u)
                if source is not None:
                    b = b + dt * source(t + dt)
                if ch is not None:
                    b = ch.apply_rhs(A_raw, b)
                if fused is not None:
                    return fused(b, u)
                return chebyshev(A.mv, b, x0=u, lam_min=lmin,
                                 lam_max=lmax, iters=iters, Minv=Minv)

            return step

        def step(u, t):
            b = M.mv(u)
            if source is not None:
                b = b + dt * source(t + dt)
            if ch is not None:
                b = ch.apply_rhs(A_raw, b)
            x, info = cg(A.mv, b, x0=u, Minv=Minv, rtol=self.rtol,
                         atol=self.atol, maxiter=self.maxiter)
            return x

        return step

    def make_step_dt(self, fn: AffineODEFunction):
        """Variant with dt as a TRACED argument (adaptive splitting):
        A = M - dt K is re-formed in-kernel each step — the same cheap
        O(nnz) re-forming the reference does on dt change
        (euler.jl:110-116)."""
        from thunderbolt_tpu.disc.functions import BidomainFunction
        if isinstance(fn, BidomainFunction):
            return self._make_bidomain_step(fn)
        ch = fn.constraints
        source = fn.source

        M, K = self._ops(fn)

        def step(u, t, dt):
            A_raw = M.axpby(1.0, K, -dt)
            A = ch.apply_operator(A_raw) if ch is not None else A_raw
            Minv = jacobi_preconditioner(A.diagonal()) \
                if self.preconditioner == "jacobi" else None
            b = M.mv(u)
            if source is not None:
                b = b + dt * source(t + dt)
            if ch is not None:
                b = ch.apply_rhs(A_raw, b)
            x, info = cg(A.mv, b, x0=u, Minv=Minv, rtol=self.rtol,
                         atol=self.atol, maxiter=self.maxiter)
            return x

        return step


@dataclass(frozen=True)
class ForwardEulerSolver:
    """Explicit heat step with row-sum lumped mass:
    u += dt * (K u + f) / m_lumped."""

    def make_step(self, fn: AffineODEFunction, dt):
        ml = fn.lumped_mass
        source = fn.source

        def step(u, t):
            r = fn.K.mv(u)
            if source is not None:
                r = r + source(t)
            return u + dt * r / ml

        return step


# ---------------------------------------------------------------------------
# pointwise (cell-ODE) solvers
# ---------------------------------------------------------------------------

#: substep counts up to this bound are unrolled into one elementwise chain
#: instead of a lax.fori_loop — XLA then fuses the whole chain into a
#: handful of kernels (measured 2.2x on the 256^2 FHN cell stage: 86 -> 38
#: us/step on a v5e chip; a fori_loop body launches per iteration).
_UNROLL_LIMIT = 64


def _substep_chain(body, U, n):
    """Run ``U = body(i, U)`` n times, unrolled when n is small."""
    if n <= _UNROLL_LIMIT:
        for i in range(n):
            U = body(i, U)
        return U
    return jax.lax.fori_loop(0, n, body, U)


@dataclass(frozen=True)
class ForwardEulerCellSolver:
    """Fixed-substep explicit Euler on the SoA cell-state block.

    Parity: ``ForwardEulerCellSolver`` (``partitioned_solver.jl:57``)."""

    substeps: int = 1
    use_pallas: bool = True

    def make_step(self, fn, dt):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step(self, fn, dt)
        ion, x, n = fn.ion, fn.x, self.substeps
        h = dt / n
        if self.use_pallas:
            from thunderbolt_tpu.ops.pallas_cells import \
                make_forward_euler_kernel
            k = make_forward_euler_kernel(
                ion, fn.npoints, dt, n,
                dtype=x.dtype if x is not None else jnp.float32)
            if k is not None:
                return k

        def step(u, t):
            U = fn.reshape(u)

            def body(i, U):
                return U + h * ion.rhs(U, x, t + i * h)

            U = _substep_chain(body, U, n)
            return U.reshape(-1)

        return step

    def make_step_dt(self, fn):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step_dt(self, fn)
        ion, x, n = fn.ion, fn.x, self.substeps

        def step(u, t, dt):
            h = dt / n
            U = fn.reshape(u)

            def body(i, U):
                return U + h * ion.rhs(U, x, t + i * h)

            U = _substep_chain(body, U, n)
            return U.reshape(-1)

        return step


@dataclass(frozen=True)
class AdaptiveForwardEulerSubstepper:
    """Per-point adaptive substepping: points whose |dphi/dt| exceeds
    `reaction_threshold` take `substeps` fine steps, the rest one coarse
    step. Parity: ``AdaptiveForwardEulerSubstepper``
    (``partitioned_solver.jl:169-234``) — the per-point branch becomes a
    vectorized compute-both-and-select (SURVEY.md §7)."""

    reaction_threshold: float = 0.1
    substeps: int = 8
    use_pallas: bool = True

    def make_step(self, fn, dt):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step(self, fn, dt)
        ion, x = fn.ion, fn.x
        n = self.substeps
        h = dt / n
        p = ion.phi_index
        if self.use_pallas:
            from thunderbolt_tpu.ops.pallas_cells import \
                make_adaptive_substep_kernel
            k = make_adaptive_substep_kernel(
                ion, fn.npoints, dt, n, self.reaction_threshold,
                dtype=x.dtype if x is not None else jnp.float32)
            if k is not None:
                return k

        def step(u, t):
            U = fn.reshape(u)
            dU = ion.rhs(U, x, t)
            coarse = U + dt * dU
            need_fine = jnp.abs(dU[p]) > self.reaction_threshold  # [npoints]

            def body(i, Uf):
                # reuse the already-computed slope on the first substep
                if isinstance(i, int):  # unrolled: resolve at trace time
                    dUf = dU if i == 0 else ion.rhs(Uf, x, t + i * h)
                else:
                    dUf = jax.lax.cond(i == 0, lambda: dU,
                                       lambda: ion.rhs(Uf, x, t + i * h))
                return Uf + h * dUf

            fine = _substep_chain(body, U, n)
            out = jnp.where(need_fine[None, :], fine, coarse)
            return out.reshape(-1)

        return step

    def make_step_dt(self, fn):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step_dt(self, fn)
        ion, x = fn.ion, fn.x
        n = self.substeps
        p = ion.phi_index

        def step(u, t, dt):
            h = dt / n
            U = fn.reshape(u)
            dU = ion.rhs(U, x, t)
            coarse = U + dt * dU
            need_fine = jnp.abs(dU[p]) > self.reaction_threshold

            def body(i, Uf):
                if isinstance(i, int):
                    dUf = dU if i == 0 else ion.rhs(Uf, x, t + i * h)
                else:
                    dUf = jax.lax.cond(i == 0, lambda: dU,
                                       lambda: ion.rhs(Uf, x, t + i * h))
                return Uf + h * dUf

            fine = _substep_chain(body, U, n)
            out = jnp.where(need_fine[None, :], fine, coarse)
            return out.reshape(-1)

        return step


@dataclass(frozen=True)
class RushLarsenCellSolver:
    """Exponential (Rush-Larsen 1978) update for Hodgkin-Huxley gates,
    forward Euler for the rest. The reference lacks this solver; it is
    required for the stiff ten Tusscher model at EP-benchmark step sizes
    (BASELINE.md config 2)."""

    substeps: int = 1
    use_pallas: bool = True

    def make_step(self, fn, dt):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step(self, fn, dt)
        ion, x = fn.ion, fn.x
        if self.use_pallas and len(ion.gating_indices) > 0:
            from thunderbolt_tpu.ops.pallas_cells import \
                make_rush_larsen_kernel
            k = make_rush_larsen_kernel(
                ion, fn.npoints, dt, self.substeps,
                dtype=x.dtype if x is not None else jnp.float32)
            if k is not None:
                return k
        gidx = jnp.asarray(ion.gating_indices)
        if len(ion.gating_indices) == 0:
            raise ValueError(f"{type(ion).__name__} exposes no gate structure")
        n = self.substeps
        h = dt / n

        def substep(U, ti):
            dU = ion.rhs(U, x, ti)
            inf, tau = ion.gating_inf_tau(U, x, ti)
            euler = U + h * dU
            gates = inf + (U[gidx] - inf) * jnp.exp(-h / tau)
            return euler.at[gidx].set(gates)

        def step(u, t):
            U = fn.reshape(u)

            def body(i, U):
                return substep(U, t + i * h)

            U = _substep_chain(body, U, n)
            return U.reshape(-1)

        return step

    def make_step_dt(self, fn):
        if isinstance(fn, PointwiseMultiODEFunction):
            return _make_multi_step_dt(self, fn)
        ion, x = fn.ion, fn.x
        gidx = jnp.asarray(ion.gating_indices)
        if len(ion.gating_indices) == 0:
            raise ValueError(f"{type(ion).__name__} exposes no gate structure")
        n = self.substeps

        def step(u, t, dt):
            h = dt / n
            U = fn.reshape(u)

            def body(i, U):
                ti = t + i * h
                dU = ion.rhs(U, x, ti)
                inf, tau = ion.gating_inf_tau(U, x, ti)
                euler = U + h * dU
                gates = inf + (U[gidx] - inf) * jnp.exp(-h / tau)
                return euler.at[gidx].set(gates)

            U = _substep_chain(body, U, n)
            return U.reshape(-1)

        return step
