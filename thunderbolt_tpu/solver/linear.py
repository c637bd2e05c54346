"""Matrix-free Krylov solvers (jit-safe, shardable).

Replaces the reference's LinearSolve.jl front-end (``KrylovJL_CG``,
``KrylovJL_GMRES``, SURVEY.md §2.8). Operators are closures x -> A x; on a
device mesh the caller supplies dot products that ``psum`` over shards
(SURVEY.md §5.8). Preconditioning: Jacobi (diagonal) to start; the
multigrid-extension parity lands later as a Chebyshev/AMG-lite precond.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class KrylovInfo(NamedTuple):
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


def _default_dot(a, b):
    return jnp.sum(a * b)


def cg(A: Callable, b, x0=None, *, Minv: Optional[Callable] = None,
       rtol=1e-5, atol=1e-6, maxiter=1000, dot=_default_dot):
    """Preconditioned conjugate gradients on an SPD operator closure.

    Matches the role of ``KrylovJL_CG(atol, rtol)`` in the reference's
    backward-Euler heat solve (``ep01_spiral-wave.jl:128``).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if Minv is None:
        Minv = lambda r: r

    r0 = b - A(x0)
    z0 = Minv(r0)
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = jnp.maximum(atol, rtol * bnorm) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (dot(r, r) > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    init = (x0, r0, z0, z0, dot(r0, z0), jnp.asarray(0, jnp.int32))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, init)
    rnorm = jnp.sqrt(dot(r, r))
    return x, KrylovInfo(k, rnorm, rnorm * rnorm <= tol2)


def bicgstab(A: Callable, b, x0=None, *, Minv: Optional[Callable] = None,
             rtol=1e-5, atol=1e-6, maxiter=1000, dot=_default_dot):
    """BiCGStab for nonsymmetric operators (interface-diffusion blocks,
    Schur complements). GMRES parity for well-conditioned systems."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if Minv is None:
        Minv = lambda r: r
    r0 = b - A(x0)
    rhat = r0
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = jnp.maximum(atol, rtol * bnorm) ** 2
    one = jnp.asarray(1.0, b.dtype)

    def cond(s):
        x, r, p, v, rho, alpha, omega, k, broke = s
        return (~broke) & (dot(r, r) > tol2) & (k < maxiter)

    def body(s):
        x, r, p, v, rho, alpha, omega, k, broke = s
        rho_new = dot(rhat, r)
        beta = (rho_new / _nz(rho)) * (alpha / _nz(omega))
        p = r + beta * (p - omega * v)
        phat = Minv(p)
        v = A(phat)
        alpha = rho_new / _nz(dot(rhat, v))
        s_vec = r - alpha * v
        shat = Minv(s_vec)
        t = A(shat)
        omega = dot(t, s_vec) / _nz(dot(t, t))
        x_new = x + alpha * phat + omega * shat
        r_new = s_vec - omega * t
        # breakdown guard (rho/omega ~ 0 at near-convergence in f32):
        # freeze the last finite iterate/residual and flag the breakdown
        # so the caller sees converged=False with the true residual norm
        ok = jnp.isfinite(jnp.sum(x_new)) & jnp.isfinite(jnp.sum(r_new))
        x = jnp.where(ok, x_new, x)
        r = jnp.where(ok, r_new, r)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, ~ok)

    init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    x, r, p, v, rho, alpha, omega, k, broke = jax.lax.while_loop(
        cond, body, init)
    rnorm = jnp.sqrt(dot(r, r))
    return x, KrylovInfo(k, rnorm, (~broke) & (rnorm * rnorm <= tol2))


def _nz(x, eps=1e-30):
    """Sign-preserving guard against division-by-~zero breakdowns."""
    return jnp.where(jnp.abs(x) > eps, x, jnp.where(x < 0, -eps, eps))


def gmres(A: Callable, b, x0=None, *, Minv: Optional[Callable] = None,
          rtol=1e-5, atol=1e-6, maxiter=1000, restart=30, dot=_default_dot):
    """Restarted GMRES(m) with right preconditioning.

    Parity with the reference's ``KrylovJL_GMRES`` front-end
    (``src/solver/linear*.jl`` via LinearSolve.jl) — the robust choice for
    the nonsymmetric active-stress tangents where BiCGStab can break down.

    TPU-native shape: one jitted ``while_loop`` over restart cycles; each
    cycle is a static ``fori_loop`` of ``restart`` Arnoldi steps (classical
    Gram-Schmidt, two passes, expressed as dense [m+1, n] matvecs that XLA
    maps onto the MXU) with on-the-fly Givens rotations, followed by an
    on-device triangular back-solve. No per-iteration host sync.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if Minv is None:
        Minv = lambda r: r
    m = int(restart)
    n = b.shape[0]
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(atol, rtol * bnorm)
    eps = jnp.asarray(1e-30, dtype)

    def arnoldi_cycle(x):
        r = b - A(x)
        beta = jnp.sqrt(dot(r, r))
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps))
        R = jnp.zeros((m, m), dtype)        # rotated upper-triangular H
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def step(j, carry):
            V, R, cs, sn, g = carry
            w = A(Minv(V[j]))
            # two-pass classical GS; rows > j of V are zero so the full
            # matvec projects exactly onto the built Krylov basis
            h1 = V @ w
            w = w - h1 @ V
            h2 = V @ w
            w = w - h2 @ V
            h = h1 + h2                      # [m+1]
            hb = jnp.sqrt(dot(w, w))
            vn = jnp.where(hb > 1e-12, 1.0, 0.0) * w / jnp.maximum(hb, eps)
            V = V.at[j + 1].set(vn)
            h = h.at[j + 1].set(hb)
            # apply previous rotations to column j
            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                return hcol.at[i].set(cs[i] * hi + sn[i] * hi1) \
                           .at[i + 1].set(-sn[i] * hi + cs[i] * hi1)
            h = jax.lax.fori_loop(0, j, rot, h)
            # new rotation annihilating h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = jnp.where(denom > eps, h[j] / jnp.maximum(denom, eps), 1.0)
            s = jnp.where(denom > eps, h[j + 1] / jnp.maximum(denom, eps),
                          0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            R = R.at[:, j].set(h[:m])
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            return (V, R, cs, sn, g)

        V, R, cs, sn, g = jax.lax.fori_loop(
            0, m, step, (V, R, cs, sn, g))
        # back-substitution R y = g[:m] (upper triangular, tiny static m)
        def back(i, y):
            j = m - 1 - i
            acc = g[j] - jnp.sum(R[j] * y)
            return y.at[j].set(acc / _nz(R[j, j]))
        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        return x + Minv(y @ V[:m])

    def cond(s):
        x, r2, k = s
        return (r2 > tol * tol) & (k < maxiter)

    def body(s):
        x, _, k = s
        x = arnoldi_cycle(x)
        r = b - A(x)
        return (x, dot(r, r), k + m)

    r0 = b - A(x0)
    x, r2, k = jax.lax.while_loop(
        cond, body, (x0, dot(r0, r0), jnp.asarray(0, jnp.int32)))
    rnorm = jnp.sqrt(r2)
    return x, KrylovInfo(k, rnorm, r2 <= tol * tol)


def jacobi_preconditioner(diag):
    """M^-1 r = r / diag (guarding near-zero diagonal entries)."""
    inv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
    return lambda r: inv * r


def schur_complement_solve(A_solve: Callable, B, C, f, g):
    """Solve the 2x2 block system with zero (2,2) block

        [A  B] [x]   [f]
        [C  0] [y] = [g]

    by explicit Schur elimination over the (small) second block: one inner
    solve per column of ``B`` plus one for ``f`` — exactly the reference's
    ``SchurComplementLinearSolver`` strategy for the 3D-0D saddle point
    (``src/solver/linear/schur.jl:26-80``: "inner solves per constraint").

    ``A_solve``: closure solving ``A x = b`` (direct or Krylov, possibly
    preconditioned/sharded). ``B``: [n, m]; ``C``: [m, n]; m small/static.
    Returns ``(x, y)``.
    """
    W = jax.vmap(A_solve, in_axes=1, out_axes=1)(B)      # A^-1 B, [n, m]
    xf = A_solve(f)                                      # A^-1 f
    S = C @ W                                            # [m, m]
    y = _small_dense_solve(S, C @ xf - g)
    x = xf - W @ y
    return x, y


def _small_dense_solve(S, b):
    """Solve the tiny (m x m) Schur system without LuDecomposition — TPU
    only implements LU for f32, and the multiplier count is 1-4 anyway."""
    m = S.shape[0]
    if m == 1:
        return b / S[0, 0]
    if m <= 3:
        from thunderbolt_tpu.utils.smallmat import det_small, inv_small
        return inv_small(S, det_small(S)) @ b
    x, _ = cg(lambda v: S @ v, b, rtol=1e-12, atol=0.0, maxiter=16 * m)
    return x


class SchurComplementLinearSolver:
    """Named front-end over :func:`schur_complement_solve` (parity:
    ``SchurComplementLinearSolver``, ``src/solver/linear/schur.jl:26``).

    ``inner``: "cg" | "bicgstab" | a callable ``(Avec, b) -> x``.
    ``Avec``: the (1,1)-block operator closure x -> A x.
    """

    def __init__(self, inner="cg", rtol=1e-8, atol=1e-10, maxiter=1000,
                 Minv=None):
        self.inner = inner
        self.rtol, self.atol, self.maxiter = rtol, atol, maxiter
        self.Minv = Minv

    def _inner_solve(self, Avec):
        if callable(self.inner):
            return lambda b: self.inner(Avec, b)
        fn = {"cg": cg, "bicgstab": bicgstab}[self.inner]

        def solve(b):
            x, _ = fn(Avec, b, Minv=self.Minv, rtol=self.rtol,
                      atol=self.atol, maxiter=self.maxiter)
            return x
        return solve

    def solve(self, Avec: Callable, B, C, f, g):
        return schur_complement_solve(self._inner_solve(Avec), B, C, f, g)


def lanczos_bounds(Bmv: Callable, n: int, dtype=jnp.float32, iters: int = 60,
                   seed: int = 0):
    """Extremal eigenvalue estimates of a symmetric operator via Lanczos
    with full reorthogonalization. The recursion runs ON DEVICE and the
    (alpha, beta) tridiagonal crosses the host boundary ONCE (a host-side
    per-iteration `float()` costs a full round-trip on tunneled chips);
    host eigvalsh of the tiny tridiagonal finishes the job.
    Returns (lam_min, lam_max) floats."""
    import numpy as np
    rng = np.random.default_rng(seed)
    iters = min(iters, n)
    v0 = jnp.asarray(rng.standard_normal(n), dtype)
    v0 = v0 / jnp.sqrt(jnp.sum(v0 * v0))

    def run():
        V = jnp.zeros((iters + 1, n), dtype).at[0].set(v0)
        alphas = jnp.zeros(iters, dtype)
        betas = jnp.zeros(iters, dtype)

        def body(k, carry):
            V, alphas, betas = carry
            v = V[k]
            w = Bmv(v)
            alpha = jnp.sum(v * w)
            # full reorthogonalization against ALL stored vectors (rows
            # past k are zero, so the projection is exact); two passes —
            # one-pass classical Gram-Schmidt loses orthogonality beyond
            # ~30 Lanczos steps and the Ritz values explode
            w = w - (V @ w) @ V
            w = w - (V @ w) @ V
            beta = jnp.sqrt(jnp.sum(w * w))
            vn = jnp.where(beta > 1e-12, 1.0, 0.0) * w / jnp.maximum(
                beta, 1e-30)
            V = V.at[k + 1].set(vn)
            return (V, alphas.at[k].set(alpha), betas.at[k].set(beta))

        _, alphas, betas = jax.lax.fori_loop(0, iters, body,
                                             (V, alphas, betas))
        return alphas, betas

    alphas, betas = jax.device_get(jax.jit(run)())
    # truncate at breakdown (invariant subspace found)
    stop = np.nonzero(betas < 1e-10)[0]
    m = int(stop[0]) + 1 if stop.size else iters
    T = np.diag(alphas[:m]).astype(np.float64)
    off = betas[: m - 1].astype(np.float64)
    T += np.diag(off, 1) + np.diag(off, -1)
    ev = np.linalg.eigvalsh(T)
    return float(ev[0]), float(ev[-1])


def chebyshev(A: Callable, b, x0=None, *, lam_min, lam_max, iters,
              Minv: Optional[Callable] = None, unroll: Optional[bool] = None):
    """Fixed-count preconditioned Chebyshev iteration on an SPD operator.

    Unlike CG this has NO inner products — the whole solve is a static
    chain of SpMV + axpy that XLA fuses and that carries no sequential
    reduction dependencies; on TPU this makes it the method of choice for
    the extremely well-conditioned backward-Euler heat systems
    (kappa ~ 2-5 after Jacobi), where the iteration count is known a
    priori from the spectral interval.

    ``unroll`` defaults by backend: True on TPU (the fully unrolled chain
    is what XLA:TPU fuses into one kernel), False elsewhere — XLA:CPU's
    compile time on the unrolled pad/slice chains of the SymDIA SpMV is
    superlinear in the iteration count (measured: 8 iters = 1.8 s,
    35 iters > 110 s at n = 85; the fori_loop form compiles in 0.3 s)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if Minv is None:
        Minv = lambda r: r
    if unroll is None:
        unroll = jax.default_backend() == "tpu"
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    x = x0
    r = b - A(x)
    d = Minv(r) / theta

    if unroll:
        for _ in range(iters):
            x = x + d
            r = r - A(d)
            z = Minv(r)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
            rho = rho_new
        return x

    def body(_, s):
        x, r, d, rho = s
        x = x + d
        r = r - A(d)
        z = Minv(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
        return (x, r, d, rho_new)

    x, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (x, r, d, jnp.asarray(rho, b.dtype)))
    return x


def chebyshev_iterations(kappa: float, rtol: float) -> int:
    """Iterations for ||e_k|| <= rtol ||e_0|| on condition number kappa."""
    import math
    q = (math.sqrt(kappa) - 1.0) / (math.sqrt(kappa) + 1.0)
    if q <= 0.0:
        return 1
    return max(1, int(math.ceil(math.log(2.0 / rtol) / -math.log(q))))
