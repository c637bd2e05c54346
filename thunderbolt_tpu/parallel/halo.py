"""Halo-exchange partitioned SpMV heat step (shard_map + lax.ppermute).

The default multi-chip EP heat path row-partitions the ELL operator and
lets GSPMD insert an ALL-GATHER of the full operand vector before every
matvec (``parallel/sharding.py``): correct, but O(ndofs) bytes per device
per Krylov/Chebyshev iteration. This module implements the SURVEY §2.9 /
§5.8-contracted TPU-native form — the analog of the reference's
partitioned shared-memory SpMV layer (``src/utils.jl:167-246``,
``ThreadedSparseMatrixCSR``): with band-ordered dof numbering (lattice or
RCM), every row's off-device columns fall in CONTIGUOUS index ranges just
left/right of the local block, so a device only needs the last/first
``B`` entries of its ring neighbours — two ``lax.ppermute`` sends of
O(bandwidth) bytes over ICI instead of an all-gather of O(ndofs).

The whole backward-Euler solve (b = M u, Jacobi scaling, Chebyshev or
psum-dot CG iteration) runs INSIDE one ``shard_map``: per iteration the
only collectives are the two halo permutes (Chebyshev; dot-free by
construction) plus one scalar psum per CG iteration.

Communication per device per iteration, P devices, n dofs, bandwidth B:

    all-gather (GSPMD):  (P-1)/P * n * 4 bytes   (full operand vector)
    halo (this module):  2 * B * 4 bytes          (surface only)

At the Niederer h=0.2 slab (58,176 dofs, measured bandwidth B = 593,
P = 8) that is 203.6 kB vs 4.7 kB per matvec — 43x less
(``tools/comm_volume.py`` records both the compiled-HLO collective
census and this model), and the gap widens with refinement (n grows as
h^-3, B as h^-2).

Enable via ``make_sharded_step(..., spmv="halo")``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ell_halo_tables(cols: np.ndarray, ndev: int):
    """(bandwidth B, local column table) for a row-partitioned ELL matrix.

    ``local_cols[r, k] = cols[r, k] - owner_offset(r) + B`` indexes into
    the device-local extended vector ``[left_halo(B) | local(L) |
    right_halo(B)]``; valid in ``[0, L + 2B)`` by the bandwidth bound.
    """
    n = cols.shape[0]
    if n % ndev:
        raise ValueError(f"rows ({n}) not divisible by mesh size {ndev}")
    L = n // ndev
    rows = np.arange(n, dtype=np.int64)[:, None]
    B = int(np.max(np.abs(cols.astype(np.int64) - rows)))
    if B > L:
        raise ValueError(
            f"matrix bandwidth {B} exceeds the local block size {L}: "
            "halo exchange needs band-ordered dofs with bandwidth below "
            "ndofs/ndevices (renumber the mesh or use spmv='gspmd')")
    owner = (rows // L) * L
    lc = (cols.astype(np.int64) - owner + B).astype(np.int32)
    return B, lc


def _halo_mv(vals, lc, x, *, B: int, axis: str, ndev: int):
    """Device-local ELL matvec with ring halo exchange.

    Non-periphery permutes only: the first device's left halo (and the
    last device's right halo) is never referenced — column indices cannot
    reach it — so those sources are simply omitted and ppermute fills
    zeros.
    """
    lh = jax.lax.ppermute(x[-B:], axis,
                          [(i, i + 1) for i in range(ndev - 1)])
    rh = jax.lax.ppermute(x[:B], axis,
                          [(i + 1, i) for i in range(ndev - 1)])
    xe = jnp.concatenate([lh, x, rh])
    return jnp.sum(vals * xe[lc], axis=1)


def _cg_psum(mv, b, x0, dinv, *, rtol, atol, maxiter, axis):
    """Jacobi-preconditioned CG with cross-device psum dot products —
    the shard_map-local analog of ``solver/linear.py:cg`` (same update
    order, same stopping rule |r| <= max(rtol*|b|, atol))."""
    def dot(u, v):
        return jax.lax.psum(jnp.sum(u * v), axis)

    r0 = b - mv(x0)
    z0 = dinv * r0
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = jnp.maximum(atol, rtol * bnorm) ** 2

    def cond(s):
        x, r, z, p, rz, k = s
        return (dot(r, r) > tol2) & (k < maxiter)

    def body(s):
        x, r, z, p, rz, k = s
        Ap = mv(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, dot(r0, z0),
                     jnp.asarray(0, jnp.int32)))
    return x


def halo_eligibility(fn, solver, ndev: int):
    """(ok, reason) — can the halo-exchange path serve this heat solve?

    Conditions (each maps to a structural requirement of
    :func:`make_halo_heat_step`): unconstrained operator (monodomain heat
    has no Dirichlet rows), a Jacobi-preconditioned Chebyshev/CG
    BackwardEulerSolver, a shared ELL sparsity between M and K, rows
    divisible by the device count (``pad_split_function`` guarantees
    this), and matrix bandwidth below the per-device block size so the
    off-device columns fit in one left + one right neighbour halo.
    """
    if fn.constraints is not None:
        return False, ("Dirichlet-constrained operator (constraint "
                       "support lives on the GSPMD path)")
    if getattr(solver, "preconditioner", "jacobi") != "jacobi":
        return False, "halo heat step is Jacobi-preconditioned"
    if getattr(solver, "solver", None) not in ("chebyshev", "cg"):
        return False, (f"inner solver {getattr(solver, 'solver', None)!r} "
                       "unsupported (chebyshev/cg only)")
    M, K = fn.M, fn.K
    cols_m = getattr(M, "cols", None)
    cols_k = getattr(K, "cols", None)
    if cols_m is None or cols_k is None:
        return False, "operators are not ELL (no column table)"
    cols = np.asarray(jax.device_get(cols_k))
    if not np.array_equal(cols, np.asarray(jax.device_get(cols_m))):
        return False, "M and K sparsity patterns differ"
    n = cols.shape[0]
    if n % ndev:
        return False, f"rows ({n}) not divisible by mesh size {ndev}"
    L = n // ndev
    rows = np.arange(n, dtype=np.int64)[:, None]
    B = int(np.max(np.abs(cols.astype(np.int64) - rows)))
    if B > L:
        return False, (f"matrix bandwidth {B} exceeds the local block "
                       f"size {L} (dofs not band-ordered; renumber or "
                       "use fewer devices)")
    return True, f"bandwidth {B} <= block {L}"


def resolve_spmv(spmv: str, fn, solver, ndev: int, *, logger=None):
    """Resolve an ``spmv`` mode string to ``"halo"`` or ``"gspmd"``.

    ``"auto"`` (the default across the sharded EP/EM entry points since
    round 5) picks halo whenever :func:`halo_eligibility` passes —
    O(bandwidth) neighbour exchange instead of an O(ndofs) all-gather
    per matvec — and falls back to GSPMD with the reason logged.
    """
    import logging
    logger = logger or logging.getLogger("thunderbolt_tpu.parallel")
    if spmv in ("halo", "gspmd"):
        return spmv
    if spmv != "auto":
        raise ValueError(f"unknown spmv mode {spmv!r}; "
                         "expected 'auto', 'halo' or 'gspmd'")
    ok, why = halo_eligibility(fn, solver, ndev)
    if ok:
        logger.info("spmv=auto -> halo (%s)", why)
        return "halo"
    logger.info("spmv=auto -> gspmd fallback: %s", why)
    return "gspmd"


def make_halo_heat_step(fn, solver, dt, mesh: Mesh, axis: str = "shard"):
    """Backward-Euler heat step with the halo-exchange partitioned SpMV.

    ``fn``: AffineODEFunction with ELL operators, dofs already padded to a
    multiple of the mesh size (``pad_split_function``), no Dirichlet
    constraints (monodomain heat has none; constraint support belongs to
    the GSPMD path). ``solver``: a BackwardEulerSolver; both its
    ``"chebyshev"`` (collective-free iterations) and ``"cg"`` (one scalar
    psum per iteration) inner solvers are supported, Jacobi-preconditioned.

    Returns ``step(u, t) -> u`` operating on the P(axis)-sharded phi row.
    """
    from thunderbolt_tpu.solver.linear import (
        lanczos_bounds, chebyshev, chebyshev_iterations)

    ok, why = halo_eligibility(
        fn, solver,
        int(np.prod([mesh.shape[a] for a in mesh.axis_names])))
    if not ok:
        raise ValueError(f"halo heat step not applicable: {why}; "
                         "use spmv='gspmd'")

    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    M, K = fn.M, fn.K
    A = M.axpby(1.0, K, -dt)
    cols_np = np.asarray(jax.device_get(A.cols))
    B, lc_np = ell_halo_tables(cols_np, ndev)
    lc = jnp.asarray(lc_np)

    diag = A.diagonal()
    dinv = 1.0 / diag
    source = fn.source

    use_cheb = solver.solver == "chebyshev"
    if use_cheb:
        s = 1.0 / jnp.sqrt(jnp.abs(diag))
        lmin, lmax = lanczos_bounds(
            lambda v: s * A.mv(s * v), diag.shape[0], diag.dtype)
        lmin, lmax = 0.9 * lmin, 1.02 * lmax
        iters = chebyshev_iterations(lmax / lmin, solver.rtol)

    row = P(axis, None)
    vec = P(axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(row, row, row, vec, vec, vec),
             out_specs=vec)
    def local_solve(Avals, Mvals, lcs, dinv_l, u, src):
        mvA = lambda x: _halo_mv(Avals, lcs, x, B=B, axis=axis, ndev=ndev)
        b = _halo_mv(Mvals, lcs, u, B=B, axis=axis, ndev=ndev) + src
        if use_cheb:
            return chebyshev(mvA, b, x0=u, lam_min=lmin, lam_max=lmax,
                             iters=iters, Minv=lambda r: dinv_l * r)
        return _cg_psum(mvA, b, u, dinv_l, rtol=solver.rtol,
                        atol=solver.atol, maxiter=solver.maxiter,
                        axis=axis)

    zeros = jnp.zeros(A.cols.shape[0], A.vals.dtype)

    def step(u, t):
        src = dt * source(t + dt) if source is not None else zeros
        return local_solve(A.vals, M.vals, lc, dinv, u,
                           src.astype(u.dtype))

    return step


def collective_bytes_per_mv(n: int, B: int, ndev: int, itemsize: int = 4):
    """Analytic per-device communication per matvec: all-gather vs halo."""
    return {
        "all_gather_bytes": (ndev - 1) * (n // ndev) * itemsize,
        "halo_bytes": 2 * B * itemsize,
    }
