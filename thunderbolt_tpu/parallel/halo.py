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


def ell_halo_partition(cols: np.ndarray, ndev: int,
                       max_spill_frac: float = 0.01):
    """Banded+spill partition of a row-partitioned ELL matrix.

    Returns ``(B, lc, spill_mask)``: ``B`` is the bandwidth of the BANDED
    part, ``lc`` the device-local extended-vector column table, and
    ``spill_mask [n, k]`` flags the entries whose column distance exceeds
    the per-device block — on LV meshes the apex-plug rows couple the
    pole to rings on the numbering's far side, which would otherwise
    reject the whole operator (measured: bandwidth 3841 vs block 481 at
    the 3.8k-dof EM-beat LV). Those few entries are served by an
    O(#unique rows) ``psum`` (the ``halo_mech._SpillPlan`` mechanism)
    while everything else rides the two neighbour permutes. Raises
    ValueError when even the spill split cannot make the band fit or the
    spill fraction exceeds ``max_spill_frac``.
    """
    n = cols.shape[0]
    if n % ndev:
        raise ValueError(f"rows ({n}) not divisible by mesh size {ndev}")
    L = n // ndev
    rows = np.arange(n, dtype=np.int64)[:, None]
    dist = np.abs(cols.astype(np.int64) - rows)
    B0 = int(dist.max())
    if B0 <= L:
        spill_mask = np.zeros(cols.shape, bool)
        B = B0
    else:
        in_band = dist <= L
        if not in_band.any():
            raise ValueError("no banded entries at all")
        B = int(dist[in_band].max())
        spill_mask = ~in_band
        nspill = int(spill_mask.sum())
        if nspill > max_spill_frac * cols.size:
            raise ValueError(
                f"matrix bandwidth {B0} exceeds the local block size {L} "
                f"and {nspill}/{cols.size} entries "
                f"({nspill / cols.size:.1%}) fall outside the band — too "
                "many for the spill psum (use spmv='gspmd')")
    owner = (rows // L) * L
    lc = np.clip(cols.astype(np.int64) - owner + B, 0,
                 L + 2 * B - 1).astype(np.int32)
    return B, lc, spill_mask


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
    try:
        B, lc, spill = ell_halo_partition(cols, ndev)
    except ValueError as e:
        return False, str(e)
    ns = int(spill.sum())
    L = cols.shape[0] // ndev
    return True, (f"bandwidth {B} <= block {L}"
                  + (f" + {ns} spill entries via psum" if ns else ""))


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
    B, lc_np, spill_mask = ell_halo_partition(cols_np, ndev)
    lc = jnp.asarray(lc_np)
    n = cols_np.shape[0]
    L = n // ndev

    # non-banded entries (LV apex plugs) ride an O(#unique rows) psum;
    # their banded-table values are zeroed and their (row, col, val)
    # triples partitioned by COLUMN owner (halo_mech._SpillPlan, c=1)
    has_spill = bool(spill_mask.any())
    band = jnp.asarray(~spill_mask, A.vals.dtype)
    Avals_b = A.vals * band
    Mvals_b = M.vals * band
    if has_spill:
        from thunderbolt_tpu.parallel.halo_mech import _SpillPlan
        sr_, sk_ = np.nonzero(spill_mask)
        sc_ = cols_np[sr_, sk_].astype(np.int64)
        Av_np = np.asarray(jax.device_get(A.vals))[sr_, sk_]
        Mv_np = np.asarray(jax.device_get(M.vals))[sr_, sk_]
        planA = _SpillPlan(sr_.astype(np.int64), sc_, Av_np, ndev, L, 1, n)
        planM = _SpillPlan(sr_.astype(np.int64), sc_, Mv_np, ndev, L, 1, n)
        nu = planA.nu
    else:
        planA = planM = None

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
    tab = P(axis, None)

    if has_spill:
        from thunderbolt_tpu.parallel.halo_mech import _spill_add
        spill_specs = (tab,) * 10
        spill_ops = planA.tables() + planM.tables()
    else:
        spill_specs = ()
        spill_ops = ()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(row, row, row, vec, vec, vec) + spill_specs,
             out_specs=vec)
    def local_solve(Avals, Mvals, lcs, dinv_l, u, src, *spill_tabs):
        if has_spill:
            tabsA, tabsM = spill_tabs[:5], spill_tabs[5:]

            def mvA(x):
                y = _halo_mv(Avals, lcs, x, B=B, axis=axis, ndev=ndev)
                return _spill_add(y, x, tabsA, nu=nu, axis=axis)

            def mvM(x):
                y = _halo_mv(Mvals, lcs, x, B=B, axis=axis, ndev=ndev)
                return _spill_add(y, x, tabsM, nu=nu, axis=axis)
        else:
            mvA = lambda x: _halo_mv(Avals, lcs, x, B=B, axis=axis,
                                     ndev=ndev)
            mvM = lambda x: _halo_mv(Mvals, lcs, x, B=B, axis=axis,
                                     ndev=ndev)
        b = mvM(u) + src
        if use_cheb:
            return chebyshev(mvA, b, x0=u, lam_min=lmin, lam_max=lmax,
                             iters=iters, Minv=lambda r: dinv_l * r)
        return _cg_psum(mvA, b, u, dinv_l, rtol=solver.rtol,
                        atol=solver.atol, maxiter=solver.maxiter,
                        axis=axis)

    zeros = jnp.zeros(A.cols.shape[0], A.vals.dtype)

    def step(u, t):
        src = dt * source(t + dt) if source is not None else zeros
        return local_solve(Avals_b, Mvals_b, lc, dinv, u,
                           src.astype(u.dtype), *spill_ops)

    return step


def collective_bytes_per_mv(n: int, B: int, ndev: int, itemsize: int = 4):
    """Analytic per-device communication per matvec: all-gather vs halo."""
    return {
        "all_gather_bytes": (ndev - 1) * (n // ndev) * itemsize,
        "halo_bytes": 2 * B * itemsize,
    }
