"""Halo-exchange partitioned BlockDIA matvec + CG for MECHANICS tangents
(VERDICT r4 item 6 — the constrained/vector-field extension of
``parallel/halo.py``).

The dof-distributed mechanics Krylov path (``ShardedMechanicsFunction``)
pins shardings and lets GSPMD pick the collectives, which materializes an
all-gather of the full displacement iterate per matvec. But the BlockDIA
tangent on lattice-ordered LV meshes (``fem/lattice.py``) has exactly the
banded structure the EP halo path exploits: every off-device entity the
DIAGONAL part of a device's rows touches lies within
``B = max |entity offset|`` entities of its block edges (the 27-offset
hex stencil). The apex COO spill is NOT banded — the pole entity couples
to rings on the numbering's far side — so it gets its own collective: the
spill touches only a few dozen UNIQUE rows, and each device's
column-owned contributions are summed into a dense O(#spill rows) vector
and ``psum``-ed. The whole Dirichlet-masked CG then runs inside ONE
``shard_map``:

* per matvec: two ``lax.ppermute`` neighbour sends of ``B * c`` dof
  values (O(surface)) + one psum of O(#spill rows) — instead of an
  all-gather of O(ndofs);
* Dirichlet elimination is the same mask algebra as
  :class:`~thunderbolt_tpu.fem.sparsity.MaskedOperator`
  (``f*A(f*x) + (1-f)*x``) — pointwise, hence shard-local;
* the block-Jacobi preconditioner inverts the [c,c] diagonal blocks —
  entity-local, hence shard-local;
* the only other collective is one scalar ``psum`` per CG dot product.

Reference anchor: the partitioned shared-memory SpMV layer this replaces
in spirit, ``src/utils.jl:167-246`` (``ThreadedSparseMatrixCSR``); the
reference has no distributed-memory mechanics at all.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thunderbolt_tpu.fem.sparsity import BlockDIAMatrix, MaskedOperator


def _unwrap(A):
    if isinstance(A, MaskedOperator):
        return A.A, A.free_mask
    return A, None


class _SpillPlan:
    """Static per-device tables for the non-banded COO spill.

    Stage 1 (column side): device d owns columns ``[d*L*c, (d+1)*L*c)``;
    its entries accumulate ``v * x_local[cloc]`` into a dense vector over
    the ``nu`` UNIQUE spill rows (``segment_sum`` by ``uidx``), which is
    then ``psum``-ed — O(nu) bytes, nu ~ a few dozen for LV apex plugs.
    Stage 2 (row side): device d adds the psum-ed values of the unique
    rows it owns (``rloc``) into its local output.
    All tables are [ndev, ...] arrays zero-padded to common static widths
    so they shard cleanly into the shard_map.
    """

    def __init__(self, sr, sc, sv, ndev, L, c, n):
        ur, inv = np.unique(sr, return_inverse=True)
        self.nu = max(1, len(ur))
        cown = sc // (L * c)
        ne = max(1, int(np.max(np.bincount(cown, minlength=ndev),
                               initial=1)))
        uidx = np.zeros((ndev, ne), np.int32)
        cloc = np.zeros((ndev, ne), np.int32)
        vals = np.zeros((ndev, ne), sv.dtype)
        for d in range(ndev):
            m = cown == d
            k = int(m.sum())
            uidx[d, :k] = inv[m]
            cloc[d, :k] = (sc[m] - d * L * c).astype(np.int32)
            vals[d, :k] = sv[m]
        rown = ur // (L * c)
        nr = max(1, int(np.max(np.bincount(rown, minlength=ndev),
                               initial=1)))
        # padded slots scatter value 0 into row 0 via a uidx pointing at
        # a zeroed pad slot of the psum vector
        ridx = np.full((ndev, nr), self.nu, np.int32)
        rloc = np.zeros((ndev, nr), np.int32)
        for d in range(ndev):
            m = rown == d
            k = int(m.sum())
            ridx[d, :k] = np.nonzero(m)[0]
            rloc[d, :k] = (ur[m] - d * L * c).astype(np.int32)
        self.uidx, self.cloc, self.vals = (jnp.asarray(uidx),
                                           jnp.asarray(cloc),
                                           jnp.asarray(vals))
        self.ridx, self.rloc = jnp.asarray(ridx), jnp.asarray(rloc)

    def tables(self):
        return (self.uidx, self.cloc, self.vals, self.ridx, self.rloc)


def blockdia_halo_partition(A, ndev: int):
    """Host-side partition plan for a (Masked)BlockDIA operator.

    Returns ``(B, spill_plan_or_None)`` where ``B`` is the ENTITY halo
    width of the banded part. Raises ValueError when the operator does
    not qualify (not BlockDIA, rows not divisible, band too wide) —
    callers fall back to the GSPMD path.
    """
    Am, _ = _unwrap(A)
    if not isinstance(Am, BlockDIAMatrix):
        raise ValueError(
            f"halo mechanics CG needs a BlockDIA tangent, got "
            f"{type(Am).__name__} (gather-ELL operators keep the GSPMD "
            "path)")
    nent, c = Am.nent, Am.ncomp
    if nent % ndev:
        raise ValueError(
            f"entities ({nent}) not divisible by mesh size {ndev}; pad "
            "the entity axis first (ShardedMechanicsFunction does)")
    L = nent // ndev
    B = max(abs(d) for d in Am.offsets)
    if B > L:
        raise ValueError(
            f"entity bandwidth {B} exceeds the local block size {L}: "
            "halo exchange needs lattice-ordered entities with bandwidth "
            "below nent/ndevices (use spmv='gspmd' or fewer devices)")
    plan = None
    if Am.spill_rows is not None:
        sr = np.asarray(jax.device_get(Am.spill_rows)).astype(np.int64)
        sc = np.asarray(jax.device_get(Am.spill_cols)).astype(np.int64)
        sv = np.asarray(jax.device_get(Am.spill_vals))
        plan = _SpillPlan(sr, sc, sv, ndev, L, c, nent * c)
    return B, plan


def _halo_band_mv(blocks, free, x, *, offsets, B, L, c, axis, ndev):
    """Banded part of the masked matvec: ring halo exchange + static
    entity-slice multiply-adds. Returns (y_band, xm) with xm the masked
    input (reused by the spill stage and the mask complement)."""
    f = None if free is None else free.astype(x.dtype)
    xm = x if f is None else f * x
    X = xm.reshape(L, c)
    lh = jax.lax.ppermute(X[-B:], axis,
                          [(i, i + 1) for i in range(ndev - 1)])
    rh = jax.lax.ppermute(X[:B], axis,
                          [(i + 1, i) for i in range(ndev - 1)])
    Xe = jnp.concatenate([lh, X, rh])                    # [L + 2B, c]
    Y = jnp.zeros_like(X)
    for k, d in enumerate(offsets):
        seg = jax.lax.dynamic_slice_in_dim(Xe, B + d, L)
        Y = Y + jnp.einsum("nab,nb->na", blocks[k], seg)
    return Y.reshape(-1), xm


def _spill_add(y, xm, tabs, *, nu, axis):
    """Non-banded COO spill via one O(nu) psum (see _SpillPlan)."""
    uidx, cloc, vals, ridx, rloc = tabs
    part = jax.ops.segment_sum(vals[0] * xm[cloc[0]], uidx[0], nu + 1)
    s = jax.lax.psum(part, axis)
    return y.at[rloc[0]].add(s[ridx[0]])


def make_halo_blockdia_cg(A, mesh: Mesh, axis: str = "shard", *,
                          rtol=1e-5, atol=0.0, maxiter=1000):
    """Block-Jacobi-preconditioned CG on a (Masked)BlockDIA tangent with
    the halo-exchange partitioned matvec, entirely inside one
    ``shard_map``.

    Returns ``solve(b, x0) -> x`` over P(axis)-sharded dof vectors.
    Collectives per iteration: two O(B*c) ppermutes + one O(#spill rows)
    psum + two scalar psums — vs GSPMD's all-gather of the full iterate.
    """
    Am, free = _unwrap(A)
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    B, plan = blockdia_halo_partition(A, ndev)
    L = Am.nent // ndev
    c = Am.ncomp
    offsets = Am.offsets
    nu = 0 if plan is None else plan.nu

    # entity-local block-Jacobi: invert the [c,c] diagonal blocks once
    from thunderbolt_tpu.utils.smallmat import det_small, inv_small
    k0 = offsets.index(0)
    D = Am.blocks[k0]
    Dinv = inv_small(D, det_small(D))                    # [nent, c, c]

    row_b = P(None, axis, None, None)    # blocks [ndiag, nent, c, c]
    row_d = P(axis, None, None)          # Dinv [nent, c, c]
    tab = P(axis, None)                  # spill tables [ndev, *]
    vec = P(axis)

    free_spec = vec if free is not None else P()
    free_in = free if free is not None else jnp.zeros((), Am.blocks.dtype)
    if plan is None:
        z32 = jnp.zeros((ndev, 1), jnp.int32)
        tabs_in = (z32, z32, jnp.zeros((ndev, 1), Am.blocks.dtype),
                   z32, z32)
    else:
        tabs_in = plan.tables()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(row_b, row_d, tab, tab, tab, tab, tab, free_spec,
                       vec, vec),
             out_specs=vec)
    def local_solve(blocks, Dinv_l, uidx, cloc, vals, ridx, rloc,
                    free_l, b, x0):
        fl = free_l if free is not None else None
        tabs = (uidx, cloc, vals, ridx, rloc)

        def mv(x):
            y, xm = _halo_band_mv(blocks, fl, x, offsets=offsets, B=B,
                                  L=L, c=c, axis=axis, ndev=ndev)
            if plan is not None:
                y = _spill_add(y, xm, tabs, nu=nu, axis=axis)
            if fl is not None:
                f = fl.astype(x.dtype)
                y = f * y + (1.0 - f) * x
            return y

        def minv(r):
            rm = r if fl is None else fl.astype(r.dtype) * r
            z = jnp.einsum("nab,nb->na", Dinv_l,
                           rm.reshape(L, c)).reshape(-1)
            if fl is None:
                return z
            f = fl.astype(r.dtype)
            return f * z + (1.0 - f) * r

        return _cg_psum_pre(mv, minv, b, x0, rtol=rtol, atol=atol,
                            maxiter=maxiter, axis=axis)

    def solve(b, x0=None):
        if x0 is None:
            x0 = jnp.zeros_like(b)
        return local_solve(Am.blocks, Dinv, *tabs_in, free_in, b, x0)

    solve.halo_entities = B
    solve.spill_rows_unique = nu
    solve.ndev = ndev
    return solve


def _cg_psum_pre(mv, minv, b, x0, *, rtol, atol, maxiter, axis):
    """Preconditioned CG with cross-device psum dots — the general-Minv
    form of ``halo._cg_psum`` (same update order/stopping rule as
    ``solver/linear.py:cg`` so halo and GSPMD iterates match bit-for-bit
    up to reduction order)."""
    def dot(u, v):
        return jax.lax.psum(jnp.sum(u * v), axis)

    r0 = b - mv(x0)
    z0 = minv(r0)
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
        z = minv(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, dot(r0, z0),
                     jnp.asarray(0, jnp.int32)))
    return x


def mech_collective_bytes_per_mv(nent: int, B: int, c: int, ndev: int,
                                 nu: int = 0, itemsize: int = 4):
    """Analytic per-device communication per mechanics matvec."""
    return {
        "all_gather_bytes": (ndev - 1) * (nent // ndev) * c * itemsize,
        "halo_bytes": (2 * B * c + nu) * itemsize,
    }
