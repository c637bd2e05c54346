"""Sparsity patterns: CSR construction + ELL layout for TPU SpMV.

TPU-native replacement for Ferrite's ``allocate_matrix`` sparsity pattern and
the reference's ``ThreadedSparseMatrixCSR`` SpMV (``src/utils.jl:167-246``):
the pattern is built once on host (numpy), and assembly under jit scatters
vmapped element matrices into the shared value array with ``segment_sum``
(deterministic, race-free — replaces ``PerColorAssemblyStrategy``, see
SURVEY.md §2.9). SpMV uses a padded ELL layout: ``y = sum_k vals[:, k] *
x[cols[:, k]]`` — a dense gather + reduce that XLA tiles cleanly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass
from typing import List, Tuple


@dataclass
class SparsityPattern:
    """CSR + ELL index structure shared by all matrices on one dof layout."""

    ndofs: int
    nnz: int
    indptr: np.ndarray       # int64 [ndofs+1]
    indices: np.ndarray      # int32 [nnz] column of each CSR slot
    rows: np.ndarray         # int32 [nnz] row of each CSR slot
    ell_cols: np.ndarray     # int32 [ndofs, kmax]; padded with own row
    ell_pos: np.ndarray      # int64 [nnz] CSR slot -> flat ELL slot
    ell_diag_pos: np.ndarray  # int64 [ndofs] flat ELL slot of the true diagonal
    elem_maps: List[np.ndarray]  # per registered batch: int32 [nc, nd, nd] -> CSR slot

    @property
    def kmax(self):
        return self.ell_cols.shape[1]


def build_sparsity(cell_dofs_list: List[np.ndarray], ndofs: int,
                   extra_pairs: Tuple[np.ndarray, np.ndarray] = None
                   ) -> SparsityPattern:
    """Union sparsity of element dense blocks (+ optional extra (i,j) pairs).

    cell_dofs_list: one int array [nc, nd] per element batch. The returned
    ``elem_maps[k][c, a, b]`` is the CSR slot of (row=cell_dofs[c,a],
    col=cell_dofs[c,b]).
    """
    keys = []
    for cd in cell_dofs_list:
        cd = np.asarray(cd, dtype=np.int64)
        nc, nd = cd.shape
        ii = np.repeat(cd, nd, axis=1)            # [nc, nd*nd] rows
        jj = np.tile(cd, (1, nd))                 # [nc, nd*nd] cols
        keys.append((ii.ravel() * ndofs + jj.ravel()))
    if extra_pairs is not None:
        ei, ej = extra_pairs
        keys.append(np.asarray(ei, np.int64) * ndofs + np.asarray(ej, np.int64))
    allkeys = np.concatenate(keys) if keys else np.zeros(0, np.int64)
    uniq, inv = np.unique(allkeys, return_inverse=True)
    nnz = uniq.shape[0]
    rows = (uniq // ndofs).astype(np.int32)
    cols = (uniq % ndofs).astype(np.int32)
    # uniq is sorted by key = row-major -> already CSR ordered
    indptr = np.zeros(ndofs + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)

    elem_maps = []
    off = 0
    for cd in cell_dofs_list:
        cd = np.asarray(cd, dtype=np.int64)
        nc, nd = cd.shape
        n = nc * nd * nd
        elem_maps.append(inv[off:off + n].reshape(nc, nd, nd).astype(np.int32))
        off += n

    # ELL layout
    rowlen = np.diff(indptr)
    kmax = int(rowlen.max()) if ndofs > 0 else 0
    ell_cols = np.repeat(np.arange(ndofs, dtype=np.int32)[:, None], kmax, axis=1)
    slot = np.arange(nnz, dtype=np.int64) - indptr[rows]
    ell_pos = rows.astype(np.int64) * kmax + slot
    ell_cols.ravel()[ell_pos] = cols
    # true-diagonal ELL slots (needed to distinguish diag from pad slots,
    # which also carry col == row)
    isdiag = rows == cols
    assert isdiag.sum() == ndofs, "diagonal missing from sparsity pattern"
    ell_diag_pos = np.zeros(ndofs, dtype=np.int64)
    ell_diag_pos[rows[isdiag]] = ell_pos[isdiag]
    return SparsityPattern(ndofs, nnz, indptr, indices=cols, rows=rows,
                           ell_cols=ell_cols, ell_pos=ell_pos,
                           ell_diag_pos=ell_diag_pos, elem_maps=elem_maps)


# ---------------------------------------------------------------------------
# device-side sparse matrix (values on top of a shared pattern)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class ELLMatrix:
    """Square sparse matrix in padded ELL form (device-resident).

    ``vals`` aligns with ``cols``; padded slots carry value 0 and column =
    own row. Supports fused a*A + b*B combination for the backward-Euler
    system A = M - dt*K (``src/solver/time/euler.jl:110-116``).
    """

    def __init__(self, cols, vals, diag_pos=None):
        self.cols = cols
        self.vals = vals
        self.diag_pos = diag_pos  # int [n] flat slot of true diagonal

    def tree_flatten(self):
        return (self.cols, self.vals, self.diag_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        n = self.cols.shape[0]
        return (n, n)

    def mv(self, x):
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        if self.diag_pos is not None:
            return self.vals.reshape(-1)[self.diag_pos]
        # pad slots carry value 0, so the masked sum is still exact
        n = self.cols.shape[0]
        rows = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(self.cols == rows, self.vals, 0.0), axis=1)

    def set_diagonal_where(self, mask, value):
        """vals[diag] = value where mask (row-wise); needs diag_pos."""
        assert self.diag_pos is not None
        flat = self.vals.reshape(-1)
        cur = flat[self.diag_pos]
        flat = flat.at[self.diag_pos].set(jnp.where(mask, value, cur))
        return ELLMatrix(self.cols, flat.reshape(self.vals.shape),
                         self.diag_pos)

    def axpby(self, a, other: "ELLMatrix", b):
        """a*self + b*other (same pattern)."""
        return ELLMatrix(self.cols, a * self.vals + b * other.vals,
                         self.diag_pos)


def csr_to_ell(pattern: SparsityPattern, csr_vals, dtype=None) -> ELLMatrix:
    """Scatter CSR-slot values into the padded ELL value array (jit-safe)."""
    n, k = pattern.ell_cols.shape
    if dtype is None:
        dtype = csr_vals.dtype
    flat = jnp.zeros((n * k,), dtype=dtype)
    flat = flat.at[jnp.asarray(pattern.ell_pos)].set(csr_vals.astype(dtype))
    return ELLMatrix(jnp.asarray(pattern.ell_cols), flat.reshape(n, k),
                     jnp.asarray(pattern.ell_diag_pos))


def ell_to_scipy(A: ELLMatrix):
    """Convert to scipy CSR (host direct solves — UMFPACK-parity path for
    small/ill-conditioned systems, cf. reference LinearSolve UMFPACK)."""
    import numpy as _np
    import scipy.sparse as _sp
    cols = _np.asarray(A.cols)
    vals = _np.asarray(A.vals)
    n, k = cols.shape
    rows = _np.repeat(_np.arange(n), k)
    mat = _sp.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n))
    mat.sum_duplicates()
    return mat


@jax.tree_util.register_pytree_node_class
class DIAMatrix:
    """Sparse matrix in diagonal (DIA) storage — the TPU-native SpMV.

    For band-ordered FEM meshes (structured grids are row-major; general
    meshes get RCM-ordered) the set of column offsets col - row is small
    (9 for quad4 stencils, 27 for hex8). Storing one value array per offset
    turns SpMV into static-offset slices of a zero-padded vector + VPU
    multiply-adds: NO gathers, no MXU, fully fusible by XLA — orders of
    magnitude faster on TPU than gather-based ELL/CSR.

    y[i] = sum_d diags[d][i] * x[i + offsets[d]]
    """

    def __init__(self, offsets, diags, n):
        self.offsets = offsets    # static tuple of ints
        self.diags = diags        # [ndiag, n] values (0 where absent)
        self.n = n

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1])

    @property
    def shape(self):
        return (self.n, self.n)

    def mv(self, x):
        lo = -min(min(self.offsets), 0)
        hi = max(max(self.offsets), 0)
        xp = jnp.pad(x, (lo, hi))
        acc = jnp.zeros_like(x)
        for k, d in enumerate(self.offsets):
            acc = acc + self.diags[k] * jax.lax.dynamic_slice_in_dim(
                xp, lo + d, self.n)
        return acc

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        k = self.offsets.index(0)
        return self.diags[k]

    def axpby(self, a, other: "DIAMatrix", b):
        assert self.offsets == other.offsets
        return DIAMatrix(self.offsets, a * self.diags + b * other.diags,
                         self.n)


@jax.tree_util.register_pytree_node_class
class SymDIAMatrix:
    """Symmetric DIA: stores only the d >= 0 diagonals and reconstructs the
    lower triangle from symmetry in the SpMV —

        y = diag_0 * x + sum_{d>0} [ diag_d * shift(x, +d)
                                     + shift(diag_d * x, -d) ]

    On the HBM-bound stencil regimes (512^2+: the SpMV streams the
    diagonals) this cuts the matrix traffic nearly in half: MEASURED on the
    v5e chip 1.36x (512^2) and 1.75x (1024^2) on a 20-iteration Chebyshev
    chain vs the full-offset DIAMatrix. Produced by ``dia_to_symmetric``;
    offsets are ascending with offsets[0] == 0."""

    def __init__(self, offsets, diags, n):
        self.offsets = offsets    # static tuple of ints, all >= 0, 0 first
        self.diags = diags        # [ndiag, n]; diag_d[i] = A[i, i+d]
        self.n = n

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1])

    @property
    def shape(self):
        return (self.n, self.n)

    def mv(self, x):
        hi = max(self.offsets)
        xp = jnp.pad(x, (0, hi))
        acc = self.diags[0] * x
        for k, d in enumerate(self.offsets):
            if d == 0:
                continue
            up = self.diags[k] * jax.lax.dynamic_slice_in_dim(xp, d, self.n)
            lo = jnp.pad(self.diags[k] * x, (d, 0))[: self.n]
            acc = acc + up + lo
        return acc

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        return self.diags[0]

    def axpby(self, a, other: "SymDIAMatrix", b):
        assert self.offsets == other.offsets
        return SymDIAMatrix(self.offsets, a * self.diags + b * other.diags,
                            self.n)


def dia_to_symmetric(A, rtol=1e-5):
    """SymDIAMatrix from a (numerically) symmetric DIAMatrix; None when A
    is not DIA or not symmetric to ``rtol``. Mirrored diagonals are
    averaged, so the result is exactly the symmetric part of A. Host-side
    (one readback of the diagonals) — call at setup, not in traced code."""
    if not isinstance(A, DIAMatrix):
        return None
    offs = list(A.offsets)
    D = np.asarray(A.diags)
    n = A.n
    scale = float(np.abs(D).max()) or 1.0
    out_offs, out = [], []
    for k, d in enumerate(offs):
        if d < 0:
            if -d not in offs and float(np.abs(D[k]).max()) > rtol * scale:
                return None
            continue
        v = D[k].copy()
        if d > 0:
            v[n - d:] = 0.0
            if -d in offs:
                mirror = D[offs.index(-d)][d:]      # A[i, i-d], i >= d
                if float(np.abs(v[: n - d] - mirror).max()) > rtol * scale:
                    return None
                v[: n - d] = 0.5 * (v[: n - d] + mirror)
        out_offs.append(d)
        out.append(v)
    order = np.argsort(out_offs)
    return SymDIAMatrix(tuple(int(out_offs[i]) for i in order),
                        jnp.asarray(np.stack([out[i] for i in order])), n)


def pattern_dia_offsets(pattern: SparsityPattern):
    """Distinct col-row offsets of the pattern (host, numpy)."""
    return np.unique(pattern.indices.astype(np.int64)
                     - pattern.rows.astype(np.int64))


def csr_to_dia(pattern: SparsityPattern, csr_vals, dtype=None,
               max_diags=96):
    """Convert CSR-slot values to DIA; returns None when the mesh ordering
    is too scattered (> max_diags distinct offsets) — callers fall back to
    ELL."""
    offs = pattern_dia_offsets(pattern)
    if offs.size > max_diags:
        return None
    if dtype is None:
        dtype = csr_vals.dtype
    n = pattern.ndofs
    # flat position of each CSR slot inside the [ndiag, n] value array
    # (offs is sorted unique, so searchsorted IS the offset index)
    d = pattern.indices.astype(np.int64) - pattern.rows.astype(np.int64)
    slot_diag = np.searchsorted(offs, d)
    pos = slot_diag * n + pattern.rows.astype(np.int64)
    flat = jnp.zeros((offs.size * n,), dtype)
    flat = flat.at[jnp.asarray(pos)].set(csr_vals.astype(dtype))
    return DIAMatrix(tuple(int(d) for d in offs),
                     flat.reshape(offs.size, n), n)


@jax.tree_util.register_pytree_node_class
class BlockDIAMatrix:
    """Block-diagonal-offset storage for VECTOR fields (ncomp components
    interleaved per entity). With mesh-node-ordered entity numbering the
    ENTITY-level offset set stays small (27 on hex stencils), and each
    offset carries [nent, c, c] blocks:

        Y[e, :] = sum_d B_d[e] @ X[e + d, :]

    The SpMV is gather-free — static entity-axis slices + batched c-by-c
    multiply-adds on the VPU — the vector-field analog of DIAMatrix. This
    unseats the gather-bound ELL SpMV in the mechanics Krylov solves
    (gathers are the slowest primitive on TPU).

    Low-occupancy diagonals (e.g. the ideal LV's apex-plug rows, which
    couple one pole node to a whole ring) are carried as a small COO
    "spill" — one segment_sum gather over a few percent of the nnz — so a
    handful of irregular rows cannot force the whole operator back to ELL.

    """

    def __init__(self, offsets, blocks, nent, ncomp,
                 spill_rows=None, spill_cols=None, spill_vals=None,
                 blocks_soa=None):
        self.offsets = offsets      # static tuple of entity offsets
        self.blocks = blocks        # [ndiag, nent, c, c]
        self.nent = nent
        self.ncomp = ncomp
        self.spill_rows = spill_rows   # int32 [ns] dof rows (or None)
        self.spill_cols = spill_cols
        self.spill_vals = spill_vals
        #: optional component-major copy [ndiag, c, c, nent] used by
        #: ``mv``: on TPU the [.., 3, 3]-minor AoS layout pads each 3x3
        #: block to full vector lanes, so the SpMV streams ~40x the
        #: logical bytes; entity-minor SoA keeps the lanes dense
        #: (measured 3.2x faster matvec at 46.8k dofs). Attach once per
        #: linearization with ``with_soa()`` — it is a pytree child, so
        #: a while_loop-carried operator keeps it with no re-transpose.
        self.blocks_soa = blocks_soa

    def tree_flatten(self):
        return ((self.blocks, self.spill_rows, self.spill_cols,
                 self.spill_vals, self.blocks_soa),
                (self.offsets, self.nent, self.ncomp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1], aux[2],
                   spill_rows=children[1], spill_cols=children[2],
                   spill_vals=children[3], blocks_soa=children[4])

    def with_soa(self):
        """Copy with the component-major mv operand attached (one
        transpose; call at linearization time, NOT inside loops)."""
        if self.blocks_soa is not None:
            return self
        return BlockDIAMatrix(
            self.offsets, self.blocks, self.nent, self.ncomp,
            spill_rows=self.spill_rows, spill_cols=self.spill_cols,
            spill_vals=self.spill_vals,
            blocks_soa=jnp.transpose(self.blocks, (0, 2, 3, 1)))

    @property
    def shape(self):
        n = self.nent * self.ncomp
        return (n, n)

    def mv(self, x):
        c = self.ncomp
        lo = -min(min(self.offsets), 0)
        hi = max(max(self.offsets), 0)
        if self.blocks_soa is not None:
            # component-major path: every vector op runs on [nent] lanes
            Xc = x.reshape(self.nent, c).T               # [c, nent]
            Xp = jnp.pad(Xc, ((0, 0), (lo, hi)))
            Ys = [jnp.zeros(self.nent, x.dtype) for _ in range(c)]
            for k, d in enumerate(self.offsets):
                seg = jax.lax.dynamic_slice_in_dim(
                    Xp, lo + d, self.nent, axis=1)       # [c, nent]
                B = self.blocks_soa[k]                   # [c, c, nent]
                for a in range(c):
                    acc = B[a, 0] * seg[0]
                    for b in range(1, c):
                        acc = acc + B[a, b] * seg[b]
                    Ys[a] = Ys[a] + acc
            y = jnp.stack(Ys, axis=1).reshape(-1)
        else:
            X = x.reshape(self.nent, c)
            Xp = jnp.pad(X, ((lo, hi), (0, 0)))
            Y = jnp.zeros_like(X)
            for k, d in enumerate(self.offsets):
                seg = jax.lax.dynamic_slice_in_dim(Xp, lo + d, self.nent)
                Y = Y + jnp.einsum("nab,nb->na", self.blocks[k], seg)
            y = Y.reshape(-1)
        if self.spill_rows is not None:
            y = y + jax.ops.segment_sum(
                self.spill_vals * x[self.spill_cols], self.spill_rows,
                self.nent * self.ncomp)
        return y

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        k = self.offsets.index(0)
        return jnp.diagonal(self.blocks[k], axis1=1, axis2=2).reshape(-1)

    def add_scaled(self, other: "BlockDIAMatrix", c):
        """self + c * other for operators sharing offsets and spill layout
        (e.g. K and M assembled through one LatticeAssemblyPlan)."""
        assert self.offsets == other.offsets
        blocks = self.blocks + c * other.blocks
        soa = None
        if self.blocks_soa is not None and other.blocks_soa is not None:
            soa = self.blocks_soa + c * other.blocks_soa
        elif self.blocks_soa is not None or other.blocks_soa is not None:
            soa = jnp.transpose(blocks, (0, 2, 3, 1))
        if self.spill_vals is None and other.spill_vals is None:
            return BlockDIAMatrix(self.offsets, blocks, self.nent,
                                  self.ncomp, blocks_soa=soa)
        sv = self.spill_vals if self.spill_vals is not None else 0.0
        ov = other.spill_vals if other.spill_vals is not None else 0.0
        rows = self.spill_rows if self.spill_rows is not None \
            else other.spill_rows
        cols = self.spill_cols if self.spill_cols is not None \
            else other.spill_cols
        return BlockDIAMatrix(self.offsets, blocks, self.nent, self.ncomp,
                              spill_rows=rows, spill_cols=cols,
                              spill_vals=sv + c * ov, blocks_soa=soa)
    def block_jacobi_inv(self):
        """r -> D_block^{-1} r with the [c,c] diagonal blocks inverted in
        closed form — a materially stronger preconditioner than scalar
        Jacobi for elasticity (couples the components of each node).
        Applied component-major ([c, c, nent], entity minor) for the same
        lane-padding reason as the SoA matvec."""
        from thunderbolt_tpu.utils.smallmat import det_small, inv_small
        k = self.offsets.index(0)
        D = self.blocks[k]                        # [nent, c, c]
        Dinv = jnp.transpose(inv_small(D, det_small(D)), (1, 2, 0))
        c = self.ncomp

        def apply(r):
            Rc = r.reshape(self.nent, c).T        # [c, nent]
            outs = []
            for a in range(c):
                acc = Dinv[a, 0] * Rc[0]
                for b in range(1, c):
                    acc = acc + Dinv[a, b] * Rc[b]
                outs.append(acc)
            return jnp.stack(outs, axis=1).reshape(-1)

        return apply

    def to_scipy(self):
        import scipy.sparse as sp
        c, nent = self.ncomp, self.nent
        n = nent * c
        rows, cols, vals = [], [], []
        B = np.asarray(self.blocks)
        e = np.arange(nent)
        for k, d in enumerate(self.offsets):
            ok = (e + d >= 0) & (e + d < nent)
            for a in range(c):
                for b in range(c):
                    rows.append((e[ok] * c + a))
                    cols.append(((e[ok] + d) * c + b))
                    vals.append(B[k, ok, a, b])
        if self.spill_rows is not None:
            rows.append(np.asarray(self.spill_rows))
            cols.append(np.asarray(self.spill_cols))
            vals.append(np.asarray(self.spill_vals))
        return sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n)).tocsr()


@jax.tree_util.register_pytree_node_class
class MaskedOperator:
    """Matrix-free symmetric Dirichlet elimination P A P + (I - P) for
    operators without mutable value layouts (BlockDIA): constrained rows
    and columns act as the identity; SPD is preserved for CG."""

    def __init__(self, A, free_mask):
        self.A = A
        self.free_mask = free_mask

    def tree_flatten(self):
        return (self.A, self.free_mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.A.shape

    def mv(self, x):
        f = self.free_mask.astype(x.dtype)
        return f * self.A.mv(f * x) + (1.0 - f) * x

    def diagonal(self):
        d = self.A.diagonal()
        f = self.free_mask.astype(d.dtype)
        return f * d + (1.0 - f)

    def block_jacobi_inv(self):
        """Masked block-Jacobi: identity on constrained dofs."""
        inner = self.A.block_jacobi_inv()
        free = self.free_mask

        def apply(r):
            f = free.astype(r.dtype)
            return f * inner(f * r) + (1.0 - f) * r

        return apply

    def to_scipy(self):
        import scipy.sparse as sp
        A = any_to_scipy(self.A).tolil()
        fixed = np.nonzero(~np.asarray(self.free_mask))[0]
        A[fixed, :] = 0.0
        A[:, fixed] = 0.0
        A[fixed, fixed] = 1.0
        return A.tocsr()


def any_to_scipy(A):
    """scipy CSR from any of our operator types (host-side, LU path)."""
    if isinstance(A, ELLMatrix):
        return ell_to_scipy(A)
    return A.to_scipy()


def block_dia_builder(pattern: SparsityPattern, ncomp: int, max_diags=96,
                      min_occupancy=0.05, max_spill=0.2):
    """Host-side factory: returns ``kvals -> BlockDIAMatrix`` (a cheap
    device scatter through a precomputed destination table), or None when
    the layout is not entity-blocked or too scattered to profit.

    Entity offsets whose diagonals are occupied below ``min_occupancy``
    (irregular rows: apex plugs, mesh seams) spill into a small COO part;
    if more than ``max_spill`` of the nnz would spill, or the dense
    offsets exceed ``max_diags``, the builder declines and callers fall
    back to ELL."""
    if ncomp < 2 or pattern.ndofs % ncomp:
        return None
    rows = pattern.rows.astype(np.int64)
    cols = pattern.indices.astype(np.int64)
    ei, a = rows // ncomp, rows % ncomp
    ej, b = cols // ncomp, cols % ncomp
    d = ej - ei
    offs, counts = np.unique(d, return_counts=True)
    nent = pattern.ndofs // ncomp
    dense = counts >= max(1, int(min_occupancy * nent * ncomp * ncomp))
    # the main diagonal must stay dense (Jacobi/diagonal() rely on it)
    dense[np.searchsorted(offs, 0)] = True if 0 in offs else dense.any()
    if 0 not in offs:
        return None
    keep = offs[dense]
    if keep.size > max_diags:
        return None
    spill_frac = counts[~dense].sum() / max(counts.sum(), 1)
    if spill_frac > max_spill:
        return None

    in_keep = np.isin(d, keep)
    k = np.searchsorted(keep, d[in_keep])
    # keep index tables as NUMPY: converting inside build() makes them
    # per-trace constants, so a builder constructed while tracing one jit
    # can be cached and reused inside another without leaking tracers
    dest_np = (((k * nent + ei[in_keep]) * ncomp + a[in_keep])
               * ncomp + b[in_keep])
    keep_pos_np = np.nonzero(in_keep)[0]
    offsets = tuple(int(x) for x in keep)
    size = keep.size * nent * ncomp * ncomp

    sp_pos_np = np.nonzero(~in_keep)[0]
    has_spill = sp_pos_np.size > 0
    sp_rows_np = rows[sp_pos_np].astype(np.int32) if has_spill else None
    sp_cols_np = cols[sp_pos_np].astype(np.int32) if has_spill else None

    def build(kvals):
        dest = jnp.asarray(dest_np)
        keep_pos = jnp.asarray(keep_pos_np)
        flat = jnp.zeros((size,), kvals.dtype).at[dest].set(kvals[keep_pos])
        blocks = flat.reshape(keep.size, nent, ncomp, ncomp)
        if has_spill:
            return BlockDIAMatrix(offsets, blocks, nent, ncomp,
                                  spill_rows=jnp.asarray(sp_rows_np),
                                  spill_cols=jnp.asarray(sp_cols_np),
                                  spill_vals=kvals[jnp.asarray(sp_pos_np)])
        return BlockDIAMatrix(offsets, blocks, nent, ncomp)

    return build


def operator_to_dense(A, probe_block=128):
    """Materialize any of our operator types to a dense [n, n] device
    array by batching ``A.mv`` over the identity — n vectorized SpMVs,
    O(n * nnz_row * n) work, intended for SMALL systems (n <~ 15k) where
    a direct MXU factorization beats Krylov iteration latency (each
    Krylov step is a sequential ~us-scale op chain on TPU; a one-shot
    [n, n] LU is a single dense kernel). Covers MaskedOperator semantics
    (identity rows/cols on constrained dofs) for free since it probes
    the masked ``mv``.

    Probes run in ``probe_block``-sized chunks under ``lax.map``: a
    single vmap over all n basis vectors materializes the per-probe
    gather intermediates for EVERY probe at once (O(n^2 * stencil)
    bytes — measured 106 GB at 10k dofs on a BlockDIA tangent), while
    chunking bounds live intermediates to O(probe_block * n * stencil)
    with the same output. Small systems (n <= probe_block) keep the
    original single-vmap schedule."""
    n = A.shape[0]
    dtype = A.diagonal().dtype
    if n <= probe_block:
        eye = jnp.eye(n, dtype=dtype)
        # rows of vmap(mv)(I) are A @ e_j, i.e. columns of A -> transpose
        return jax.vmap(A.mv)(eye).T
    nblocks = -(-n // probe_block)

    def probe_chunk(s):
        j = s * probe_block + jnp.arange(probe_block)
        # padded probes (j >= n) clip onto column n-1; their duplicate
        # rows are sliced off below, so the clip never aliases output
        basis = jnp.zeros((probe_block, n), dtype)
        basis = basis.at[jnp.arange(probe_block),
                         jnp.clip(j, 0, n - 1)].set(1)
        return jax.vmap(A.mv)(basis)

    cols = jax.lax.map(probe_chunk, jnp.arange(nblocks))
    return cols.reshape(nblocks * probe_block, n)[:n].T
