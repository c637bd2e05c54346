"""Scatter-free lattice assembly: element matrices -> BlockDIA via sliced
adds.

TPU scatter-add runs at ~1 element per ~7 ns regardless of batching — the
2.4M-value `segment_sum` behind a hex mechanics assembly costs more than
the AD material tangents themselves, and the CSR->BlockDIA reorder doubles
it. But the meshes this framework generates (boxes, rings, LV shells) have
*affine lattice* structure: cell c's anchor node is ``base + Σ idx_i s_i``
and every element corner sits at a constant node offset from the anchor.
Then the contribution of corner pair (a, b) across ALL cells lands on ONE
entity diagonal (offset ``const_b - const_a``) in a contiguous window of
the node volume — a `dynamic_update_slice` add, no scatter at all.

Irregular cells (ring seams where the circumferential index wraps, the
ideal LV's apex plug, arbitrary appended blocks) and out-of-window pairs
drop into a small COO spill, assembled with one (cheap, because small)
segment_sum — the same spill mechanism `BlockDIAMatrix` already uses for
its SpMV.

This is the TPU-native answer to the reference's assembly strategies
(`SequentialAssemblyStrategy`/`PerColorAssemblyStrategy`/
`ElementAssemblyStrategy`, SURVEY.md §2.9): where the reference colors
elements to avoid write races, we restructure the writes so they are dense
slices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.fem.sparsity import BlockDIAMatrix


def detect_affine_lattice(r):
    """Detect ``r[c] = base + Σ idx_i * strides_i`` (idx_1 fastest) on a
    prefix of ``r``.

    Returns ``(shape, strides, base, ncl)`` — fastest-first shape/strides
    and the covered prefix length ``ncl = prod(shape)`` — or None. A
    mismatch truncates to the valid prefix (appended irregular cells, e.g.
    an LV apex plug, simply fall off the end).
    """
    r = np.asarray(r, np.int64).ravel()
    if r.size == 0:
        return None
    shape: List[int] = []
    strides: List[int] = []
    rr = r
    while rr.size > 1:
        s = int(rr[1] - rr[0])
        if s == 0:
            break
        diffs = rr - rr[0]
        mism = np.nonzero(diffs != np.arange(rr.size) * s)[0]
        k = int(mism[0]) if mism.size else rr.size
        if k == 1:
            break
        nrows = rr.size // k
        if nrows == 0:
            break
        R = rr[: nrows * k].reshape(nrows, k)
        ok = (R - R[:, :1] == np.arange(k) * s).all(axis=1)
        bad = np.nonzero(~ok)[0]
        v = int(bad[0]) if bad.size else nrows
        if v == 0:
            break
        shape.append(k)
        strides.append(s)
        rr = R[:v, 0].copy()
    if not shape:
        return None
    # rr.size > 1 means the outermost starts had no arithmetic structure:
    # keep only the first outer block (a prefix of r)
    ncl = int(np.prod(shape))
    base = int(rr[0])
    return tuple(shape), tuple(strides), base, ncl


@dataclass
class _PairOp:
    """One sliced add: corner pair (a, b) -> diagonal k at window."""
    a: int
    b: int
    diag: int                 # offset value at build; offset index after
    window: Tuple              # tuple of slices over the volume axes
    perm: Tuple[int, ...]      # transpose for vals cell axes (slow..fast)
    vshape: Tuple[int, ...]    # reshape target = window extents
    cslice: Tuple              # pre-transpose clip slices (cell axes)


class LatticeAssemblyPlan:
    """Precomputed sliced-add assembly for one batch list sharing a node
    volume. Produces a ``BlockDIAMatrix`` (+ COO spill) and the residual
    vector without any large scatter."""

    def __init__(self, nent, ncomp, ndofs, vol_shape, offsets, batch_plans,
                 spill):
        self.nent = nent
        self.ncomp = ncomp
        self.ndofs = ndofs
        self.vol_shape = vol_shape          # node volume dims (slow..fast)
        self.offsets = offsets              # tuple of entity offsets
        self.batch_plans = batch_plans      # per batch dict (see builder)
        self.spill = spill                  # dict or None

    # -- runtime -----------------------------------------------------------

    def assemble_matrix(self, Kes: List[jnp.ndarray], dtype=None):
        """Kes[k]: [nc_k, nd, nd] element matrices (cell order as given at
        plan build). Returns BlockDIAMatrix."""
        c = self.ncomp
        dtype = dtype or Kes[0].dtype
        nvol = int(np.prod(self.vol_shape))
        vols = jnp.zeros((len(self.offsets),) + self.vol_shape + (c, c),
                         dtype)
        for bp, Ke in zip(self.batch_plans, Kes):
            nbn = bp["nbn"]
            ncl = bp["ncl"]
            if ncl == 0:
                continue
            cshape = bp["cell_shape"]       # slow..fast
            Kb = Ke[:ncl].reshape(ncl, nbn, c, nbn, c)
            if bp["mask"] is not None:
                m = jnp.asarray(bp["mask"], Ke.dtype)
                Kb = Kb * m[:, None, None, None, None]
            for op in bp["pair_ops"]:
                vals = Kb[:, op.a, :, op.b, :]           # [ncl, c, c]
                vals = vals.reshape(cshape + (c, c))
                vals = vals[op.cslice]                   # clip wrap tails
                vals = jnp.transpose(vals, op.perm + (len(cshape),
                                                      len(cshape) + 1))
                vals = vals.reshape(op.vshape + (c, c))
                vols = vols.at[(op.diag,) + op.window].add(vals)
        blocks = vols.reshape(len(self.offsets), nvol, c, c)[:, : self.nent]
        sp = self.spill
        if sp is None:
            return BlockDIAMatrix(self.offsets, blocks, self.nent, c)
        flat = jnp.concatenate([Ke.reshape(-1) for Ke in Kes])
        # in-band spill (entity offset among the kept diagonals, incl. the
        # apex/seam DIAGONAL blocks the preconditioner needs) scatters
        # straight into the dense blocks — small, and it keeps
        # block_jacobi_inv exact
        if sp["in_dest"] is not None:
            blocks = blocks.reshape(-1).at[sp["in_dest"]].add(
                flat[sp["in_src"]]).reshape(blocks.shape)
        if sp["slot"] is None:
            return BlockDIAMatrix(self.offsets, blocks, self.nent, c)
        vals = jax.ops.segment_sum(flat[sp["src"]], sp["slot"],
                                   sp["nslots"])
        return BlockDIAMatrix(self.offsets, blocks, self.nent, c,
                              spill_rows=sp["rows"], spill_cols=sp["cols"],
                              spill_vals=vals)

    def assemble_vector(self, res: List[jnp.ndarray], dtype=None):
        """res[k]: [nc_k, nbn, ncomp] element residuals -> [ndofs]."""
        c = self.ncomp
        dtype = dtype or res[0].dtype
        nvol = int(np.prod(self.vol_shape))
        rvol = jnp.zeros(self.vol_shape + (c,), dtype)
        spill_parts = []
        for bp, re in zip(self.batch_plans, res):
            ncl = bp["ncl"]
            cshape = bp["cell_shape"]
            if ncl:
                rb = re[:ncl]
                if bp["mask"] is not None:
                    rb = rb * jnp.asarray(bp["mask"], re.dtype)[:, None,
                                                                None]
                for a, window, perm, vshape, cslice in bp["vec_ops"]:
                    vals = rb[:, a, :].reshape(cshape + (c,))
                    vals = vals[cslice]
                    vals = jnp.transpose(vals, perm + (len(cshape),))
                    vals = vals.reshape(vshape + (c,))
                    rvol = rvol.at[window].add(vals)
            if bp["vec_spill"] is not None:
                vs = bp["vec_spill"]
                spill_parts.append((re.reshape(-1)[vs["src"]], vs["dofs"]))
        r = rvol.reshape(nvol * c)[: self.ndofs]
        for vals, dofs in spill_parts:
            r = r + jax.ops.segment_sum(vals, dofs, self.ndofs)
        return r


def build_lattice_plan(ent_tables: List[np.ndarray], nent: int, ncomp: int,
                       dof_offset: int = 0,
                       max_diags: int = 40, max_spill: float = 0.5
                       ) -> Optional[LatticeAssemblyPlan]:
    """Try to build a sliced-add assembly plan.

    ``ent_tables[k]``: int [nc_k, nbn_k] entity (node) index per element
    corner. All tables must live on one entity numbering of size ``nent``
    (vector dof = dof_offset + entity * ncomp + comp).
    Returns None when no batch has lattice structure or the spill fraction
    is too high (callers then keep the segment_sum path).
    """
    ndofs = nent * ncomp

    # 1) detect per-batch cell lattices + node-volume strides consistency
    det = []
    node_strides = None
    for ent in ent_tables:
        ent = np.asarray(ent, np.int64)
        d = detect_affine_lattice(ent[:, 0])
        det.append((ent, d))

    # node volume: union of strides from successful detections, must nest
    all_strides = sorted({abs(int(s))
                          for _, d in det if d is not None
                          for s in d[1]})
    if not all_strides or all_strides[0] != 1:
        return None
    for lo, hi in zip(all_strides, all_strides[1:]):
        if hi % lo:
            return None
    t = all_strides                      # ascending node strides
    dims = []
    for i, s in enumerate(t):
        nxt = t[i + 1] if i + 1 < len(t) else None
        if nxt is not None:
            dims.append(nxt // s)
        else:
            dims.append(-(-nent // s))   # ceil: ragged outermost layer
    # vol dims fastest-first = dims; store slow..fast for C-order arrays
    vol_shape = tuple(dims[::-1])
    nvol = int(np.prod(vol_shape))
    if nvol < nent:
        return None

    def decompose(flat):
        """flat node index -> coords (slow..fast) in vol_shape, or None."""
        out = []
        rem = int(flat)
        for i in range(len(t) - 1, -1, -1):
            q, rem = divmod(rem, t[i])
            out.append(q)
        if rem != 0:
            return None
        for q, m in zip(out, vol_shape):
            if q < 0 or q >= m:
                return None
        return tuple(out)

    offsets_set = {0}
    batch_plans = []
    spill_src = []      # flat indices into concatenated Ke values
    spill_rc = []       # (row, col) dof pairs
    total_vals = 0
    spill_vals_n = 0
    ke_base = 0         # offset of this batch's Ke values in the concat

    for ent, d in det:
        nc, nbn = ent.shape
        nd = nbn * ncomp
        ke_sz = nc * nd * nd
        total_vals += ke_sz
        if d is None:
            # whole batch spills
            _spill_cells(ent, np.arange(nc), ncomp, dof_offset, ke_base,
                         nbn, spill_src, spill_rc)
            spill_vals_n += ke_sz
            batch_plans.append(dict(nbn=nbn, ncl=0, cell_shape=(),
                                    mask=None, pair_ops=[], vec_ops=[],
                                    vec_spill=_vec_spill(
                                        ent, np.arange(nc), ncomp,
                                        dof_offset, nbn)))
            ke_base += ke_sz
            continue
        cshape_f, cstrides_f, base, ncl = d
        # cell axes slow..fast
        cell_shape = tuple(cshape_f[::-1])
        # map cell axes (slow..fast) to volume axes: match strides
        perm = []
        ok = True
        for s in cstrides_f[::-1]:
            if abs(int(s)) not in t:
                ok = False
                break
            perm.append(len(t) - 1 - t.index(abs(int(s))))
        if not ok or any(int(s) < 0 for s in cstrides_f):
            _spill_cells(ent, np.arange(nc), ncomp, dof_offset, ke_base,
                         nbn, spill_src, spill_rc)
            spill_vals_n += ke_sz
            batch_plans.append(dict(nbn=nbn, ncl=0, cell_shape=(),
                                    mask=None, pair_ops=[], vec_ops=[],
                                    vec_spill=_vec_spill(
                                        ent, np.arange(nc), ncomp,
                                        dof_offset, nbn)))
            ke_base += ke_sz
            continue
        # For jnp.transpose(vals, perm): vals axes are cell slow..fast;
        # output must be ordered like the volume axes (ascending = slow
        # first), restricted to the spanned axes.
        used = perm                       # volume axis per cell axis
        order = np.argsort(used)          # output slot -> cell axis
        out_axes = tuple(int(x) for x in order)
        out_vol_axes = tuple(used[i] for i in out_axes)
        out_shape = tuple(cell_shape[i] for i in out_axes)
        # full-rank window extents (1 on volume axes the cells don't span)
        win_ext = [1] * len(vol_shape)
        vax_to_cax = {}                 # volume axis -> cell axis (slow..fast)
        for slot, vax in enumerate(out_vol_axes):
            win_ext[vax] = out_shape[slot]
            vax_to_cax[vax] = out_axes[slot]
        win_ext = tuple(win_ext)

        # corner offsets: dominant const per corner over the lattice prefix
        consts = []
        irregular = np.zeros(ncl, bool)
        for a in range(nbn):
            ca = ent[:ncl, a] - ent[:ncl, 0]
            vals_u, cnts = np.unique(ca, return_counts=True)
            dom = int(vals_u[np.argmax(cnts)])
            consts.append(dom)
            irregular |= ca != dom
        reg = ~irregular
        # extra (non-prefix) cells spill wholesale
        extra = np.arange(ncl, nc)
        irr_idx = np.concatenate([np.nonzero(irregular)[0], extra])

        # per-axis lattice indices of each prefix cell (cell axes
        # slow..fast), for clipped-window validity checks
        cell_idx = np.stack(np.meshgrid(
            *[np.arange(n) for n in cell_shape], indexing="ij"),
            axis=0).reshape(len(cell_shape), ncl)

        def make_window(oa):
            """(window, vshape, cell slicer) at origin oa, or None.

            Windows may CLIP at an axis end when every cell falling past
            the end is irregular (ring wrap: the seam cells are masked to
            zero, so dropping their slice loses nothing)."""
            if oa is None:
                return None
            win, vshape = [], []
            clip = {}                   # cell axis -> kept extent
            for vax in range(len(vol_shape)):
                o, ext, m = oa[vax], win_ext[vax], vol_shape[vax]
                k = min(ext, m - o)
                if k <= 0:
                    return None
                if k < ext:
                    cax = vax_to_cax.get(vax)
                    if cax is None:
                        return None
                    dropped = cell_idx[cax] >= k
                    if reg[dropped].any():
                        return None     # live cells would be clipped
                    clip[cax] = k
                win.append(slice(o, o + k))
                vshape.append(k)
            cslice = tuple(slice(0, clip.get(cax, cell_shape[cax]))
                           for cax in range(len(cell_shape)))
            return tuple(win), tuple(vshape), cslice

        # pair ops
        pair_ops = []
        pair_spill = []   # (a, b) pairs that cannot slice
        corner_window = [make_window(decompose(base + consts[a]))
                         for a in range(nbn)]
        for a in range(nbn):
            wa = corner_window[a]
            for b in range(nbn):
                dsg = consts[b] - consts[a]
                if wa is None:
                    pair_spill.append((a, b))
                    continue
                offsets_set.add(dsg)
                pair_ops.append(_PairOp(a=a, b=b, diag=dsg, window=wa[0],
                                        perm=out_axes, vshape=wa[1],
                                        cslice=wa[2]))
        # vec ops per corner
        vec_ops = []
        vec_corner_spill = []
        for a in range(nbn):
            wa = corner_window[a]
            if wa is not None:
                vec_ops.append((a, wa[0], out_axes, wa[1], wa[2]))
            else:
                vec_corner_spill.append(a)

        # spill bookkeeping: irregular/extra cells (all pairs) + spill
        # pairs over regular cells
        if irr_idx.size:
            _spill_cells(ent, irr_idx, ncomp, dof_offset, ke_base, nbn,
                         spill_src, spill_rc)
            spill_vals_n += irr_idx.size * nd * nd
        reg_idx = np.nonzero(reg)[0]
        for (a, b) in pair_spill:
            _spill_pairs(ent, reg_idx, a, b, ncomp, dof_offset, ke_base,
                         nbn, spill_src, spill_rc)
            spill_vals_n += reg_idx.size * ncomp * ncomp

        mask = None
        if irregular.any():
            mask = reg.astype(np.float32)   # cast to Ke dtype at runtime
        vs_cells = irr_idx
        vec_spill = _vec_spill(ent, vs_cells, ncomp, dof_offset, nbn,
                               corners_extra=(vec_corner_spill, reg_idx))
        batch_plans.append(dict(
            nbn=nbn, ncl=ncl, cell_shape=tuple(cell_shape),
            mask=mask, pair_ops=pair_ops, vec_ops=vec_ops,
            vec_spill=vec_spill))
        ke_base += ke_sz

    if total_vals == 0 or spill_vals_n / total_vals > max_spill:
        return None
    offsets = tuple(sorted(offsets_set))
    if len(offsets) > max_diags:
        return None
    # cast masks to a uniform dtype later at call time; store f64 template

    spill = None
    if spill_rc:
        rc = np.concatenate(spill_rc)
        src = np.concatenate(spill_src)
        rows_s, cols_s = rc[:, 0], rc[:, 1]
        er, ar = rows_s // ncomp, rows_s % ncomp
        ec, ac = cols_s // ncomp, cols_s % ncomp
        d_ent = ec - er
        off_arr = np.asarray(offsets)
        inband = np.isin(d_ent, off_arr)
        k_idx = np.searchsorted(off_arr, d_ent[inband])
        in_dest = (((k_idx * nent + er[inband]) * ncomp + ar[inband])
                   * ncomp + ac[inband])
        out = ~inband
        spill = dict(
            in_src=jnp.asarray(src[inband]) if inband.any() else None,
            in_dest=jnp.asarray(in_dest) if inband.any() else None,
            src=None, slot=None, nslots=0, rows=None, cols=None,
        )
        if spill["in_dest"] is None:
            spill["in_src"] = spill["in_dest"] = None
        if out.any():
            key = rows_s[out].astype(np.int64) * ndofs + cols_s[out]
            uq, inv = np.unique(key, return_inverse=True)
            spill.update(
                src=jnp.asarray(src[out]),
                slot=jnp.asarray(inv.astype(np.int32)),
                nslots=int(uq.size),
                rows=jnp.asarray((uq // ndofs).astype(np.int32)),
                cols=jnp.asarray((uq % ndofs).astype(np.int32)),
            )

    # remap pair diag values -> index into offsets tuple
    for bp in batch_plans:
        bp["pair_ops"] = [
            _PairOp(a=op.a, b=op.b, diag=offsets.index(op.diag),
                    window=op.window, perm=op.perm, vshape=op.vshape,
                    cslice=op.cslice)
            for op in bp["pair_ops"]]

    return LatticeAssemblyPlan(nent=nent, ncomp=ncomp, ndofs=ndofs,
                               vol_shape=vol_shape, offsets=offsets,
                               batch_plans=batch_plans, spill=spill)


def _spill_cells(ent, cells, ncomp, dof_offset, ke_base, nbn,
                 spill_src, spill_rc):
    """Record all (a, b, i, j) values of the given cells as COO spill."""
    if cells.size == 0:
        return
    nd = nbn * ncomp
    e = ent[cells]                               # [m, nbn]
    rows = (dof_offset + e[:, :, None] * ncomp
            + np.arange(ncomp)[None, None, :]).reshape(cells.size, nd)
    rr = np.repeat(rows, nd, axis=1).ravel()
    cc = np.tile(rows, (1, nd)).ravel()
    src = (ke_base + cells[:, None] * nd * nd
           + np.arange(nd * nd)[None, :]).ravel()
    spill_src.append(src)
    spill_rc.append(np.stack([rr, cc], axis=1))


def _spill_pairs(ent, cells, a, b, ncomp, dof_offset, ke_base, nbn,
                 spill_src, spill_rc):
    if cells.size == 0:
        return
    nd = nbn * ncomp
    ea = ent[cells, a]
    eb = ent[cells, b]
    i = np.arange(ncomp)
    m = cells.size
    rr = np.broadcast_to(dof_offset + ea[:, None, None] * ncomp
                         + i[None, :, None], (m, ncomp, ncomp))
    cc = np.broadcast_to(dof_offset + eb[:, None, None] * ncomp
                         + i[None, None, :], (m, ncomp, ncomp))
    # Ke flat layout: [c, (a*ncomp+i), (b*ncomp+j)]
    src = (ke_base + cells[:, None, None] * nd * nd
           + (a * ncomp + i[None, :, None]) * nd
           + (b * ncomp + i[None, None, :]))
    spill_src.append(src.ravel())
    spill_rc.append(np.stack([rr.ravel(), cc.ravel()], axis=1))


def _vec_spill(ent, cells, ncomp, dof_offset, nbn, corners_extra=None):
    """COO for residual rows of spilled cells (+ spilled corners of
    regular cells)."""
    srcs, dofs = [], []
    nd = nbn * ncomp
    if cells.size:
        e = ent[cells]
        d = (dof_offset + e[:, :, None] * ncomp
             + np.arange(ncomp)[None, None, :]).ravel()
        s = (cells[:, None] * nd
             + np.arange(nd)[None, :]).ravel()
        srcs.append(s)
        dofs.append(d)
    if corners_extra is not None:
        corners, reg_idx = corners_extra
        for a in corners:
            if reg_idx.size == 0:
                continue
            e = ent[reg_idx, a]
            d = (dof_offset + e[:, None] * ncomp
                 + np.arange(ncomp)[None, :]).ravel()
            s = (reg_idx[:, None] * nd + a * ncomp
                 + np.arange(ncomp)[None, :]).ravel()
            srcs.append(s)
            dofs.append(d)
    if not srcs:
        return None
    return dict(src=jnp.asarray(np.concatenate(srcs)),
                dofs=jnp.asarray(np.concatenate(dofs).astype(np.int32)))
