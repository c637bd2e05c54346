"""Mesh: static, type-sorted element batches.

TPU-native analog of the reference's ``SimpleMesh`` wrapping a Ferrite
``Grid`` (``src/mesh/simple_meshes.jl:1-181``). Design differences, per the
rebuild plan (SURVEY.md §7): connectivity is plain numpy int32 arrays sorted
into one batch per cell type, so every downstream kernel vmaps over a dense
``[ncells, nnodes_per_cell]`` table; subdomains (cellsets), facetsets and
nodesets are index arrays, not lazy set objects.

All arrays live on host (numpy); device arrays are produced at
discretization time.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional

from thunderbolt_tpu.mesh.elements import get_element


@dataclass
class ElementBlock:
    """A batch of same-type cells.

    Attributes:
      celltype: element catalog key ("quad4", "hex8", ...).
      connectivity: int32 [ncells, nnodes_per_cell] global node indices.
      cell_offset: this block's first global cell index (blocks are numbered
        consecutively in mesh order).
    """

    celltype: str
    connectivity: np.ndarray
    cell_offset: int = 0

    @property
    def ncells(self):
        return self.connectivity.shape[0]

    @property
    def element(self):
        return get_element(self.celltype)


@dataclass
class Mesh:
    """Unstructured mesh with typed element blocks and named index sets.

    Reference parity: ``SimpleMesh`` + subdomain descriptors
    (``src/mesh/simple_meshes.jl:1-62``); ``facetsets`` store
    ``(global_cell, local_facet)`` pairs like Ferrite ``FacetIndex``.
    """

    nodes: np.ndarray                      # float64 [nnodes, sdim]
    blocks: List[ElementBlock]
    nodesets: Dict[str, np.ndarray] = dfield(default_factory=dict)
    facetsets: Dict[str, np.ndarray] = dfield(default_factory=dict)   # [n,2] int
    cellsets: Dict[str, np.ndarray] = dfield(default_factory=dict)    # [n] int

    def __post_init__(self):
        off = 0
        for b in self.blocks:
            b.cell_offset = off
            b.connectivity = np.ascontiguousarray(b.connectivity, dtype=np.int32)
            off += b.ncells
        self.nodes = np.ascontiguousarray(self.nodes, dtype=np.float64)

    # --- basic queries ------------------------------------------------------

    @property
    def sdim(self):
        return self.nodes.shape[1]

    @property
    def nnodes(self):
        return self.nodes.shape[0]

    @property
    def ncells(self):
        return sum(b.ncells for b in self.blocks)

    def elementtypes(self):
        return tuple(b.celltype for b in self.blocks)

    def block_of_cell(self, gidx: int):
        for bi, b in enumerate(self.blocks):
            if b.cell_offset <= gidx < b.cell_offset + b.ncells:
                return bi, gidx - b.cell_offset
        raise IndexError(gidx)

    def single_block_or_error(self):
        """Analog of ``single_subdomain_or_error`` (simple_meshes.jl)."""
        if len(self.blocks) != 1:
            raise ValueError(
                f"operation requires a single-element-type mesh, got "
                f"{self.elementtypes()}"
            )
        return self.blocks[0]

    # --- derived sets ---------------------------------------------------

    def cellset(self, name: Optional[str]) -> np.ndarray:
        """Global cell indices of a named subdomain (None = whole mesh)."""
        if name is None:
            return np.arange(self.ncells, dtype=np.int64)
        return np.asarray(self.cellsets[name], dtype=np.int64)

    def nodeset(self, name: str) -> np.ndarray:
        return np.asarray(self.nodesets[name], dtype=np.int64)

    def facetset(self, name: str) -> np.ndarray:
        return np.asarray(self.facetsets[name], dtype=np.int64).reshape(-1, 2)

    def nodes_of_facetset(self, name: str) -> np.ndarray:
        """Unique global node indices touched by a facet set."""
        fs = self.facetset(name)
        out = []
        for gc, lf in fs:
            bi, lc = self.block_of_cell(int(gc))
            b = self.blocks[bi]
            el = b.element
            # all nodes on that facet: corners + (P2) edge/face nodes.
            out.extend(facet_nodes(el, int(lf), b.connectivity[lc]))
        return np.unique(np.asarray(out, dtype=np.int64))

    # --- predicate-based set builders (Ferrite add*set! idiom) ----------

    def add_cellset(self, name: str, predicate) -> np.ndarray:
        """Cells whose EVERY node satisfies ``predicate(x) -> bool``
        (vectorized over [n, sdim]; Ferrite ``addcellset!`` semantics)."""
        ok = np.asarray(predicate(self.nodes), dtype=bool)
        sel = []
        for b in self.blocks:
            hit = ok[b.connectivity].all(axis=1)
            sel.append(b.cell_offset + np.nonzero(hit)[0])
        self.cellsets[name] = np.concatenate(sel).astype(np.int64)
        return self.cellsets[name]

    def add_nodeset(self, name: str, predicate) -> np.ndarray:
        """Nodes satisfying ``predicate(x)`` (Ferrite ``addnodeset!``)."""
        ok = np.asarray(predicate(self.nodes), dtype=bool)
        self.nodesets[name] = np.nonzero(ok)[0].astype(np.int64)
        return self.nodesets[name]

    def add_facetset(self, name: str, predicate) -> np.ndarray:
        """Boundary facets whose EVERY corner node satisfies
        ``predicate(x)`` (Ferrite ``addfacetset!`` semantics — the census
        runs over boundary facets only)."""
        ok = np.asarray(predicate(self.nodes), dtype=bool)
        bf = self.boundary_facets()
        keep = []
        for gc, lf in bf:
            bi, lc = self.block_of_cell(int(gc))
            b = self.blocks[bi]
            corners = b.connectivity[lc, list(b.element.facets[lf])]
            if ok[corners].all():
                keep.append((gc, lf))
        self.facetsets[name] = np.asarray(keep, dtype=np.int64).reshape(-1, 2)
        return self.facetsets[name]

    def cell_membership(self, cells) -> np.ndarray:
        """Boolean [ncells] mask from a global cell index array."""
        member = np.zeros(self.ncells, dtype=bool)
        member[np.asarray(cells, dtype=np.int64)] = True
        return member

    def block_of_cells(self, gcs: np.ndarray):
        """Vectorized block lookup: (block_index, local_index) arrays for
        a vector of global cell ids."""
        offs = np.asarray([b.cell_offset for b in self.blocks]
                          + [self.ncells], dtype=np.int64)
        gcs = np.asarray(gcs, dtype=np.int64)
        bi = np.searchsorted(offs, gcs, side="right") - 1
        return bi, gcs - offs[bi]

    def boundary_facets(self, cells: Optional[np.ndarray] = None) -> np.ndarray:
        """All (global_cell, local_facet) pairs on the mesh boundary.

        ``cells`` (optional) restricts the facet census to a subset of
        global cell indices — the result is then the boundary of that
        subdomain (faces owned by exactly one member cell), the semantics
        of the reference's ``extract_boundary_faces``
        (``src/mesh/tools.jl:721-744``).

        Vectorized: every facet's sorted corner tuple (padded to a common
        width with -1, appended AFTER sorting so facets of different node
        counts never collide) is deduplicated in one lexsort; facets whose
        key appears exactly once are boundary."""
        member = None
        if cells is not None:
            member = self.cell_membership(cells)
        wmax = max(len(f) for b in self.blocks for f in b.element.facets)
        keys, pairs = [], []
        for b in self.blocks:
            el = b.element
            gc_all = b.cell_offset + np.arange(b.ncells, dtype=np.int64)
            keep = slice(None) if member is None else member[gc_all]
            conn = b.connectivity[keep]
            gc = gc_all[keep]
            if conn.shape[0] == 0:
                continue
            for lf, fac in enumerate(el.facets):
                fn = np.sort(conn[:, list(fac)].astype(np.int64), axis=1)
                if fn.shape[1] < wmax:
                    fn = np.concatenate(
                        [fn, np.full((fn.shape[0], wmax - fn.shape[1]), -1,
                                     dtype=np.int64)], axis=1)
                keys.append(fn)
                pairs.append(np.stack(
                    [gc, np.full(len(gc), lf, dtype=np.int64)], axis=1))
        if not keys:
            return np.zeros((0, 2), dtype=np.int64)
        keys = np.concatenate(keys)
        pairs = np.concatenate(pairs)
        order = np.lexsort(keys.T[::-1])
        ks = keys[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]).any(axis=1)
        grp = np.cumsum(new) - 1
        cnt = np.bincount(grp)
        single = cnt[grp] == 1
        out = pairs[order][single]
        return out[np.lexsort((out[:, 1], out[:, 0]))]


def facet_nodes(el, local_facet: int, cell_conn: np.ndarray):
    """Global node indices (incl. higher-order nodes) on a local facet."""
    fac = el.facets[local_facet]
    idx = list(fac)
    if el.order == 2:
        # edge midside nodes whose corner pair lies on the facet
        fset = set(fac)
        nv = len(el.vertices)
        for k, (a, b) in enumerate(el.edges):
            if a in fset and b in fset:
                idx.append(nv + k)
        # face-center node for hex27 facets
        if el.faces:
            for k, f in enumerate(el.faces):
                if set(f) <= fset:
                    idx.append(nv + len(el.edges) + k)
        # 2D cells with a center node have no facet-interior nodes
    return cell_conn[idx].tolist()


def merge_duplicate_nodes(nodes: np.ndarray, blocks, tol=1e-12):
    """Weld coincident nodes (used by generators building from patches)."""
    key = np.round(nodes / max(tol, 1e-300)).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    new_nodes = nodes[np.sort(first)]
    # map: original idx -> new idx in sorted-first ordering
    order = np.argsort(first)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    remap = rank[inv]
    new_blocks = [
        ElementBlock(b.celltype, remap[b.connectivity]) for b in blocks
    ]
    return new_nodes, new_blocks, remap
