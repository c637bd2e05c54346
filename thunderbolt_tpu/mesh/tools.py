"""Mesh tools: uniform refinement, hexahedralization, external loaders.

Parity: ``src/mesh/tools.jl`` — ``hexahedralize`` (``:1-5``),
``uniform_refinement`` (``:257``), ``load_voom2_grid``/``load_mfem_grid``/
``load_carp_grid`` (``:491,502,660``).

Refinement design: reuse the quadratic-elevation entity machinery
(generators.elevate_to_quadratic) — the P2 nodes of a cell are exactly the
new vertices of its children; child connectivity is derived programmatically
by matching sub-cell corner positions against the P2 reference nodes, so one
code path covers every cell type. Facetsets transfer by the subset rule: a
child boundary facet belongs to a parent facetset iff all its corners are
nodes generated from that parent facet (corners, its edge midpoints, its
face center).
"""

from __future__ import annotations

import numpy as np
from functools import lru_cache
from typing import Dict, List

from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock, facet_nodes
from thunderbolt_tpu.mesh.elements import get_element
from thunderbolt_tpu.mesh.generators import elevate_to_quadratic


_P2_OF = {"line2": "line3", "tri3": "tri6", "quad4": "quad9",
          "tet4": "tet10", "hex8": "hex27", "wedge6": "wedge18"}


@lru_cache(maxsize=None)
def _child_templates(celltype: str):
    """Children of a refined cell as index tuples into the P2 cell's nodes."""
    el = get_element(celltype)
    p2 = get_element(_P2_OF[celltype])
    ref = p2.ref_nodes

    def find(pt):
        d = np.linalg.norm(ref - pt[None], axis=1)
        i = int(np.argmin(d))
        assert d[i] < 1e-12, (celltype, pt)
        return i

    corners = el.ref_nodes
    children = []
    if celltype in ("line2", "quad4", "hex8"):
        # octant sub-cells: shrink toward each corner by 1/2
        for c in corners:
            sub = corners * 0.5 + c * 0.5
            children.append(tuple(find(p) for p in sub))
    elif celltype == "tri3":
        m01 = (corners[0] + corners[1]) / 2
        m12 = (corners[1] + corners[2]) / 2
        m20 = (corners[2] + corners[0]) / 2
        for tri in ([corners[0], m01, m20], [m01, corners[1], m12],
                    [m20, m12, corners[2]], [m01, m12, m20]):
            children.append(tuple(find(p) for p in tri))
    elif celltype == "tet4":
        c = corners
        m = {(i, j): (c[i] + c[j]) / 2 for i in range(4) for j in range(4)
             if i < j}
        # 4 corner tets
        tets = [
            [c[0], m[(0, 1)], m[(0, 2)], m[(0, 3)]],
            [m[(0, 1)], c[1], m[(1, 2)], m[(1, 3)]],
            [m[(0, 2)], m[(1, 2)], c[2], m[(2, 3)]],
            [m[(0, 3)], m[(1, 3)], m[(2, 3)], c[3]],
        ]
        # central octahedron (m01, m02, m03, m12, m13, m23) split along the
        # m01-m23 diagonal into 4 tets
        a, b = m[(0, 1)], m[(2, 3)]
        ring = [m[(0, 2)], m[(1, 2)], m[(1, 3)], m[(0, 3)]]
        for k in range(4):
            tets.append([a, b, ring[k], ring[(k + 1) % 4]])
        for tet in tets:
            idx = [find(p) for p in tet]
            vol = np.linalg.det(np.asarray([ref[idx[1]] - ref[idx[0]],
                                            ref[idx[2]] - ref[idx[0]],
                                            ref[idx[3]] - ref[idx[0]]]))
            if vol < 0:
                idx[1], idx[2] = idx[2], idx[1]
            children.append(tuple(idx))
    elif celltype == "wedge6":
        # 4 sub-triangles x 2 z-halves -> 8 child wedges
        tri = corners[:3, :2]
        m01, m12, m20 = ((tri[0] + tri[1]) / 2, (tri[1] + tri[2]) / 2,
                         (tri[2] + tri[0]) / 2)
        subtris = ([tri[0], m01, m20], [m01, tri[1], m12],
                   [m20, m12, tri[2]], [m01, m12, m20])
        for z0, z1 in ((0.0, 0.5), (0.5, 1.0)):
            for st in subtris:
                pts = [np.array([p[0], p[1], z]) for z in (z0, z1)
                       for p in st]
                children.append(tuple(find(p) for p in pts))
    else:
        raise KeyError(celltype)
    return tuple(children)


def uniform_refinement(mesh: Mesh, n: int = 1) -> Mesh:
    """Refine each cell into 2^dim (tri/tet: 4/8) children, n times
    (``tools.jl:257``)."""
    for _ in range(n):
        mesh = _refine_once(mesh)
    return mesh


def _refine_once(mesh: Mesh, return_parents: bool = False):
    """One uniform refinement. With ``return_parents=True`` also returns,
    for every NEW node, the tuple of parent node ids (original nodes keep
    their indices — coarse nodes are the first ``mesh.nnodes`` nodes of
    the fine mesh), which is exactly the multigrid prolongation table."""
    if return_parents:
        p2, parents = elevate_to_quadratic(mesh, return_parents=True)
    else:
        p2 = elevate_to_quadratic(mesh)
    new_blocks = []
    cellset_children: Dict[int, List[int]] = {}
    gchild = 0
    for b, b2 in zip(mesh.blocks, p2.blocks):
        tpl = _child_templates(b.celltype)
        conns = []
        for c in range(b.ncells):
            row = b2.connectivity[c]
            for t in tpl:
                conns.append(row[list(t)])
                cellset_children.setdefault(b.cell_offset + c, []).append(
                    gchild)
                gchild += 1
        new_blocks.append(ElementBlock(b.celltype,
                                       np.asarray(conns, np.int32)))
    out = Mesh(p2.nodes, new_blocks)

    # facetset transfer by the allowed-node subset rule
    if mesh.facetsets:
        allowed: Dict[str, set] = {}
        for name in mesh.facetsets:
            nodes = set()
            for gc, lf in mesh.facetset(name):
                bi, lc = mesh.block_of_cell(int(gc))
                b2 = p2.blocks[bi]
                el2 = b2.element
                nodes.update(facet_nodes(el2, int(lf), b2.connectivity[lc]))
            allowed[name] = nodes
        fsets = {name: [] for name in mesh.facetsets}
        for gc, lf in out.boundary_facets():
            bi, lc = out.block_of_cell(int(gc))
            bb = out.blocks[bi]
            fac = bb.element.facets[lf]
            fnodes = set(int(v) for v in bb.connectivity[lc, list(fac)])
            for name, ok in allowed.items():
                if fnodes <= ok:
                    fsets[name].append((gc, lf))
                    break
        out.facetsets = {k: np.asarray(v, np.int64)
                         for k, v in fsets.items() if v}
        for k in out.facetsets:
            out.nodesets[k] = out.nodes_of_facetset(k)
    for k, v in mesh.nodesets.items():
        out.nodesets.setdefault(k, v)  # parent node ids persist
    for k, cells in mesh.cellsets.items():
        out.cellsets[k] = np.asarray(sorted(
            ch for c in cells for ch in cellset_children[int(c)]), np.int64)
    if return_parents:
        return out, parents
    return out


# (corner, adjacent edge-mid P2 slots, adjacent other-corner triples) for
# the tet corner-hex construction; tet10 mids: 4=m01 5=m12 6=m02 7=m03
# 8=m13 9=m23
_TET_CORNER_HEX = (
    (0, (4, 6, 7), (1, 2, 3)),
    (1, (4, 5, 8), (0, 2, 3)),
    (2, (6, 5, 9), (0, 1, 3)),
    (3, (7, 8, 9), (0, 1, 2)),
)


def hexahedralize(mesh: Mesh) -> Mesh:
    """Convert every cell to hexahedra (2D: quadrilaterals) by barycentric
    subdivision through the edge/face/cell entity points (``tools.jl:1-5``):
    tri -> 3 quads, quad -> 4 quads, tet -> 4 hexes, hex -> 8 hexes.
    Tri/tet paths create the missing centroid nodes (face centroids are
    deduplicated across neighbors). Facetsets transfer by the same
    allowed-node subset rule as ``uniform_refinement``."""
    p2 = elevate_to_quadratic(mesh)
    extra_nodes: List[np.ndarray] = []
    nextid = p2.nnodes
    tet_face_ids: Dict[tuple, int] = {}  # sorted orig-node triple -> node id
    quads, hexes = [], []

    def new_node(pt):
        nonlocal nextid
        extra_nodes.append(pt)
        nid = nextid
        nextid += 1
        return nid

    for b, b2 in zip(mesh.blocks, p2.blocks):
        ct = b.celltype
        conn = b.connectivity
        for c in range(b.ncells):
            r = b2.connectivity[c]
            if ct == "quad4":
                # corners 0-3, edge mids 4-7 (b,r,t,l), center 8
                quads += [[r[0], r[4], r[8], r[7]], [r[4], r[1], r[5], r[8]],
                          [r[8], r[5], r[2], r[6]], [r[7], r[8], r[6], r[3]]]
            elif ct == "tri3":
                # corners 0-2, mids 3(01) 4(12) 5(20); create the centroid
                g = new_node(mesh.nodes[conn[c]].mean(axis=0))
                quads += [[r[0], r[3], g, r[5]],
                          [r[1], r[4], g, r[3]],
                          [r[2], r[5], g, r[4]]]
            elif ct == "hex8":
                for t in _child_templates("hex8"):
                    hexes.append(r[list(t)])
            elif ct == "wedge6":
                # wedge18 cols: 6-8 bottom mids, 9-11 top mids, 12-14
                # vertical mids, 15-17 side-face centers; create the two
                # cap centroids (shared with stacked neighbors) + the cell
                # centroid -> one hex per vertex (6)
                fc = {}
                for fac in ((0, 2, 1), (3, 4, 5)):
                    orig = tuple(sorted(int(conn[c, i]) for i in fac))
                    if orig not in tet_face_ids:
                        tet_face_ids[orig] = new_node(
                            mesh.nodes[list(orig)].mean(axis=0))
                    fc[frozenset(fac)] = tet_face_ids[orig]
                cB = fc[frozenset((0, 2, 1))]
                cT = fc[frozenset((3, 4, 5))]
                g = new_node(mesh.nodes[conn[c]].mean(axis=0))
                # (vertex, edge-mid cols around it in-cap, cap centroid,
                #  vertical-mid col, side-face-center cols)
                for v, (ma, mb), cap, mv, (qa, qb) in (
                        (0, (6, 8), cB, 12, (15, 17)),
                        (1, (7, 6), cB, 13, (16, 15)),
                        (2, (8, 7), cB, 14, (17, 16)),
                        (3, (11, 9), cT, 12, (17, 15)),
                        (4, (9, 10), cT, 13, (15, 16)),
                        (5, (10, 11), cT, 14, (16, 17))):
                    hexes.append([r[v], r[ma], cap, r[mb],
                                  r[mv], r[qa], g, r[qb]])
            elif ct == "tet4":
                # face centroids (shared with neighbors) + cell centroid
                fc = {}
                for fac in b.element.facets:
                    orig = tuple(sorted(int(conn[c, i]) for i in fac))
                    if orig not in tet_face_ids:
                        tet_face_ids[orig] = new_node(
                            mesh.nodes[list(orig)].mean(axis=0))
                    fc[frozenset(fac)] = tet_face_ids[orig]
                g = new_node(mesh.nodes[conn[c]].mean(axis=0))
                for v, (ma, mb, mc), (A, B, C) in _TET_CORNER_HEX:
                    hexes.append([
                        r[v], r[ma], fc[frozenset((v, A, B))], r[mb],
                        r[mc], fc[frozenset((v, A, C))], g,
                        fc[frozenset((v, B, C))]])
            else:
                raise NotImplementedError(ct)

    nodes = np.vstack([p2.nodes] + [np.asarray(extra_nodes)]) \
        if extra_nodes else p2.nodes
    new_blocks = []
    if quads:
        new_blocks.append(ElementBlock("quad4", np.asarray(quads, np.int32)))
    if hexes:
        hx = np.asarray(hexes, np.int32)
        # fix inverted corner hexes (orientation depends on tet handedness)
        e1 = nodes[hx[:, 1]] - nodes[hx[:, 0]]
        e2 = nodes[hx[:, 3]] - nodes[hx[:, 0]]
        e3 = nodes[hx[:, 4]] - nodes[hx[:, 0]]
        neg = np.einsum("ci,ci->c", np.cross(e1, e2), e3) < 0.0
        hx[neg] = hx[neg][:, [4, 5, 6, 7, 0, 1, 2, 3]]
        new_blocks.append(ElementBlock("hex8", hx))
    out = Mesh(nodes, new_blocks)

    # facetset transfer: P2 facet nodes of the parent facets + the centroid
    # of any tet facet belonging to the set
    if mesh.facetsets:
        allowed: Dict[str, set] = {}
        for name in mesh.facetsets:
            ns = set()
            for gc, lf in mesh.facetset(name):
                bi, lc = mesh.block_of_cell(int(gc))
                bb2 = p2.blocks[bi]
                ns.update(facet_nodes(bb2.element, int(lf),
                                      bb2.connectivity[lc]))
                bb = mesh.blocks[bi]
                fac = bb.element.facets[int(lf)]
                if bb.celltype == "tet4" or \
                        (bb.celltype == "wedge6" and len(fac) == 3):
                    key = tuple(sorted(int(bb.connectivity[lc, i])
                                       for i in fac))
                    ns.add(tet_face_ids[key])
            allowed[name] = ns
        fsets = {name: [] for name in mesh.facetsets}
        for gc, lf in out.boundary_facets():
            bi, lc = out.block_of_cell(int(gc))
            bb = out.blocks[bi]
            fac = bb.element.facets[lf]
            fnodes = set(int(v) for v in bb.connectivity[lc, list(fac)])
            for name, ok in allowed.items():
                if fnodes <= ok:
                    fsets[name].append((gc, lf))
                    break
        out.facetsets = {k: np.asarray(v, np.int64)
                         for k, v in fsets.items() if v}
        for k in out.facetsets:
            out.nodesets[k] = out.nodes_of_facetset(k)
    for k, v in mesh.nodesets.items():
        out.nodesets.setdefault(k, v)
    return out


# ---------------------------------------------------------------------------
# external loaders
# ---------------------------------------------------------------------------

#: MFEM geometry ids; prism/pyramid orderings match VTK directly
#: (the reference maps them too: ``tools.jl:543-545``)
_MFEM_TYPES = {1: ("line2", 2), 2: ("tri3", 3), 3: ("quad4", 4),
               4: ("tet4", 4), 5: ("hex8", 8),
               6: ("wedge6", 6), 7: ("pyramid5", 5)}




def renumber_mesh_nodes(mesh: Mesh, perm) -> Mesh:
    """Relabel mesh nodes by ``perm`` (new node i = old node ``perm[i]``).

    Connectivity and nodesets are remapped; facetsets/cellsets are
    cell-indexed and survive unchanged. Used by the RCM reorder and by the
    multigrid hierarchy's per-level renumbering."""
    perm = np.asarray(perm, np.int64)
    inv = np.empty(mesh.nnodes, dtype=np.int64)
    inv[perm] = np.arange(mesh.nnodes)
    blocks = [ElementBlock(b.celltype,
                           inv[b.connectivity].astype(np.int32))
              for b in mesh.blocks]
    out = Mesh(mesh.nodes[perm], blocks,
               facetsets={k: v.copy() for k, v in mesh.facetsets.items()},
               cellsets={k: v.copy() for k, v in mesh.cellsets.items()})
    for k, v in mesh.nodesets.items():
        out.nodesets[k] = np.sort(inv[v])
    return out


def lexsort_node_perm(mesh: Mesh, quantum: float = 1e-6) -> np.ndarray:
    """Node permutation sorting by quantized (z, y, x) coordinates.

    On lattice-structured geometries (box meshes and their uniform
    refinements) this recovers the generator's native lattice ordering, so
    constant-stride neighbor offsets — and with them the DIA/BlockDIA
    gather-free SpMV paths — re-engage on refined meshes."""
    q = np.round(mesh.nodes /
                 (np.ptp(mesh.nodes, axis=0).max() * quantum)
                 ).astype(np.int64)
    return np.lexsort(tuple(q[:, d] for d in range(q.shape[1])))


def reorder_mesh_rcm(mesh: Mesh, return_perm: bool = False):
    """Reverse Cuthill-McKee node reordering.

    With ``return_perm=True`` also returns ``perm`` (new node i = old node
    ``perm[i]``) so callers can remap node-indexed side tables (multigrid
    transfer/injection maps).

    Minimizes the mesh (and hence dof) bandwidth so the gather-free
    DIA/BlockDIA SpMV fast paths engage on unstructured meshes (generated
    LV meshes, external loaders). Facetsets are (cell, facet) pairs and
    survive unchanged; nodesets are remapped. The reference keeps Ferrite's
    insertion order and pays for it with cache misses — on TPU the penalty
    is gathers, so bandwidth ordering is the difference between the DIA
    and ELL SpMV (measured 48x on a hex mechanics Jacobian).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    n = mesh.nnodes
    rows, cols = [], []
    for b in mesh.blocks:
        conn = b.connectivity
        nb = conn.shape[1]
        for i in range(nb):
            rows.append(np.repeat(conn[:, i], nb))
            cols.append(conn.reshape(-1))
    g = sp.coo_matrix((np.ones(sum(r.size for r in rows), np.int8),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True),
                      dtype=np.int64)
    out = renumber_mesh_nodes(mesh, perm)
    if return_perm:
        return out, perm
    return out


def load_mfem_grid(filename: str) -> Mesh:
    """MFEM v1.0 ascii meshes (``tools.jl:502``); boundary attributes become
    facetsets named by their attribute id."""
    with open(filename) as f:
        lines = [ln.strip() for ln in f]
    assert lines[0] == "MFEM mesh v1.0", lines[0]

    def section(name):
        i = lines.index(name)
        return i + 1

    i = section("dimension")
    dim = int(lines[i])
    i = section("elements")
    ne = int(lines[i])
    blocks: Dict[str, List] = {}
    for k in range(ne):
        vals = [int(v) for v in lines[i + 1 + k].split()]
        attr, etype, conn = vals[0], vals[1], vals[2:]
        if etype not in _MFEM_TYPES:
            raise NotImplementedError(f"MFEM geometry type {etype}")
        name, nn = _MFEM_TYPES[etype]
        if etype == 2:
            conn = [conn[1], conn[2], conn[0]]  # reference rotation
        blocks.setdefault(name, []).append(conn[:nn])
    i = section("vertices")
    nv = int(lines[i])
    sdim = int(lines[i + 1])
    verts = np.asarray([[float(v) for v in lines[i + 2 + k].split()]
                        for k in range(nv)])
    mesh = Mesh(verts, [ElementBlock(n, np.asarray(c, np.int32))
                        for n, c in blocks.items()])
    # boundary section -> facetsets by attribute
    try:
        i = section("boundary")
        nb = int(lines[i])
        bnd: Dict[int, List[frozenset]] = {}
        for k in range(nb):
            vals = [int(v) for v in lines[i + 1 + k].split()]
            bnd.setdefault(vals[0], []).append(frozenset(vals[2:]))
        lookup = {}
        for gc, lf in mesh.boundary_facets():
            bi, lc = mesh.block_of_cell(int(gc))
            b = mesh.blocks[bi]
            key = frozenset(int(v) for v in
                            b.connectivity[lc, list(b.element.facets[lf])])
            lookup[key] = (gc, lf)
        for attr, keys in bnd.items():
            fs = [lookup[k] for k in keys if k in lookup]
            if fs:
                mesh.facetsets[str(attr)] = np.asarray(fs, np.int64)
    except ValueError:
        pass
    return mesh


#: openCARP element tags; "Pr" prisms map to wedge6 (openCARP orders prism
#: nodes bottom-triangle-then-top, matching the VTK wedge ordering)
_CARP_TYPES = {"Ln": ("line2", 2), "Tr": ("tri3", 3), "Qd": ("quad4", 4),
               "Tt": ("tet4", 4), "Hx": ("hex8", 8), "Pr": ("wedge6", 6)}


def load_carp_grid(basename: str) -> Mesh:
    """openCARP .pts/.elem pair (``tools.jl:660``); the trailing element tag
    becomes a cellset."""
    pts = open(basename + ".pts").read().split()
    npts = int(pts[0])
    nodes = np.asarray(pts[1:1 + 3 * npts], dtype=float).reshape(npts, 3)
    lines = open(basename + ".elem").read().splitlines()
    ne = int(lines[0].split()[0])
    blocks: Dict[str, List] = {}
    tags: Dict[str, List] = {}
    order = []
    for k in range(ne):
        parts = lines[1 + k].split()
        name, nn = _CARP_TYPES[parts[0]]
        conn = [int(v) for v in parts[1:1 + nn]]
        tag = parts[1 + nn] if len(parts) > 1 + nn else "0"
        blocks.setdefault(name, []).append(conn)
        tags.setdefault(name, []).append(tag)
        order.append(name)
    mesh = Mesh(nodes, [ElementBlock(n, np.asarray(c, np.int32))
                        for n, c in blocks.items()])
    off = 0
    cellsets: Dict[str, List] = {}
    for b in mesh.blocks:
        for i, tag in enumerate(tags[b.celltype]):
            cellsets.setdefault(tag, []).append(b.cell_offset + i)
    mesh.cellsets.update({k: np.asarray(v, np.int64)
                          for k, v in cellsets.items()})
    return mesh


def load_voom2_grid(basename: str) -> Mesh:
    """voom2 legacy .nodes/.ele pair (``tools.jl:491``); 1-based indices."""
    toks = open(basename + ".nodes").read().split()
    npts, sdim = int(toks[0]), int(toks[1])
    data = np.asarray(toks[4:4 + npts * (1 + sdim)], dtype=float
                      ).reshape(npts, 1 + sdim)
    ids = data[:, 0].astype(int)
    nodes = np.zeros((int(ids.max()), sdim))
    nodes[ids - 1] = data[:, 1:]
    lines = [ln for ln in open(basename + ".ele").read().splitlines()
             if ln.strip()]
    ne = int(lines[0].split()[0])
    blocks: Dict[str, List] = {}
    for k in range(ne):
        parts = [int(v) for v in lines[1 + k].split()]
        nn = parts[1]
        conn = [v - 1 for v in parts[2:2 + nn]]
        name = {2: "line2", 3: "tri3", 4: "tet4", 5: "pyramid5",
                6: "wedge6", 8: "hex8"}[nn]
        blocks.setdefault(name, []).append(conn)
    return Mesh(nodes, [ElementBlock(n, np.asarray(c, np.int32))
                        for n, c in blocks.items()])


# --- surface extraction + geometry tools ------------------------------------

def extract_outer_surface_mesh(mesh: Mesh, subdomains=None) -> Mesh:
    """Shell mesh of the outer boundary of a 3D mesh.

    Parity: ``extract_outer_surface_mesh`` (``src/mesh/tools.jl:745-789``) —
    every boundary facet becomes a 2D surface cell (tri/quad embedded in
    3D), volumetric facetsets become surface cellsets, and nodes not
    attached to any surface cell are dropped.

    ``subdomains``: optional list of cellset names; the boundary is then
    computed over the union of those subdomains only.

    Degenerate quads from collapsed-hex cells (e.g. the ideal-LV apex
    plug, which the reference meshes with Wedge cells instead) are
    emitted as tri3 cells.
    """
    from thunderbolt_tpu.mesh.elements import facet_type
    from thunderbolt_tpu.fem.facets import facet_basis_indices
    if mesh.sdim != 3:
        raise ValueError("surface extraction requires a 3D mesh")
    cells = None
    if subdomains is not None:
        cells = np.unique(np.concatenate(
            [mesh.cellset(s) for s in subdomains]))
    bf = mesh.boundary_facets(cells)

    conn_by_type: Dict[str, List] = {}
    slot_by_type: Dict[str, List[int]] = {}   # row in bf for each new cell
    bis, lcs = (mesh.block_of_cells(bf[:, 0]) if len(bf)
                else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
    for row, (gc, lf) in enumerate(bf):
        bi, lc = int(bis[row]), int(lcs[row])
        b = mesh.blocks[bi]
        el = b.element
        fidx = facet_basis_indices(el, int(lf))
        fconn = b.connectivity[lc, fidx]
        ftype = facet_type(el, int(lf))
        # collapsed-corner quads degrade to triangles (preserve order)
        uniq = np.unique(fconn)
        if len(uniq) < len(fconn):
            if el.order != 1:
                raise NotImplementedError(
                    "degenerate quadratic boundary facet")
            seen, kept = set(), []
            for n in fconn:
                if int(n) not in seen:
                    seen.add(int(n))
                    kept.append(int(n))
            if len(kept) != 3:
                raise ValueError("boundary facet collapses below a triangle")
            fconn, ftype = np.asarray(kept), "tri3"
        conn_by_type.setdefault(ftype, []).append(fconn)
        slot_by_type.setdefault(ftype, []).append(row)

    blocks, surf_index = [], np.full(len(bf), -1, dtype=np.int64)
    off = 0
    for ftype in sorted(conn_by_type):
        conn = np.asarray(conn_by_type[ftype], dtype=np.int64)
        blocks.append(ElementBlock(ftype, conn))
        surf_index[slot_by_type[ftype]] = off + np.arange(len(conn))
        off += len(conn)

    # volumetric facetsets -> surface cellsets, matched on (gc, lf) pairs;
    # the key multiplier covers every element type's facet count so no
    # (cell, facet) pair can alias another
    mult = max(len(b.element.facets) for b in mesh.blocks) + 1
    key = bf[:, 0] * mult + bf[:, 1]
    order = np.argsort(key)
    cellsets = {}
    for name, fs in mesh.facetsets.items():
        fs = np.asarray(fs, dtype=np.int64).reshape(-1, 2)
        k = fs[:, 0] * mult + fs[:, 1]
        pos = np.searchsorted(key[order], k)
        pos = np.clip(pos, 0, len(key) - 1)
        hit = key[order][pos] == k
        idx = surf_index[order[pos[hit]]]
        if len(idx):
            cellsets[name] = np.sort(idx)

    # drop unattached nodes
    used = np.unique(np.concatenate([b.connectivity.ravel()
                                     for b in blocks])) if blocks else \
        np.zeros(0, dtype=np.int64)
    remap = np.full(mesh.nnodes, -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    out_blocks = [ElementBlock(b.celltype, remap[b.connectivity])
                  for b in blocks]
    return Mesh(mesh.nodes[used], out_blocks, cellsets=cellsets)


def compute_center_of_mass(mesh: Mesh, domain_name: str = None) -> np.ndarray:
    """Volume-weighted centroid ∫x dΩ / ∫dΩ over a (sub)domain.

    Parity: ``compute_center_of_mass`` (``src/mesh/tools.jl:824-859``).
    Vectorized host computation (setup-time geometry, like the long-axis
    fit): per block, quadrature of degree max(2·order−1, 2).
    """
    from thunderbolt_tpu.mesh.quadrature import quadrature_rule
    member = mesh.cell_membership(mesh.cellset(domain_name))
    Ix = np.zeros(mesh.sdim)
    I1 = 0.0
    for b in mesh.blocks:
        sel = member[b.cell_offset:b.cell_offset + b.ncells]
        if not sel.any():
            continue
        el = b.element
        qr = quadrature_rule(el.name, max(2 * el.order - 1, 2))
        N = el.shape(qr.points)          # [nqp, nb]
        dN = el.grad(qr.points)          # [nqp, nb, rdim]
        Xe = mesh.nodes[b.connectivity[sel]]          # [nc, nb, sdim]
        J = np.einsum("qbr,cbs->cqsr", dN, Xe)
        detJ = np.linalg.det(J)
        xq = np.einsum("qb,cbs->cqs", N, Xe)
        w = detJ * qr.weights[None, :]
        Ix += np.einsum("cqs,cq->s", xq, w)
        I1 += w.sum()
    return Ix / I1


def compute_center_of_surface(mesh: Mesh, name: str) -> np.ndarray:
    """Facet-area-weighted center of the cells touching facetset ``name``.

    Parity: ``compute_center_of_surface`` (``src/mesh/tools.jl:860-882``),
    including its exact weighting semantics: each member facet contributes
    the average of its OWNING CELL's node coordinates, weighted by the
    facet's surface area.
    """
    from thunderbolt_tpu.mesh.elements import facet_type
    from thunderbolt_tpu.fem.facets import facet_basis_indices
    from thunderbolt_tpu.mesh.quadrature import quadrature_rule
    fs = mesh.facetset(name)
    if len(fs) == 0:
        raise ValueError(f"facetset {name!r} is empty")
    acc = np.zeros(mesh.sdim)
    total = 0.0
    # group by (block, local facet) for vectorized area integration
    binfo = np.stack(mesh.block_of_cells(fs[:, 0]), axis=1)
    for bi in np.unique(binfo[:, 0]):
        b = mesh.blocks[bi]
        el = b.element
        for lf in np.unique(fs[binfo[:, 0] == bi, 1]):
            rows = (binfo[:, 0] == bi) & (fs[:, 1] == lf)
            lc = binfo[rows, 1]
            ftype = facet_type(el, int(lf))
            fel = get_element(ftype)
            qr = quadrature_rule(ftype, max(2 * el.order - 1, 2))
            dNf = fel.grad(qr.points)                     # [nqp, nbf, fdim]
            fidx = facet_basis_indices(el, int(lf))
            Xf = mesh.nodes[b.connectivity[lc][:, fidx]]  # [nf, nbf, sdim]
            T = np.einsum("qbr,cbs->cqsr", dNf, Xf)
            if T.shape[-1] == 2:
                da = np.linalg.norm(
                    np.cross(T[..., 0], T[..., 1]), axis=-1)
            else:
                da = np.linalg.norm(T[..., 0], axis=-1)
            areas = (da * qr.weights[None, :]).sum(axis=1)  # [nf]
            cent = mesh.nodes[b.connectivity[lc]].mean(axis=1)  # [nf, sdim]
            acc += (cent * areas[:, None]).sum(axis=0)
            total += areas.sum()
    return acc / total


def split_facetset_by_type(mesh: Mesh, name: str,
                           remove_original: bool = False):
    """Split a facetset mixing facet types (e.g. wedge caps + sides) into
    per-type sets ``{name}:{facettype}`` so each can feed a facet batch
    (facet batches require one facet type per set; see
    ``fem/facets.py:make_facet_batch``). Returns the new set names.

    No-op (returns ``[name]``) when the set is already single-type."""
    from thunderbolt_tpu.mesh.elements import facet_type
    fs = mesh.facetset(name)
    if len(fs) == 0:
        return [name]
    bis, lcs = mesh.block_of_cells(fs[:, 0])
    types = np.asarray([facet_type(mesh.blocks[int(b)].element, int(lf))
                        for b, (gc, lf) in zip(bis, fs)])
    uniq = sorted(set(types.tolist()))
    if len(uniq) == 1:
        return [name]
    out = []
    for t in uniq:
        nm = f"{name}:{t}"
        mesh.facetsets[nm] = fs[types == t]
        out.append(nm)
    if remove_original:
        del mesh.facetsets[name]
    return out
