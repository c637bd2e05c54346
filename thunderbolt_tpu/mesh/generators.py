"""Idealized mesh generators.

Parity targets: Ferrite's ``generate_grid`` (used by the reference tutorials,
e.g. ``docs/src/literate-tutorials/ep01_spiral-wave.jl:30``) and the
reference's own generators ``generate_ring_mesh``
(``src/mesh/generators.jl:17``) and ``generate_ideal_lv_mesh``
(``src/mesh/generators.jl:521``) plus quadratic variants
(``generators.jl:251,384``).

All generators emit canonical facetsets: boxes get left/right/bottom/top
(/front/back), rings and ventricles get Endocardium/Epicardium/Base (/Apex)
— the names the reference's coordinate-system builders key on
(``src/modeling/core/coordinate_systems.jl:886``).
"""

from __future__ import annotations

import numpy as np

from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
from thunderbolt_tpu.mesh.elements import get_element


# ---------------------------------------------------------------------------
# structured boxes
# ---------------------------------------------------------------------------

def _grid_nodes(dims, cmin, cmax):
    axes = [np.linspace(cmin[d], cmax[d], dims[d] + 1) for d in range(len(dims))]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1), \
        [dims[d] + 1 for d in range(len(dims))]


def _nid(shape):
    """Node-index lookup for an ij-ordered structured grid."""
    strides = np.cumprod([1] + shape[::-1][:-1])[::-1]

    def f(*idx):
        return sum(i * s for i, s in zip(idx, strides))
    return f


def _box_facetsets(mesh: Mesh, cmin, cmax, tol=1e-10):
    names2 = ["left", "right", "bottom", "top"]
    names3 = ["left", "right", "front", "back", "bottom", "top"]
    dim = mesh.sdim
    bf = mesh.boundary_facets()
    sets = {}
    for i, (gc, lf) in enumerate(bf):
        bi, lc = mesh.block_of_cell(int(gc))
        b = mesh.blocks[bi]
        fac = b.element.facets[lf]
        centroid = mesh.nodes[b.connectivity[lc, list(fac)]].mean(axis=0)
        for d in range(dim):
            lo = abs(centroid[d] - cmin[d]) < tol
            hi = abs(centroid[d] - cmax[d]) < tol
            if lo or hi:
                name = (names2 if dim == 2 else names3)[2 * d + (1 if hi else 0)]
                sets.setdefault(name, []).append((gc, lf))
                break
    mesh.facetsets.update(
        {k: np.asarray(v, dtype=np.int64) for k, v in sets.items()}
    )
    # matching nodesets
    for k in list(sets.keys()):
        mesh.nodesets[k] = mesh.nodes_of_facetset(k)
    return mesh


def generate_mesh(celltype: str, dims, corner_min=None, corner_max=None) -> Mesh:
    """Structured box mesh; mirrors Ferrite ``generate_grid``.

    celltype in {line2/3, tri3/6, quad4/9, tet4/10, hex8/27}; `dims` is the
    number of cells per dimension; corners default to the unit box.
    """
    el = get_element(celltype)
    dim = el.dim
    dims = tuple(int(d) for d in np.atleast_1d(dims))
    if len(dims) != dim:
        raise ValueError(
            f"{celltype} is {dim}D but got {len(dims)} subdivision counts")
    cmin = np.zeros(dim) if corner_min is None else np.asarray(corner_min, float)
    cmax = np.ones(dim) if corner_max is None else np.asarray(corner_max, float)

    base = {"line3": "line2", "tri6": "tri3", "quad9": "quad4",
            "tet10": "tet4", "hex27": "hex8",
            "wedge18": "wedge6"}.get(celltype, celltype)

    nodes, shape = _grid_nodes(dims, cmin, cmax)
    nid = _nid(shape)
    # bulk cell tables: nid() is pure index arithmetic, so feeding it whole
    # index grids builds every cell's connectivity in a handful of numpy
    # ops (the per-cell Python loops were the setup bottleneck at 1M cells)
    IJ = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    IJ = [a.ravel() for a in IJ]  # cell order = i-major lexicographic

    def corners(*deltas):
        """[ncells, len(deltas)] node ids at the given index offsets."""
        return np.stack([nid(*[a + d for a, d in zip(IJ, ds)])
                         for ds in deltas], axis=1)

    if base == "line2":
        cells = corners((0,), (1,))
    elif base == "quad4":
        cells = corners((0, 0), (1, 0), (1, 1), (0, 1))
    elif base == "tri3":
        q = corners((0, 0), (1, 0), (1, 1), (0, 1))  # ll lr ur ul
        cells = np.stack([q[:, [0, 1, 2]], q[:, [0, 2, 3]]],
                         axis=1).reshape(-1, 3)
    elif base == "hex8":
        cells = corners((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))
    elif base == "tet4":
        # Kuhn 6-tet subdivision (conformal across cells)
        perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
                 (2, 1, 0)]
        tets = []
        for p in perms:
            vs = [np.array([0, 0, 0])]
            for ax in p:
                v = vs[-1].copy()
                v[ax] += 1
                vs.append(v)
            tets.append(corners(*[tuple(v) for v in vs]))
        cells = np.stack(tets, axis=1).reshape(-1, 4)  # [nc*6, 4]
        # fix orientation (positive volume), batched
        pts = nodes[cells]
        vol = np.linalg.det(pts[:, 1:] - pts[:, :1])
        flip = vol < 0
        cells[flip] = cells[flip][:, [0, 2, 1, 3]]
    elif base == "wedge6":
        # each hex column cell -> two prisms split along the xy diagonal
        h = corners((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))
        cells = np.stack([h[:, [0, 1, 2, 4, 5, 6]],
                          h[:, [0, 2, 3, 4, 6, 7]]], axis=1).reshape(-1, 6)
    elif base == "pyramid5":
        # each hex cell -> 6 pyramids: base = hex face (inward-oriented so
        # the base normal points at the apex), apex = new centroid node.
        # Shared quad faces conform across cells.
        hex_el = get_element("hex8")
        h = corners((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))
        nc = h.shape[0]
        apex = nodes.shape[0] + np.arange(nc, dtype=np.int64)
        centroids = nodes[h].mean(axis=1)
        pyr = [np.concatenate(
            [h[:, list(reversed(fac))], apex[:, None]], axis=1)
            for fac in hex_el.facets]
        cells = np.stack(pyr, axis=1).reshape(-1, 5)
        nodes = np.vstack([nodes, centroids])
    else:
        raise KeyError(celltype)

    mesh = Mesh(nodes, [ElementBlock(base, np.asarray(cells, dtype=np.int32))])
    if celltype != base:
        mesh = elevate_to_quadratic(mesh)
    return _box_facetsets(mesh, cmin, cmax)


def generate_simple_disc_mesh(n: int, radius: float = 1.0) -> Mesh:
    """Quad fan disc: 2n rim nodes + a center node, n quadrilaterals, all
    sharing the center (parity: ``generate_simple_disc_mesh``,
    ``src/mesh/generators.jl:944-966``). Facetset ``boundary`` = the rim."""
    th = np.pi / n * np.arange(2 * n)
    # reference starts at (0, radius) and rotates; rotate((0,r), a) =
    # (-r sin a, r cos a)
    rim = np.stack([-radius * np.sin(th), radius * np.cos(th)], axis=1)
    nodes = np.vstack([rim, [[0.0, 0.0]]])
    center = 2 * n
    cells = [[2 * i, 2 * i + 1, (2 * i + 2) % (2 * n), center]
             for i in range(n)]
    mesh = Mesh(nodes, [ElementBlock("quad4",
                                     np.asarray(cells, dtype=np.int32))])
    mesh.facetsets["boundary"] = np.asarray(mesh.boundary_facets(),
                                            dtype=np.int64)
    mesh.nodesets["boundary"] = mesh.nodes_of_facetset("boundary")
    return mesh


# ---------------------------------------------------------------------------
# quadratic elevation
# ---------------------------------------------------------------------------

def elevate_to_quadratic(mesh: Mesh, return_parents: bool = False):
    """Insert edge/face/center nodes, turning P1 blocks into P2 blocks.

    Analog of the reference's dedicated quadratic generators
    (``src/mesh/generators.jl:251,384``) but generic over cell type.
    With ``return_parents=True`` also returns, for every NEW node, the tuple
    of original node ids it interpolates (multigrid prolongation weights are
    1/len(parents) each).
    """
    p2_of = {"line2": "line3", "tri3": "tri6", "quad4": "quad9",
             "tet4": "tet10", "hex8": "hex27", "wedge6": "wedge18"}
    nodes = [mesh.nodes]
    nextid = mesh.nnodes
    edge_ids = {}
    face_ids = {}
    new_blocks = []
    parents = []

    def mid(node_ids):
        parents.append(tuple(int(v) for v in node_ids))
        return mesh.nodes[list(node_ids)].mean(axis=0)

    for b in mesh.blocks:
        el = b.element
        if b.celltype not in p2_of:
            raise NotImplementedError(
                f"no quadratic family for {b.celltype!r} (as in the "
                "reference, pyramids are linear-only — no P2 elevation, "
                "refinement, or hexahedralization)")
        p2 = get_element(p2_of[b.celltype])
        conn = b.connectivity
        ncells = b.ncells
        newconn = np.zeros((ncells, p2.nnodes), dtype=np.int32)
        newconn[:, : el.nnodes] = conn
        col = el.nnodes
        # edges
        for (a, bb) in p2.edges:
            for c in range(ncells):
                key = tuple(sorted((int(conn[c, a]), int(conn[c, bb]))))
                if key not in edge_ids:
                    edge_ids[key] = nextid
                    nodes.append(mid(key)[None])
                    nextid += 1
                newconn[c, col] = edge_ids[key]
            col += 1
        # faces (hex27 only)
        for f in p2.faces:
            for c in range(ncells):
                key = tuple(sorted(int(conn[c, v]) for v in f))
                if key not in face_ids:
                    face_ids[key] = nextid
                    nodes.append(mid(key)[None])
                    nextid += 1
                newconn[c, col] = face_ids[key]
            col += 1
        # center
        if p2.has_center_node:
            for c in range(ncells):
                newconn[c, col] = nextid
                nodes.append(mid(tuple(int(v) for v in conn[c]))[None])
                nextid += 1
            col += 1
        assert col == p2.nnodes
        new_blocks.append(ElementBlock(p2_of[b.celltype], newconn))

    out = Mesh(np.vstack(nodes), new_blocks,
               facetsets=dict(mesh.facetsets), cellsets=dict(mesh.cellsets))
    # regenerate nodesets from facetsets (they gain midside nodes)
    for k in mesh.facetsets:
        out.nodesets[k] = out.nodes_of_facetset(k)
    for k, v in mesh.nodesets.items():
        if k not in out.nodesets:
            out.nodesets[k] = v
    if return_parents:
        return out, parents
    return out


# ---------------------------------------------------------------------------
# idealized cardiac geometries
# ---------------------------------------------------------------------------

def generate_ring_mesh(ne_c: int, ne_r: int, ne_l: int,
                       inner_radius: float = 0.75, outer_radius: float = 1.0,
                       longitudinal_upper: float = 0.2,
                       apicobasal_tilt: float = 0.0) -> Mesh:
    """Hexahedral ring (idealized myocardial slice).

    Parity: ``generate_ring_mesh`` (``src/mesh/generators.jl:17``); facetsets
    Endocardium/Epicardium/Top/Bottom, cellset "Myocardium".
    """
    nn_c, nn_r, nn_l = ne_c, ne_r + 1, ne_l + 1
    theta = np.linspace(0, 2 * np.pi, nn_c, endpoint=False)
    radius = np.linspace(inner_radius, outer_radius, nn_r)
    zs = np.linspace(0.0, longitudinal_upper, nn_l)
    nodes = []
    for k, z in enumerate(zs):
        for j, r in enumerate(radius):
            for i, th in enumerate(theta):
                tilt = apicobasal_tilt * (r - inner_radius) \
                    / max(outer_radius - inner_radius, 1e-30)
                nodes.append([r * np.cos(th), r * np.sin(th), z + tilt])
    nodes = np.asarray(nodes)

    def nid(i, j, k):
        return (i % nn_c) + j * nn_c + k * nn_c * nn_r

    cells = []
    for k in range(ne_l):
        for j in range(ne_r):
            for i in range(ne_c):
                cells.append([
                    nid(i, j, k), nid(i, j + 1, k),
                    nid(i + 1, j + 1, k), nid(i + 1, j, k),
                    nid(i, j, k + 1), nid(i, j + 1, k + 1),
                    nid(i + 1, j + 1, k + 1), nid(i + 1, j, k + 1),
                ])
    mesh = Mesh(nodes, [ElementBlock("hex8", np.asarray(cells, np.int32))])
    b = mesh.blocks[0]
    rr = np.linalg.norm(nodes[:, :2], axis=1)
    fsets = {"Endocardium": [], "Epicardium": [], "Top": [], "Bottom": []}
    for gc, lf in mesh.boundary_facets():
        fac = b.element.facets[lf]
        pts = nodes[b.connectivity[gc, list(fac)]]
        rmean = np.linalg.norm(pts[:, :2], axis=1).mean()
        zmean = pts[:, 2].mean()
        if np.allclose(np.linalg.norm(pts[:, :2], axis=1), inner_radius, atol=1e-8):
            fsets["Endocardium"].append((gc, lf))
        elif np.allclose(np.linalg.norm(pts[:, :2], axis=1), outer_radius, atol=1e-8):
            fsets["Epicardium"].append((gc, lf))
        elif zmean > longitudinal_upper - 1e-8:
            fsets["Top"].append((gc, lf))
        else:
            fsets["Bottom"].append((gc, lf))
    mesh.facetsets = {k: np.asarray(v, np.int64) for k, v in fsets.items() if v}
    mesh.cellsets["Myocardium"] = np.arange(mesh.ncells, dtype=np.int64)
    for k in mesh.facetsets:
        mesh.nodesets[k] = mesh.nodes_of_facetset(k)
    return mesh


def generate_open_ring_mesh(ne_c: int, ne_r: int, ne_l: int,
                            opening_angle: float,
                            inner_radius: float = 0.75,
                            outer_radius: float = 1.0,
                            longitudinal_lower: float = -0.2,
                            longitudinal_upper: float = 0.2,
                            apicobasal_tilt: float = 0.0) -> Mesh:
    """Hexahedral ring with an azimuthal opening (cut along the x-z
    plane), opened symmetrically by ``opening_angle``.

    Parity: ``generate_open_ring_mesh`` (``src/mesh/generators.jl:132``).
    Facetsets: Endocardium/Epicardium (inner/outer walls), Open1/Open2
    (the two azimuthal cut faces at theta = 2*pi - opening_angle/2 and
    theta = opening_angle/2), Base (z = longitudinal_upper), Myocardium
    (z = longitudinal_lower); anchor nodesets MyocardialAnchor1-4.
    ``longitudinal_*`` are the axial extent in z (lengths, not angles);
    ``apicobasal_tilt`` shrinks the radius linearly with z as in the
    reference (radius - tilt * z / max|z|).
    """
    nn_c, nn_r, nn_l = ne_c + 1, ne_r + 1, ne_l + 1
    theta = np.linspace(opening_angle / 2, 2 * np.pi - opening_angle / 2,
                        nn_c)
    radius = np.linspace(inner_radius, outer_radius, nn_r)
    zs = np.linspace(longitudinal_lower, longitudinal_upper, nn_l)
    zden = max(np.abs(zs).max(), 1e-30)
    nodes = []
    for z in zs:
        for r in radius:
            rr = r - apicobasal_tilt * z / zden
            for th in theta:
                nodes.append([rr * np.cos(th), rr * np.sin(th), z])
    nodes = np.asarray(nodes)

    def nid(i, j, k):
        return i + j * nn_c + k * nn_c * nn_r

    cells = []
    for k in range(ne_l):
        for j in range(ne_r):
            for i in range(ne_c):
                cells.append([
                    nid(i, j, k), nid(i, j + 1, k),
                    nid(i + 1, j + 1, k), nid(i + 1, j, k),
                    nid(i, j, k + 1), nid(i, j + 1, k + 1),
                    nid(i + 1, j + 1, k + 1), nid(i + 1, j, k + 1),
                ])
    mesh = Mesh(nodes, [ElementBlock("hex8", np.asarray(cells, np.int32))])
    b = mesh.blocks[0]
    # tilt-aware parametric radius/angle of each node for classification
    r_param = np.linalg.norm(nodes[:, :2], axis=1) \
        + apicobasal_tilt * nodes[:, 2] / zden
    th_node = np.mod(np.arctan2(nodes[:, 1], nodes[:, 0]), 2 * np.pi)
    fsets = {"Endocardium": [], "Epicardium": [], "Open1": [],
             "Open2": [], "Base": [], "Myocardium": []}
    tol = 1e-8
    for gc, lf in mesh.boundary_facets():
        fac = b.element.facets[lf]
        nids = b.connectivity[gc, list(fac)]
        if np.all(np.abs(r_param[nids] - inner_radius) < tol):
            fsets["Endocardium"].append((gc, lf))
        elif np.all(np.abs(r_param[nids] - outer_radius) < tol):
            fsets["Epicardium"].append((gc, lf))
        elif np.all(np.abs(th_node[nids] - theta[-1]) < tol):
            fsets["Open1"].append((gc, lf))
        elif np.all(np.abs(th_node[nids] - theta[0]) < tol):
            fsets["Open2"].append((gc, lf))
        elif np.all(nodes[nids, 2] > longitudinal_upper - tol):
            fsets["Base"].append((gc, lf))
        else:
            fsets["Myocardium"].append((gc, lf))
    mesh.facetsets = {k: np.asarray(v, np.int64)
                      for k, v in fsets.items() if v}
    mesh.cellsets["Myocardium"] = np.arange(mesh.ncells, dtype=np.int64)
    for k in mesh.facetsets:
        mesh.nodesets[k] = mesh.nodes_of_facetset(k)
    mesh.nodesets["MyocardialAnchor1"] = np.array([nid(0, 0, 0)])
    mesh.nodesets["MyocardialAnchor2"] = np.array([nid(0, nn_r - 1, 0)])
    mesh.nodesets["MyocardialAnchor3"] = np.array(
        [nid(int(np.ceil(nn_c / 4)), 0, 0)])
    mesh.nodesets["MyocardialAnchor4"] = np.array(
        [nid(int(np.ceil(3 * nn_c / 4)), 0, 0)])
    return mesh


def generate_ideal_lv_mesh(ne_c: int, ne_r: int, ne_l: int,
                           inner_radius: float = 0.7,
                           outer_radius: float = 1.0,
                           longitudinal_lower: float = -1.0,
                           longitudinal_upper: float = 0.2) -> Mesh:
    """Idealized left ventricle: truncated-ellipsoid hexahedral shell.

    Parity: ``generate_ideal_lv_mesh`` (``src/mesh/generators.jl:521``).
    The wall is swept in (circumferential, transmural, apicobasal)
    prolate-spheroid coordinates; the apex is closed with a degenerate-free
    cap built by collapsing the innermost ring onto the axis via a small
    structured plug. Facetsets: Endocardium, Epicardium, Base; nodeset Apex.
    """
    # apicobasal angle: 0 at apex pole, pi/2 at equator; truncate above z_upper.
    # Ellipsoid: x = r sin(phi) cos(th), y = r sin(phi) sin(th), z = -r cos(phi)
    # scaled so long axis = |longitudinal_lower|, short axis = radius.
    nn_c, nn_r, nn_l = ne_c, ne_r + 1, ne_l + 1
    theta = np.linspace(0, 2 * np.pi, nn_c, endpoint=False)
    radii = np.linspace(inner_radius, outer_radius, nn_r)
    a_long = -longitudinal_lower  # long semi-axis scale for unit r
    phi_apex = np.pi / 12

    nodes = []
    for kk in range(nn_l):
        for r in radii:
            # per-shell truncation angle so the base plane is z = upper
            phi_base = np.pi / 2 + np.arcsin(
                min(max(longitudinal_upper / (a_long * r), -1.0), 1.0))
            phi = phi_apex + (phi_base - phi_apex) * kk / (nn_l - 1)
            for th in theta:
                nodes.append([
                    r * np.sin(phi) * np.cos(th),
                    r * np.sin(phi) * np.sin(th),
                    -a_long * r * np.cos(phi),
                ])
    # apex cap ring: one extra layer of points on the axis per radius
    cap_start = len(nodes)
    for r in radii:
        nodes.append([0.0, 0.0, -a_long * r])
    nodes = np.asarray(nodes)

    def nid(i, j, k):
        return (i % nn_c) + j * nn_c + k * nn_c * nn_r

    cells = []
    for k in range(nn_l - 1):
        for j in range(ne_r):
            for i in range(ne_c):
                cells.append([
                    nid(i, j, k), nid(i, j + 1, k),
                    nid(i + 1, j + 1, k), nid(i + 1, j, k),
                    nid(i, j, k + 1), nid(i, j + 1, k + 1),
                    nid(i + 1, j + 1, k + 1), nid(i + 1, j, k + 1),
                ])
    # apex plug: wedges collapsed to hexes connecting first phi-ring to pole
    for j in range(ne_r):
        for i in range(ne_c):
            p0, p1 = cap_start + j, cap_start + j + 1
            cells.append([
                p0, p0, nid(i + 1, j, 0), nid(i, j, 0),
                p1, p1, nid(i + 1, j + 1, 0), nid(i, j + 1, 0),
            ])
    mesh = Mesh(nodes, [ElementBlock("hex8", np.asarray(cells, np.int32))])
    b = mesh.blocks[0]
    fsets = {"Endocardium": [], "Epicardium": [], "Base": []}
    rin, rout = inner_radius, outer_radius
    for gc, lf in mesh.boundary_facets():
        fac = b.element.facets[lf]
        pts = nodes[b.connectivity[gc, list(fac)]]
        # normalized ellipsoidal radius
        rho = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2 + (pts[:, 2] / a_long) ** 2)
        if pts[:, 2].min() > longitudinal_upper - 1e-9:
            fsets["Base"].append((gc, lf))
        elif np.allclose(rho, rin, atol=1e-6):
            fsets["Endocardium"].append((gc, lf))
        elif np.allclose(rho, rout, atol=1e-6):
            fsets["Epicardium"].append((gc, lf))
    mesh.facetsets = {k: np.asarray(v, np.int64) for k, v in fsets.items() if v}
    mesh.cellsets["Myocardium"] = np.arange(mesh.ncells, dtype=np.int64)
    mesh.nodesets["Apex"] = np.array([cap_start + nn_r - 1], dtype=np.int64)
    # basal anchor nodes for rigid-body-mode suppression in contraction
    # solves (parity: generators.jl:595-598)
    kb = nn_l - 1
    mesh.nodesets["MyocardialAnchor1"] = np.array([nid(0, 0, kb)])
    mesh.nodesets["MyocardialAnchor2"] = np.array([nid(0, nn_r - 1, kb)])
    mesh.nodesets["MyocardialAnchor3"] = np.array(
        [nid(int(np.ceil(nn_c / 4)), 0, kb)])
    mesh.nodesets["MyocardialAnchor4"] = np.array(
        [nid(int(np.ceil(3 * nn_c / 4)), 0, kb)])
    for k in mesh.facetsets:
        mesh.nodesets[k] = mesh.nodes_of_facetset(k)
    return mesh


def generate_ideal_lv_mesh_hex(*args, **kw) -> Mesh:
    """All-hexahedron ideal LV (parity: ``generate_ideal_lv_mesh_hex``,
    ``generators.jl:769``). Our ``generate_ideal_lv_mesh`` already closes
    the apex with collapsed hexes instead of wedges, so the two reference
    entry points coincide here."""
    return generate_ideal_lv_mesh(*args, **kw)


def generate_quadratic_ring_mesh(*args, **kw):
    """Quadratic (hex27) ring — parity: ``generators.jl:251``."""
    return elevate_to_quadratic(generate_ring_mesh(*args, **kw))


def generate_quadratic_open_ring_mesh(*args, **kw):
    """Quadratic (hex27-family) open ring (``generators.jl:384``)."""
    return elevate_to_quadratic(generate_open_ring_mesh(*args, **kw))


def generate_quadratic_ideal_lv_mesh(*args, **kw):
    """Quadratic (hex27) idealized LV — parity: ``generators.jl:384``."""
    return elevate_to_quadratic(generate_ideal_lv_mesh(*args, **kw))
