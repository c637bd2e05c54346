"""Reference element library (host side, numpy, setup time only).

The TPU-native analog of Ferrite's interpolations + the reference's
``LagrangeCollection`` dispatch tables (reference:
``src/ferrite-addons/collections.jl:48-113``) and the vendored isbits
``StaticInterpolationValues`` shape tables
(``src/ferrite-addons/PR883.jl:190-315``): every element type exposes
*static* shape-function / gradient tables evaluated at quadrature points.
These tables become compile-time constants inside jitted element kernels —
no per-cell ``reinit!`` exists; Jacobians are computed in-kernel from
gathered node coordinates.

Supported cell types mirror the set the reference handles
(``src/mesh/meshes.jl`` LinearCellGeometry): P1/P2 Lagrange on line,
triangle, quadrilateral, tetrahedron, hexahedron, wedge, plus the linear
rational pyramid. Node orderings follow VTK so VTU export is a direct dump.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field
from functools import lru_cache


# ----------------------------------------------------------------------------
# 1D Lagrange bases on [-1, 1]
# ----------------------------------------------------------------------------

def _lag1(x):
    """Linear 1D Lagrange at nodes (-1, +1): values [n_nodes] per point."""
    x = np.asarray(x, dtype=np.float64)
    return np.stack([(1 - x) / 2, (1 + x) / 2], axis=-1)


def _dlag1(x):
    x = np.asarray(x, dtype=np.float64)
    o = np.ones_like(x)
    return np.stack([-o / 2, o / 2], axis=-1)


def _lag2(x):
    """Quadratic 1D Lagrange at nodes (-1, +1, 0) — endpoint-first (VTK)."""
    x = np.asarray(x, dtype=np.float64)
    return np.stack([x * (x - 1) / 2, x * (x + 1) / 2, 1 - x * x], axis=-1)


def _dlag2(x):
    x = np.asarray(x, dtype=np.float64)
    return np.stack([x - 0.5, x + 0.5, -2 * x], axis=-1)


_LAG = {1: (_lag1, _dlag1), 2: (_lag2, _dlag2)}


@dataclass(frozen=True)
class ReferenceElement:
    """A reference element: node locations, shape functions, topology.

    Attributes:
      name: canonical cell type string (e.g. "quad4").
      dim: reference (topological) dimension.
      nnodes: number of nodes / P-Lagrange basis functions.
      order: polynomial order (1 or 2).
      ref_nodes: [nnodes, dim] reference coordinates of the nodes.
      vertices: indices of the corner nodes (the P1 sub-element).
      edges: tuple of local node-index pairs (corner pairs) — used for P2
        dof distribution and uniform refinement.
      facets: tuple of local corner-node tuples per facet, ordered so the
        right-hand rule gives the outward normal (3D) / CCW boundary (2D).
      facet_ref: for each facet a (origin, axes) pair mapping facet reference
        coordinates into cell reference coordinates (filled for P1 geometry).
      interior_faces: for hex27: quad face corner tuples (dof distribution).
      vtk_type: VTK cell type id for IO.
    """

    name: str
    dim: int
    order: int
    ref_nodes: np.ndarray
    vertices: tuple
    edges: tuple
    facets: tuple
    vtk_type: int
    faces: tuple = ()  # 2D sub-faces of 3D cells used for dof placement (hex27)
    has_center_node: bool = False

    @property
    def nnodes(self):
        return self.ref_nodes.shape[0]

    def shape(self, xi):
        """N[..., nnodes] at reference points xi[..., dim]."""
        raise NotImplementedError

    def grad(self, xi):
        """dN/dxi[..., nnodes, dim]."""
        raise NotImplementedError


# ----------------------------------------------------------------------------
# Tensor-product elements (line / quad / hex)
# ----------------------------------------------------------------------------

class TensorElement(ReferenceElement):
    """Tensor-product Lagrange element. Nodes identified by 1D index tuples."""

    def __init__(self, name, dim, order, node_1d_idx, **kw):
        # node_1d_idx: [nnodes, dim] of indices into the 1D node set.
        nodes_1d = {1: np.array([-1.0, 1.0]), 2: np.array([-1.0, 1.0, 0.0])}[order]
        idx = np.asarray(node_1d_idx, dtype=np.int64)
        ref_nodes = nodes_1d[idx]
        object.__setattr__(self, "_idx", idx)
        super().__init__(name=name, dim=dim, order=order, ref_nodes=ref_nodes, **kw)

    def shape(self, xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        f = _LAG[self.order][0]
        vals = [f(xi[..., d]) for d in range(self.dim)]  # each [..., n1d]
        out = np.ones(xi.shape[:-1] + (self.nnodes,))
        for i in range(self.nnodes):
            for d in range(self.dim):
                out[..., i] = out[..., i] * vals[d][..., self._idx[i, d]]
        return out

    def grad(self, xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        f, df = _LAG[self.order]
        vals = [f(xi[..., d]) for d in range(self.dim)]
        dvals = [df(xi[..., d]) for d in range(self.dim)]
        out = np.zeros(xi.shape[:-1] + (self.nnodes, self.dim))
        for i in range(self.nnodes):
            for gd in range(self.dim):
                term = np.ones(xi.shape[:-1])
                for d in range(self.dim):
                    tab = dvals[d] if d == gd else vals[d]
                    term = term * tab[..., self._idx[i, d]]
                out[..., i, gd] = term
        return out


# ----------------------------------------------------------------------------
# Simplex elements (tri / tet)
# ----------------------------------------------------------------------------

class SimplexElement(ReferenceElement):
    """P1/P2 Lagrange simplex using barycentric coordinates."""

    def _bary(self, xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        lam0 = 1.0 - xi.sum(axis=-1)
        return np.concatenate([lam0[..., None], xi], axis=-1)  # [..., dim+1]

    def _dbary(self):
        d = self.dim
        out = np.zeros((d + 1, d))
        out[0, :] = -1.0
        out[1:, :] = np.eye(d)
        return out  # [dim+1, dim]

    def __init__(self, name, dim, order, edge_pairs=(), **kw):
        nv = dim + 1
        corners = np.vstack([np.zeros(dim), np.eye(dim)])
        if order == 1:
            ref_nodes = corners
        else:
            mids = np.array([(corners[a] + corners[b]) / 2 for a, b in edge_pairs])
            ref_nodes = np.vstack([corners, mids])
        object.__setattr__(self, "_edge_pairs", tuple(edge_pairs))
        super().__init__(name=name, dim=dim, order=order, ref_nodes=ref_nodes, **kw)

    def shape(self, xi):
        lam = self._bary(xi)
        nv = self.dim + 1
        if self.order == 1:
            return lam
        corner = lam[..., :nv] * (2 * lam[..., :nv] - 1)
        mids = np.stack(
            [4 * lam[..., a] * lam[..., b] for a, b in self._edge_pairs], axis=-1
        )
        return np.concatenate([corner, mids], axis=-1)

    def grad(self, xi):
        lam = self._bary(xi)
        dlam = self._dbary()  # [nv, dim]
        nv = self.dim + 1
        if self.order == 1:
            return np.broadcast_to(dlam, lam.shape[:-1] + dlam.shape).copy()
        out = np.zeros(lam.shape[:-1] + (self.nnodes, self.dim))
        for i in range(nv):
            out[..., i, :] = (4 * lam[..., i, None] - 1) * dlam[i]
        for k, (a, b) in enumerate(self._edge_pairs):
            out[..., nv + k, :] = 4 * (
                lam[..., a, None] * dlam[b] + lam[..., b, None] * dlam[a]
            )
        return out


# ----------------------------------------------------------------------------
# Wedge (triangular prism): simplex (x,y) x tensor (z)
# ----------------------------------------------------------------------------

class WedgeElement(ReferenceElement):
    """P1/P2 Lagrange prism: tri(x, y) ⊗ line(z on [0, 1]).

    Parity: the reference's cell-geometry union includes ``Wedge``
    (``src/mesh/meshes.jl:15-16``; its ideal-LV generator emits wedge apex
    cells, ``generators.jl:584``). Node ordering is VTK: wedge6 = bottom
    triangle then top; wedge18 (VTK 32, biquadratic-quadratic wedge) adds
    9 edge midpoints (bottom, top, vertical) and the 3 side-face centers —
    exactly the tri6 ⊗ line3 tensor basis, so shape functions are plain
    products."""

    def __init__(self, name, order, **kw):
        # (tri node index, z level index) per node; z levels [0, 1, 1/2]
        if order == 1:
            pairs = [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)]
        else:
            pairs = (
                [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)] +
                [(3, 0), (4, 0), (5, 0)] +     # bottom edge mids
                [(3, 1), (4, 1), (5, 1)] +     # top edge mids
                [(0, 2), (1, 2), (2, 2)] +     # vertical edge mids
                [(3, 2), (4, 2), (5, 2)])      # side face centers
        tri_nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                              [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
        z_nodes = np.array([0.0, 1.0, 0.5])
        ref_nodes = np.array([[*tri_nodes[t], z_nodes[z]]
                              for t, z in pairs])
        object.__setattr__(self, "_pairs", tuple(pairs))
        super().__init__(name=name, dim=3, order=order,
                         ref_nodes=ref_nodes, **kw)

    def _tri_tabs(self, xy):
        lam0 = 1.0 - xy[..., 0] - xy[..., 1]
        lam = np.stack([lam0, xy[..., 0], xy[..., 1]], axis=-1)
        dlam = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        if self.order == 1:
            N = lam
            dN = np.broadcast_to(dlam, lam.shape[:-1] + (3, 2)).copy()
            return N, dN
        pairs = ((0, 1), (1, 2), (2, 0))
        N = np.concatenate(
            [lam * (2 * lam - 1)] +
            [4 * (lam[..., a] * lam[..., b])[..., None] for a, b in pairs],
            axis=-1)
        dN = np.zeros(lam.shape[:-1] + (6, 2))
        for i in range(3):
            dN[..., i, :] = (4 * lam[..., i, None] - 1) * dlam[i]
        for k, (a, b) in enumerate(pairs):
            dN[..., 3 + k, :] = 4 * (lam[..., a, None] * dlam[b] +
                                     lam[..., b, None] * dlam[a])
        return N, dN

    def _z_tabs(self, z):
        if self.order == 1:
            N = np.stack([1.0 - z, z], axis=-1)
            dN = np.stack([-np.ones_like(z), np.ones_like(z)], axis=-1)
            return N, dN
        N = np.stack([(1 - z) * (1 - 2 * z), z * (2 * z - 1),
                      4 * z * (1 - z)], axis=-1)
        dN = np.stack([4 * z - 3, 4 * z - 1, 4 - 8 * z], axis=-1)
        return N, dN

    def shape(self, xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        Nt, _ = self._tri_tabs(xi[..., :2])
        Nz, _ = self._z_tabs(xi[..., 2])
        return np.stack([Nt[..., t] * Nz[..., z]
                         for t, z in self._pairs], axis=-1)

    def grad(self, xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        Nt, dNt = self._tri_tabs(xi[..., :2])
        Nz, dNz = self._z_tabs(xi[..., 2])
        out = np.zeros(xi.shape[:-1] + (self.nnodes, 3))
        for i, (t, z) in enumerate(self._pairs):
            out[..., i, 0] = dNt[..., t, 0] * Nz[..., z]
            out[..., i, 1] = dNt[..., t, 1] * Nz[..., z]
            out[..., i, 2] = Nt[..., t] * dNz[..., z]
        return out


# ----------------------------------------------------------------------------
# Pyramid: rational P1 basis (quad base x apex)
# ----------------------------------------------------------------------------

class PyramidElement(ReferenceElement):
    """Linear pyramid (VTK 14) with the standard rational basis.

    Parity: the reference's cell-geometry union includes ``Pyramid``
    (``src/mesh/meshes.jl:15-16``) and its MFEM loader emits pyramids
    (``src/mesh/tools.jl:545``). Reference element: base [-1,1]^2 at
    zeta=0 (CCW), apex (0,0,1). With u = 1-zeta the basis is

        N_i = (u -+ xi)(u -+ eta) / (4u)   (base corners),   N_4 = zeta.

    Rational, but every facet trace is polynomial: the base trace is the
    quad4 bilinear basis and each side trace is the tri3 affine basis, so
    pyramids conform with hex and tet neighbors and the generic facet
    machinery applies unchanged. Quadrature points never hit the apex;
    nodal evaluation clamps u (xi*eta = 0 on the apex line keeps values
    and gradients finite there)."""

    def __init__(self, **kw):
        ref_nodes = np.array([
            [-1.0, -1.0, 0.0], [1.0, -1.0, 0.0],
            [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0],
            [0.0, 0.0, 1.0]])
        super().__init__(name="pyramid5", dim=3, order=1,
                         ref_nodes=ref_nodes, **kw)

    @staticmethod
    def _split(xi):
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        x, y, z = xi[..., 0], xi[..., 1], xi[..., 2]
        u = np.maximum(1.0 - z, 1e-12)
        return x, y, z, u

    def shape(self, xi):
        x, y, z, u = self._split(xi)
        return np.stack([
            (u - x) * (u - y) / (4 * u),
            (u + x) * (u - y) / (4 * u),
            (u + x) * (u + y) / (4 * u),
            (u - x) * (u + y) / (4 * u),
            z], axis=-1)

    def grad(self, xi):
        x, y, z, u = self._split(xi)
        out = np.zeros(x.shape + (5, 3))
        r = x * y / (u * u)
        out[..., 0, :] = np.stack(
            [-(u - y) / (4 * u), -(u - x) / (4 * u), -(1 - r) / 4], axis=-1)
        out[..., 1, :] = np.stack(
            [(u - y) / (4 * u), -(u + x) / (4 * u), -(1 + r) / 4], axis=-1)
        out[..., 2, :] = np.stack(
            [(u + y) / (4 * u), (u + x) / (4 * u), -(1 - r) / 4], axis=-1)
        out[..., 3, :] = np.stack(
            [-(u + y) / (4 * u), (u - x) / (4 * u), -(1 + r) / 4], axis=-1)
        out[..., 4, 2] = 1.0
        return out


# ----------------------------------------------------------------------------
# Catalog
# ----------------------------------------------------------------------------

def _build_catalog():
    cat = {}

    # --- line ---
    cat["line2"] = TensorElement(
        "line2", 1, 1, [[0], [1]],
        vertices=(0, 1), edges=((0, 1),), facets=((0,), (1,)), vtk_type=3,
    )
    cat["line3"] = TensorElement(
        "line3", 1, 2, [[0], [1], [2]],
        vertices=(0, 1), edges=((0, 1),), facets=((0,), (1,)), vtk_type=21,
    )

    # --- quad: corners CCW, then edge mids (bottom,right,top,left), center ---
    quad_corners = [[0, 0], [1, 0], [1, 1], [0, 1]]
    quad_edges = ((0, 1), (1, 2), (2, 3), (3, 0))
    quad_facets = quad_edges
    cat["quad4"] = TensorElement(
        "quad4", 2, 1, quad_corners,
        vertices=(0, 1, 2, 3), edges=quad_edges, facets=quad_facets, vtk_type=9,
    )
    quad9_idx = quad_corners + [[2, 0], [1, 2], [2, 1], [0, 2], [2, 2]]
    cat["quad9"] = TensorElement(
        "quad9", 2, 2, quad9_idx,
        vertices=(0, 1, 2, 3), edges=quad_edges, facets=quad_facets, vtk_type=28,
        has_center_node=True,
    )

    # --- triangle ---
    tri_edges = ((0, 1), (1, 2), (2, 0))
    cat["tri3"] = SimplexElement(
        "tri3", 2, 1,
        vertices=(0, 1, 2), edges=tri_edges, facets=tri_edges, vtk_type=5,
    )
    cat["tri6"] = SimplexElement(
        "tri6", 2, 2, edge_pairs=tri_edges,
        vertices=(0, 1, 2), edges=tri_edges, facets=tri_edges, vtk_type=22,
    )

    # --- tetrahedron (VTK node/edge ordering) ---
    tet_edges = ((0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3))
    # facets ordered for outward normals on the reference tet
    tet_facets = ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2))
    cat["tet4"] = SimplexElement(
        "tet4", 3, 1,
        vertices=(0, 1, 2, 3), edges=tet_edges, facets=tet_facets, vtk_type=10,
    )
    cat["tet10"] = SimplexElement(
        "tet10", 3, 2, edge_pairs=tet_edges,
        vertices=(0, 1, 2, 3), edges=tet_edges, facets=tet_facets, vtk_type=24,
    )

    # --- hexahedron: VTK corners (bottom CCW then top CCW) ---
    hex_corners = [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ]
    # VTK hexahedron edge ordering (bottom 4, top 4, vertical 4)
    hex_edges = (
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    )
    # outward-normal facet ordering (bottom, front, right, back, left, top)
    hex_facets = (
        (0, 3, 2, 1), (0, 1, 5, 4), (1, 2, 6, 5),
        (2, 3, 7, 6), (0, 4, 7, 3), (4, 5, 6, 7),
    )
    cat["hex8"] = TensorElement(
        "hex8", 3, 1, hex_corners,
        vertices=tuple(range(8)), edges=hex_edges, facets=hex_facets, vtk_type=12,
    )
    # VTK triquadratic hex (type 29): 8 corners, 12 edge mids (VTK edge order),
    # 6 face centers in order (x-,x+,y-,y+,z-,z+), then body center.
    hex27_idx = list(hex_corners)
    for a, b in hex_edges:
        hex27_idx.append([
            2 if hex_corners[a][d] != hex_corners[b][d] else hex_corners[a][d]
            for d in range(3)
        ])
    vtk_hex_faces = (
        (0, 4, 7, 3), (1, 2, 6, 5),  # x-, x+
        (0, 1, 5, 4), (2, 3, 7, 6),  # y-, y+
        (0, 3, 2, 1), (4, 5, 6, 7),  # z-, z+
    )
    _face_1didx = {
        (0, 4, 7, 3): [0, 2, 2], (1, 2, 6, 5): [1, 2, 2],
        (0, 1, 5, 4): [2, 0, 2], (2, 3, 7, 6): [2, 1, 2],
        (0, 3, 2, 1): [2, 2, 0], (4, 5, 6, 7): [2, 2, 1],
    }
    for f in vtk_hex_faces:
        hex27_idx.append(_face_1didx[f])
    hex27_idx.append([2, 2, 2])
    cat["hex27"] = TensorElement(
        "hex27", 3, 2, hex27_idx,
        vertices=tuple(range(8)), edges=hex_edges, facets=hex_facets, vtk_type=29,
        faces=vtk_hex_faces, has_center_node=True,
    )

    # --- wedge / prism (VTK 13 / 32): bottom tri, top tri, sides ---
    wedge_edges = (
        (0, 1), (1, 2), (2, 0),        # bottom
        (3, 4), (4, 5), (5, 3),        # top
        (0, 3), (1, 4), (2, 5),        # vertical
    )
    # outward-normal ordering: bottom (-z), top (+z), three sides
    wedge_facets = (
        (0, 2, 1), (3, 4, 5),
        (0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5),
    )
    wedge_faces = ((0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5))
    cat["wedge6"] = WedgeElement(
        "wedge6", 1,
        vertices=tuple(range(6)), edges=wedge_edges, facets=wedge_facets,
        vtk_type=13,
    )
    cat["wedge18"] = WedgeElement(
        "wedge18", 2,
        vertices=tuple(range(6)), edges=wedge_edges, facets=wedge_facets,
        vtk_type=32, faces=wedge_faces,
    )

    # --- pyramid (VTK 14): quad base CCW, then apex ---
    cat["pyramid5"] = PyramidElement(
        vertices=tuple(range(5)),
        edges=((0, 1), (1, 2), (2, 3), (3, 0),
               (0, 4), (1, 4), (2, 4), (3, 4)),
        # outward-normal ordering: base (-z), then four sides
        facets=((0, 3, 2, 1),
                (0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)),
        vtk_type=14,
    )
    return cat


_CATALOG = _build_catalog()


def get_element(name: str) -> ReferenceElement:
    return _CATALOG[name]


def element_names():
    return tuple(_CATALOG.keys())


#: map cell type -> its P1 geometric sub-element (corner nodes carry geometry
#: for affine meshes; quadratic geometry uses the full element).
P1_OF = {
    "line2": "line2", "line3": "line2",
    "tri3": "tri3", "tri6": "tri3",
    "quad4": "quad4", "quad9": "quad4",
    "tet4": "tet4", "tet10": "tet4",
    "hex8": "hex8", "hex27": "hex8",
    "wedge6": "wedge6", "wedge18": "wedge6",
    "pyramid5": "pyramid5",
}

#: facet cell type of each cell type (for surface quadrature / IO);
#: wedges have MIXED facets — use ``facet_type(el, lf)`` for those
FACET_TYPE = {
    "line2": None, "line3": None,
    "tri3": "line2", "tri6": "line3",
    "quad4": "line2", "quad9": "line3",
    "tet4": "tri3", "tet10": "tri6",
    "hex8": "quad4", "hex27": "quad9",
}

_MIXED_FACET_TYPES = {
    "wedge6": ("tri3", "tri3", "quad4", "quad4", "quad4"),
    "wedge18": ("tri6", "tri6", "quad9", "quad9", "quad9"),
    "pyramid5": ("quad4", "tri3", "tri3", "tri3", "tri3"),
}


def facet_type(el, local_facet: int) -> str:
    """Facet cell type of ``el``'s ``local_facet`` — per-facet aware
    (wedges and pyramids mix triangles and quadrilaterals)."""
    if el.name in _MIXED_FACET_TYPES:
        return _MIXED_FACET_TYPES[el.name][local_facet]
    return FACET_TYPE[el.name]
