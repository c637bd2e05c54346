"""Generalized coordinate systems: Cartesian, LV, BiV, cell-index.

Parity: ``src/modeling/core/coordinate_systems.jl`` —
``CartesianCoordinateSystem`` (``:43``), ``LVCoordinateSystem``/
``LVCoordinate`` (transmural/apicobasal/rotational, ``:89,111``),
``CellIndexCoordinateSystem`` (``:74``), ``BiVCoordinateSystem`` (``:1079``),
built by solving Laplace problems on the mesh (``_assemble_laplacian``
``:145``, ``compute_lv_coordinate_system`` ``:886``,
``apicobasal_from_laplace`` ``:255``).

TPU-native: the Laplace solves reuse the assembled ELL operator + CG; the
resulting coordinates are *nodal arrays* interpolated into quadrature points
with the geometric shape tables (a FieldCoefficient in the reference's
vocabulary).
"""

from __future__ import annotations

from collections import namedtuple

from dataclasses import dataclass, field as dfield
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_diffusion, scatter_matrix)
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
from thunderbolt_tpu.fem.constraints import Dirichlet, close_constraints
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner


# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CartesianCoordinateSystem:
    """The identity coordinate system (``coordinate_systems.jl:43``)."""

    def at_qps(self, batch):
        return batch.xq

    def at_dofs(self, coords):
        return coords


@dataclass(frozen=True)
class CellIndexCoordinateSystem:
    """Hands models the (global) cell index (``coordinate_systems.jl:74``)."""

    def at_qps(self, batch):
        nc, nqp = batch.xq.shape[:2]
        return jnp.broadcast_to(batch.cells[:, None, None].astype(batch.xq.dtype),
                                (nc, nqp, 1))


def _unit(v):
    """Normalize along the last axis with a zero-safe floor."""
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


class NodalCoordinateSystem:
    """Base for coordinate systems stored as per-mesh-node arrays.

    `nodal` is a dict name -> [nnodes] array; interpolation into batches
    uses the geometric basis. Subclasses define `component_names`."""

    component_names = ()

    def __init__(self, mesh: Mesh, nodal: Dict[str, np.ndarray], axis=None):
        self.mesh = mesh
        self.nodal = {k: np.asarray(v) for k, v in nodal.items()}
        #: apex->base unit vector (the anatomical long axis); set by builders
        self.axis = None if axis is None else np.asarray(axis, float)

    def stacked(self):
        return np.stack([self.nodal[k] for k in self.component_names], axis=-1)

    def at_qps(self, batch):
        """[nc, nqp, ncomp] generalized coordinates at quadrature points.

        Periodic components ("rotational", values in [-pi, pi]) are
        unwrapped PER CELL before interpolation: each cell's nodal angles
        are shifted by +-2pi into the branch of the cell's first node, so
        cells straddling the theta = +-pi seam interpolate correctly. This
        is the TPU-native equivalent of the reference's per-cell
        DiscontinuousLagrange rotational dofs
        (``coordinate_systems.jl:903,985``) — same seam-safe semantics,
        dense gather + einsum instead of a discontinuous dof layout."""
        data = self.stacked()  # [nnodes, ncomp]
        # gather through the *geometry* connectivity of the batch's block
        conn = self._batch_conn(batch)
        loc = data[conn]  # [nc, nbg, ncomp] (fancy-index copy: safe to edit)
        periodic = [k for k, n in enumerate(self.component_names)
                    if n == "rotational"]
        for k in periodic:
            th = loc[..., k]
            ref = th[:, :1]
            loc[..., k] = ref + np.mod(th - ref + np.pi, 2 * np.pi) - np.pi
        Ngeo = np.asarray(batch.Ngeo)
        out = np.einsum("qb,cbk->cqk", Ngeo, loc)
        for k in periodic:   # wrap interpolants back into [-pi, pi]
            out[..., k] = np.mod(out[..., k] + np.pi, 2 * np.pi) - np.pi
        return jnp.asarray(out, batch.xq.dtype)

    def _batch_conn(self, batch):
        # locate the element block by cell ids
        cells = np.asarray(batch.cells)
        bi, lc0 = self.mesh.block_of_cell(int(cells[0]))
        block = self.mesh.blocks[bi]
        return block.connectivity[cells - block.cell_offset]

    def axes_at_qps(self, batch):
        """Local coordinate axes (transmural, apicobasal, rotational) unit
        vectors at quadrature points, from the GRADIENTS of the stored
        transmural/apicobasal fields (parity: ``_local_axes`` +
        ``setup_coordinate_axes_cache``, ``coordinate_systems.jl:13-35``):
        the transmural direction is taken as given, the apicobasal one is
        orthogonalized against it, and the rotational direction is their
        cross product — NOT grad(rotational), whose seam jump makes it
        unusable exactly where the other two are fine.

        Correct on arbitrary (patient) geometries, unlike the idealized
        radial-proxy fallback. Returns three [nc, nqp, sdim] arrays."""
        names = self.component_names
        if "transmural" not in names or "apicobasal" not in names:
            raise ValueError(
                "coordinate system lacks transmural/apicobasal fields")
        conn = self._batch_conn(batch)
        dNgeo = np.asarray(batch.dNgeo)          # [nqp, nbg, rdim]
        Xe = np.asarray(batch.Xe)                # [nc, nbg, sdim]
        J = np.einsum("qbr,cbs->cqsr", dNgeo, Xe)
        dNdx = np.einsum("qbr,cqrs->cqbs", dNgeo, np.linalg.inv(J))
        tg = np.einsum("cqbs,cb->cqs", dNdx,
                       np.asarray(self.nodal["transmural"])[conn])
        ag = np.einsum("cqbs,cb->cqs", dNdx,
                       np.asarray(self.nodal["apicobasal"])[conn])
        t_hat = _unit(tg)
        ab = _unit(ag)
        ab = _unit(ab - np.sum(ab * t_hat, axis=-1, keepdims=True) * t_hat)
        return t_hat, ab, _unit(np.cross(t_hat, ab))


    def at_dofs(self, coords):
        """Generalized coordinates at arbitrary points given as the dof
        coordinates — nearest-node lookup (dof sites coincide with nodes for
        isoparametric fields)."""
        from scipy.spatial import cKDTree  # scipy ships with the image
        tree = cKDTree(self.mesh.nodes)
        _, idx = tree.query(coords)
        return self.stacked()[idx]


#: gradient-based local frame (parity: ``LocalCoordinateAxes``,
#: ``coordinate_systems.jl:13``)
LocalCoordinateAxes = namedtuple(
    "LocalCoordinateAxes", ["transmural", "apicobasal", "rotational"])


def evaluate_coordinate_axes(coordinate_system, batch) -> LocalCoordinateAxes:
    """Functional form of ``NodalCoordinateSystem.axes_at_qps`` (parity:
    ``evaluate_coordinate_axes``, ``coordinate_systems.jl``)."""
    t, ab, rot = coordinate_system.axes_at_qps(batch)
    return LocalCoordinateAxes(t, ab, rot)


class LVCoordinateSystem(NodalCoordinateSystem):
    """(transmural, apicobasal, rotational) ventricular coordinates
    (``coordinate_systems.jl:89``)."""

    component_names = ("transmural", "apicobasal", "rotational")


class BiVCoordinateSystem(NodalCoordinateSystem):
    """(transmural, apicobasal, rotational, transventricular)
    (``coordinate_systems.jl:1079``)."""

    component_names = ("transmural", "apicobasal", "rotational",
                       "transventricular")


# ---------------------------------------------------------------------------
# Laplace solves
# ---------------------------------------------------------------------------


def solve_laplace_nodal(mesh: Mesh, dbcs, order=None, rtol=1e-8,
                        atol=1e-10) -> np.ndarray:
    """Solve div(grad u) = 0 with Dirichlet specs; return mesh-node-ordered
    values (the reference's ``_assemble_laplacian`` + solve,
    ``coordinate_systems.jl:145``)."""
    if order is None:
        order = mesh.blocks[0].element.order
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    dh = DofHandler(mesh).add_field("u", order=order).close()
    subs = dh.subdofs
    pattern = build_sparsity([s.cell_dofs for s in subs], dh.ndofs)
    kvals = jnp.zeros(pattern.nnz, jnp.float64)
    for s, em in zip(subs, pattern.elem_maps):
        batch = make_form_batch(dh, s, dtype=jnp.float64)
        Ke = element_diffusion(batch, D=1.0)
        kvals = kvals + scatter_matrix(Ke, jnp.asarray(em), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kvals)
    ch = close_constraints(dh, dbcs, dtype=jnp.float64)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, jnp.zeros(dh.ndofs, jnp.float64))
    x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                 rtol=rtol, atol=atol, maxiter=5000)
    if not bool(info.converged):
        raise RuntimeError(f"Laplace solve did not converge: {info}")
    fi = dh.fields["u"]
    out = np.full(mesh.nnodes, np.nan)
    mask = fi.entity_nodes >= 0
    out[fi.entity_nodes[mask]] = np.asarray(x)[mask]
    return out


def compute_long_axis(mesh: Mesh):
    """Apex->base unit vector. Uses the Base facetset + Apex nodeset when
    present (generated LV meshes), else the dominant PCA axis
    (parity: ``src/mesh/long_axis.jl``)."""
    if "Base" in mesh.facetsets and "Apex" in mesh.nodesets:
        base_c = mesh.nodes[mesh.nodes_of_facetset("Base")].mean(axis=0)
        apex = mesh.nodes[mesh.nodeset("Apex")].mean(axis=0)
        v = base_c - apex
        return v / np.linalg.norm(v), apex, base_c
    x = mesh.nodes - mesh.nodes.mean(axis=0)
    _, _, Vt = np.linalg.svd(x, full_matrices=False)
    v = Vt[0]
    lo = mesh.nodes[np.argmin(mesh.nodes @ v)]
    hi = mesh.nodes[np.argmax(mesh.nodes @ v)]
    return v, lo, hi


def fit_basal_plane(mesh: Mesh, facetset: str = "Base"):
    """Least-squares plane through the basal nodes: (point, unit normal),
    normal oriented away from the apex (parity: ``fit_basal_plane``,
    ``src/mesh/long_axis.jl``). Falls back to the PCA long-axis extreme
    when the facetset is absent."""
    if facetset in mesh.facetsets:
        pts = mesh.nodes[mesh.nodes_of_facetset(facetset)]
    else:
        axis, _, hi = compute_long_axis(mesh)
        proj = mesh.nodes @ axis
        pts = mesh.nodes[proj >= proj.max() - 1e-8 * max(np.ptp(proj), 1.0)]
    c = pts.mean(axis=0)
    _, _, Vt = np.linalg.svd(pts - c, full_matrices=False)
    n = Vt[-1]
    axis, apex, _ = compute_long_axis(mesh)
    if n @ (c - apex) < 0.0:
        n = -n
    return c, n / np.linalg.norm(n)


@dataclass(frozen=True)
class LVAxes:
    """Anatomical frame of a left ventricle (``heart_axes.jl:23-42``):
    ``longitudinal`` is the apex->base unit long axis; ``lateral`` and
    ``anteroposterior`` complete a right-handed orthonormal frame
    (anteroposterior = longitudinal x lateral); ``apex``/``base_center``
    pin the axis line in space. On rotationally symmetric idealized
    meshes, ``lateral`` is set by discretization noise, not anatomy."""
    longitudinal: np.ndarray
    lateral: np.ndarray
    anteroposterior: np.ndarray
    apex: np.ndarray
    base_center: np.ndarray

    @staticmethod
    def from_directions(longitudinal, lateral, apex, base_center):
        l = np.asarray(longitudinal, float)
        l = l / np.linalg.norm(l)
        r = np.asarray(lateral, float) - (np.asarray(lateral, float) @ l) * l
        nr = np.linalg.norm(r)
        if nr < 1e-8:
            raise ValueError("LVAxes: lateral must not be collinear with "
                             "longitudinal")
        r = r / nr
        return LVAxes(l, r, np.cross(l, r), np.asarray(apex, float),
                      np.asarray(base_center, float))


def _principal_short_axis(points, centroid, longitudinal):
    """Dominant direction of the node cloud with the long axis projected
    out; cardinal fallback on degeneracy (``heart_axes.jl:92-114``)."""
    d = points - centroid
    d = d - np.outer(d @ longitudinal, longitudinal)
    cov = d.T @ d
    w, V = np.linalg.eigh(cov)
    cand = V[:, np.argmax(w)]
    cand = cand - (cand @ longitudinal) * longitudinal
    if np.linalg.norm(cand) < 1e-8:
        fallback = np.array([1.0, 0.0, 0.0]) \
            if abs(longitudinal[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        cand = fallback - (fallback @ longitudinal) * longitudinal
    return cand / np.linalg.norm(cand)


def compute_lv_axes(mesh: Mesh, base: str = "Base", apex: str = None) \
        -> LVAxes:
    """Derive the LV anatomical frame from the mesh geometry
    (``compute_lv_axes``, ``heart_axes.jl:139-185``): the basal plane is
    the total-least-squares fit through the ``base`` facetset nodes
    (normal oriented away from the bulk); the apex is the ``apex``
    nodeset's centroid when given, else the node farthest below that
    plane; the lateral axis comes from short-axis PCA."""
    coords = mesh.nodes
    if base not in mesh.facetsets:
        raise ValueError(f"compute_lv_axes: facetset {base!r} not found")
    base_pts = coords[mesh.nodes_of_facetset(base)]
    base_center = base_pts.mean(axis=0)
    _, _, Vt = np.linalg.svd(base_pts - base_center, full_matrices=False)
    normal = Vt[-1]
    centroid = coords.mean(axis=0)
    if (base_center - centroid) @ normal < 0.0:
        normal = -normal
    if apex is not None:
        apex_point = coords[mesh.nodeset(apex)].mean(axis=0)
    else:
        apex_point = coords[np.argmin((coords - base_center) @ normal)]
    longitudinal = base_center - apex_point
    nl = np.linalg.norm(longitudinal)
    if nl < 1e-12:
        raise ValueError("compute_lv_axes: apex and base center coincide")
    longitudinal = longitudinal / nl
    lateral = _principal_short_axis(coords, centroid, longitudinal)
    return LVAxes.from_directions(longitudinal, lateral, apex_point,
                                  base_center)


def compute_lv_axes_from_plane(mesh: Mesh, plane_point, plane_normal) \
        -> LVAxes:
    """Plane form for meshes without basal annotation
    (``heart_axes.jl:187-214``): the apex is the node farthest below the
    supplied plane; ``base_center`` is the centroid of nodes within the
    top 5% of the basal-distance range. ``plane_normal`` points from the
    apex towards the base."""
    coords = mesh.nodes
    normal = np.asarray(plane_normal, float)
    normal = normal / np.linalg.norm(normal)
    signed = (coords - np.asarray(plane_point, float)) @ normal
    apex_point = coords[np.argmin(signed)]
    band = max((signed.max() - signed.min()) * 0.05, 1e-3)
    base_pts = coords[signed >= signed.max() - band]
    base_center = base_pts.mean(axis=0)
    longitudinal = base_center - apex_point
    nl = np.linalg.norm(longitudinal)
    if nl < 1e-12:
        raise ValueError("compute_lv_axes: apex and base center coincide")
    longitudinal = longitudinal / nl
    lateral = _principal_short_axis(coords, coords.mean(axis=0),
                                    longitudinal)
    return LVAxes.from_directions(longitudinal, lateral, apex_point,
                                  base_center)


def compute_lv_coordinate_system(mesh: Mesh) -> LVCoordinateSystem:
    """LV coordinates on a mesh with Endocardium/Epicardium/Base facetsets
    (``compute_lv_coordinate_system``, ``coordinate_systems.jl:886``):

    * transmural: Laplace, endo=0 -> epi=1;
    * apicobasal: Laplace, base=1, apex=0 (``apicobasal_from_laplace:255``);
    * rotational: atan2 angle about the long axis in [-pi, pi].
    """
    transmural = solve_laplace_nodal(mesh, [
        Dirichlet("u", "Endocardium", 0.0),
        Dirichlet("u", "Epicardium", 1.0),
    ])
    apex_bc = ("Apex" if "Apex" in mesh.nodesets else None)
    dbcs = [Dirichlet("u", "Base", 1.0)]
    if apex_bc:
        dbcs.append(Dirichlet("u", apex_bc, 0.0))
    apicobasal = solve_laplace_nodal(mesh, dbcs)
    if not apex_bc:
        # normalize so min is 0 (pure-base Laplace is constant otherwise)
        lo, hi = np.nanmin(apicobasal), np.nanmax(apicobasal)
        apicobasal = (apicobasal - lo) / max(hi - lo, 1e-30)

    axis, apex, base_c = compute_long_axis(mesh)
    rel = mesh.nodes - apex
    # orthonormal frame (e1, e2) spanning the short-axis plane
    tmp = np.array([1.0, 0.0, 0.0])
    if abs(axis @ tmp) > 0.9:
        tmp = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(axis, tmp)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(axis, e1)
    rotational = np.arctan2(rel @ e2, rel @ e1)
    return LVCoordinateSystem(mesh, {
        "transmural": transmural,
        "apicobasal": apicobasal,
        "rotational": rotational,
    }, axis=axis)


def compute_midmyocardial_section_coordinate_system(mesh: Mesh) \
        -> LVCoordinateSystem:
    """Ring/section variant (``coordinate_systems.jl:971``): transmural via
    endo/epi Laplace, apicobasal normalized along the ring axis (z),
    rotational about z."""
    transmural = solve_laplace_nodal(mesh, [
        Dirichlet("u", "Endocardium", 0.0),
        Dirichlet("u", "Epicardium", 1.0),
    ])
    z = mesh.nodes[:, 2]
    lo, hi = z.min(), z.max()
    apicobasal = (z - lo) / max(hi - lo, 1e-30)
    rotational = np.arctan2(mesh.nodes[:, 1], mesh.nodes[:, 0])
    return LVCoordinateSystem(mesh, {
        "transmural": transmural,
        "apicobasal": apicobasal,
        "rotational": rotational,
    }, axis=np.array([0.0, 0.0, 1.0]))


def compute_biv_coordinate_system(
        mesh: Mesh, *, lv_endo: str = "EndocardiumLV",
        rv_endo: str = "EndocardiumRV", epi: str = "Epicardium",
        base: str = "Base") -> BiVCoordinateSystem:
    """In-package Cobiveco-style BiV coordinates from Laplace solves.

    Beyond the reference: ``BiVCoordinateSystem``
    (``coordinate_systems.jl:1079``) is import-only there (Cobiveco VTU
    readback, also supported here via ``io.vtk.read_vtu`` — see
    ``tests/test_coordinates.py::test_biv_coordinate_system_roundtrip``);
    this builder produces the four fields for ANY biventricular mesh
    carrying the named facetsets, following the Cobiveco recipe
    (Schuler et al. 2021) with harmonic interpolation:

    * transventricular: Laplace with LV endo = 0, RV endo = 1 (Cobiveco
      thresholds at 1/2 for the hard label; the continuous field is kept);
    * transmural: Laplace, both endocardia = 0, epicardium = 1;
    * apicobasal: Laplace, base = 1, apex = 0 (``Apex`` nodeset when
      present, else the node farthest from the basal plane);
    * rotational: angle about the long axis in [-pi, pi] (the atan2
      simplification of Cobiveco's geodesic construction, matching the LV
      builder).
    """
    for name in (lv_endo, rv_endo, epi, base):
        if name not in mesh.facetsets:
            raise ValueError(f"mesh lacks facetset {name!r} (available: "
                             f"{sorted(mesh.facetsets)})")
    transventricular = solve_laplace_nodal(mesh, [
        Dirichlet("u", lv_endo, 0.0),
        Dirichlet("u", rv_endo, 1.0),
    ])
    transmural = solve_laplace_nodal(mesh, [
        Dirichlet("u", lv_endo, 0.0),
        Dirichlet("u", rv_endo, 0.0),
        Dirichlet("u", epi, 1.0),
    ])
    if "Apex" in mesh.nodesets:
        apex_set, temp = "Apex", False
    else:
        c, nrm = fit_basal_plane(mesh, base)
        d = (mesh.nodes - c) @ nrm
        apex_node = int(np.argmin(d))
        mesh.nodesets["_biv_apex"] = np.asarray([apex_node], np.int64)
        apex_set, temp = "_biv_apex", True
    try:
        apicobasal = solve_laplace_nodal(mesh, [
            Dirichlet("u", base, 1.0),
            Dirichlet("u", apex_set, 0.0),
        ])
    finally:
        if temp:
            del mesh.nodesets["_biv_apex"]  # don't leak into the mesh
    axis, apex, base_c = compute_long_axis(mesh)
    rel = mesh.nodes - apex
    tmp = np.array([1.0, 0.0, 0.0])
    if abs(axis @ tmp) > 0.9:
        tmp = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(axis, tmp)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(axis, e1)
    rotational = np.arctan2(rel @ e2, rel @ e1)
    return BiVCoordinateSystem(mesh, {
        "transmural": transmural,
        "apicobasal": apicobasal,
        "rotational": rotational,
        "transventricular": transventricular,
    }, axis=axis)


def compute_relative_rotation(a, b, axis):
    """Signed rotation angle (radians) from direction field `a` to `b`
    about `axis` (parity: heart-axes helpers,
    ``src/modeling/core/heart_axes.jl`` / ``compute_relative_rotation``,
    ``src/utils.jl:155``). a, b: [..., 3] unit-ish vectors."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    ap = a - (a @ axis)[..., None] * axis
    bp = b - (b @ axis)[..., None] * axis
    ap /= np.maximum(np.linalg.norm(ap, axis=-1, keepdims=True), 1e-30)
    bp /= np.maximum(np.linalg.norm(bp, axis=-1, keepdims=True), 1e-30)
    cosang = np.clip((ap * bp).sum(-1), -1.0, 1.0)
    sinang = np.cross(ap, bp) @ axis
    return np.arctan2(sinang, cosang)
