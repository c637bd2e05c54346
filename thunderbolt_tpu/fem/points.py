"""Point queries: evaluate FEM fields at arbitrary physical points.

Parity: Ferrite's ``PointEvalHandler`` as used by the reference
(``src/ferrite-addons/point.jl``; e.g. the Land-benchmark probe,
``test/validation/land2015.jl:95``).

Host-side setup (cell location via centroid KD-tree + Newton inverse
mapping); evaluation itself is a tiny gather+einsum usable inside jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass
from typing import List, Optional

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.mesh.elements import get_element
from thunderbolt_tpu.fem.dofs import DofHandler


def _inverse_map(el, Xe, x, tol=1e-10, maxit=30):
    """Reference coordinates xi with X(xi) = x (Newton on the geometry map).
    Returns (xi, converged)."""
    dim = el.dim
    xi = el.ref_nodes.mean(axis=0).copy()
    for _ in range(maxit):
        N = el.shape(xi[None])[0]
        dN = el.grad(xi[None])[0]          # [nb, dim]
        r = N @ Xe - x
        if np.linalg.norm(r) < tol:
            return xi, True
        J = Xe.T @ dN                      # [sdim, dim]
        try:
            dxi = np.linalg.solve(J[:dim, :dim], r[:dim])
        except np.linalg.LinAlgError:
            return xi, False
        xi = xi - dxi
    return xi, np.linalg.norm(r) < 1e-6


def _inside(el, xi, tol=1e-8):
    if el.name[:3] in ("tri", "tet"):
        return (xi >= -tol).all() and xi.sum() <= 1 + tol
    return (np.abs(xi) <= 1 + tol).all()


@dataclass
class PointEvalHandler:
    """Locate `points` in `mesh` once; evaluate fields many times."""

    mesh: Mesh
    points: np.ndarray

    def __post_init__(self):
        from scipy.spatial import cKDTree
        mesh = self.mesh
        pts = np.atleast_2d(np.asarray(self.points, float))
        self.points = pts
        centroids, owners = [], []
        for b in mesh.blocks:
            centroids.append(mesh.nodes[b.connectivity].mean(axis=1))
            owners.extend((b.cell_offset + i) for i in range(b.ncells))
        centroids = np.vstack(centroids)
        owners = np.asarray(owners)
        tree = cKDTree(centroids)
        k = min(12, len(owners))
        _, cand = tree.query(pts, k=k)
        cand = np.atleast_2d(cand)
        self.cells = np.full(len(pts), -1, dtype=np.int64)
        self.xi = np.zeros((len(pts), mesh.sdim))
        for i, x in enumerate(pts):
            for gc in owners[cand[i]]:
                bi, lc = mesh.block_of_cell(int(gc))
                b = mesh.blocks[bi]
                el = b.element
                Xe = mesh.nodes[b.connectivity[lc]]
                xi, ok = _inverse_map(el, Xe, x)
                if ok and _inside(el, xi):
                    self.cells[i] = gc
                    self.xi[i, : el.dim] = xi
                    break
        self.missing = np.nonzero(self.cells < 0)[0]

    def evaluate(self, dh: DofHandler, field: str, u):
        """Field values at the points: [npoints(, ncomp)]."""
        fi = dh.fields[field]
        out = np.full((len(self.points), fi.ncomponents), np.nan)
        u = np.asarray(u)
        for i, gc in enumerate(self.cells):
            if gc < 0:
                continue
            bi, lc = self.mesh.block_of_cell(int(gc))
            subs = dh.subdata(field, bi)
            if not subs:
                continue
            sub = subs[0]
            hit = np.nonzero(sub.local_cells == lc)[0]
            if hit.size == 0:
                continue
            fel = get_element(sub.field_celltype)
            N = fel.shape(self.xi[i, : fel.dim][None])[0]
            dofs = sub.cell_dofs[hit[0]].reshape(-1, fi.ncomponents)
            out[i] = N @ u[dofs]
        return out[:, 0] if fi.ncomponents == 1 else out


def evaluate_at_points(mesh, dh, field, u, points):
    """One-shot convenience (Ferrite ``evaluate_at_points`` parity)."""
    return PointEvalHandler(mesh, points).evaluate(dh, field, u)


# ---------------------------------------------------------------------------


@dataclass
class NodalIntergridTransfer:
    """Transfer a nodal field between meshes by point evaluation at the
    target's dof sites. Parity: the reference's transfer operators
    (``src/ferrite-addons/transfer_operators.jl``) used for heart -> torso
    ECG coupling."""

    source_mesh: Mesh
    source_dh: DofHandler
    source_field: str
    target_coords: np.ndarray

    def __post_init__(self):
        self.ph = PointEvalHandler(self.source_mesh, self.target_coords)

    def transfer(self, u):
        return self.ph.evaluate(self.source_dh, self.source_field, u)
