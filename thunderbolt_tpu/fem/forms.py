"""Weak-form element batches and assembly kernels.

TPU-native replacement for the reference's integrator/element-cache layer:
``BilinearDiffusionIntegrator``/``BilinearMassIntegrator``/``LinearIntegrator``
quadrature loops (``src/modeling/core/diffusion.jl:28-60``, ``mass.jl:6``,
``linear.jl:6``) and the FerriteOperators assembly strategies (SURVEY.md
§2.9). One strategy replaces Sequential/PerColor/ElementAssembly: gather
element unknowns -> vmapped dense element kernel -> ``segment_sum`` scatter
into shared CSR slots. Deterministic and race-free by construction.

Sign conventions follow the reference: the diffusion "stiffness" K is
assembled as ``-∫ ∇v ⋅ D ∇u`` (``diffusion.jl:46``), so the semidiscrete
heat problem reads ``M du/dt = K u + f``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass
from typing import Any, Optional

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.mesh.elements import get_element
from thunderbolt_tpu.mesh.quadrature import quadrature_rule, default_degree
from thunderbolt_tpu.fem.dofs import DofHandler, SubDofData
from thunderbolt_tpu.utils.smallmat import det_small, inv_small


@jax.tree_util.register_pytree_node_class
class FormBatch:
    """Static per-(field, block) data for volumetric weak forms.

    Device leaves: shape tables (compile-time constants), gathered element
    node coordinates ``Xe``, dof gather table ``cell_dofs``, physical
    quadrature coordinates ``xq``. The analog of the reference's
    ``StaticCellValues`` (``src/ferrite-addons/PR883.jl:293``) — but one
    object covers the whole batch, not one cell.
    """

    def __init__(self, N, dN, Ngeo, dNgeo, wq, Xe, cell_dofs, xq,
                 cells, ncomp, celltype, field_celltype, cell_weight=None,
                 geo_dNdx=None, geo_detJw=None):
        self.N = N            # [nqp, nb]
        self.dN = dN          # [nqp, nb, rdim]
        self.Ngeo = Ngeo      # [nqp, nbg]
        self.dNgeo = dNgeo    # [nqp, nbg, rdim]
        self.wq = wq          # [nqp]
        self.Xe = Xe          # [nc, nbg, sdim]
        self.cell_dofs = cell_dofs  # int32 [nc, nb*ncomp]
        self.xq = xq          # [nc, nqp, sdim]
        self.cells = cells    # int32 [nc] global cell ids
        self.ncomp = ncomp
        self.celltype = celltype
        self.field_celltype = field_celltype
        #: optional [nc] weight applied to detJw — 0 marks padding cells
        #: inserted for even device sharding
        self.cell_weight = cell_weight
        #: reference-configuration geometry cache (total-Lagrangian forms
        #: never move the mesh, so J^-1 grads / detJ.w are setup constants)
        self.geo_dNdx = geo_dNdx      # [nc, nqp, nb, sdim] or None
        self.geo_detJw = geo_detJw    # [nc, nqp] or None

    def tree_flatten(self):
        leaves = (self.N, self.dN, self.Ngeo, self.dNgeo, self.wq,
                  self.Xe, self.cell_dofs, self.xq, self.cells,
                  self.cell_weight, self.geo_dNdx, self.geo_detJw)
        return leaves, (self.ncomp, self.celltype, self.field_celltype)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        *main, cell_weight, geo_dNdx, geo_detJw = leaves
        return cls(*main, *aux, cell_weight=cell_weight,
                   geo_dNdx=geo_dNdx, geo_detJw=geo_detJw)

    def precompute_geometry(self, max_bytes=512 << 20):
        """Cache (dNdx, detJw) so jitted assembly reads constants instead of
        re-deriving J^-1 per call. Skipped when the dNdx table would exceed
        ``max_bytes`` (streaming it from HBM would cost more than the math)."""
        if self.geo_detJw is not None:
            return self
        dNdx, detJw = self.geometry()
        if dNdx.size * dNdx.dtype.itemsize <= max_bytes:
            self.geo_dNdx = dNdx
        self.geo_detJw = detJw
        return self

    @property
    def ncells(self):
        return self.Xe.shape[0]

    @property
    def nqp(self):
        return self.wq.shape[0]

    @property
    def nb(self):
        return self.N.shape[1]

    @property
    def sdim(self):
        return self.Xe.shape[2]

    def geometry(self):
        """In-kernel geometry: (dNdx [nc,nqp,nb,sdim], detJw [nc,nqp]).

        J[s,r] = d x_s / d xi_r. Square Jacobians invert directly;
        lower-dimensional cells embedded in a higher-dimensional space
        (Purkinje-style line2-in-3D cables, the reference's
        mixed-dimensional fixture ``test/testfixtures.jl:20-43``) use the
        tangential pseudo-inverse: dN/dx = dN (J^T J)^-1 J^T with area
        element sqrt(det J^T J) — gradients live in the cell's tangent
        space."""
        if self.geo_detJw is not None and self.geo_dNdx is not None:
            return self.geo_dNdx, self.geo_detJw
        J = jnp.einsum("qbr,cbs->cqsr", self.dNgeo, self.Xe)
        rdim = J.shape[-1]
        sdim = J.shape[-2]
        if rdim == sdim:
            detJ = det_small(J)
            Jinv = inv_small(J, detJ)
            dNdx = jnp.einsum("qbr,cqrs->cqbs", self.dN, Jinv)
        else:
            G = jnp.einsum("cqsr,cqst->cqrt", J, J)       # J^T J [rdim,rdim]
            detG = det_small(G)
            Ginv = inv_small(G, detG)
            Jpinv = jnp.einsum("cqrt,cqst->cqrs", Ginv, J)  # (J^T J)^-1 J^T
            dNdx = jnp.einsum("qbr,cqrs->cqbs", self.dN, Jpinv)
            detJ = jnp.sqrt(detG)
        detJw = detJ * self.wq[None, :]
        if self.cell_weight is not None:
            detJw = detJw * self.cell_weight[:, None]
        return dNdx, detJw

    def interpolate(self, u_elem):
        """Field values at qps from element dof values [nc, nb(*ncomp)]."""
        if self.ncomp == 1:
            return jnp.einsum("qb,cb->cq", self.N, u_elem)
        ue = u_elem.reshape(u_elem.shape[0], self.nb, self.ncomp)
        return jnp.einsum("qb,cbk->cqk", self.N, ue)

    def gather(self, u):
        return u[self.cell_dofs]


def make_form_batch(dh: DofHandler, sub: SubDofData, degree: Optional[int] = None,
                    dtype=jnp.float32) -> FormBatch:
    """Build the static batch tables for one SubDofData."""
    mesh = dh.mesh
    block = mesh.blocks[sub.block_index]
    gel = get_element(sub.celltype)
    fel = get_element(sub.field_celltype)
    if degree is None:
        degree = default_degree(fel.order)
    qr = quadrature_rule(sub.celltype, degree)
    N = fel.shape(qr.points)          # [nqp, nb]
    dN = fel.grad(qr.points)          # [nqp, nb, rdim]
    Ngeo = gel.shape(qr.points)
    dNgeo = gel.grad(qr.points)
    conn = block.connectivity[sub.local_cells]
    Xe = mesh.nodes[conn]             # [nc, nbg, sdim] f64
    xq = np.einsum("qb,cbs->cqs", Ngeo, Xe)
    ncomp = dh.fields[sub.field].ncomponents
    return FormBatch(
        N=jnp.asarray(N, dtype), dN=jnp.asarray(dN, dtype),
        Ngeo=jnp.asarray(Ngeo, dtype), dNgeo=jnp.asarray(dNgeo, dtype),
        wq=jnp.asarray(qr.weights, dtype),
        Xe=jnp.asarray(Xe, dtype),
        cell_dofs=jnp.asarray(sub.cell_dofs),
        xq=jnp.asarray(xq, dtype),
        cells=jnp.asarray(sub.cells, dtype=jnp.int32),
        ncomp=ncomp, celltype=sub.celltype,
        field_celltype=sub.field_celltype,
    )


# ---------------------------------------------------------------------------
# scalar-field volumetric forms (EP / diffusion / mass)
# ---------------------------------------------------------------------------

def _normalize_tensor(D, nc, nqp, dim, dtype):
    """Broadcast a diffusion coefficient to [nc, nqp, dim, dim]."""
    D = jnp.asarray(D, dtype)
    if D.ndim == 0:
        return D * jnp.eye(dim, dtype=dtype)[None, None]
    if D.ndim == 2 and D.shape == (dim, dim):
        return D[None, None]
    if D.ndim == 3 and D.shape[-2:] == (dim, dim):   # per-cell tensors
        return D[:, None]
    if D.ndim == 4:
        return D
    # scalar per (cell, qp)
    if D.ndim <= 2:
        return D[..., None, None] * jnp.eye(dim, dtype=dtype)[None, None]
    raise ValueError(f"bad diffusion tensor shape {D.shape}")


def element_mass(batch: FormBatch, rho=1.0):
    """Dense element mass matrices ∫ rho N_a N_b dΩ -> [nc, nb, nb].

    Parity: ``BilinearMassIntegrator`` (``src/modeling/core/mass.jl:6``)."""
    _, detJw = batch.geometry()
    w = jnp.asarray(rho) * detJw      # [nc, nqp] (rho broadcasts)
    return jnp.einsum("cq,qa,qb->cab", w, batch.N, batch.N)


def element_diffusion(batch: FormBatch, D=1.0):
    """Dense element matrices -∫ ∇N_a ⋅ D ∇N_b dΩ -> [nc, nb, nb].

    Parity incl. sign: ``BilinearDiffusionIntegrator.assemble_element!``
    (``src/modeling/core/diffusion.jl:28-60``)."""
    dNdx, detJw = batch.geometry()
    nc, nqp = detJw.shape
    dim = dNdx.shape[-1]
    Dn = _normalize_tensor(D, nc, nqp, dim, dNdx.dtype)
    flux = jnp.einsum("cqij,cqbj->cqbi", Dn, dNdx)   # D ∇N_b
    return -jnp.einsum("cqai,cqbi,cq->cab", dNdx, flux, detJw)


def element_load(batch: FormBatch, f):
    """Element load vectors ∫ f N_a dΩ -> [nc, nb] (scalar field).

    Parity: ``LinearIntegrator`` (``src/modeling/core/linear.jl:6``)."""
    _, detJw = batch.geometry()
    w = jnp.asarray(f) * detJw
    return jnp.einsum("cq,qa->ca", w, batch.N)


def scatter_matrix(Ke, elem_map, nnz):
    """Element matrices -> CSR slot values via segment_sum (race-free)."""
    return jax.ops.segment_sum(Ke.reshape(-1), elem_map.reshape(-1), nnz)


def scatter_vector(fe, cell_dofs, ndofs):
    return jax.ops.segment_sum(fe.reshape(-1), cell_dofs.reshape(-1), ndofs)


def lumped_mass(batch: FormBatch, ndofs, rho=1.0):
    """Row-sum lumped mass vector (for explicit EP steppers)."""
    Me = element_mass(batch, rho)
    return scatter_vector(Me.sum(axis=2), batch.cell_dofs, ndofs)
