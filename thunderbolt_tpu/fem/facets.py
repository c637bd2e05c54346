"""Facet (surface) batches for boundary weak forms.

TPU-native analog of Ferrite ``FacetValues`` as used by the reference's
facet assembly (``src/modeling/core/weak_boundary_conditions.jl:102-634``):
a facetset becomes one dense batch of facets with static shape tables of the
facet restriction of the volume basis; normals and area elements are
computed in-kernel from gathered (possibly deformed) facet node coordinates.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from typing import Optional

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.mesh.elements import get_element, facet_type
from thunderbolt_tpu.mesh.quadrature import quadrature_rule, default_degree
from thunderbolt_tpu.fem.dofs import DofHandler


def facet_basis_indices(el, lf: int):
    """Local basis-function indices of `el` on facet `lf`, ordered to match
    the facet element's own node ordering (corners in facet order, then
    midside nodes in the facet element's edge order, then face center)."""
    fac = el.facets[lf]
    idx = list(fac)
    if el.order == 2:
        facet_el = get_element(facet_type(el, lf))
        nv = len(el.vertices)
        # for each facet-element edge (a,b), find the matching cell edge
        for (a, b) in facet_el.edges:
            pair = {fac[a], fac[b]}
            for k, (ca, cb) in enumerate(el.edges):
                if {ca, cb} == pair:
                    idx.append(nv + k)
                    break
            else:
                raise RuntimeError("facet edge not found in cell edges")
        if el.faces:
            fset = set(fac)
            for k, f in enumerate(el.faces):
                if set(f) <= fset:
                    idx.append(nv + len(el.edges) + k)
    return idx




@jax.tree_util.register_pytree_node_class
class FacetBatch:
    """Static tables for one facetset on one block/field."""

    def __init__(self, Xf, facet_dofs, N, dN, Ngeo, dNgeo, wq, xq, ncomp,
                 sdim):
        self.Xf = Xf                  # [nf, nbg, sdim] geometry facet nodes
        self.facet_dofs = facet_dofs  # int32 [nf, nbf*ncomp]
        self.N = N                    # [nqp, nbf] field facet basis
        self.dN = dN                  # [nqp, nbf, fdim]
        self.Ngeo = Ngeo              # [nqp, nbg]
        self.dNgeo = dNgeo            # [nqp, nbg, fdim]
        self.wq = wq                  # [nqp]
        self.xq = xq                  # [nf, nqp, sdim]
        self.ncomp = ncomp
        self.sdim = sdim

    def tree_flatten(self):
        return ((self.Xf, self.facet_dofs, self.N, self.dN, self.Ngeo,
                 self.dNgeo, self.wq, self.xq), (self.ncomp, self.sdim))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def nfacets(self):
        return self.Xf.shape[0]

    @property
    def nbf(self):
        return self.N.shape[1]

    def normal_da(self, Xf, uf=None):
        """Non-unit outward normal scaled by the area element, per qp.

        Xf: [nbg, sdim] geometry facet nodes of ONE facet; uf (optional):
        [nbf, sdim] field displacement dofs — the deformed surface tangents
        add the field-basis contribution (supports P2 fields on P1 meshes).
        Returns [nqp, sdim]. 3D: cross of the two tangents (facet orderings
        give outward orientation); 2D: CCW-rotated tangent."""
        T = jnp.einsum("qbr,bs->qsr", self.dNgeo, Xf)  # [nqp, sdim, fdim]
        if uf is not None:
            T = T + jnp.einsum("qbr,bs->qsr", self.dN, uf)
        if self.sdim == 3:
            t1, t2 = T[:, :, 0], T[:, :, 1]
            return jnp.cross(t1, t2)
        t = T[:, :, 0]
        return jnp.stack([t[:, 1], -t[:, 0]], axis=-1)


def make_facet_batch(dh: DofHandler, field: str, facetset: str,
                     degree: Optional[int] = None,
                     dtype=jnp.float32, cells=None) -> FacetBatch:
    """Build the surface batch of `facetset` for `field` (single-block).

    ``cells`` (optional): global cell indices — keep only facets owned by
    those cells. Per-subdomain weak BCs use this so a facetset spanning
    several subdomains is loaded once by each subdomain's own face models
    (reference: per-subdomain facemodels in
    ``semidiscretize(Dict{String,QuasiStaticModel})``, fem.jl:843-895)."""
    mesh = dh.mesh
    fi = dh.fields[field]
    fs = mesh.facetset(facetset)
    if cells is not None:
        fs = fs[mesh.cell_membership(cells)[fs[:, 0]]]
        if len(fs) == 0:
            raise ValueError(
                f"facetset {facetset!r} has no facets in the given "
                "subdomain (callers should skip the BC instead)")
    # group facets by (block, local facet); gather per-facet tables
    Xf_list, dofs_list, x_rows = [], [], []
    N = dN = Ngeo = dNgeo = wq = None
    for gc, lf in fs:
        bi, lc = mesh.block_of_cell(int(gc))
        block = mesh.blocks[bi]
        gel = block.element
        sub = [s for s in dh.subdata(field, bi)][0]
        fel = get_element(sub.field_celltype)
        # facet element tables (shared across facets of same type; mixed
        # wedge facetsets — caps + sides in ONE set — are rejected, split
        # the set by surface instead)
        ft_geo = facet_type(gel, int(lf))
        if N is not None and ft_geo != _batch_ft[0]:
            raise NotImplementedError(
                f"facetset {facetset!r} mixes facet types "
                f"({_batch_ft[0]} and {ft_geo}); split it into "
                "per-surface sets")
        if N is None:
            _batch_ft = (ft_geo,)
            f_geo_el = get_element(ft_geo)
            f_fld_el = get_element(facet_type(fel, int(lf)))
            deg = degree if degree is not None \
                else default_degree(f_fld_el.order)
            qr = quadrature_rule(f_geo_el.name, deg)
            N = f_fld_el.shape(qr.points)
            dN = f_fld_el.grad(qr.points)
            Ngeo = f_geo_el.shape(qr.points)
            dNgeo = f_geo_el.grad(qr.points)
            wq = qr.weights
        # geometry nodes of the facet, in the FACET ELEMENT's own node
        # ordering (corners, then ITS edge order, then center) — the same
        # ordering the Ngeo/dNgeo tables above are tabulated in. The
        # cell-edge ordering of mesh.facet_nodes differs on some hex
        # facets and garbles the quadratic facet geometry.
        gnodes = block.connectivity[lc, facet_basis_indices(gel, int(lf))]
        Xf_list.append(mesh.nodes[gnodes])
        # field dofs on the facet
        lcell = np.nonzero(sub.local_cells == lc)[0]
        if lcell.size == 0:
            raise ValueError(
                f"facet cell {gc} is outside the subdomain of {field!r}")
        row = sub.cell_dofs[lcell[0]].reshape(-1, fi.ncomponents)
        fidx = facet_basis_indices(fel, int(lf))
        dofs_list.append(row[fidx].reshape(-1))
        x_rows.append(np.einsum("qb,bs->qs", Ngeo, Xf_list[-1]))

    return FacetBatch(
        Xf=jnp.asarray(np.stack(Xf_list), dtype),
        facet_dofs=jnp.asarray(np.stack(dofs_list), jnp.int32),
        N=jnp.asarray(N, dtype), dN=jnp.asarray(dN, dtype),
        Ngeo=jnp.asarray(Ngeo, dtype), dNgeo=jnp.asarray(dNgeo, dtype),
        wq=jnp.asarray(wq, dtype),
        xq=jnp.asarray(np.stack(x_rows), dtype),
        ncomp=fi.ncomponents, sdim=mesh.sdim,
    )


def make_interface_batch(dh: DofHandler, field: str, facetset_a: str,
                         facetset_b: str, dtype=jnp.float32):
    """Match facets of two (geometrically coincident) facetsets by centroid
    and build jump-coupling tables: for each pair, the B side's basis is
    evaluated at the physical quadrature points of the A side (host-side
    inverse mapping), so both traces align pointwise.

    Returns dict with: pair_dofs [np, nbfA+nbfB], N_jump [np, nqp,
    nbfA+nbfB] (A-basis, then NEGATED B-basis), w_dG [np, nqp] (average
    area element). Parity: ``InterfaceCellValues``-based assembly
    (``src/modeling/core/diffusion.jl:81-127``)."""
    fa = make_facet_batch(dh, field, facetset_a, dtype=jnp.float64)
    fb = make_facet_batch(dh, field, facetset_b, dtype=jnp.float64)
    ca = np.asarray(fa.Xf).mean(axis=1)
    cb = np.asarray(fb.Xf).mean(axis=1)
    from scipy.spatial import cKDTree
    dist, match = cKDTree(cb).query(ca)
    if dist.max() > 1e-8:
        raise ValueError(
            f"interface facetsets do not coincide (max centroid gap "
            f"{dist.max():.3e})")
    # geometry of both sides
    import jax as _jax
    nda_a = _jax.vmap(lambda X: fa.normal_da(X))(fa.Xf)
    da_a = np.linalg.norm(np.asarray(nda_a), axis=-1)     # [np, nqp]
    npairs, nqp = da_a.shape
    nbfA, nbfB = fa.nbf, fb.nbf

    # B basis at A's physical qps via per-facet inverse mapping
    from thunderbolt_tpu.mesh.elements import get_element
    xqa = np.asarray(fa.xq)            # [np, nqp, sdim]
    Nb_at_a = np.zeros((npairs, nqp, nbfB))
    da_b = np.zeros((npairs, nqp))
    Ngeo_b = np.asarray(fb.Ngeo)
    Xb = np.asarray(fb.Xf)
    # facet element (geometry) of side B for Newton inverse map
    fdim = np.asarray(fb.dNgeo).shape[-1]
    for ipair in range(npairs):
        j = match[ipair]
        Xf = Xb[j]
        for q in range(nqp):
            x = xqa[ipair, q]
            # least-squares Newton on the embedded facet map
            xi = np.zeros(fdim)
            for _ in range(30):
                # evaluate geometry basis of the facet element at xi
                Ng, dNg = _facet_geo_tables(fb, xi)
                r = Ng @ Xf - x
                if np.linalg.norm(r) < 1e-12:
                    break
                J = Xf.T @ dNg          # [sdim, fdim]
                xi = xi - np.linalg.solve(J.T @ J, J.T @ r)
            Nf, dNf = _facet_field_tables(fb, xi)
            Nb_at_a[ipair, q] = Nf
            Jg = Xf.T @ dNg
            if Jg.shape[1] == 2:
                da_b[ipair, q] = np.linalg.norm(np.cross(Jg[:, 0], Jg[:, 1]))
            else:
                da_b[ipair, q] = np.linalg.norm(Jg[:, 0])
    N_jump = np.concatenate([
        np.broadcast_to(np.asarray(fa.N)[None], (npairs, nqp, nbfA)),
        -Nb_at_a], axis=2)
    pair_dofs = np.concatenate([np.asarray(fa.facet_dofs),
                                np.asarray(fb.facet_dofs)[match]], axis=1)
    w_dG = 0.5 * (da_a + da_b) * np.asarray(fa.wq)[None]
    return {
        "pair_dofs": jnp.asarray(pair_dofs, jnp.int32),
        "N_jump": jnp.asarray(N_jump, dtype),
        "w_dG": jnp.asarray(w_dG, dtype),
    }


def _facet_geo_tables(fb, xi):
    from thunderbolt_tpu.mesh.elements import get_element
    # reconstruct the facet geometry element from table shapes
    nbg = np.asarray(fb.Ngeo).shape[1]
    fdim = np.asarray(fb.dNgeo).shape[-1]
    name = {(2, 1): "line2", (3, 1): "line3",
            (4, 2): "quad4", (9, 2): "quad9",
            (3, 2): "tri3", (6, 2): "tri6"}[(nbg, fdim)]
    el = get_element(name)
    return el.shape(xi[None])[0], el.grad(xi[None])[0]


def _facet_field_tables(fb, xi):
    from thunderbolt_tpu.mesh.elements import get_element
    nbf = np.asarray(fb.N).shape[1]
    fdim = np.asarray(fb.dN).shape[-1]
    name = {(2, 1): "line2", (3, 1): "line3",
            (4, 2): "quad4", (9, 2): "quad9",
            (3, 2): "tri3", (6, 2): "tri6"}[(nbf, fdim)]
    el = get_element(name)
    return el.shape(xi[None])[0], el.grad(xi[None])[0]
