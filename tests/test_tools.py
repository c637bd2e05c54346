"""Mesh tools: refinement, loaders, point evaluation, transfer.
Parity with ``test_mesh.jl`` loaders + ``test_transfer.jl`` (SURVEY.md §4)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.mesh.tools import (
    uniform_refinement, hexahedralize, load_mfem_grid, load_carp_grid,
    load_voom2_grid)
from thunderbolt_tpu.fem.points import PointEvalHandler, NodalIntergridTransfer
from thunderbolt_tpu.fem.dofs import DofHandler

REF = "/root/reference/test/data"


def _volume(mesh):
    from tests.test_mesh import mesh_volume
    return mesh_volume(mesh)


@pytest.mark.parametrize("celltype,dims", [
    ("quad4", (2, 3)), ("tri3", (2, 2)), ("hex8", (2, 2, 2)),
    ("tet4", (1, 1, 1)), ("line2", (3,)),
])
def test_uniform_refinement(celltype, dims):
    mesh = tb.generate_mesh(celltype, dims)
    fine = uniform_refinement(mesh)
    factor = {1: 2, 2: 4, 3: 8}[mesh.sdim]
    assert fine.ncells == mesh.ncells * factor
    assert np.isclose(_volume(fine), _volume(mesh), rtol=1e-12)
    # facetsets survive with 2^(d-1) children per parent facet
    for name, fs in mesh.facetsets.items():
        child = fine.facetsets[name]
        assert len(child) == len(fs) * 2 ** (mesh.sdim - 1), name
    # boundary facet count matches exactly
    assert sum(len(v) for v in fine.facetsets.values()) == \
        len(fine.boundary_facets())


def test_refinement_twice_and_cellsets():
    mesh = tb.generate_mesh("hex8", (1, 1, 1))
    mesh.cellsets["all"] = np.array([0])
    fine = uniform_refinement(mesh, 2)
    assert fine.ncells == 64
    assert len(fine.cellsets["all"]) == 64


def test_hexahedralize_quads():
    mesh = tb.generate_mesh("quad4", (2, 2))
    hexed = hexahedralize(mesh)
    assert hexed.elementtypes() == ("quad4",)
    assert hexed.ncells == 16
    assert np.isclose(_volume(hexed), 1.0, atol=1e-12)


def test_load_mfem():
    mesh = load_mfem_grid(f"{REF}/mfem/ref-cube.mesh")
    assert mesh.elementtypes() == ("hex8",)
    assert mesh.ncells == 1 and mesh.nnodes == 8
    assert np.isclose(_volume(mesh), 1.0)
    assert len(mesh.facetsets) == 6  # boundary attributes 1..6
    mesh2 = load_mfem_grid(f"{REF}/mfem/ref-triangle.mesh")
    assert mesh2.elementtypes() == ("tri3",)
    assert _volume(mesh2) > 0


def test_load_carp():
    mesh = load_carp_grid(f"{REF}/openCARP/ref-cube")
    assert mesh.elementtypes() == ("hex8",)
    assert np.isclose(_volume(mesh), 1.0)
    assert "1" in mesh.cellsets
    mesh2 = load_carp_grid(f"{REF}/openCARP/ref-tetrahedron")
    assert mesh2.elementtypes() == ("tet4",)
    assert _volume(mesh2) > 0


def test_load_voom2():
    mesh = load_voom2_grid(f"{REF}/voom2/ex1")
    types = set(mesh.elementtypes())
    assert "hex8" in types and "line2" in types
    # the hex is a 0.02-cube
    hexblock = [b for b in mesh.blocks if b.celltype == "hex8"][0]
    from thunderbolt_tpu.mesh.quadrature import quadrature_rule
    from thunderbolt_tpu.utils.smallmat import det_small
    el = hexblock.element
    qr = quadrature_rule("hex8", 2)
    dN = el.grad(qr.points)
    Xe = mesh.nodes[hexblock.connectivity]
    J = np.einsum("qbr,cbs->cqsr", dN, Xe)
    detJ = np.asarray(det_small(jnp.asarray(J)))
    assert detJ.min() > 0
    assert np.isclose((detJ * qr.weights[None]).sum(), 0.02 ** 3, rtol=1e-10)


def test_point_eval_handler():
    mesh = tb.generate_mesh("hex8", (3, 3, 3))
    dh = DofHandler(mesh).add_field("u", order=1).close()
    coords = dh.field_dof_coords("u")
    # u = affine field -> exact at arbitrary interior points
    u = jnp.asarray(2.0 * coords[:, 0] - coords[:, 1] + 0.5 * coords[:, 2])
    pts = np.array([[0.5, 0.5, 0.5], [0.123, 0.871, 0.44], [1.0, 1.0, 1.0]])
    ph = PointEvalHandler(mesh, pts)
    assert ph.missing.size == 0
    vals = ph.evaluate(dh, "u", u)
    expect = 2 * pts[:, 0] - pts[:, 1] + 0.5 * pts[:, 2]
    assert np.allclose(vals, expect, atol=1e-10)
    # a point outside the mesh is reported missing, not silently wrong
    ph2 = PointEvalHandler(mesh, [[5.0, 5.0, 5.0]])
    assert ph2.missing.size == 1
    assert np.isnan(ph2.evaluate(dh, "u", u)).all()


def test_intergrid_transfer():
    """Heart -> torso style transfer: affine fields transfer exactly."""
    heart = tb.generate_mesh("hex8", (2, 2, 2), (0.25, 0.25, 0.25),
                             (0.75, 0.75, 0.75))
    torso = tb.generate_mesh("hex8", (3, 3, 3))
    dh_h = DofHandler(heart).add_field("phi").close()
    coords_h = dh_h.field_dof_coords("phi")
    u_h = jnp.asarray(coords_h[:, 0] + 3 * coords_h[:, 2])
    dh_t = DofHandler(torso).add_field("phi").close()
    coords_t = dh_t.field_dof_coords("phi")
    inside = ((coords_t >= 0.25 - 1e-9) & (coords_t <= 0.75 + 1e-9)).all(1)
    op = NodalIntergridTransfer(heart, dh_h, "phi", coords_t)
    vals = op.transfer(u_h)
    expect = coords_t[:, 0] + 3 * coords_t[:, 2]
    assert np.allclose(vals[inside], expect[inside], atol=1e-10)
    assert np.isnan(vals[~inside]).all()


def test_hexahedralize_tris():
    """tri -> 3 quads through edge mids + centroid; volume and facetsets
    preserved (``tools.jl:1-5``)."""
    mesh = tb.generate_mesh("tri3", (3, 2))
    hexed = hexahedralize(mesh)
    assert hexed.elementtypes() == ("quad4",)
    assert hexed.ncells == mesh.ncells * 3
    assert np.isclose(_volume(hexed), 1.0, atol=1e-12)
    # every original facetset survives with 2 child facets per parent edge
    for name in mesh.facetsets:
        assert name in hexed.facetsets
        assert len(hexed.facetset(name)) == 2 * len(mesh.facetset(name))
    # all quads positively oriented
    dh = DofHandler(hexed).add_field("u").close()
    from thunderbolt_tpu.fem.forms import make_form_batch
    import jax.numpy as jnp
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    _, detJw = batch.geometry()
    assert float(detJw.min()) > 0


def test_hexahedralize_tets():
    """tet -> 4 corner hexes through edge mids, deduplicated face centroids
    and the cell centroid; exact volume, positive Jacobians, facetsets."""
    mesh = tb.generate_mesh("tet4", (2, 2, 2))
    hexed = hexahedralize(mesh)
    assert hexed.elementtypes() == ("hex8",)
    assert hexed.ncells == mesh.ncells * 4
    assert np.isclose(_volume(hexed), 1.0, atol=1e-12)
    for name in mesh.facetsets:
        assert name in hexed.facetsets
        # each boundary tri facet becomes 3 child quads
        assert len(hexed.facetset(name)) == 3 * len(mesh.facetset(name))
    dh = DofHandler(hexed).add_field("u").close()
    from thunderbolt_tpu.fem.forms import make_form_batch
    import jax.numpy as jnp
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    _, detJw = batch.geometry()
    assert float(detJw.min()) > 0
    # face centroids are shared: interior faces contribute exactly one node
    ntet_faces = len(np.unique(np.sort(np.concatenate([
        mesh.blocks[0].connectivity[:, list(f)]
        for f in mesh.blocks[0].element.facets]), axis=1), axis=0))
    p2_nodes = mesh.nnodes + len(np.unique(np.sort(np.concatenate([
        mesh.blocks[0].connectivity[:, list(e)]
        for e in mesh.blocks[0].element.edges]), axis=1), axis=0))
    assert hexed.nnodes == p2_nodes + ntet_faces + mesh.ncells


@pytest.mark.slow
def test_hexahedralized_tet_poisson():
    """End-to-end: solve Poisson on a hexahedralized tet mesh."""
    import jax.numpy as jnp
    from thunderbolt_tpu.fem.forms import (
        make_form_batch, element_diffusion, element_load, scatter_matrix,
        scatter_vector)
    from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
    from thunderbolt_tpu.fem.constraints import close_constraints
    from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner

    mesh = hexahedralize(tb.generate_mesh("tet4", (3, 3, 3)))
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    pattern = build_sparsity([dh.subdofs[0].cell_dofs], dh.ndofs)
    Ke = element_diffusion(batch, D=1.0)
    kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kv)
    f = 3 * np.pi ** 2 * np.prod(np.sin(np.pi * np.asarray(batch.xq)), -1)
    b = scatter_vector(element_load(batch, jnp.asarray(f)),
                       batch.cell_dofs, dh.ndofs)
    names = ["left", "right", "front", "back", "bottom", "top"]
    ch = close_constraints(dh, [tb.Dirichlet("u", n, 0.0) for n in names],
                           dtype=jnp.float64)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, b)
    x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                 rtol=1e-10, atol=1e-12, maxiter=3000)
    assert bool(info.converged)
    coords = dh.field_dof_coords("u")
    exact = np.prod(np.sin(np.pi * coords), axis=-1)
    assert np.abs(np.asarray(x) - exact).max() < 0.08
