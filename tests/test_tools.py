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
