"""Mesh generators: volumes, facetsets, quadratic elevation, ring/LV.
Parity with the reference's ``test_mesh.jl`` (SURVEY.md §4)."""

import numpy as np
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu import generate_mesh, generate_ring_mesh, generate_ideal_lv_mesh
from thunderbolt_tpu.mesh.elements import get_element
from thunderbolt_tpu.mesh.quadrature import quadrature_rule
from thunderbolt_tpu.utils.smallmat import det_small
import jax.numpy as jnp


def mesh_volume(mesh):
    vol = 0.0
    for b in mesh.blocks:
        el = b.element
        qr = quadrature_rule(b.celltype, 2 * el.order)
        dN = el.grad(qr.points)  # [nqp, nb, dim]
        Xe = mesh.nodes[b.connectivity]  # [nc, nb, dim]
        J = np.einsum("qbr,cbs->cqsr", dN, Xe)
        detJ = np.asarray(det_small(jnp.asarray(J)))
        vol += (detJ * qr.weights[None]).sum()
    return vol


@pytest.mark.parametrize("celltype,dims", [
    ("line2", (4,)), ("line3", (4,)),
    ("quad4", (3, 4)), ("quad9", (3, 4)),
    ("tri3", (3, 4)), ("tri6", (3, 4)),
    ("hex8", (2, 3, 2)), ("hex27", (2, 2, 2)),
    ("tet4", (2, 3, 2)), ("tet10", (2, 2, 2)),
])
def test_generate_mesh_volume(celltype, dims):
    cmin = np.zeros(len(dims))
    cmax = np.array([1.5, 2.0, 0.5][: len(dims)])
    mesh = generate_mesh(celltype, dims, cmin, cmax)
    assert np.isclose(mesh_volume(mesh), np.prod(cmax - cmin), rtol=1e-10)
    assert mesh.blocks[0].celltype == celltype
    # positive Jacobians everywhere
    b = mesh.blocks[0]
    el = b.element
    qr = quadrature_rule(celltype, 2)
    dN = el.grad(qr.points)
    Xe = mesh.nodes[b.connectivity]
    J = np.einsum("qbr,cbs->cqsr", dN, Xe)
    detJ = np.asarray(det_small(jnp.asarray(J)))
    assert detJ.min() > 0


@pytest.mark.parametrize("celltype,dims", [
    ("quad4", (3, 4)), ("tri3", (3, 4)), ("hex8", (2, 3, 2)),
    ("tet4", (2, 2, 2)), ("quad9", (3, 3)), ("hex27", (2, 2, 2)),
])
def test_box_facetsets(celltype, dims):
    mesh = generate_mesh(celltype, dims)
    dim = len(dims)
    names = ["left", "right", "bottom", "top"] if dim == 2 else \
        ["left", "right", "front", "back", "bottom", "top"]
    for n in names:
        assert n in mesh.facetsets and len(mesh.facetsets[n]) > 0, n
    total = sum(len(v) for v in mesh.facetsets.values())
    assert total == len(mesh.boundary_facets())
    # left nodes all have x == 0
    assert np.allclose(mesh.nodes[mesh.nodesets["left"], 0], 0.0)
    assert np.allclose(mesh.nodes[mesh.nodesets["right"], 0], 1.0)


def test_ring_mesh():
    mesh = generate_ring_mesh(12, 3, 2, inner_radius=0.75, outer_radius=1.0,
                              longitudinal_upper=0.2)
    exact = np.pi * (1.0 ** 2 - 0.75 ** 2) * 0.2
    # polygonal ring is slightly smaller than the circular one
    assert abs(mesh_volume(mesh) - exact) / exact < 0.05
    for n in ("Endocardium", "Epicardium", "Top", "Bottom"):
        assert n in mesh.facetsets
    r_endo = np.linalg.norm(mesh.nodes[mesh.nodesets["Endocardium"], :2], axis=1)
    assert np.allclose(r_endo, 0.75, atol=1e-10)


def test_ideal_lv_mesh():
    mesh = generate_ideal_lv_mesh(8, 2, 4)
    vol = mesh_volume(mesh)
    assert vol > 0
    for n in ("Endocardium", "Epicardium", "Base"):
        assert n in mesh.facetsets and len(mesh.facetsets[n]) > 0
    assert "Apex" in mesh.nodesets
    # base facets sit at z >= longitudinal_upper
    base_nodes = mesh.nodes_of_facetset("Base")
    assert mesh.nodes[base_nodes, 2].min() > 0.19


def test_boundary_facet_count_quad():
    mesh = generate_mesh("quad4", (3, 3))
    assert len(mesh.boundary_facets()) == 4 * 3


def test_open_ring_mesh():
    """Open ring (``generators.jl:132``): no azimuthal wraparound, the
    reference facetset names, and anchor nodesets."""
    ne_c, ne_r, ne_l = 8, 2, 3
    m = tb.generate_open_ring_mesh(ne_c, ne_r, ne_l, np.pi / 2)
    assert m.nnodes == (ne_c + 1) * (ne_r + 1) * (ne_l + 1)
    assert m.ncells == ne_c * ne_r * ne_l
    assert len(m.facetsets["Endocardium"]) == ne_c * ne_l
    assert len(m.facetsets["Epicardium"]) == ne_c * ne_l
    assert len(m.facetsets["Open1"]) == ne_r * ne_l
    assert len(m.facetsets["Open2"]) == ne_r * ne_l
    assert len(m.facetsets["Base"]) == ne_c * ne_r
    assert len(m.facetsets["Myocardium"]) == ne_c * ne_r
    for k in range(1, 5):
        assert len(m.nodesets[f"MyocardialAnchor{k}"]) == 1
    # opening: no node in the +-opening_angle/2 sector around theta=0
    th = np.mod(np.arctan2(m.nodes[:, 1], m.nodes[:, 0]), 2 * np.pi)
    gap = np.pi / 2
    assert np.all((th >= gap / 2 - 1e-9) & (th <= 2 * np.pi - gap / 2 + 1e-9))


def test_quadratic_open_ring_mesh():
    m = tb.generate_quadratic_open_ring_mesh(4, 2, 2, np.pi / 3)
    assert m.blocks[0].celltype == "hex27"
    assert m.ncells == 4 * 2 * 2
    assert "Open1" in m.facetsets and "Open2" in m.facetsets


# --- surface extraction + geometry tools (ref test_mesh.jl:140-156) ---------

def test_surface_extraction_box():
    box = generate_mesh("hex8", (4, 4, 4))
    s = tb.extract_outer_surface_mesh(box)
    assert s.ncells == 6 * 16                    # 6 faces x 4x4 quads
    assert s.nnodes == 5 ** 3 - 3 ** 3           # all but interior nodes
    assert s.elementtypes() == ("quad4",)
    # facetsets become surface cellsets of the right cardinality
    for name in ("left", "right", "top", "bottom", "front", "back"):
        assert len(s.cellsets[name]) == 16
    # surface cells are geometrically on the boundary
    for b in s.blocks:
        X = s.nodes[b.connectivity]              # [nc, 4, 3]
        on_bdy = np.isclose(X, 0.0) | np.isclose(X, 1.0)
        assert np.all(on_bdy.any(axis=2).all(axis=1))


def test_surface_extraction_lv():
    # reference expected counts (test/test_mesh.jl:140-150) reproduced by
    # our hex-plug LV: apex quads collapse to tri3 shells
    lv = generate_ideal_lv_mesh(4, 2, 2)
    s = tb.extract_outer_surface_mesh(lv)
    assert len(s.cellsets) == 3
    assert len(s.cellsets["Epicardium"]) == 3 * 4
    assert len(s.cellsets["Endocardium"]) == 3 * 4
    assert len(s.cellsets["Base"]) == 4 * 2
    assert s.nnodes == 2 + 3 * 2 * 4 + 4
    assert s.ncells == 2 * 4 + 2 * 4 * (2 + 1)
    assert set(s.elementtypes()) == {"quad4", "tri3"}


def test_surface_extraction_subdomain_and_quadratic():
    box = generate_mesh("hex8", (4, 4, 4))
    box.cellsets["half"] = np.arange(box.ncells // 2)
    s = tb.extract_outer_surface_mesh(box, subdomains=["half"])
    # 4x4x2 slab: 2 big faces (16 each) + 4 side slabs (8 each)
    assert s.ncells == 2 * 16 + 4 * 8
    assert "right" not in s.cellsets             # cut plane is not 'right'
    q = tb.generate_quadratic_ring_mesh(5, 3, 3)
    sq = tb.extract_outer_surface_mesh(q)
    assert sq.elementtypes() == ("quad9",)
    assert len(sq.cellsets["Endocardium"]) == 5 * 3


def test_geometry_tools_centers():
    # ref test_mesh.jl:152-156 — ring centers vanish in x,y by symmetry
    ring = generate_ring_mesh(5, 4, 4)
    zmid = 0.5 * (ring.nodes[:, 2].min() + ring.nodes[:, 2].max())
    com = tb.compute_center_of_mass(ring)
    assert np.allclose(com[:2], 0.0, atol=1e-12)
    assert np.isclose(com[2], zmid, atol=1e-12)
    cos = tb.compute_center_of_surface(ring, "Endocardium")
    assert np.allclose(cos[:2], 0.0, atol=1e-12)
    assert np.isclose(cos[2], zmid, atol=1e-12)
    # exact volume centroid on the unit box, full and half domain
    box = generate_mesh("hex8", (4, 4, 4))
    assert np.allclose(tb.compute_center_of_mass(box), [0.5, 0.5, 0.5])
    box.cellsets["half"] = np.arange(box.ncells // 2)
    assert np.allclose(tb.compute_center_of_mass(box, "half"),
                       [0.25, 0.5, 0.5])


def test_surface_extraction_facetset_key_no_alias():
    """A facetset entry whose local-facet index exceeds the boundary
    census's max must not alias another (cell, facet) pair (mixed
    hex+tet mesh, subdomain extraction)."""
    hexes = generate_mesh("hex8", (1, 1, 1))
    # one tet glued conceptually apart (indices offset); build a 2-block mesh
    tet_nodes = np.array([[2.0, 0, 0], [3.0, 0, 0], [2.0, 1, 0],
                          [2.0, 0, 1]])
    nodes = np.vstack([hexes.nodes, tet_nodes])
    from thunderbolt_tpu.mesh.mesh import ElementBlock, Mesh
    mesh = Mesh(nodes, [
        ElementBlock("hex8", hexes.blocks[0].connectivity),
        ElementBlock("tet4", np.array([[8, 9, 10, 11]], np.int32)),
    ])
    mesh.cellsets["tets"] = np.array([1])
    # facetset on the hex with local facet 5 (> any tet local facet id)
    mesh.facetsets["hextop"] = np.array([[0, 5]])
    s = tb.extract_outer_surface_mesh(mesh, subdomains=["tets"])
    assert s.ncells == 4 and s.elementtypes() == ("tri3",)
    assert "hextop" not in s.cellsets       # no aliased match


def test_predicate_set_builders():
    """Ferrite add*set! idiom (used throughout the reference's tests,
    e.g. test_mesh.jl:31-57): predicate-based cell/facet/node sets; a
    predicate-built facetset matches the generator's canonical one."""
    m = generate_mesh("hex8", (3, 3, 3))
    right = m.add_facetset("right_new", lambda x: np.isclose(x[:, 0], 1.0))
    canon = m.facetset("right")
    assert {tuple(r) for r in right} == {tuple(r) for r in canon}
    cs = m.add_cellset("right_cells", lambda x: x[:, 0] >= 2 / 3 - 1e-9)
    assert len(cs) == 9
    ns = m.add_nodeset("corner", lambda x: np.isclose(x, 0.0).all(axis=1))
    assert len(ns) == 1
