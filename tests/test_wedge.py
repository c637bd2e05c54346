"""Wedge (triangular prism) element support (VERDICT r1 item 9).

Parity: the reference's cell-geometry union includes ``Wedge``
(``src/mesh/meshes.jl:15-16``); its ideal-LV generator emits wedge apex
cells (``generators.jl:584``). Covers: reference element + quadrature,
box wedge generation, Poisson convergence vs hex on the same geometry,
P2 (wedge18) exactness, facet batches (tri caps + quad sides),
hexahedralize, uniform refinement, CARP "Pr" loading.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.mesh.elements import get_element, facet_type
from thunderbolt_tpu.mesh.quadrature import quadrature_rule
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_diffusion, element_mass, element_load,
    scatter_matrix, scatter_vector)
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
from thunderbolt_tpu.fem.constraints import Dirichlet, close_constraints
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner

DT = jnp.float64


@pytest.mark.parametrize("name", ["wedge6", "wedge18"])
def test_wedge_shape_functions(name):
    el = get_element(name)
    # Kronecker property at the nodes
    N = el.shape(el.ref_nodes)
    np.testing.assert_allclose(N, np.eye(el.nnodes), atol=1e-12)
    # partition of unity + zero gradient sum at random points
    rng = np.random.default_rng(0)
    xi = rng.random((20, 3)) * [0.5, 0.5, 1.0]
    np.testing.assert_allclose(el.shape(xi).sum(-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(el.grad(xi).sum(-2), 0.0, atol=1e-12)


def test_wedge_quadrature_volume_and_degree():
    for deg in (1, 2, 3, 4):
        qr = quadrature_rule("wedge6", deg)
        assert abs(qr.weights.sum() - 0.5) < 1e-12
    # exact integration of x^2 * z^2 over the reference prism:
    # int_tri x^2 dA = 1/12, int_0^1 z^2 dz = 1/3
    qr = quadrature_rule("wedge6", 4)
    val = (qr.weights * qr.points[:, 0] ** 2 * qr.points[:, 2] ** 2).sum()
    assert abs(val - (1.0 / 12.0) * (1.0 / 3.0)) < 1e-12


def _setup(mesh, order=1):
    dh = DofHandler(mesh).add_field("u", order=order).close()
    sub = dh.subdofs[0]
    batch = make_form_batch(dh, sub, dtype=DT)
    pattern = build_sparsity([sub.cell_dofs], dh.ndofs)
    return dh, sub, batch, pattern


def test_wedge_mass_total():
    """sum_ij M_ij = |Omega| on a wedge box."""
    mesh = tb.generate_mesh("wedge6", (3, 3, 3))
    dh, sub, batch, pattern = _setup(mesh)
    Me = element_mass(batch)
    total = float(Me.sum())
    assert abs(total - 1.0) < 1e-10


@pytest.mark.slow
def test_wedge_poisson_matches_hex():
    """-lap u = f manufactured solution: wedge solution converges to the
    same field as hex8 on the same box (the VERDICT 'done' criterion)."""
    errs = {}
    for celltype in ("hex8", "wedge6"):
        mesh = tb.generate_mesh(celltype, (6, 6, 6))
        dh, sub, batch, pattern = _setup(mesh)

        def uex(x):
            return np.prod(np.sin(np.pi * x), axis=-1)

        Ke = element_diffusion(batch, D=1.0)
        kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]),
                            pattern.nnz)
        A_raw = csr_to_ell(pattern, -kv)
        f = 3 * np.pi ** 2 * uex(np.asarray(batch.xq))
        b = scatter_vector(element_load(batch, jnp.asarray(f, DT)),
                           batch.cell_dofs, dh.ndofs)
        names = ["left", "right", "front", "back", "bottom", "top"]
        ch = close_constraints(
            dh, [Dirichlet("u", n, 0.0) for n in names], dtype=DT)
        A = ch.apply_operator(A_raw)
        b = ch.apply_rhs(A_raw, b)
        x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                     rtol=1e-11, atol=1e-13, maxiter=4000)
        assert bool(info.converged)
        coords = dh.field_dof_coords("u")
        errs[celltype] = np.abs(np.asarray(x) - uex(coords)).max()
    # both discretizations resolve the field; wedge error is the same
    # order as hex on the identical geometry
    assert errs["wedge6"] < 0.05, errs
    assert errs["wedge6"] < 4.0 * errs["hex8"], errs


def test_wedge18_quadratic_exactness():
    """A P2 field on wedge18 reproduces a quadratic exactly (Laplace with
    inhomogeneous quadratic-harmonic boundary data)."""
    mesh = tb.generate_mesh("wedge6", (2, 2, 2))
    dh, sub, batch, pattern = _setup(mesh, order=2)
    Ke = element_diffusion(batch, D=1.0)
    kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kv)

    def g(x):
        return x[:, 0] ** 2 - x[:, 1] ** 2 + x[:, 0] * x[:, 2]  # harmonic

    names = ["left", "right", "front", "back", "bottom", "top"]
    ch = close_constraints(dh, [Dirichlet("u", n, g) for n in names],
                           dtype=DT)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, jnp.zeros(dh.ndofs, DT))
    x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                 rtol=1e-12, atol=1e-14, maxiter=4000)
    coords = dh.field_dof_coords("u")
    np.testing.assert_allclose(np.asarray(x), g(coords), atol=1e-8)


def test_wedge_facet_batches():
    """Facet areas from both facet families: quad sides and tri caps."""
    from thunderbolt_tpu.fem.facets import make_facet_batch
    import jax
    mesh = tb.generate_mesh("wedge6", (3, 3, 3))
    dh = DofHandler(mesh).add_field("u", order=1).close()
    for fsname, expect in (("left", 1.0), ("top", 1.0)):
        fb = make_facet_batch(dh, "u", fsname, dtype=DT)
        nda = jax.vmap(lambda X: fb.normal_da(X))(fb.Xf)
        area = float((jnp.linalg.norm(nda, axis=-1) *
                      fb.wq[None, :]).sum())
        assert abs(area - expect) < 1e-10, (fsname, area)
    # the top set is triangles, the left set quads
    assert facet_type(get_element("wedge6"), 1) == "tri3"
    assert facet_type(get_element("wedge6"), 2) == "quad4"


def test_wedge_hexahedralize():
    """wedge -> 6 hexes, volume preserved, facetsets transfer."""
    from thunderbolt_tpu.mesh.tools import hexahedralize
    mesh = tb.generate_mesh("wedge6", (2, 2, 2))
    out = hexahedralize(mesh)
    assert all(b.celltype == "hex8" for b in out.blocks)
    assert out.ncells == 6 * mesh.ncells
    dh, sub, batch, pattern = _setup(out)
    assert abs(float(element_mass(batch).sum()) - 1.0) < 1e-10
    assert "left" in out.facetsets and "top" in out.facetsets


def test_wedge_uniform_refinement():
    from thunderbolt_tpu.mesh.tools import uniform_refinement
    mesh = tb.generate_mesh("wedge6", (2, 2, 2))
    fine = uniform_refinement(mesh)
    assert fine.ncells == 8 * mesh.ncells
    dh, sub, batch, pattern = _setup(fine)
    assert abs(float(element_mass(batch).sum()) - 1.0) < 1e-10


def test_carp_prism_roundtrip(tmp_path):
    """CARP loader accepts 'Pr' prism elements (ref tools.jl:660)."""
    from thunderbolt_tpu.mesh.tools import load_carp_grid
    mesh = tb.generate_mesh("wedge6", (2, 2, 1))
    base = os.path.join(tmp_path, "prism")
    with open(base + ".pts", "w") as f:
        f.write(f"{mesh.nnodes}\n")
        for p in mesh.nodes:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    with open(base + ".elem", "w") as f:
        f.write(f"{mesh.ncells}\n")
        for row in mesh.blocks[0].connectivity:
            f.write("Pr " + " ".join(str(int(v)) for v in row) + " 7\n")
    loaded = load_carp_grid(base)
    assert loaded.blocks[0].celltype == "wedge6"
    assert loaded.ncells == mesh.ncells
    np.testing.assert_allclose(loaded.nodes, mesh.nodes)
    assert "7" in loaded.cellsets
    dh, sub, batch, pattern = _setup(loaded)
    assert abs(float(element_mass(batch).sum()) -
               float(element_mass(_setup(mesh)[2]).sum())) < 1e-12


def test_split_facetset_by_type():
    """A facetset mixing wedge caps (tri) and sides (quad) splits into
    per-type sets that facet batches accept (the documented workaround
    for the one-type-per-batch rule, now automated)."""
    from thunderbolt_tpu.mesh.tools import split_facetset_by_type
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.facets import make_facet_batch
    mesh = tb.generate_mesh("wedge6", (2, 2, 2))
    mixed = mesh.boundary_facets()
    mesh.facetsets["all"] = mixed
    names = split_facetset_by_type(mesh, "all")
    assert sorted(names) == ["all:quad4", "all:tri3"]
    assert (len(mesh.facetset("all:quad4"))
            + len(mesh.facetset("all:tri3"))) == len(mixed)
    dh = DofHandler(mesh).add_field("u").close()
    for nm in names:
        fb = make_facet_batch(dh, "u", nm, dtype=jnp.float64)
        assert fb.nfacets == len(mesh.facetset(nm))
    # single-type set is a no-op
    mesh.facetsets["quadsonly"] = mesh.facetset("all:quad4")
    assert split_facetset_by_type(mesh, "quadsonly") == ["quadsonly"]
