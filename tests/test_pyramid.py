"""Pyramid element support (completes VERDICT r1 item 9's Wedge/Pyramid pair).

Parity: the reference's cell-geometry union includes ``Pyramid``
(``src/mesh/meshes.jl:15-16``) and its MFEM loader emits pyramids
(``src/mesh/tools.jl:545``). Covers: rational reference element +
conical-product quadrature, box pyramid generation (hex -> 6 pyramids),
Poisson convergence vs hex on the same geometry, facet batches,
MFEM/voom2 loading, and the linear-only guard (no P2/refine — matching
the reference, which refines hexahedra only).
"""

import os

import numpy as np
import pytest
import jax
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


def test_pyramid_facet_traces():
    """The rational basis restricts to quad4 bilinears on the base and to
    tri3 affine functions on the sides — the conformity property that lets
    pyramids glue hex and tet regions."""
    el = get_element("pyramid5")
    quad = get_element("quad4")
    # base facet (0,3,2,1): zeta = 0
    s = np.linspace(-0.9, 0.9, 5)
    xy = np.stack(np.meshgrid(s, s), -1).reshape(-1, 2)
    base_pts = np.concatenate([xy, np.zeros((len(xy), 1))], axis=1)
    N = el.shape(base_pts)
    np.testing.assert_allclose(N[:, 4], 0.0, atol=1e-14)
    np.testing.assert_allclose(N[:, :4], quad.shape(xy), atol=1e-12)
    # side facet (0,1,4): eta = -(1 - zeta); trace is affine in (xi, zeta)
    t = np.linspace(0.05, 0.9, 7)
    for frac in (0.2, 0.5, 0.8):
        pts = np.stack([(2 * frac - 1) * (1 - t), -(1 - t), t], -1)
        N = el.shape(pts)
        np.testing.assert_allclose(N[:, 2], 0.0, atol=1e-14)
        np.testing.assert_allclose(N[:, 3], 0.0, atol=1e-14)
        # affine nodal values on the triangle (node0, node1, apex)
        np.testing.assert_allclose(N[:, 0], (1 - t) * (1 - frac), atol=1e-12)
        np.testing.assert_allclose(N[:, 1], (1 - t) * frac, atol=1e-12)
        np.testing.assert_allclose(N[:, 4], t, atol=1e-12)
    assert facet_type(el, 0) == "quad4"
    assert facet_type(el, 1) == "tri3"


def test_pyramid_quadrature_exactness():
    """Volume 4/3 at every degree; conical rule integrates monomials that
    the rational basis products produce."""
    for deg in (1, 2, 3, 4):
        qr = quadrature_rule("pyramid5", deg)
        assert abs(qr.weights.sum() - 4.0 / 3.0) < 1e-12
    qr = quadrature_rule("pyramid5", 4)
    # int z^k over pyramid (base [-1,1]^2, apex height 1):
    # cross-section area 4(1-z)^2 -> 8 / ((k+1)(k+2)(k+3))
    for k in (1, 2, 3, 4):
        val = (qr.weights * qr.points[:, 2] ** k).sum()
        exact = 8.0 / ((k + 1) * (k + 2) * (k + 3))
        assert abs(val - exact) < 1e-12, k
    # int x^2: per cross-section 4(1-z)^4/3 -> 4/15
    val = (qr.weights * qr.points[:, 0] ** 2).sum()
    assert abs(val - 4.0 / 15.0) < 1e-12


def _setup(mesh, order=1):
    dh = DofHandler(mesh).add_field("u", order=order).close()
    sub = dh.subdofs[0]
    batch = make_form_batch(dh, sub, dtype=DT)
    pattern = build_sparsity([sub.cell_dofs], dh.ndofs)
    return dh, sub, batch, pattern


def test_pyramid_box_generation_and_mass():
    """hex -> 6 pyramids per cell; conforming, positive Jacobians,
    total mass = |Omega|."""
    mesh = tb.generate_mesh("pyramid5", (3, 2, 2))
    nhex = 3 * 2 * 2
    assert mesh.ncells == 6 * nhex
    assert mesh.nnodes == 4 * 3 * 3 + nhex  # grid + centroids
    dh, sub, batch, pattern = _setup(mesh)
    assert abs(float(element_mass(batch).sum()) - 1.0) < 1e-10
    # positive Jacobian determinants at every quadrature point
    J = np.einsum("qbr,cbs->cqsr", np.asarray(batch.dNgeo),
                  np.asarray(batch.Xe))
    assert np.linalg.det(J).min() > 0.0


@pytest.mark.slow
def test_pyramid_poisson_matches_hex():
    """-lap u = f manufactured solution: pyramid solution converges to the
    same field as hex8 on the same box."""
    errs = {}
    for celltype in ("hex8", "pyramid5"):
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
    assert errs["pyramid5"] < 0.05, errs
    assert errs["pyramid5"] < 4.0 * errs["hex8"], errs


def test_pyramid_linear_exactness():
    """u = x is reproduced exactly (linear completeness survives assembly,
    Dirichlet elimination, and the rational Jacobians)."""
    mesh = tb.generate_mesh("pyramid5", (2, 2, 2))
    dh, sub, batch, pattern = _setup(mesh)
    Ke = element_diffusion(batch, D=1.0)
    kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kv)
    ch = close_constraints(
        dh, [Dirichlet("u", "left", 0.0), Dirichlet("u", "right", 1.0)],
        dtype=DT)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, jnp.zeros(dh.ndofs, DT))
    x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                 rtol=1e-12, atol=1e-14, maxiter=4000)
    coords = dh.field_dof_coords("u")
    np.testing.assert_allclose(np.asarray(x), coords[:, 0], atol=1e-9)


def test_pyramid_facet_batches():
    """Boundary facets of the pyramid box are base quads; areas and
    outward normals match the box surfaces."""
    from thunderbolt_tpu.fem.facets import make_facet_batch
    mesh = tb.generate_mesh("pyramid5", (3, 3, 3))
    dh = DofHandler(mesh).add_field("u", order=1).close()
    for fsname, axis, sign in (("left", 0, -1.0), ("top", 2, 1.0)):
        fb = make_facet_batch(dh, "u", fsname, dtype=DT)
        nda = jax.vmap(lambda X: fb.normal_da(X))(fb.Xf)
        area = float((jnp.linalg.norm(nda, axis=-1) * fb.wq[None, :]).sum())
        assert abs(area - 1.0) < 1e-10, (fsname, area)
        n = np.asarray(nda).reshape(-1, 3)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        expect = np.zeros(3)
        expect[axis] = sign
        np.testing.assert_allclose(n, np.broadcast_to(expect, n.shape),
                                   atol=1e-12)


def test_mfem_pyramid_and_prism_loading(tmp_path):
    """MFEM loader accepts geometry types 6 (prism) and 7 (pyramid)
    (ref tools.jl:543-545)."""
    from thunderbolt_tpu.mesh.tools import load_mfem_grid
    pyr = tb.generate_mesh("pyramid5", (1, 1, 1))
    path = os.path.join(tmp_path, "pyr.mesh")
    with open(path, "w") as f:
        f.write("MFEM mesh v1.0\n\ndimension\n3\n\nelements\n")
        f.write(f"{pyr.ncells}\n")
        for row in pyr.blocks[0].connectivity:
            f.write("1 7 " + " ".join(str(int(v)) for v in row) + "\n")
        f.write(f"\nvertices\n{pyr.nnodes}\n3\n")
        for p in pyr.nodes:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    loaded = load_mfem_grid(path)
    assert loaded.blocks[0].celltype == "pyramid5"
    assert loaded.ncells == pyr.ncells
    dh, sub, batch, pattern = _setup(loaded)
    assert abs(float(element_mass(batch).sum()) - 1.0) < 1e-10


def test_voom2_pyramid_loading(tmp_path):
    """voom2 loader dispatches 5-node elements to pyramid5
    (ref tools.jl:491 family)."""
    from thunderbolt_tpu.mesh.tools import load_voom2_grid
    pyr = tb.generate_mesh("pyramid5", (1, 1, 1))
    base = os.path.join(tmp_path, "pyr")
    with open(base + ".nodes", "w") as f:
        f.write(f"{pyr.nnodes} 3 0 0\n")
        for i, p in enumerate(pyr.nodes):
            f.write(f"{i + 1} {p[0]} {p[1]} {p[2]}\n")
    with open(base + ".ele", "w") as f:
        f.write(f"{pyr.ncells}\n")
        for k, row in enumerate(pyr.blocks[0].connectivity):
            f.write(f"{k + 1} 5 "
                    + " ".join(str(int(v) + 1) for v in row) + "\n")
    loaded = load_voom2_grid(base)
    assert loaded.blocks[0].celltype == "pyramid5"
    np.testing.assert_allclose(loaded.nodes, pyr.nodes)


def test_pyramid_is_linear_only():
    """P2 elevation (and with it uniform refinement) raises the documented
    guard — the reference likewise only refines hexahedra."""
    mesh = tb.generate_mesh("pyramid5", (1, 1, 1))
    with pytest.raises(NotImplementedError, match="linear-only"):
        tb.elevate_to_quadratic(mesh)
    from thunderbolt_tpu.mesh.tools import uniform_refinement
    with pytest.raises(NotImplementedError, match="linear-only"):
        uniform_refinement(mesh)
