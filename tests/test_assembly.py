"""Assembly + CG substrate: mass/diffusion matrices against analytic facts,
Poisson solves against manufactured solutions. Parity with the reference's
diffusion-operator tests (``test/gpu/diffusion-test.jl``, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thunderbolt_tpu import generate_mesh, Dirichlet
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_mass, element_diffusion, element_load,
    scatter_matrix, scatter_vector, lumped_mass,
)
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
from thunderbolt_tpu.fem.constraints import close_constraints
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner

DTYPE = jnp.float64


def setup_scalar(mesh, order=1, degree=None):
    dh = DofHandler(mesh)
    dh.add_field("u", order=order)
    dh.close()
    sub = dh.subdofs[0]
    batch = make_form_batch(dh, sub, degree=degree, dtype=DTYPE)
    pattern = build_sparsity([sub.cell_dofs], dh.ndofs)
    return dh, sub, batch, pattern


@pytest.mark.parametrize("celltype,dims,order", [
    ("quad4", (4, 4), 1), ("tri3", (4, 4), 1), ("hex8", (3, 3, 3), 1),
    ("tet4", (2, 2, 2), 1), ("quad9", (3, 3), 2), ("tri6", (3, 3), 2),
    ("hex27", (2, 2, 2), 2), ("tet10", (2, 2, 2), 2),
])
def test_mass_matrix_total(celltype, dims, order):
    """sum_ij M_ij = |Omega|, row sums > 0 (P1)."""
    mesh = generate_mesh(celltype, dims)
    dh, sub, batch, pattern = setup_scalar(mesh, order=order)
    Me = element_mass(batch)
    vals = scatter_matrix(Me, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    assert np.isclose(float(vals.sum()), 1.0, atol=1e-10)
    M = csr_to_ell(pattern, vals)
    ones = jnp.ones(dh.ndofs, DTYPE)
    assert np.isclose(float(ones @ M.mv(ones)), 1.0, atol=1e-10)
    # lumped mass sums to volume too
    ml = lumped_mass(batch, dh.ndofs)
    assert np.isclose(float(ml.sum()), 1.0, atol=1e-10)


@pytest.mark.parametrize("celltype,dims", [
    ("quad4", (4, 4)), ("tri3", (4, 4)), ("hex8", (2, 2, 2)),
])
def test_stiffness_nullspace(celltype, dims):
    """K @ const = 0 and K is symmetric negative semidefinite."""
    mesh = generate_mesh(celltype, dims)
    dh, sub, batch, pattern = setup_scalar(mesh)
    Ke = element_diffusion(batch, D=1.0)
    vals = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    K = csr_to_ell(pattern, vals)
    c = jnp.full(dh.ndofs, 3.7, DTYPE)
    assert np.allclose(np.asarray(K.mv(c)), 0.0, atol=1e-10)
    x = jnp.asarray(np.random.default_rng(0).normal(size=dh.ndofs))
    assert float(x @ K.mv(x)) <= 1e-12


@pytest.mark.parametrize("celltype,dims,order,tol", [
    ("quad4", (16, 16), 1, 2e-2), ("tri3", (16, 16), 1, 2e-2),
    ("quad9", (8, 8), 2, 2e-3), ("tri6", (8, 8), 2, 2e-3),
    ("hex8", (8, 8, 8), 1, 5e-2), ("tet10", (4, 4, 4), 2, 2e-2),
    ("hex27", (3, 3, 3), 2, 2e-2),
])
def test_poisson_manufactured(celltype, dims, order, tol):
    """-div(grad u) = f with u = prod sin(pi x_d), Dirichlet 0."""
    mesh = generate_mesh(celltype, dims)
    dh, sub, batch, pattern = setup_scalar(mesh, order=order)
    dim = mesh.sdim

    def uexact(x):
        return np.prod(np.sin(np.pi * x), axis=-1)

    Ke = element_diffusion(batch, D=1.0)  # = -∫∇N⋅∇N
    kvals = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kvals)  # positive definite Laplacian
    f = dim * np.pi ** 2 * np.asarray(uexact(np.asarray(batch.xq)))
    fe = element_load(batch, jnp.asarray(f, DTYPE))
    b = scatter_vector(fe, batch.cell_dofs, dh.ndofs)

    names = ["left", "right", "bottom", "top"] if dim == 2 else \
        ["left", "right", "front", "back", "bottom", "top"]
    ch = close_constraints(
        dh, [Dirichlet("u", n, 0.0) for n in names], dtype=DTYPE)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, b)
    Minv = jacobi_preconditioner(A.diagonal())
    x, info = cg(A.mv, b, Minv=Minv, rtol=1e-10, atol=1e-12, maxiter=2000)
    assert bool(info.converged)

    coords = dh.field_dof_coords("u")
    err = np.abs(np.asarray(x) - uexact(coords))
    assert err.max() < tol, err.max()


def test_dirichlet_inhomogeneous():
    """Laplace with u=g on boundary reproduces the linear exact solution."""
    mesh = generate_mesh("quad4", (8, 8))
    dh, sub, batch, pattern = setup_scalar(mesh)
    Ke = element_diffusion(batch, D=1.0)
    kvals = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A_raw = csr_to_ell(pattern, -kvals)

    g = lambda x: 2.0 * x[:, 0] - 0.5 * x[:, 1] + 1.0
    names = ["left", "right", "bottom", "top"]
    ch = close_constraints(
        dh, [Dirichlet("u", n, g) for n in names], dtype=DTYPE)
    A = ch.apply_operator(A_raw)
    b = ch.apply_rhs(A_raw, jnp.zeros(dh.ndofs, DTYPE))
    x, info = cg(A.mv, b, rtol=1e-12, atol=1e-14, maxiter=2000)
    coords = dh.field_dof_coords("u")
    assert np.allclose(np.asarray(x), g(coords), atol=1e-8)


def test_anisotropic_diffusion_tensor():
    """Tensor D reproduces the quadratic exact solution's bilinear energy."""
    mesh = generate_mesh("quad4", (6, 6))
    dh, sub, batch, pattern = setup_scalar(mesh, degree=4)
    D = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
    Ke = element_diffusion(batch, D=jnp.asarray(D))
    kvals = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    K = csr_to_ell(pattern, kvals)
    # u = x => energy = -u'Ku = ∫ e_x . D e_x = D[0,0]*|Omega|
    coords = dh.field_dof_coords("u")
    ux = jnp.asarray(coords[:, 0])
    assert np.isclose(float(-(ux @ K.mv(ux))), D[0, 0], rtol=1e-10)
    uy = jnp.asarray(coords[:, 1])
    assert np.isclose(float(-(uy @ K.mv(uy))), D[1, 1], rtol=1e-10)
    assert np.isclose(float(-(ux @ K.mv(uy))), D[0, 1], atol=1e-14)


def test_mixed_mesh_two_blocks():
    """Two blocks (quad + tri) share nodes; assembly is conforming."""
    from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
    # unit square: left half quads, right half triangles
    mq = generate_mesh("quad4", (2, 4), (0.0, 0.0), (0.5, 1.0))
    mt = generate_mesh("tri3", (2, 4), (0.5, 0.0), (1.0, 1.0))
    nodes = np.vstack([mq.nodes, mt.nodes])
    blocks = [ElementBlock("quad4", mq.blocks[0].connectivity),
              ElementBlock("tri3", mt.blocks[0].connectivity + mq.nnodes)]
    from thunderbolt_tpu.mesh.mesh import merge_duplicate_nodes
    nodes, blocks, _ = merge_duplicate_nodes(nodes, blocks)
    mesh = Mesh(nodes, blocks)
    dh = DofHandler(mesh).add_field("u").close()
    subs = dh.subdofs
    assert len(subs) == 2
    pattern = build_sparsity([s.cell_dofs for s in subs], dh.ndofs)
    total = 0.0
    for s, em in zip(subs, pattern.elem_maps):
        batch = make_form_batch(dh, s, dtype=DTYPE)
        Me = element_mass(batch)
        total += float(scatter_matrix(Me, jnp.asarray(em), pattern.nnz).sum())
    assert np.isclose(total, 1.0, atol=1e-10)
    assert dh.ndofs == mesh.nnodes


def test_pallas_dia_matches_xla():
    """The Pallas DIA kernel (interpret mode on CPU) matches the XLA path."""
    mesh = generate_mesh("quad4", (12, 12))
    dh, sub, batch, pattern = setup_scalar(mesh)
    from thunderbolt_tpu.fem.sparsity import csr_to_dia
    Ke = element_diffusion(batch, D=1.0)
    kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    A = csr_to_dia(pattern, kv, dtype=jnp.float32)
    assert A is not None
    x = jnp.asarray(np.random.default_rng(0).normal(size=dh.ndofs)
                    .astype(np.float32))
    from thunderbolt_tpu.ops.pallas_dia import dia_mv_pallas
    y_ref = A.mv(x)
    y_pal = dia_mv_pallas(A, x, interpret=True)
    assert np.allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)


def test_sym_dia_matches_full():
    """SymDIAMatrix (half-traffic symmetric storage) reproduces the full
    DIA SpMV and axpby exactly; asymmetric operators are rejected."""
    mesh = generate_mesh("quad4", (12, 12))
    dh, sub, batch, pattern = setup_scalar(mesh)
    from thunderbolt_tpu.fem.sparsity import csr_to_dia, dia_to_symmetric
    Ke = element_diffusion(batch, D=1.0)
    kv = scatter_matrix(Ke, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    Me = element_mass(batch)
    mv_ = scatter_matrix(Me, jnp.asarray(pattern.elem_maps[0]), pattern.nnz)
    K = csr_to_dia(pattern, kv)
    M = csr_to_dia(pattern, mv_)
    Ks, Ms = dia_to_symmetric(K), dia_to_symmetric(M)
    assert Ks is not None and Ms is not None
    assert Ks.offsets[0] == 0 and all(d >= 0 for d in Ks.offsets)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=dh.ndofs))
    assert np.allclose(np.asarray(Ks.mv(x)), np.asarray(K.mv(x)), atol=1e-12)
    assert np.allclose(np.asarray(Ms.diagonal()), np.asarray(M.diagonal()))
    A = M.axpby(1.0, K, -0.01)
    As = Ms.axpby(1.0, Ks, -0.01)
    assert np.allclose(np.asarray(As.mv(x)), np.asarray(A.mv(x)), atol=1e-12)
    # an asymmetric in-band perturbation must be rejected (A[0,1] != A[1,0])
    kp = K.offsets.index(1)
    bad = type(K)(K.offsets, K.diags.at[kp, 0].add(1.0), K.n)
    assert dia_to_symmetric(bad) is None


def test_mixed_hex_wedge_pyramid_transition_poisson():
    """One conforming 3D mesh with THREE element types — hexes, wedges
    (hex split along the xy diagonal) and pyramids (hex split into 6 about
    its centroid) — solving Laplace with u(0)=0, u(1)=1 across the
    transitions. Every type reproduces linears and all internal interfaces
    are matching quad faces, so u = x is exact. This is the pyramid's
    raison d'être: transition elements between structured and
    unstructured regions (ref ``src/mesh/meshes.jl:15-16``)."""
    from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
    from thunderbolt_tpu.mesh.elements import get_element
    import thunderbolt_tpu as tb

    base = generate_mesh("hex8", (6, 2, 2))
    conn = base.blocks[0].connectivity
    cent = base.nodes[conn].mean(axis=1)
    hex_cells = conn[cent[:, 0] < 1 / 3]
    wedge_src = conn[(cent[:, 0] >= 1 / 3) & (cent[:, 0] < 2 / 3)]
    pyr_src = conn[cent[:, 0] >= 2 / 3]

    # wedges: split along the xy diagonal (quad side faces conform)
    wedges = np.concatenate([wedge_src[:, [0, 1, 2, 4, 5, 6]],
                             wedge_src[:, [0, 2, 3, 4, 6, 7]]], axis=0)
    # pyramids: 6 per hex about the centroid (base quads = hex faces)
    hex_el = get_element("hex8")
    nc = pyr_src.shape[0]
    apex = base.nnodes + np.arange(nc, dtype=np.int64)
    centroids = base.nodes[pyr_src].mean(axis=1)
    pyrs = np.concatenate([
        np.concatenate([pyr_src[:, list(reversed(f))], apex[:, None]],
                       axis=1) for f in hex_el.facets], axis=0)
    nodes = np.vstack([base.nodes, centroids])
    mesh = Mesh(nodes, [ElementBlock("hex8", hex_cells),
                        ElementBlock("wedge6", wedges),
                        ElementBlock("pyramid5", pyrs)])
    bf = mesh.boundary_facets()
    # facetsets from boundary coordinates
    left, right = [], []
    for gc, lf in bf:
        bi, lc = mesh.block_of_cells([gc])
        b = mesh.blocks[int(bi[0])]
        pts = mesh.nodes[b.connectivity[int(lc[0]),
                                        list(b.element.facets[lf])]]
        if np.allclose(pts[:, 0], 0.0):
            left.append((gc, lf))
        elif np.allclose(pts[:, 0], 1.0):
            right.append((gc, lf))
    mesh.facetsets["left"] = np.asarray(left)
    mesh.facetsets["right"] = np.asarray(right)

    from thunderbolt_tpu.models.coordinates import solve_laplace_nodal
    u = solve_laplace_nodal(mesh, [tb.Dirichlet("u", "left", 0.0),
                                   tb.Dirichlet("u", "right", 1.0)])
    assert np.abs(u - mesh.nodes[:, 0]).max() < 1e-6, \
        np.abs(u - mesh.nodes[:, 0]).max()
