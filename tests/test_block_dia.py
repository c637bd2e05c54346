"""Block-DIA vector-field Jacobian storage: gather-free SpMV for the
mechanics Krylov path (48x over gather-ELL on the chip), matrix-free
Dirichlet elimination, and the RCM mesh reordering tool."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.sparsity import (
    BlockDIAMatrix, MaskedOperator, block_dia_builder, csr_to_ell,
    any_to_scipy)

DT = jnp.float64


def _mech(mesh, dbc_set, pressure_set="top"):
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=3.0)),
        (tb.ConstantPressureBC(0.03, pressure_set),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", dbc_set, 0.0)], dtype=DT)
    return tb.semidiscretize(model, disc, mesh)


@pytest.mark.slow
def test_block_dia_matches_ell():
    mesh = tb.generate_mesh("hex8", (4, 3, 3))
    fn = _mech(mesh, "left")
    rng = np.random.default_rng(0)
    u = jnp.asarray(0.02 * rng.normal(size=fn.solution_size))
    kv, r = fn.assemble(u, 1.0)
    A_b = fn.jacobian_matrix(kv)
    assert isinstance(A_b, BlockDIAMatrix), type(A_b)
    A_e = csr_to_ell(fn.pattern, kv)
    x = jnp.asarray(rng.normal(size=fn.solution_size))
    assert np.allclose(np.asarray(A_b.mv(x)), np.asarray(A_e.mv(x)),
                       atol=1e-11)
    assert np.allclose(np.asarray(A_b.diagonal()),
                       np.asarray(A_e.diagonal()), atol=1e-13)
    # scipy conversion round-trip (LU path)
    As = any_to_scipy(A_b)
    assert np.allclose(As @ np.asarray(x), np.asarray(A_e.mv(x)), atol=1e-11)


def test_masked_operator_matches_ell_elimination():
    """MaskedOperator (P A P + I - P) == the ELL symmetric elimination."""
    mesh = tb.generate_mesh("hex8", (3, 3, 3))
    fn = _mech(mesh, "bottom")
    ch = fn.constraints
    rng = np.random.default_rng(1)
    u = jnp.asarray(0.02 * rng.normal(size=fn.solution_size))
    kv, _ = fn.assemble(u, 1.0)
    A_b = ch.apply_operator(fn.jacobian_matrix(kv))
    assert isinstance(A_b, MaskedOperator)
    A_e = ch.apply_operator(csr_to_ell(fn.pattern, kv))
    x = jnp.asarray(rng.normal(size=fn.solution_size))
    assert np.allclose(np.asarray(A_b.mv(x)), np.asarray(A_e.mv(x)),
                       atol=1e-11)
    assert np.allclose(np.asarray(A_b.diagonal()),
                       np.asarray(A_e.diagonal()), atol=1e-13)
    As = any_to_scipy(A_b)
    assert np.allclose(As @ np.asarray(x), np.asarray(A_e.mv(x)), atol=1e-11)


def test_newton_same_solution_via_block_dia():
    """Newton-CG through the BlockDIA path reproduces the LU solution."""
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (2.0, 1.0, 1.0))
    fn = _mech(mesh, "left")
    newton_cg = tb.NewtonRaphsonSolver(tol=1e-10, max_iter=30, inner="cg",
                                       inner_rtol=1e-10, inner_maxiter=3000)
    newton_lu = tb.NewtonRaphsonSolver(tol=1e-10, max_iter=30, inner="lu")
    u0 = jnp.zeros(fn.solution_size, DT)
    u_cg, s_cg = newton_cg.solve(fn, u0, 1.0)
    import copy
    fn2 = _mech(mesh, "left")
    u_lu, s_lu = newton_lu.solve(fn2, u0, 1.0)
    assert s_cg.converged and s_lu.converged
    assert np.allclose(np.asarray(u_cg), np.asarray(u_lu), atol=1e-7)


def test_rcm_reorder_preserves_everything():
    from thunderbolt_tpu.mesh.tools import reorder_mesh_rcm
    from tests.test_mesh import mesh_volume
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    out = reorder_mesh_rcm(mesh)
    assert np.isclose(mesh_volume(out), mesh_volume(mesh), rtol=1e-12)
    assert sorted(out.facetsets) == sorted(mesh.facetsets)
    # facetsets still address the same geometry (cells unchanged)
    for name in mesh.facetsets:
        a = out.nodes[out.nodes_of_facetset(name)]
        b = mesh.nodes[mesh.nodes_of_facetset(name)]
        assert np.allclose(np.sort(a, axis=0), np.sort(b, axis=0))
    # bandwidth strictly improves on the generated LV numbering
    def bandwidth(m):
        w = 0
        for b in m.blocks:
            c = b.connectivity
            w = max(w, int((c.max(axis=1) - c.min(axis=1)).max()))
        return w
    assert bandwidth(out) < bandwidth(mesh)


@pytest.mark.slow
def test_block_dia_spill_on_lv():
    """The ideal LV's apex plug couples pole nodes to whole rings — those
    irregular diagonals spill to COO while the lattice shell stays
    block-DIA; the combined operator matches ELL exactly."""
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    fn = _mech(mesh, "Base", pressure_set="Endocardium")
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.01 * rng.normal(size=fn.solution_size))
    kv, _ = fn.assemble(u, 1.0)
    A_b = fn.jacobian_matrix(kv)
    assert isinstance(A_b, BlockDIAMatrix)
    assert A_b.spill_rows is not None and A_b.spill_rows.size > 0
    # the spill is a small fraction of the nnz
    assert A_b.spill_rows.size < 0.2 * fn.pattern.nnz
    A_e = csr_to_ell(fn.pattern, kv)
    x = jnp.asarray(rng.normal(size=fn.solution_size))
    assert np.allclose(np.asarray(A_b.mv(x)), np.asarray(A_e.mv(x)),
                       atol=1e-11)
    assert np.allclose(np.asarray(A_b.diagonal()),
                       np.asarray(A_e.diagonal()), atol=1e-13)
    As = any_to_scipy(A_b)
    assert np.allclose(As @ np.asarray(x), np.asarray(A_e.mv(x)), atol=1e-11)
