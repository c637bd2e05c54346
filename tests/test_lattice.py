"""Scatter-free lattice assembly (fem/lattice.py): BlockDIA built by
sliced adds must match the segment_sum CSR path exactly, including the
seam/plug spill (ring wrap, ideal-LV apex)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.lattice import (
    detect_affine_lattice, build_lattice_plan)


def test_detect_affine_lattice_box():
    # 3D lattice: r = 5 + i + 7j + 70k, i fastest
    i, j, k = np.meshgrid(np.arange(4), np.arange(5), np.arange(3),
                          indexing="ij")
    r = (5 + i + 7 * j + 70 * k).transpose(2, 1, 0).ravel()
    shape, strides, base, ncl = detect_affine_lattice(r)
    assert shape == (4, 5, 3) and strides == (1, 7, 70)
    assert base == 5 and ncl == 60


def test_detect_prefix_truncation():
    r = np.concatenate([10 + np.arange(12) * 3, [999, 1234, 17]])
    shape, strides, base, ncl = detect_affine_lattice(r)
    assert ncl == 12 and strides == (3,) and base == 10


def _compare(mesh, bcs=(), dtype=jnp.float64, with_state=False):
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=1.3, lam=3.1))
    model = tb.QuasiStaticModel("d", mat, bcs)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=mesh.sdim)}, dtype=dtype)
    fn = tb.semidiscretize(model, disc, mesh)
    assert fn._lattice_plan is not None, "plan should build for this mesh"
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.01 * rng.standard_normal(fn.solution_size), dtype)
    kvals, r_ref = fn.assemble(u, 0.0)
    A_ref = fn.jacobian_matrix(kvals)
    A_lat, r_lat = fn.assemble_operator(u, 0.0)
    np.testing.assert_allclose(np.asarray(r_lat), np.asarray(r_ref),
                               rtol=1e-10, atol=1e-12)
    for seed in range(3):
        x = jnp.asarray(rng.standard_normal(fn.solution_size), dtype)
        np.testing.assert_allclose(
            np.asarray(A_lat.mv(x)), np.asarray(A_ref.mv(x)),
            rtol=1e-9, atol=1e-10)
    return fn


def test_lattice_box_hex():
    fn = _compare(tb.generate_mesh("hex8", (5, 4, 3)))
    assert fn._lattice_plan.spill is None or \
        fn._lattice_plan.spill["nslots"] == 0


@pytest.mark.slow
def test_lattice_box_with_pressure_bc():
    _compare(tb.generate_mesh("hex8", (4, 3, 3)),
             bcs=(tb.ConstantPressureBC(0.1, "top"),))


def test_lattice_ring_seam_spill():
    mesh = tb.generate_ring_mesh(12, 2, 3)
    fn = _compare(mesh)
    assert fn._lattice_plan.spill is not None  # wrap cells must spill


@pytest.mark.slow
def test_lattice_ideal_lv():
    mesh = tb.generate_ideal_lv_mesh(10, 3, 4)
    fn = _compare(mesh, bcs=(tb.ConstantPressureBC(0.1, "Endocardium"),))
    assert fn._lattice_plan.spill is not None  # apex plug spills


@pytest.mark.slow
def test_newmark_lattice_cg_matches_lu():
    """Newmark stage J = K + c M on the scatter-free BlockDIA path (CG
    Newton) must match the host-LU CSR path."""
    mesh = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0), (3.0, 0.5, 0.5))
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=5.0, lam=10.0))
    model = tb.ElastodynamicsModel("d", "v", mat, rho=1.0)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)

    def march(fn, nm):
        u0 = jnp.zeros(fn.solution_size)
        st = nm.init(fn, u0, jnp.zeros_like(u0), 0.0)
        st = tb.NewmarkState(st.u, st.v + 0.01, st.a, st.t)
        return nm.solve(fn, st, 0.05, 0.01)

    fn = tb.semidiscretize(model, disc, mesh)
    assert fn._lattice_plan is not None and fn.M_bdia is not None
    st_cg = march(fn, tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        inner="cg", tol=1e-8, inner_rtol=1e-10, inner_maxiter=4000)))

    fn2 = tb.semidiscretize(model, disc, mesh)
    fn2._lattice_plan = None
    fn2.M_bdia = None
    st_lu = march(fn2, tb.NewmarkSolver(
        newton=tb.NewtonRaphsonSolver(inner="lu", tol=1e-8)))
    np.testing.assert_allclose(np.asarray(st_cg.u), np.asarray(st_lu.u),
                               atol=1e-8)
