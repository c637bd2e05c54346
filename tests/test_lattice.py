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


def test_lattice_box_with_pressure_bc():
    _compare(tb.generate_mesh("hex8", (4, 3, 3)),
             bcs=(tb.ConstantPressureBC(0.1, "top"),))


def test_lattice_ring_seam_spill():
    mesh = tb.generate_ring_mesh(12, 2, 3)
    fn = _compare(mesh)
    assert fn._lattice_plan.spill is not None  # wrap cells must spill


def test_lattice_ideal_lv():
    mesh = tb.generate_ideal_lv_mesh(10, 3, 4)
    fn = _compare(mesh, bcs=(tb.ConstantPressureBC(0.1, "Endocardium"),))
    assert fn._lattice_plan.spill is not None  # apex plug spills
