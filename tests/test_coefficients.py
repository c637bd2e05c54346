"""Coefficient-protocol tests mirroring the reference's dedicated suite
(``test/test_coefficients.jl``): every catalog type evaluated through the
two-phase protocol on a 2-cell line grid on [-1, 1], with the reference's
exact expected values where quadrature-independent.

TPU-native protocol difference under test: ``setup_coefficient_cache``
materializes per-(cell, qp) arrays once; ``evaluate_coefficient(cache, t)``
is jit-traceable with dynamic ``t``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import make_form_batch
from thunderbolt_tpu.models.coefficients import (
    ConstantCoefficient, FieldCoefficient, AnalyticalCoefficient,
    CoordinateSystemCoefficient, SpectralTensorCoefficient,
    ConductivityToDiffusivityCoefficient, SpatiallyHomogeneousDataField,
    setup_coefficient_cache, evaluate_coefficient)


@pytest.fixture(scope="module")
def line_batch():
    """2-cell line grid on [-1, 1] (ref: generate_grid(Line, (2,)))."""
    mesh = tb.generate_mesh("line2", (2,), (-1.0,), (1.0,))
    dh = DofHandler(mesh).add_field("u").close()
    return mesh, make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)


@pytest.mark.parametrize("val", [1.0, np.eye(2)])
def test_constant_coefficient(line_batch, val):
    """Same value at every cell/qp/time (ref ConstantCoefficient testset)."""
    _, batch = line_batch
    cache = setup_coefficient_cache(ConstantCoefficient(val), batch)
    for t in (0.0, 1.0):
        np.testing.assert_allclose(np.asarray(evaluate_coefficient(cache, t)),
                                   val)


def test_raw_value_is_a_coefficient(line_batch):
    """Python/numpy scalars & tensors pass through the protocol unwrapped."""
    _, batch = line_batch
    cache = setup_coefficient_cache(2.5, batch)
    assert float(evaluate_coefficient(cache, 3.0)) == 2.5


def test_field_coefficient_scalar(line_batch):
    """Nodal data interpolated to qps: exact linear interpolation per cell
    (ref FieldCoefficient scalar block: cell 1 nodes (1,-1), cell 2 nodes
    (-1,0) => f = -1-2x on [-1,0], f = -1+x on [0,1])."""
    _, batch = line_batch
    data = np.array([[1.0, -1.0], [-1.0, 0.0]])
    cache = setup_coefficient_cache(FieldCoefficient(data), batch)
    vals = np.asarray(evaluate_coefficient(cache, 0.0))
    xq = np.asarray(batch.xq)[..., 0]          # [nc, nqp]
    expected = np.where(xq <= 0.0, -1.0 - 2.0 * xq, -1.0 + xq)
    np.testing.assert_allclose(vals, expected, atol=1e-12)
    # time-independence
    np.testing.assert_allclose(
        np.asarray(evaluate_coefficient(cache, 1.0)), vals)


def test_field_coefficient_vector(line_batch):
    """Vector-valued nodal data (ref FieldCoefficient vector block)."""
    _, batch = line_batch
    data = np.zeros((2, 2, 2))
    data[0, 0] = [1.0, 0.0]     # cell 0, node 0
    data[0, 1] = [0.0, -1.0]    # cell 0, node 1
    data[1, 0] = [-1.0, 0.0]    # cell 1, node 0
    cache = setup_coefficient_cache(FieldCoefficient(data), batch)
    vals = np.asarray(evaluate_coefficient(cache, 0.0))  # [nc, nqp, 2]
    xq = np.asarray(batch.xq)[..., 0]
    # cell 0 spans [-1,0]: s = x+1 in [0,1]; components (1-s, -s)
    s0 = xq[0] + 1.0
    np.testing.assert_allclose(vals[0, :, 0], 1.0 - s0, atol=1e-12)
    np.testing.assert_allclose(vals[0, :, 1], -s0, atol=1e-12)
    # cell 1 spans [0,1]: components (-(1-x), 0)
    np.testing.assert_allclose(vals[1, :, 0], -(1.0 - xq[1]), atol=1e-12)
    np.testing.assert_allclose(vals[1, :, 1], 0.0, atol=1e-12)


def test_field_coefficient_per_cell_constant(line_batch):
    _, batch = line_batch
    cache = setup_coefficient_cache(
        FieldCoefficient(np.array([3.0, 7.0]), per_cell_constant=True), batch)
    vals = np.asarray(evaluate_coefficient(cache, 0.0))
    assert (vals[0] == 3.0).all() and (vals[1] == 7.0).all()


def test_cartesian_coordinate_system(line_batch):
    """The coordinate itself at each qp, time-independent (ref Cartesian
    Coordinate System testset)."""
    _, batch = line_batch
    cache = setup_coefficient_cache(CoordinateSystemCoefficient(), batch)
    for t in (0.0, 1.0):
        np.testing.assert_allclose(
            np.asarray(evaluate_coefficient(cache, t)),
            np.asarray(batch.xq), atol=0)


def test_analytical_coefficient(line_batch):
    """f(x, t) = |x| + t at the qps, with DYNAMIC t under jit (ref
    AnalyticalCoefficient testset; t-tracing is what stimuli rely on)."""
    _, batch = line_batch
    coeff = AnalyticalCoefficient(
        lambda x, t: jnp.linalg.norm(x, axis=-1) + t)
    cache = setup_coefficient_cache(coeff, batch)
    xn = np.linalg.norm(np.asarray(batch.xq), axis=-1)
    for t in (0.0, 1.0):
        np.testing.assert_allclose(
            np.asarray(evaluate_coefficient(cache, t)), xn + t, atol=1e-12)
    # one compile serves every t (the closure is traced; t stays dynamic)
    jitted = jax.jit(lambda t: evaluate_coefficient(cache, t))
    np.testing.assert_allclose(np.asarray(jitted(2.5)), xn + 2.5,
                               atol=1e-12)
    assert jitted._cache_size() == 1
    np.testing.assert_allclose(np.asarray(jitted(7.0)), xn + 7.0,
                               atol=1e-12)
    assert jitted._cache_size() == 1


def test_spectral_tensor_coefficient(line_batch):
    """D = sum_i lambda_i e_i (x) e_i (ref SpectralTensorCoefficient
    testset: the three eigenbasis configurations)."""
    _, batch = line_batch
    ev = np.array([[1.0, 0.0]])
    st = np.array([[-1.0, 0.0], [0.0, 0.0]])
    cache = setup_coefficient_cache(
        SpectralTensorCoefficient(ConstantCoefficient(ev),
                                  ConstantCoefficient(np.array([-1.0]))),
        batch)
    np.testing.assert_allclose(np.asarray(evaluate_coefficient(cache, 0.0)),
                               st, atol=1e-12)
    # planar basis, both eigenvalues -1 => -I
    planar = np.array([[1.0, 0.0], [0.0, 1.0]])
    cache2 = setup_coefficient_cache(
        SpectralTensorCoefficient(
            ConstantCoefficient(planar),
            ConstantCoefficient(np.array([-1.0, -1.0]))), batch)
    np.testing.assert_allclose(np.asarray(evaluate_coefficient(cache2, 0.0)),
                               -np.eye(2), atol=1e-12)


def test_conductivity_to_diffusivity(line_batch):
    """D = kappa / (Cm * chi); Cm=2, chi=0.5 divides out exactly (ref
    ConductivityToDiffusivityCoefficient testset)."""
    _, batch = line_batch
    ev = np.array([[1.0, 0.0]])
    stc = SpectralTensorCoefficient(ConstantCoefficient(ev),
                                    ConstantCoefficient(np.array([-1.0])))
    cache = setup_coefficient_cache(
        ConductivityToDiffusivityCoefficient(stc, Cm=2.0, chi=0.5), batch)
    st = np.array([[-1.0, 0.0], [0.0, 0.0]])
    for t in (0.0, 1.0):
        np.testing.assert_allclose(
            np.asarray(evaluate_coefficient(cache, t)), st, atol=1e-12)


def test_spatially_homogeneous_vector_data(line_batch):
    """Vector values, piecewise-constant in time with jumps AFTER each
    timestamp (ref SpatiallyHomogeneousDataField testset: value at t=1.0
    is still the first entry; 1.1 takes the second)."""
    _, batch = line_batch
    coeff = SpatiallyHomogeneousDataField(
        timestamps=[1.0, 2.0],
        values=[[0.1], [0.2], [0.3]])
    cache = setup_coefficient_cache(coeff, batch)
    for t, expect in [(0.0, 0.1), (1.0, 0.1), (1.1, 0.2), (2.0, 0.2),
                      (2.1, 0.3)]:
        np.testing.assert_allclose(
            np.asarray(evaluate_coefficient(cache, t)), [expect], atol=1e-12)
    # t stays dynamic under jit
    jitted = jax.jit(lambda t: evaluate_coefficient(cache, t))
    np.testing.assert_allclose(np.asarray(jitted(1.5)), [0.2], atol=1e-12)
    np.testing.assert_allclose(np.asarray(jitted(0.5)), [0.1], atol=1e-12)
    assert jitted._cache_size() == 1


# ---------------------------------------------------------------------------
# evaluate_coefficient_at_dof_locations (coefficients.jl:173-199)
# ---------------------------------------------------------------------------

def test_dof_location_eval_linear_field_is_nodal():
    """P1 field on a matching grid: dof locations == mesh nodes, so an
    analytic coefficient evaluated there equals f(node coords)."""
    from thunderbolt_tpu.models.coefficients import (
        evaluate_coefficient_at_dof_locations)
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    dh = DofHandler(mesh).add_field("u").close()
    coeff = AnalyticalCoefficient(
        lambda x, t: x[..., 0] + 2.0 * x[..., 1] + t)
    vals = evaluate_coefficient_at_dof_locations(coeff, dh, "u", t=3.0)
    coords = dh.field_dof_coords("u")
    np.testing.assert_allclose(
        vals, coords[:, 0] + 2.0 * coords[:, 1] + 3.0, atol=1e-12)


def test_dof_location_eval_quadratic_field_hits_edge_midpoints():
    """P2 field on a LINEAR hex mesh evaluates at the ansatz-space nodes
    (edge midpoints, face/cell centers) — NOT just the mesh nodes; the
    reference docstring's 'nodes of the ansatz space' semantics."""
    from thunderbolt_tpu.models.coefficients import (
        evaluate_coefficient_at_dof_locations)
    mesh = tb.generate_mesh("hex8", (1, 1, 1))
    dh = DofHandler(mesh).add_field("u", order=2).close()
    coeff = AnalyticalCoefficient(lambda x, t: x[..., 0] * x[..., 1])
    vals = evaluate_coefficient_at_dof_locations(coeff, dh, "u")
    coords = dh.field_dof_coords("u")
    assert coords.shape[0] == 27          # hex27 ansatz on one hex8 cell
    np.testing.assert_allclose(vals, coords[:, 0] * coords[:, 1],
                               atol=1e-12)


def test_dof_location_eval_cellset_restriction():
    """Entities outside the cellset keep the `out` values (reference:
    'entries outside the set are left untouched')."""
    from thunderbolt_tpu.models.coefficients import (
        evaluate_coefficient_at_dof_locations)
    mesh = tb.generate_mesh("hex8", (2, 1, 1))
    dh = DofHandler(mesh).add_field("u").close()
    coeff = ConstantCoefficient(7.0)
    seed = np.full(dh.fields["u"].nentities, -1.0)
    vals = evaluate_coefficient_at_dof_locations(
        coeff, dh, "u", cellset=[0], out=seed)
    coords = dh.field_dof_coords("u")
    touched = coords[:, 0] <= 0.5 + 1e-9   # cell 0 spans x in [0, 0.5]
    assert (vals[touched] == 7.0).all()
    assert (vals[~touched] == -1.0).all()
    assert (seed == -1.0).all()            # out is not mutated in place
