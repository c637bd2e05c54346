"""Prestress: multiplicative-prestress material + Sellier unloaded-
configuration recovery (``PrestressedMechanicalModel``,
``materials.jl:789``; cm02 tutorial topic)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.prestress import (
    recover_unloaded_configuration)


@pytest.mark.slow
def test_identity_prestress_matches_inner():
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (2.0, 0.5, 0.5))
    inner = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    for mat in (inner, tb.PrestressedMechanicalModel(inner)):
        model = tb.QuasiStaticModel(
            "d", mat, (tb.ConstantPressureBC(0.003, "top"),))
        disc = tb.FiniteElementDiscretization(
            {"d": tb.FieldSpec(order=1, ncomponents=3)},
            dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)
        fn = tb.semidiscretize(model, disc, mesh)
        sol = tb.NewtonRaphsonSolver(tol=1e-10, inner="cg",
                                     inner_rtol=1e-12, inner_maxiter=3000)
        u, st = sol.solve(fn, jnp.zeros(fn.solution_size), 0.0)
        assert st.converged
        if mat is inner:
            u_ref = np.asarray(u)
        else:
            np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-9)


def test_constant_prestress_shifts_equilibrium():
    """A uniform fiber-direction prestretch F0 produces nonzero stress at
    u = 0 (residual differs from the unprestressed material)."""
    mesh = tb.generate_mesh("hex8", (3, 2, 2))
    inner = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    F0 = np.diag([1.1, 1.0, 1.0])
    mat = tb.PrestressedMechanicalModel(
        inner, prestress_field=tb.ConstantCoefficient(jnp.asarray(F0)))
    model = tb.QuasiStaticModel("d", mat, ())
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    r = fn.residual(jnp.zeros(fn.solution_size), 0.0)
    assert float(jnp.abs(r).max()) > 1e-3


@pytest.mark.slow
def test_sellier_recovers_unloaded_beam():
    """Inflate a beam to get a 'target' geometry, then recover the
    unloaded reference from the target + load; must match the true
    reference."""
    mesh0 = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0), (3.0, 0.5, 0.5))
    p = 0.0015

    def make_function(mesh):
        mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
        model = tb.QuasiStaticModel(
            "d", mat, (tb.ConstantPressureBC(p, "top"),))
        disc = tb.FiniteElementDiscretization(
            {"d": tb.FieldSpec(order=1, ncomponents=3)},
            dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)
        return tb.semidiscretize(model, disc, mesh)

    sol = tb.NewtonRaphsonSolver(tol=1e-10, inner="cg", inner_rtol=1e-12,
                                 inner_maxiter=4000)

    def solve(fn):
        u, st = sol.solve(fn, jnp.zeros(fn.solution_size), 0.0)
        return u, st.converged

    # build the loaded target from the TRUE unloaded mesh
    fn0 = make_function(mesh0)
    u0, ok = solve(fn0)
    assert ok
    from thunderbolt_tpu.models.solid.prestress import _nodal_displacement
    x_star = mesh0.nodes + _nodal_displacement(fn0, u0, mesh0)
    target = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0),
                              (3.0, 0.5, 0.5))
    target.nodes[:] = x_star

    rec, hist = recover_unloaded_configuration(
        target, make_function, solve, max_iter=12, tol=1e-8)
    err = np.max(np.linalg.norm(rec.nodes - mesh0.nodes, axis=1))
    assert hist[-1] < 1e-8
    assert err < 1e-6, err
