"""Idealized-LV contraction: smoke + path-independence matrix.

Parity: ``test/integration/test_solid_mechanics.jl:620-766`` ("Idealized
LV") — three constitutive stacks (ExtendedHill, GeneralizedHill,
ActiveStress) on the ideal LV with the ODB25LT fiber rule, anchored at the
four basal MyocardialAnchor nodes, loaded by endocardial pressure +
epicardial Robin + basal springs, marched by the homotopy path solver
with two different calcium time profiles:

* hat:            Ca(t) = 2t/1000 for t<500 else 2 - 2t/1000
* quadratic hat:  Ca(t) = (2t/1000)^2 for t<500 else 2 - (2t/1000)^2

Both profiles coincide at t=500 (Ca=1) but differ at t=100, so a correct
quasi-static march must produce identical displacements at t=500
("path independence") and different ones at t=100 ("the load path is
actually different"); adaptivity must not change the result at all.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb

DT = jnp.float64


def _ca_hat():
    return tb.AnalyticalCoefficient(
        lambda x, t: jnp.where(t / 1000.0 < 0.5,
                               2.0 * t / 1000.0, 2.0 - 2.0 * t / 1000.0))


def _ca_quadratic_hat():
    return tb.AnalyticalCoefficient(
        lambda x, t: jnp.where(t / 1000.0 < 0.5,
                               (2.0 * t / 1000.0) ** 2,
                               2.0 - (2.0 * t / 1000.0) ** 2))


def _lv_setup():
    mesh = tb.generate_ideal_lv_mesh(4, 1, 1)
    cs = tb.compute_lv_coordinate_system(mesh)
    micro = tb.create_microstructure_model(
        cs, tb.ODB25LTMicrostructureParameters(
            endo_helix_angle=np.deg2rad(80.0),
            epi_helix_angle=np.deg2rad(-65.0)))
    return mesh, micro


def _solve_lv(material, tmax, dt=100.0, adaptive=True):
    mesh = material.pop("__mesh__")
    mat = material.pop("__material__")
    dbcs = [
        tb.Dirichlet("d", "MyocardialAnchor1", 0.0, components=[0, 1, 2]),
        tb.Dirichlet("d", "MyocardialAnchor2", 0.0, components=[1, 2]),
        tb.Dirichlet("d", "MyocardialAnchor3", 0.0, components=[2]),
        tb.Dirichlet("d", "MyocardialAnchor4", 0.0, components=[2]),
    ]
    model = tb.QuasiStaticModel("d", mat, (
        tb.RobinBC(0.1, "Epicardium"),
        tb.NormalSpringBC(1.0, "Base"),
        tb.PressureFieldBC(tb.ConstantCoefficient(0.01), "Endocardium"),
    ))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-10, max_iter=10, inner="lu"),
        adaptive=adaptive)
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT),
                          (0.0, tmax), dt=dt)
    assert rep.converged, rep
    assert np.abs(np.asarray(u)).max() > 0.0       # it did something
    return np.asarray(u)


def _active_stress(micro, mesh, ca):
    return {"__mesh__": mesh, "__material__": tb.ActiveStressModel(
        material_model=tb.HumphreyStrumpfYinModel(),
        active_stress_model=tb.SimpleActiveStress(),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), ca),
        microstructure_model=micro)}


def test_extended_hill_lv_contracts():
    mesh, micro = _lv_setup()
    mat = {"__mesh__": mesh, "__material__": tb.ExtendedHillModel(
        passive_model=tb.HolzapfelOgden2009Model(),
        active_model=tb.ActiveMaterialAdapter(tb.LinearSpringModel()),
        active_deformation_gradient_model=
        tb.GMKActiveDeformationGradientModel(),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), _ca_hat()),
        microstructure_model=micro)}
    _solve_lv(mat, 300.0)


@pytest.mark.slow
def test_generalized_hill_lv_contracts():
    mesh, micro = _lv_setup()
    mat = {"__mesh__": mesh, "__material__": tb.GeneralizedHillModel(
        passive_model=tb.LinYinPassiveModel(),
        active_model=tb.ActiveMaterialAdapter(tb.LinYinActiveModel()),
        active_deformation_gradient_model=
        tb.GMKIncompressibleActiveDeformationGradientModel(),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), _ca_hat()),
        microstructure_model=micro)}
    _solve_lv(mat, 300.0)


def test_adaptivity_does_not_change_the_result():
    mesh, micro = _lv_setup()
    u1 = _solve_lv(_active_stress(micro, mesh, _ca_quadratic_hat()),
                   10.0, dt=1.0, adaptive=True)
    u2 = _solve_lv(_active_stress(micro, mesh, _ca_quadratic_hat()),
                   10.0, dt=1.0, adaptive=False)
    assert np.abs(u1 - u2).max() < 1e-4


@pytest.mark.slow
def test_load_path_is_actually_different():
    mesh, micro = _lv_setup()
    u1 = _solve_lv(_active_stress(micro, mesh, _ca_hat()), 100.0)
    u2 = _solve_lv(_active_stress(micro, mesh, _ca_quadratic_hat()), 100.0)
    assert not np.abs(u1 - u2).max() < 1e-4


@pytest.mark.slow
def test_path_independence_at_equal_calcium():
    mesh, micro = _lv_setup()
    u1 = _solve_lv(_active_stress(micro, mesh, _ca_hat()), 500.0)
    u2 = _solve_lv(_active_stress(micro, mesh, _ca_quadratic_hat()), 500.0)
    assert np.abs(u1 - u2).max() < 1e-4
