"""Mechanics tutorial 4: pericardial boundary conditions.

Mirrors the topic of ``docs/src/literate-tutorials/cm04_pericardium.jl``
(a content stub in the reference): the pericardial sac constrains the
epicardium — modeled as normal springs (+ optional bending resistance)
on the Epicardium facetset (``RobinBC``/``NormalSpringBC``/
``BendingSpringBC``, ``weak_boundary_conditions.jl:23-71``) — while the
base floats on weaker omnidirectional springs instead of a hard clamp.
The contracting LV then shows the physiological wall-sliding/apex-fixed
motion pattern: compare apex displacement with and without the
pericardium.

Run:  python examples/cm04_pericardium.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

mesh = tb.generate_ideal_lv_mesh(*smoke((6, 2, 3), (12, 3, 6)))
cs = tb.compute_lv_coordinate_system(mesh)
micro = tb.create_microstructure_model(
    cs, endo_helix_angle=np.deg2rad(60.0), epi_helix_angle=np.deg2rad(-60.0))
calcium = tb.AnalyticalCoefficient(
    lambda x, t: jnp.clip(t / 100.0, 0.0, 1.0))


def run(bcs, dbcs, label):
    material = tb.ActiveStressModel(
        material_model=tb.HolzapfelOgden2009Model(),
        active_stress_model=tb.SimpleActiveStress(Tmax=10.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), calcium),
        microstructure_model=micro)
    model = tb.QuasiStaticModel("displacement", material, bcs)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=dbcs, dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-6, inner="lu", max_iter=15))
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float64),
                          (0.0, smoke(40.0, 100.0)), dt=20.0)
    X = fn.dh.field_dof_coords("displacement")
    apex = np.asarray(u).reshape(-1, 3)[np.argmin(X[:, 2])]
    print(f"{label:28s} apex dz = {apex[2]:+.4f}  "
          f"(converged={rep.converged})")
    return u


# no pericardium: clamped base only (cm01-style)
run((), [tb.Dirichlet("displacement", "Base", 0.0)], "clamped base")
# pericardium: epicardial normal springs + bending + soft elastic base
run((tb.NormalSpringBC(2.0, "Epicardium"),
     tb.BendingSpringBC(0.5, "Epicardium"),
     tb.RobinBC(0.5, "Base")),
    [], "pericardial springs")
