"""Mechanics tutorial 1: actively contracting idealized left ventricle.

Mirrors ``docs/src/literate-tutorials/cm01_simple-active-stress.jl``:
LV coordinates from Laplace solves, rule-based fibers, Holzapfel-Ogden
passive + simple active stress driven by a calcium transient, quasi-static
stepping with homotopy/Newton.

Run:  python examples/cm01_active_lv.py
"""

import numpy as np
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# runs TPU-native: the homotopy path drives the fully jitted Newton
# (scatter-free lattice assembly + BiCGStab — active-stress tangents are
# nonsymmetric, so CG is not applicable); set JAX_PLATFORMS=cpu to force
# host execution
import jax

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

# 1. idealized LV + ventricular coordinate system + fibers
mesh = tb.generate_ideal_lv_mesh(*smoke((6, 2, 3), (12, 3, 6)))
cs = tb.compute_lv_coordinate_system(mesh)
micro = tb.create_microstructure_model(
    cs, endo_helix_angle=np.deg2rad(60.0), epi_helix_angle=np.deg2rad(-60.0))

# 2. material: HO2009 passive + Ca-scaled active stress along the fibers
calcium = tb.AnalyticalCoefficient(
    lambda x, t: jnp.clip(t / 100.0, 0.0, 1.0))   # activation ramp
material = tb.ActiveStressModel(
    material_model=tb.HolzapfelOgden2009Model(),
    active_stress_model=tb.SimpleActiveStress(Tmax=10.0),  # kPa
    contraction_model=tb.CaDrivenInternalSarcomereModel(
        tb.PelceSunLangeveld1995Model(), calcium),
    microstructure_model=micro,
)

# 3. quasi-static model: clamp the base, springs on the epicardium
model = tb.QuasiStaticModel(
    "displacement", material,
    (tb.NormalSpringBC(1.0, "Epicardium"),))
disc = tb.FiniteElementDiscretization(
    {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
    dtype=jnp.float32)
fn = tb.semidiscretize(model, disc, mesh)

# 4. march the activation with homotopy-wrapped Newton
solver = tb.HomotopyPathSolver(
    tb.NewtonRaphsonSolver(tol=1e-4, inner="bicgstab", inner_rtol=1e-5,
                           inner_maxiter=4000, max_iter=20))
io = tb.ParaViewWriter("out/CM01_active_lv")


def store(t, u):
    d = np.zeros((mesh.nnodes, 3), np.float32)
    fi = fn.dh.fields["displacement"]
    mask = fi.entity_nodes >= 0
    d[fi.entity_nodes[mask]] = np.asarray(u).reshape(-1, 3)[mask]
    io.store_timestep(t, mesh, {"displacement": d})
    apex = np.asarray(u).reshape(-1, 3)[
        np.argmin(fn.dh.field_dof_coords("displacement")[:, 2])]
    print(f"t = {t:6.1f}   apex displacement = {apex}")


u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float32),
                      (0.0, smoke(40.0, 100.0)), dt=20.0, store=store)
io.finalize()
print(f"done: {rep}")
