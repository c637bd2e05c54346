"""How-to: multigrid-preconditioned mechanics (ring contraction).

Mirrors ``docs/src/literate-howto/multigrid.jl``: an actively contracting
myocardial ring (Guccione passive + Guccione 1993 active tension along
circumferential fibers, Robin-tethered epicardium), solved with Newton
whose inner Krylov iterations are preconditioned by a geometric-multigrid
V-cycle over nested refinements of the ring.

The recipe:

1. describe the model once (materials, BCs, discretization);
2. ``build_mechanics_hierarchy(model, disc, coarse_mesh, nlevels)`` —
   refines the mesh, semidiscretizes every level, precomputes the
   prolongation/injection transfers;
3. hand the FINE function to Newton with
   ``NewtonRaphsonSolver(precon=MechanicsGMGPreconditioner(hierarchy))``.

Coefficients must be evaluable on EVERY level, so geometry-dependent data
(fibers) is expressed as an AnalyticalCoefficient of the coordinates
rather than nodal fields tied to one mesh.

Run:  python examples/howto_multigrid.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# small ring demo; remote-TPU compile latency dominates — force CPU
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.linear import gmres, jacobi_preconditioner
from thunderbolt_tpu.solver.multigrid import (
    build_mechanics_hierarchy, MechanicsGMGPreconditioner)

DT = jnp.float64

# 1. model: circumferential fibers about z, expressed analytically so the
#    SAME coefficient evaluates on every grid level
def circumferential(x, t):
    e = jnp.stack([-x[..., 1], x[..., 0], jnp.zeros_like(x[..., 0])], -1)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def calcium_hat(x, t):
    """0 -> 1 over [0, 300] ms, back to 0 by 500 ms (the reference's
    profile)."""
    up = jnp.clip(t / 300.0, 0.0, 1.0)
    down = jnp.clip((500.0 - t) / 200.0, 0.0, 1.0)
    return jnp.minimum(up, down)


micro = tb.TransverselyIsotropicMicrostructureModel(
    tb.AnalyticalCoefficient(circumferential))
material = tb.ActiveStressModel(
    material_model=tb.Guccione1991PassiveModel(),
    active_stress_model=tb.Guccione1993ActiveModel(Tmax=20.0),
    contraction_model=tb.CaDrivenInternalSarcomereModel(
        tb.ConstantStretchModel(), tb.AnalyticalCoefficient(calcium_hat)),
    microstructure_model=micro)
model = tb.QuasiStaticModel("d", material, (tb.RobinBC(0.1, "Epicardium"),))
disc = tb.FiniteElementDiscretization(
    {"d": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("d", "Bottom", 0.0)],   # clamp: no rigid modes
    dtype=DT)

# 2. hierarchy: coarse ring refined once (raise nlevels on real hosts)
coarse = tb.generate_ring_mesh(12, 2, 2)
hier = build_mechanics_hierarchy(model, disc, coarse, nlevels=2)
fn = hier.fine_function
mg = MechanicsGMGPreconditioner(hier)
print(f"levels: {[f.solution_size for f in hier.functions]} dofs "
      f"(fine mesh {hier.meshes[-1].ncells} cells)")

# 3. march the activation with MG-preconditioned Newton-GMRES
solver = tb.HomotopyPathSolver(
    tb.NewtonRaphsonSolver(tol=1e-7, inner="gmres", inner_maxiter=400,
                           precon=mg, max_iter=25))
radii = []


def store(t, u):
    d = np.asarray(u[:fn.dh.ndofs]).reshape(-1, 3)
    x = np.asarray(fn.dh.field_dof_coords("d"))
    inner = np.linalg.norm(x[:, :2], axis=1) < 0.755  # endocardial shell
    r = np.linalg.norm((x + d)[inner, :2], axis=1).mean()
    radii.append(r)
    print(f"t = {t:6.1f} ms   Ca = {float(calcium_hat(0, t)):.2f}   "
          f"mean endocardial radius = {r:.4f}")


u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT),
                      (0.0, 300.0), dt=100.0, store=store)
assert rep.converged, rep
assert radii[-1] < radii[0] - 0.01, "ring did not contract"

# 4. why MG: solve the final tangent system to a tight tolerance with the
#    V-cycle vs plain Jacobi. The fully-activated active-stress tangent is
#    nonsymmetric and stiff — restarted GMRES(30) with Jacobi STALLS on it,
#    while the MG-preconditioned solve converges.
kv, _ = fn.assemble(u, 300.0)
A = fn.constraints.apply_operator(fn.jacobian_matrix(kv))
r = fn.constraints.apply_zero(
    jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0])))
_, info_mg = gmres(A.mv, r, Minv=jax.jit(mg(A, u, 300.0, ())),
                   rtol=1e-8, atol=0.0, maxiter=2000)
_, info_bj = gmres(A.mv, r, Minv=jacobi_preconditioner(A.diagonal()),
                   rtol=1e-8, atol=0.0, maxiter=8000)
print(f"GMRES on the final tangent to rtol 1e-8:  MG = "
      f"{int(info_mg.iterations)} its (converged={bool(info_mg.converged)}),"
      f"  Jacobi = {int(info_bj.iterations)} its "
      f"(converged={bool(info_bj.converged)})")
assert bool(info_mg.converged)
assert (not bool(info_bj.converged)
        or int(info_mg.iterations) < int(info_bj.iterations) / 2)
print("OK: MG-preconditioned Newton contracts the ring; the V-cycle "
      "converges the tangent solve that Jacobi-GMRES cannot.")
