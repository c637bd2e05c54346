"""Mechanics tutorial 2: prestress — recovering the unloaded configuration.

Mirrors the topic of ``docs/src/literate-tutorials/cm02_prestress.jl`` (a
content stub in the reference): an imaged cardiac geometry is NOT
stress-free — it carries the end-diastolic pressure. Given the imaged
(loaded) LV and the load, the Sellier backward-displacement fixed point
recovers the unloaded reference configuration; re-inflating it reproduces
the imaged shape, and `PrestressedMechanicalModel` can then carry the
residual stretch into downstream simulations.

Run:  python examples/cm02_prestress.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the fixed point re-meshes (and so recompiles) per iterate, and runs in
# f64 — native on CPU, emulated on TPU: force CPU for this workflow demo
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.prestress import (
    recover_unloaded_configuration, _nodal_displacement)
from thunderbolt_tpu.utils.smoke import smoke

LV_DIMS = smoke((6, 2, 3), (10, 2, 5))

P_ED = 0.25   # end-diastolic pressure [kPa-ish units of the material]

def make_function(mesh):
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
    model = tb.QuasiStaticModel(
        "d", mat, (tb.ConstantPressureBC(P_ED, "Endocardium"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "Base", 0.0)], dtype=jnp.float64)
    return tb.semidiscretize(model, disc, mesh)

sol = tb.NewtonRaphsonSolver(tol=1e-9, inner="cg", inner_rtol=1e-10,
                             inner_maxiter=4000)

def solve(fn):
    u, st = sol.solve(fn, jnp.zeros(fn.solution_size), 0.0)
    return u, st.converged

# "imaged" geometry: inflate a known LV so we can check the recovery
truth = tb.generate_ideal_lv_mesh(*LV_DIMS)
fn_t = make_function(truth)
u_t, ok = solve(fn_t)
assert ok
imaged = tb.generate_ideal_lv_mesh(*LV_DIMS)
imaged.nodes[:] = truth.nodes + _nodal_displacement(fn_t, u_t, truth)
print(f"imaged cavity volume:   "
      f"{float(tb.compute_chamber_volume(fn_t.dh, u_t, 'Endocardium')):.4f}")

unloaded, hist = recover_unloaded_configuration(
    imaged, make_function, solve, max_iter=smoke(4, 10), tol=1e-7,
    verbose=True)
err = np.max(np.linalg.norm(unloaded.nodes - truth.nodes, axis=1))
print(f"recovered vs true unloaded geometry: max node error {err:.2e}")

# re-inflate the recovered reference -> must reproduce the imaged shape
fn_r = make_function(unloaded)
u_r, ok = solve(fn_r)
x_check = unloaded.nodes + _nodal_displacement(fn_r, u_r, unloaded)
print(f"re-inflation reproduces imaged shape to "
      f"{np.max(np.linalg.norm(x_check - imaged.nodes, axis=1)):.2e}")
