"""Mechanics tutorial 3: 3D-0D coupled heartbeat (LV + circulation).

Mirrors ``docs/src/literate-tutorials/cm03_3d0d-coupling.jl``: the LV's
cavity volume is tied to the RSAFDQ2022 lumped circuit via a Lagrange
multiplier (= chamber pressure); per step the 3D block solves a
Schur-complement Newton and the 0D circuit integrates with the multiplier
pressure as input.

Run:  python examples/cm03_coupled_heartbeat.py
"""

import time

import numpy as np
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the 3D block Newton runs fully on device (Schur elimination with CG
# inner solves inside one jitted while_loop) — TPU-ready; set
# JAX_PLATFORMS=cpu to force host execution
import jax

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

# physiologic scale: cm units -> cavity ~120 mL
mesh = tb.generate_ideal_lv_mesh(*smoke((8, 2, 4), (12, 3, 6)))
mesh.nodes[:] = mesh.nodes * 5.14

material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))  # kPa
coupler = tb.LumpedFluidSolidCoupler(
    (tb.ChamberVolumeCoupling("Endocardium", "lv"),),
    "displacement",
    volume_method=tb.RSAFDQ2022SurrogateVolume(
        h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * 5.14)))
circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
coupled = tb.RSAFDQ2022Model(
    tb.QuasiStaticModel("displacement", material, ()), circuit, coupler)

disc = tb.FiniteElementDiscretization(
    {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=jnp.float32)
fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)

solver = tb.Coupled3D0DSolver(
    newton=tb.BlockedNewtonSolver(tol=1e-4, max_iter=25,
                                  inner="schur_cg"))
w, c = solver.init(fn3d, circ, jnp.float32)
V0 = float(fn3d.volumes(w[: fn3d.nmech])[0])
c = c.at[circ.volume_index("lv")].set(V0)
print(f"initial LV cavity volume: {V0:.1f} mL")

t, dt = 0.0, 2.0
NSTEPS = smoke(6, 50)
t_wall = time.perf_counter()
print(f"{'t [ms]':>8} {'V_3D [mL]':>10} {'p_LV [kPa]':>11} {'V_circ':>8}")
for k in range(NSTEPS):
    w, c, stats = solver.step(fn3d, circ, w, c, t, dt)
    if not stats.converged:
        print("step failed:", stats)
        break
    t += dt
    if k % 5 == 0:
        V3d = float(fn3d.volumes(w[: fn3d.nmech])[0])
        print(f"{t:8.1f} {V3d:10.2f} {float(w[fn3d.nmech]):11.3f} "
              f"{float(c[circ.volume_index('lv')]):8.2f}")
el = time.perf_counter() - t_wall
print(f"done: {NSTEPS} coupled steps in {el:.1f} s "
      f"({NSTEPS/el:.2f} steps/s)")
