"""Electromechanics 2: the full simulated heartbeat chain.

Excitation → contraction → circulation on one device: an apex-paced
monodomain solve (ten Tusscher-Panfilov 2006) runs on the ideal LV; its
ionic calcium transient drives the RDQ20-MF sarcomeres; the contracting
cavity is volume-tied to the RSAFDQ2022 closed-loop circulation through
the blocked Schur Newton (`tb.CoupledElectromechanics3D0D`).

Beyond-reference capability: the reference's CM03 tutorial prescribes an
ANALYTICAL calcium transient and an analytical activation for the
circuit; here every link of the chain is simulated state.

Run:  python examples/em02_full_heartbeat.py
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
from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel
from thunderbolt_tpu.disc.coupled import (BlockedNewtonSolver,
                                          Coupled3D0DSolver)

DT = jnp.float64

# 1. physiologic-scale ideal LV (cm units, cavity ~120 mL) + apex pacing
mesh = tb.generate_ideal_lv_mesh(10, 2, 5)
mesh.nodes[:] = mesh.nodes * 5.14
stim = tb.AnalyticalTransmembraneStimulationProtocol(
    lambda x, t: jnp.where(x[..., 2] < -2.5, 50.0 / 140.0, 0.0),
    intervals=((1.0, 3.0),))
ep_model = tb.MonodomainModel(chi=140.0, Cm=0.01, kappa=0.1334, stim=stim,
                              ion=tb.TenTusscherPanfilov2006Model())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit(ep_model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=DT), mesh)
alg = tb.LieTrotterGodunov((
    tb.BackwardEulerSolver(rtol=1e-10, atol=0.0),
    tb.RushLarsenCellSolver(substeps=2, use_pallas=False)))

# 2. Ca-driven active-stress LV tied to the RSAFDQ2022 circulation
material = tb.ActiveStressModel(
    material_model=tb.NeoHookeanModel(mu=2.0, lam=10.0),     # kPa
    active_stress_model=tb.SimpleActiveStress(Tmax=60.0),
    contraction_model=tb.CaDrivenInternalSarcomereModel(
        RDQ20MFModel(), tb.ConstantCoefficient(0.0)))        # EP drives
coupler = tb.LumpedFluidSolidCoupler(
    (tb.ChamberVolumeCoupling("Endocardium", "lv"),), "displacement",
    volume_method=tb.RSAFDQ2022SurrogateVolume(
        h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * 5.14)))
circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
coupled = tb.RSAFDQ2022Model(
    tb.QuasiStaticModel("displacement", material, ()), circuit, coupler)
disc = tb.FiniteElementDiscretization(
    {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=DT)
fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)

# 3. march: EP dt 0.5 ms inside 5 ms coupled steps
em = tb.CoupledElectromechanics3D0D(
    ode, alg, 0.5, fn3d, circ,
    Coupled3D0DSolver(newton=BlockedNewtonSolver(tol=1e-7, max_iter=40)),
    ca_transform=lambda c: 1000.0 * c)       # mM -> uM-scale drive

print(f"{'t [ms]':>7} {'phi_max':>8} {'Ca_max[uM]':>10} "
      f"{'V_LV [mL]':>10} {'p_LV [kPa]':>10}")


def monitor(t, w, c, u_ep):
    V = float(fn3d.volumes(w[: fn3d.nmech])[0])
    p = float(w[fn3d.nmech])
    phi = float(tb.getvariable(u_ep, ode, "phi_m").max())
    ca = 1000.0 * float(tb.getvariable(u_ep, ode, "Ca_i").max())
    print(f"{t:7.1f} {phi:8.2f} {ca:10.3f} {V:10.2f} {p:10.4f}")


ts, ws, cs, u_ep = em.solve((0.0, 100.0), 5.0, monitor=monitor)
p0, p1 = float(ws[1][fn3d.nmech]), float(ws[-1][fn3d.nmech])
print(f"\nLV pressure rose {p0:.4f} -> {p1:.4f} kPa as the simulated "
      f"Ca transient built active tension against the closed circuit.")
