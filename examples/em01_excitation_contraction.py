"""Electromechanics 1: excitation-contraction coupling.

Beyond-reference capability: the reference's electromechanics tutorials
(CM03) prescribe an ANALYTICAL calcium transient; here the monodomain
solve's own ionic calcium (ten Tusscher-Panfilov 2006 ``Ca_i``) drives
the RDQ20-MF sarcomeres (`tb.CoupledElectromechanics`): a paced slab
depolarizes, the Ca transient rises over ~25 ms, and the tissue
contracts along the fiber — the full excitation -> calcium -> tension
chain, simulated, on one mesh.

Run:  python examples/em01_excitation_contraction.py
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
from thunderbolt_tpu.utils.smoke import smoke

DT = jnp.float64

# 1. shared mesh; EP = Niederer-calibrated monodomain with TTP06
mesh = tb.generate_mesh("hex8", smoke((6, 2, 2), (8, 3, 3)), (0, 0, 0),
                        (4.0, 1.0, 1.0))
stim = tb.AnalyticalTransmembraneStimulationProtocol(
    lambda x, t: jnp.where(x[..., 0] < 0.6, 50.0 / 140.0, 0.0),
    intervals=((1.0, 3.0),))
ep_model = tb.MonodomainModel(chi=140.0, Cm=0.01, kappa=0.1334, stim=stim,
                              ion=tb.TenTusscherPanfilov2006Model())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit(ep_model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=DT), mesh)
alg = tb.LieTrotterGodunov((
    tb.BackwardEulerSolver(rtol=1e-10, atol=0.0),
    tb.RushLarsenCellSolver(substeps=2, use_pallas=False)))

# 2. mechanics: Ca-driven RDQ20-MF active stress on the same mesh
material = tb.ActiveStressModel(
    material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
    active_stress_model=tb.SimpleActiveStress(Tmax=5000.0),
    contraction_model=tb.CaDrivenInternalSarcomereModel(
        RDQ20MFModel(), tb.ConstantCoefficient(0.0)),   # placeholder: EP drives
)
disc = tb.FiniteElementDiscretization(
    {"d": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("d", "left", 0.0, components=[0]),
          tb.Dirichlet("d", "front", 0.0, components=[1]),
          tb.Dirichlet("d", "bottom", 0.0, components=[2])], dtype=DT)
fn = tb.semidiscretize(tb.QuasiStaticModel("d", material, ()), disc, mesh)

# 3. the coupled driver: Ca_i (mM) -> uM-scale sarcomere drive
em = tb.CoupledElectromechanics(
    ode, alg, 0.05, fn,
    tb.NewtonRaphsonSolver(tol=1e-8, inner="gmres", inner_rtol=1e-10,
                           max_iter=40),
    ca_transform=lambda c: 1000.0 * c)

coords = fn.dh.field_dof_coords("d")
tip = coords[:, 0] > 3.99


def monitor(t, u, u_ep):
    phi = float(tb.getvariable(u_ep, ode, "phi_m").max())
    ca = 1000.0 * float(tb.getvariable(u_ep, ode, "Ca_i").max())
    shortening = -float(np.asarray(u).reshape(-1, 3)[tip, 0].mean())
    print(f"t = {t:5.1f} ms   phi_max = {phi:7.2f} mV   "
          f"Ca_max = {ca:5.3f} uM   fiber shortening = {shortening:+.4f} mm")


print("excitation -> calcium -> contraction:")
ts, us, u_ep = em.solve((0.0, smoke(40.0, 80.0)), 5.0, monitor=monitor)

short = -np.asarray(us[-1]).reshape(-1, 3)[tip, 0].mean()
assert short > smoke(0.005, 0.05), "no contraction developed"
print(f"\nOK: paced slab shortened {short:.3f} mm along the fiber; "
      "the calcium that did it came out of the monodomain solve.")
