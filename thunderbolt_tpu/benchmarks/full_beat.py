"""The full EP-driven heartbeat benchmark configuration.

Excitation → contraction → circulation with every link SIMULATED: an
apex-paced ten Tusscher-Panfilov 2006 monodomain solve on the ideal LV
drives the RDQ20-MF sarcomeres through the ionic calcium transient; the
contracting cavity is volume-tied to the RSAFDQ2022 closed-loop
circulation through the blocked Schur Newton. Beyond-reference: the
reference's CM03 tutorial (``cm03_3d0d-coupling.jl``) prescribes an
ANALYTICAL calcium transient; its EP and mechanics stacks never exchange
state.

Measured physiology of one 800 ms beat at the defaults (f64, CPU or
chip): EDV 140.1 mL, ESV 81.8 mL, stroke volume 58.3 mL, ejection
fraction 41.6 %, peak LV pressure 15.1 kPa (≈ 113 mmHg) — inside the
textbook human bands (EDV 100-180, ESV 40-110, EF 30-65 %, systolic
LV 12-18 kPa). The trace shows all four PV-loop phases, including an
exactly volume-pinned isovolumetric relaxation (closed valves) while
pressure falls 14.7 → 1.6 kPa.

Two calibration constants matter (both discovered by measurement, see
``tools/run_full_beat.py``):

* ``Tmax = a_XB = 22894`` [kPa]: ``SimpleActiveStress`` is scaled by the
  RDQ20 ``activation_scale`` (the XB distortion moments, peak ≈ 3.6e-3
  under the published calcium transient), so Tmax must carry the
  a_XB-scale stiffness for the product to be the published active
  tension (peak ≈ 75 kPa). A "plausible-looking" Tmax of 60 produces a
  0.2 kPa peak — 300x too weak to eject.
* rule-based fibers (±60° helix): WITHOUT a microstructure the frame
  defaults to the global x-axis and contraction cannot squeeze the
  cavity at all (measured: the beat degenerates to passive filling).
"""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel
from thunderbolt_tpu.disc.coupled import (BlockedNewtonSolver,
                                          Coupled3D0DSolver)

DEFAULT_TMAX = 22894.0     # = RDQ20MFModel.a_XB


def build(Tmax=DEFAULT_TMAX, dims=(10, 2, 5), scale=5.14,
          dtype=jnp.float64, ep_dt=0.5, newton_tol=1e-7):
    """Build the full-beat driver; returns ``(mesh, ode, fn3d, circ, em)``.

    ``em.march(0.0, dt_mech, nsteps)`` runs the whole beat in ONE device
    dispatch (``CoupledElectromechanics3D0D.march``)."""
    mesh = tb.generate_ideal_lv_mesh(*dims)
    mesh.nodes[:] = mesh.nodes * scale
    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        lambda x, t: jnp.where(x[..., 2] < -2.5, 50.0 / 140.0, 0.0),
        intervals=((1.0, 3.0),))
    ep_model = tb.MonodomainModel(chi=140.0, Cm=0.01, kappa=0.1334,
                                  stim=stim,
                                  ion=tb.TenTusscherPanfilov2006Model())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(ep_model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=dtype), mesh)
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-10, atol=0.0),
        tb.RushLarsenCellSolver(substeps=2, use_pallas=False)))

    cs = tb.compute_lv_coordinate_system(mesh)
    micro = tb.create_microstructure_model(
        cs, endo_helix_angle=np.deg2rad(60.0),
        epi_helix_angle=np.deg2rad(-60.0))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=2.0, lam=10.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=Tmax),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), tb.ConstantCoefficient(0.0)),
        microstructure_model=micro)
    coupler = tb.LumpedFluidSolidCoupler(
        (tb.ChamberVolumeCoupling("Endocardium", "lv"),), "displacement",
        volume_method=tb.RSAFDQ2022SurrogateVolume(
            h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * scale)))
    circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
    coupled = tb.RSAFDQ2022Model(
        tb.QuasiStaticModel("displacement", material, ()), circuit, coupler)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=dtype)
    fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)
    em = tb.CoupledElectromechanics3D0D(
        ode, alg, ep_dt, fn3d, circ,
        Coupled3D0DSolver(newton=BlockedNewtonSolver(
            tol=newton_tol, max_iter=40)),
        ca_transform=lambda c: 1000.0 * c)     # mM -> uM drive
    return mesh, ode, fn3d, circ, em


def pv_stats(report):
    """PV-loop statistics from an ``EMMarchReport``: dict with EDV, ESV,
    SV, EF [%], peak_p [kPa]."""
    V = np.asarray(report.volumes)[:, 0]
    p = np.asarray(report.pressures)[:, 0]
    EDV, ESV = float(V.max()), float(V.min())
    return {"EDV": EDV, "ESV": ESV, "SV": EDV - ESV,
            "EF": 100.0 * (EDV - ESV) / EDV, "peak_p": float(p.max())}
