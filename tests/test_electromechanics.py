"""Coupled electromechanics (simulated calcium drives the sarcomeres).

Beyond-reference capability: the reference's CM03 pipeline prescribes an
analytical calcium transient; here the monodomain ionic calcium (ten
Tusscher 2006 ``Ca_i``) feeds the RDQ20-MF sarcomeres. Tests: (1) the Ca
threading is EXACT — a constant transform reproduces the prescribed-
coefficient mechanics march bit-for-bit in physics terms; (2) physiology —
an excitation wave produces contraction that FOLLOWS electrical activation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel

DT = jnp.float64


def _mech_fn(mesh, calcium_field):
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=5000.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), calcium_field),
    )
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=DT)
    return tb.semidiscretize(tb.QuasiStaticModel("d", material, ()),
                             disc, mesh)


def _ep_parts(mesh, stim=None):
    # Niederer-2011-calibrated tissue (benchmarks/niederer.py)
    model = tb.MonodomainModel(
        chi=140.0, Cm=0.01, kappa=0.1334,
        stim=stim or tb.NoStimulationProtocol(),
        ion=tb.TenTusscherPanfilov2006Model())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=DT), mesh)
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-10, atol=0.0),
        tb.RushLarsenCellSolver(substeps=2, use_pallas=False)))
    return ode, alg


@pytest.mark.slow
def test_constant_transform_matches_prescribed_coefficient():
    """ca_transform == const must reproduce the prescribed
    ConstantCoefficient march exactly: same Newton iterates, same
    internal-state evolution, same displacements."""
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    CA = 0.4
    dt, nsteps = 5.0, 4

    # prescribed-coefficient march (the CM03-style path)
    fn_ref = _mech_fn(mesh, tb.ConstantCoefficient(CA))
    newton = tb.NewtonRaphsonSolver(tol=1e-10, inner="gmres",
                                    inner_rtol=1e-12, max_iter=30)
    u_ref = jnp.zeros(fn_ref.solution_size, DT)
    for k in range(1, nsteps + 1):
        t = k * dt
        fn_ref.internal_dt = dt
        fn_ref.internal_t = t
        u_ref, st = newton.solve(fn_ref, u_ref, jnp.asarray(t))
        assert st.converged
        fn_ref.update_internal_state(u_ref, t, dt)

    # EM driver with a transform that ignores the EP values
    ode, alg = _ep_parts(mesh)
    fn_em = _mech_fn(mesh, tb.ConstantCoefficient(0.0))
    em = tb.CoupledElectromechanics(
        ode, alg, 0.5, fn_em, newton,
        ca_transform=lambda c: jnp.full_like(c, CA))
    ts, us, _ = em.solve((0.0, nsteps * dt), dt)

    assert float(jnp.abs(u_ref).max()) > 1e-4      # contraction happened
    np.testing.assert_allclose(np.asarray(us[-1]), np.asarray(u_ref),
                               rtol=0, atol=1e-10)


@pytest.mark.slow
def test_excitation_wave_drives_contraction():
    """Paced slab: the ionic calcium transient (mM -> uM transform) builds
    active tension AFTER electrical activation — negligible deformation
    before the stimulus, substantial contraction after the Ca rise."""
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (2.0, 1.0, 1.0))
    # benchmark-strength stimulus: 50 uA/mm^3 / chi for 2 ms
    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        lambda x, t: jnp.where(x[..., 0] < 0.6, 50.0 / 140.0, 0.0),
        intervals=((1.0, 3.0),))
    ode, alg = _ep_parts(mesh, stim)
    fn = _mech_fn(mesh, tb.ConstantCoefficient(0.0))
    newton = tb.NewtonRaphsonSolver(tol=1e-8, inner="gmres",
                                    inner_rtol=1e-10, max_iter=40)
    em = tb.CoupledElectromechanics(
        ode, alg, 0.05, fn, newton,
        ca_transform=lambda c: 1000.0 * c)     # mM -> the uM-scale drive

    deflect = {}
    phis = {}
    cas = {}

    def monitor(t, u, u_ep):
        deflect[t] = float(jnp.abs(u).max())
        phis[t] = float(tb.getvariable(u_ep, ode, "phi_m").max())
        cas[t] = 1000.0 * float(tb.getvariable(u_ep, ode, "Ca_i").max())

    em.solve((0.0, 60.0), 5.0, monitor=monitor)
    # the wave has activated the tissue (upstroke to positive phi)...
    assert phis[5.0] > 0.0, phis
    # ...the ionic Ca transient is physiologic (rest 0.126 -> ~1 uM)...
    assert 0.6 < max(cas.values()) < 1.5, cas
    # ...contraction is negligible before the transient rises...
    assert deflect[5.0] < 0.01, deflect
    # ...and substantial after it (an unpaced control's resting tone
    # reaches only ~0.064 on this geometry/material)
    assert deflect[60.0] > 0.15, deflect


def _lv_3d0d_em(Tmax=30.0):
    """Physiologic-scale LV with Ca-driven sarcomeres tied to the RSAFDQ2022
    circulation, EP on the same mesh (apex-paced ten Tusscher)."""
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    mesh.nodes[:] = mesh.nodes * 5.14          # cm units, cavity ~0.9*5.14^3
    # apex pacing: strong 2 ms transmembrane pulse on the lower third
    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        lambda x, t: jnp.where(x[..., 2] < -2.5, 50.0 / 140.0, 0.0),
        intervals=((1.0, 3.0),))
    ode, alg = _ep_parts(mesh, stim)
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=2.0, lam=10.0),   # kPa
        active_stress_model=tb.SimpleActiveStress(Tmax=Tmax),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), tb.ConstantCoefficient(0.0)))
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
    from thunderbolt_tpu.disc.coupled import (BlockedNewtonSolver,
                                              Coupled3D0DSolver)
    solver = Coupled3D0DSolver(
        newton=BlockedNewtonSolver(tol=1e-7, max_iter=40))
    em = tb.CoupledElectromechanics3D0D(
        ode, alg, 0.5, fn3d, circ, solver,
        ca_transform=lambda c: 1000.0 * c)     # mM -> uM-scale drive
    return mesh, ode, fn3d, circ, em


def test_heartbeat_3d0d_smoke():
    """Excitation -> contraction -> circulation end-to-end: the tied 3D
    cavity volume tracks the circuit volume (one-step lag), states stay
    finite, the paced EP wave activates the apex."""
    mesh, ode, fn3d, circ, em = _lv_3d0d_em()
    seen = []

    def monitor(t, w, c, u_ep):
        seen.append((t, float(fn3d.volumes(w[: fn3d.nmech])[0]),
                     float(c[circ.volume_index("lv")]),
                     float(tb.getvariable(u_ep, ode, "phi_m").max())))

    ts, ws, cs, u_ep = em.solve((0.0, 8.0), 2.0, monitor=monitor)
    assert len(ts) == 5 and len(seen) == 4
    t_, V3, Vc, phi = np.asarray(seen).T
    assert np.isfinite(V3).all() and np.isfinite(Vc).all()
    # apex fired (ten Tusscher upstroke crosses 0 mV)
    assert phi[-1] > 0.0, phi
    # tying: each accepted 3D volume equals the circuit volume that step
    # was solved against (the circuit then advances -> one-step lag)
    np.testing.assert_allclose(V3[1:], Vc[:-1], rtol=2e-6)


@pytest.mark.slow
def test_heartbeat_3d0d_contraction_raises_pressure():
    """Through the Ca transient the ventricle contracts against the closed
    circuit: LV pressure multiplier rises by kPa-scale vs the passive
    pre-activation value."""
    mesh, ode, fn3d, circ, em = _lv_3d0d_em()
    ps = {}

    def monitor(t, w, c, u_ep):
        ps[t] = float(w[fn3d.nmech])

    ts, ws, cs, u_ep = em.solve((0.0, 60.0), 5.0, monitor=monitor)
    assert np.isfinite(list(ps.values())).all()
    # pre-activation the chamber pressure is ~passive (~0); after the Ca
    # rise the sarcomeres squeeze the tied cavity -> pressure climbs
    # steadily (measured: 3e-6 -> 0.25 -> 0.47 kPa at t=5/20/60)
    assert abs(ps[5.0]) < 1e-3, ps
    assert ps[20.0] > ps[5.0] + 0.1, ps
    assert ps[60.0] > ps[20.0] + 0.1, ps


@pytest.mark.slow
def test_full_beat_physiological_pv_loop():
    """One COMPLETE 800 ms EP-driven heartbeat (VERDICT r2 item 3): the
    excitation->contraction->circulation chain produces a physiological
    PV loop — EDV/ESV/stroke volume/EF/peak pressure inside textbook
    human bands, all four phases present (including an exactly
    volume-pinned isovolumetric relaxation: closed valves), plus a
    stored-artifact drift check (tools/run_full_beat.py regenerates)."""
    import os
    from thunderbolt_tpu.benchmarks import full_beat

    mesh, ode, fn3d, circ, em = full_beat.build()
    u_ep, w, c, rep = em.march(0.0, 5.0, 160)
    assert rep.all_converged()
    s = full_beat.pv_stats(rep)
    # textbook bands (Guyton/Klabunde): EDV 100-180 mL, ESV 40-110 mL,
    # SV >= 40 mL, EF 30-65 %, peak LV systolic 10-20 kPa
    assert 100.0 < s["EDV"] < 180.0, s
    assert 40.0 < s["ESV"] < 110.0, s
    assert s["SV"] > 40.0, s
    assert 30.0 < s["EF"] < 65.0, s
    assert 10.0 < s["peak_p"] < 20.0, s

    ts = np.asarray(rep.ts)
    V = np.asarray(rep.volumes)[:, 0]
    p = np.asarray(rep.pressures)[:, 0]
    phi = np.asarray(rep.phi_max)
    # the EP wave fired and repolarized
    assert phi[:20].max() > 0.0 and phi[-1] < -80.0
    # isovolumetric relaxation: after peak pressure the closed valves pin
    # the volume EXACTLY while pressure falls by kPa-scale
    k_pk = int(np.argmax(p))
    iso = slice(k_pk + 16, k_pk + 36)      # ~80-180 ms past peak
    assert np.ptp(V[iso]) < 1e-6 * V.max(), np.ptp(V[iso])
    assert p[k_pk] - p[iso.stop] > 5.0
    # late diastole refills toward EDV
    assert V[-1] > s["ESV"] + 0.7 * s["SV"]

    # stored-artifact drift check (f64 CPU trace; regenerate with
    # tools/run_full_beat.py --save when the model is retuned)
    art = os.path.join(os.path.dirname(__file__), "data", "trajectories",
                       "full_beat_lv.csv")
    ref = np.genfromtxt(art, delimiter=",", names=True)
    assert np.allclose(ts, ref["t"], atol=1e-9)
    assert np.allclose(V, ref["V_lv"], rtol=2e-3, atol=1e-2), \
        np.abs(V - ref["V_lv"]).max()
    assert np.allclose(p, ref["p_lv"], rtol=5e-3, atol=3e-2), \
        np.abs(p - ref["p_lv"]).max()
