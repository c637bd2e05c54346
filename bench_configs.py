"""Benchmarks for BASELINE.md driver configs 3-5 (mechanics + coupling).

Prints one JSON line per config:
  {"metric", "value", "unit", "vs_baseline"}

Configs (BASELINE.md "Baseline protocol for the rebuild"):
  3. Passive Holzapfel-Ogden ideal-LV inflation — quasi-static Newton with
     rule-based fibers (cf. ``cm01`` tutorial, ``energies.jl:136``).
     Metric: Newton iterations/second (assembly + Krylov + line search,
     one-dispatch jitted loop).
  4. Actively contracting LV, Newmark-beta implicit dynamics
     (``test/integration/test_elastodynamics.jl``). Metric: time steps/s.
  5. 3D-0D coupled heartbeat (LV + RSAFDQ2022 circulation,
     ``cm03_3d0d-coupling.jl``). Metric: wall-clock seconds for one FULL
     800 ms heartbeat (400 coupled Schur-Newton steps at dt = 2 ms).

vs_baseline denominators are the documented reference-CPU protocol
estimates appended to BASELINE.md (the reference publishes no numbers and
Julia is absent from this container) — replace when a Julia toolchain is
available.

Run: python bench_configs.py          (uses the TPU chip; first compiles
                                       are remote and slow, ~1-3 min each)
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# BASELINE.md protocol estimates (reference CPU, 16-core box)
REF_CPU = {
    "newton_iters_per_sec": 8.0,    # config 3
    "newmark_steps_per_sec": 1.0,   # config 4
    "heartbeat_seconds": 1200.0,    # config 5
}

# On-chip correctness gates (VERDICT r3 item 2; reference analog
# test/gpu/diffusion-test.jl:23-45): each config's f32 chip end state is
# compared against the stored f64 CPU reference (tools/gen_bench_refs.py).
# Tolerances are ~20x the measured f32-CPU deviation (config 3: 8.1e-6,
# config 4: 4.6e-6, config 5 volume: 1.2e-5 relative) — loose enough for
# backend scheduling noise, tight enough that any real numeric break
# (wrong BC, broken kernel, bad compile) fails the bench.
_REFS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_refs")
C3_U_TOL = 2e-4
C4_U_TOL = 2e-4
C5_VOL_RTOL = 1e-3
C5_P_TOL = 2e-3


def _check(name, ok, err, tol):
    """Correctness fields for the JSON line; hard-fail AFTER printing."""
    if ok is None:
        return {"ok_correctness": None,
                "correctness_note": f"bench_refs/{name} missing"}
    return {"ok_correctness": bool(ok),
            "correctness_max_err": float(err), "correctness_tol": tol}


def _fail_if(rec):
    if rec.get("ok_correctness") is False:
        raise SystemExit(
            f"CORRECTNESS GATE FAILED: {rec}")


def _lv_microstructure(mesh):
    import thunderbolt_tpu as tb
    cs = tb.compute_lv_coordinate_system(mesh)
    return tb.create_microstructure_model(
        cs, endo_helix_angle=np.deg2rad(60.0),
        epi_helix_angle=np.deg2rad(-60.0))


def build_config3(dtype=None):
    """Config-3 problem builder (shared by the bench, the f64 reference
    generator ``tools/gen_bench_refs.py`` and the correctness gate)."""
    import thunderbolt_tpu as tb
    dtype = jnp.float32 if dtype is None else dtype
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    micro = _lv_microstructure(mesh)
    material = tb.PK1Model(tb.HolzapfelOgden2009Model(),
                           microstructure_model=micro)
    model = tb.QuasiStaticModel(
        "displacement", material,
        (tb.ConstantPressureBC(0.12, "Endocardium"),
         tb.NormalSpringBC(0.5, "Epicardium")))
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
        dtype=dtype)
    return tb.semidiscretize(model, disc, mesh)


def config3_passive_inflation():
    """HO2009 passive LV inflation: Newton iterations/second."""
    import thunderbolt_tpu as tb
    fn = build_config3()
    # dense inner: at 1k dofs a single MXU LU beats Krylov iteration
    # latency (tools/bench_config3_variants.py); the whole 4-step load
    # ladder runs as ONE jitted scan (march_fixed_ladder) — the host
    # adaptive ramp paid one ~40-90 ms tunnel dispatch per load step,
    # which dominated the round-2 number (20 iters/s ~= 4 dispatches)
    from thunderbolt_tpu.solver.time.homotopy import march_fixed_ladder
    newton = tb.NewtonRaphsonSolver(tol=5e-4, inner="dense", max_iter=30)
    u0 = jnp.zeros(fn.solution_size, jnp.float32)
    # warm: compile
    u, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
    assert bool(jnp.all(convs)), np.asarray(convs)
    t0 = time.perf_counter()
    u, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
    jax.block_until_ready(u)
    el = time.perf_counter() - t0
    iters = max(1, int(np.asarray(its).sum()))
    val = iters / el
    ref_path = os.path.join(_REFS, "config3_u.npz")
    if os.path.isfile(ref_path):
        ref = np.load(ref_path)["u"].astype(np.float64)
        err = float(np.abs(np.asarray(u, np.float64) - ref).max())
        chk = _check("config3_u.npz", err <= C3_U_TOL, err, C3_U_TOL)
    else:
        chk = _check("config3_u.npz", None, None, C3_U_TOL)
    rec = {
        "metric": "config3_passive_lv_newton_iters_per_sec",
        "value": round(val, 2), "unit": "iters/s",
        "vs_baseline": round(val / REF_CPU["newton_iters_per_sec"], 1),
        **chk}
    print(json.dumps(rec), flush=True)
    _fail_if(rec)


def build_config4(dtype=None):
    """Config-4 problem builder (shared; see build_config3)."""
    import thunderbolt_tpu as tb
    dtype = jnp.float32 if dtype is None else dtype
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    micro = _lv_microstructure(mesh)
    calcium = tb.AnalyticalCoefficient(
        lambda x, t: jnp.clip(t / 50.0, 0.0, 1.0))
    material = tb.ActiveStressModel(
        material_model=tb.HolzapfelOgden2009Model(),
        active_stress_model=tb.SimpleActiveStress(Tmax=10.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), calcium),
        microstructure_model=micro)
    model = tb.ElastodynamicsModel(
        "displacement", "velocity", material, rho=1.1e-3,
        face_models=(tb.NormalSpringBC(1.0, "Epicardium"),))
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
        dtype=dtype)
    return tb.semidiscretize(model, disc, mesh)


def config4_active_newmark():
    """Actively contracting LV, Newmark implicit dynamics: steps/s."""
    import thunderbolt_tpu as tb
    fn = build_config4()
    # device march: 20 implicit steps in ONE jitted scan with dense-LU
    # inner solves (round 2's host loop paid a tunnel dispatch per step)
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        tol=5e-4, inner="dense", max_iter=30))
    state = solver.init(fn)
    dt = 1.0
    nsteps = 20
    # warm: compile the march (same static nsteps as the timed run);
    # the timed run CONTINUES from the warm state so the committed
    # internal sarcomere state stays consistent with the kinematic state
    state_w, its, convs = solver.march(fn, state, dt, nsteps)
    assert bool(jnp.all(convs)), np.asarray(convs)
    # correctness gate: the warm march IS the stored protocol (20 steps
    # of dt=1 from rest) — compare before the timed continuation
    ref_path = os.path.join(_REFS, "config4_u_t20.npz")
    if os.path.isfile(ref_path):
        ref = np.load(ref_path)["u"].astype(np.float64)
        err = float(np.abs(np.asarray(state_w.u, np.float64) - ref).max())
        chk = _check("config4_u_t20.npz", err <= C4_U_TOL, err, C4_U_TOL)
    else:
        chk = _check("config4_u_t20.npz", None, None, C4_U_TOL)
    t0 = time.perf_counter()
    state_w, its, convs = solver.march(fn, state_w, dt, nsteps)
    jax.block_until_ready(state_w.u)
    el = time.perf_counter() - t0
    assert bool(jnp.all(convs)), np.asarray(convs)
    val = nsteps / el
    rec = {
        "metric": "config4_active_lv_newmark_steps_per_sec",
        "value": round(val, 2), "unit": "steps/s",
        "vs_baseline": round(val / REF_CPU["newmark_steps_per_sec"], 1),
        **chk}
    print(json.dumps(rec), flush=True)
    _fail_if(rec)


def build_config5(dtype=None):
    """Config-5 problem builder (shared; see build_config3)."""
    import thunderbolt_tpu as tb
    dtype = jnp.float32 if dtype is None else dtype
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    mesh.nodes[:] = mesh.nodes * 5.14
    material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
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
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
        dtype=dtype)
    return tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)


def config5_coupled_heartbeat():
    """3D-0D coupled heartbeat: wall-clock for one full 800 ms beat."""
    import thunderbolt_tpu as tb
    fn3d, circ = build_config5()
    # rtol-based convergence: the chamber-volume residual is O(100) in f32
    # (mesh scaled x5.14), so an absolute 1e-4 sits below the f32 roundoff
    # floor (~2.4e-4 measured at t=638 ms, pure-noise plateau after
    # quadratic convergence 0.39 -> 1.7e-3 -> 2.4e-4)
    # chord (simplified) Newton: frozen blocked tangent + preconditioner,
    # auto re-linearization on slow contraction — newton_raphson.jl:67,223
    # inner="schur_dense" (round 5): at 1,020 dofs one MXU dense LU per
    # chord linearization (~1 ms measured, tools/roofline_mech.py)
    # replaces the latency-bound Schur-CG entirely; verified to
    # reproduce the schur_cg march bit-for-bit in Newton counts and the
    # PV trace (and the f64-reference correctness gate below still
    # applies). The CG policy note for larger sizes: inner_rtol=1e-5
    # measured equivalent to 1e-8 at 1k/6.5k (identical Newton counts,
    # vol trace bitwise, p_err <= 4.2e-7 — sweep --verify-inner).
    solver = tb.Coupled3D0DSolver(
        newton=tb.BlockedNewtonSolver(tol=5e-4, rtol=1e-3, max_iter=25,
                                      inner="schur_dense",
                                      simplified_newton=True))
    w0, c0 = solver.init(fn3d, circ, jnp.float32)
    V0 = float(fn3d.volumes(w0[: fn3d.nmech])[0])
    c0 = c0.at[circ.volume_index("lv")].set(V0)
    dt, nsteps = 2.0, 400
    # warm: compile the one-dispatch march (the whole beat is ONE scan)
    w, c, rep = solver.march(fn3d, circ, w0, c0, 0.0, dt, nsteps)
    if not rep.all_converged():
        bad = np.where(~np.asarray(rep.converged))[0]
        raise RuntimeError(f"coupled march diverged at steps {bad[:5]}")
    # correctness gate: the warm beat IS the stored protocol (400 steps
    # of dt=2 from rest) — PV-loop trace vs the f64 CPU reference
    ref_path = os.path.join(_REFS, "config5_pv_400.npz")
    if os.path.isfile(ref_path):
        ref = np.load(ref_path)
        v = np.asarray(rep.volumes)[:, 0].astype(np.float64)
        p = np.asarray(rep.pressures)[:, 0].astype(np.float64)
        rv = ref["volumes"].astype(np.float64)
        rp = ref["pressures"].astype(np.float64)
        verr = float((np.abs(v - rv) / np.abs(rv)).max())
        perr = float(np.abs(p - rp).max())
        ok = verr <= C5_VOL_RTOL and perr <= C5_P_TOL
        chk = {"ok_correctness": bool(ok),
               "correctness_vol_rel_err": round(verr, 8),
               "correctness_p_err": round(perr, 8),
               "correctness_tol": [C5_VOL_RTOL, C5_P_TOL]}
    else:
        chk = _check("config5_pv_400.npz", None, None, C5_VOL_RTOL)
    t0 = time.perf_counter()
    w, c, rep = solver.march(fn3d, circ, w0, c0, 0.0, dt, nsteps)
    jax.block_until_ready(w)
    el = time.perf_counter() - t0
    rec = {
        "metric": "config5_full_heartbeat_wallclock",
        "value": round(el, 1), "unit": "s/beat",
        "vs_baseline": round(REF_CPU["heartbeat_seconds"] / el, 1),
        **chk}
    print(json.dumps(rec), flush=True)
    _fail_if(rec)


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["3", "4", "5"]
    if "3" in which:
        config3_passive_inflation()
    if "4" in which:
        config4_active_newmark()
    if "5" in which:
        config5_coupled_heartbeat()
