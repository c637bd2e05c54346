"""Differentiable-simulation module (thunderbolt_tpu.ad).

Beyond-reference capability tests: (1) the reverse-differentiable
monodomain march reproduces the production operator-split integrator,
(2) its conductivity gradient matches finite differences, (3) the
adjoint (implicit-function-theorem) equilibrium solve's load-parameter
gradient matches finite differences.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.ad import (DifferentiableMonodomain,
                                make_equilibrium_solve,
                                make_parametric_equilibrium_solve)

DT = jnp.float64


def _square_pulse(coords):
    return np.where(coords[:, 0] < 0.3, 1.0, 0.0)


def test_differentiable_march_matches_production_integrator():
    """Same physics as LieTrotterGodunov((BackwardEuler, ForwardEulerCells))
    — phi trajectories agree to the linear-solve tolerance."""
    mesh = tb.generate_mesh("quad4", (24, 4), (0.0, 0.0), (1.5, 0.25))
    dm = DifferentiableMonodomain(mesh, tb.FHNModel(), dt=0.5, substeps=4,
                                  dtype=DT, rtol=1e-10, D_ref=1e-3)
    states0 = dm.initial_states()
    states0 = states0.at[0].set(jnp.asarray(_square_pulse(
        np.asarray(dm.coords)), DT))
    states, _ = dm.march(jnp.asarray(1e-3, DT), states0, 40)

    model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                               stim=tb.NoStimulationProtocol(),
                               ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=DT), mesh)
    u0 = tb.create_initial_condition(ode, DT)
    u0 = tb.setvariable(u0, ode, "phi_m", _square_pulse)
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-12, atol=0.0, maxiter=500),
        tb.ForwardEulerCellSolver(substeps=4, use_pallas=False)))
    u = tb.init(ode, alg, u0, (0.0, 20.0), 0.5).solve()
    phi_ref = np.asarray(tb.getvariable(u, ode, "phi_m"))

    assert np.abs(np.asarray(states[0]) - phi_ref).max() < 1e-6
    assert phi_ref.max() > 0.8          # the wave is alive


def test_conductivity_gradient_matches_fd():
    """d loss / d D through assembly + Chebyshev solves + reaction chain."""
    mesh = tb.generate_mesh("quad4", (16, 4), (0.0, 0.0), (1.0, 0.25))
    dm = DifferentiableMonodomain(mesh, tb.FHNModel(), dt=0.5, substeps=4,
                                  dtype=DT, rtol=1e-10, D_ref=1e-3)
    states0 = dm.initial_states()
    states0 = states0.at[0].set(jnp.asarray(_square_pulse(
        np.asarray(dm.coords)), DT))
    probe = np.array([int(np.argmin(
        np.linalg.norm(np.asarray(dm.coords) - [0.75, 0.125], axis=1)))])

    def loss(k):
        _, trace = dm.march(k, states0, 30, probe=probe)
        return jnp.sum(trace ** 2)

    k0 = jnp.asarray(1e-3, DT)
    g = jax.grad(loss)(k0)
    h = 1e-7
    fd = (loss(k0 + h) - loss(k0 - h)) / (2 * h)
    assert np.isfinite(float(g)) and abs(float(fd)) > 1e-3  # nontrivial
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-5)


def test_equilibrium_adjoint_gradient_matches_fd():
    """d QoI / d t through the Newton equilibrium via ONE adjoint solve
    (implicit function theorem), against central finite differences of
    full re-solves."""
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0)),
        (tb.ConstantPressureBC(lambda t: 0.05 * t, "right"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-12, inner="gmres",
                                    inner_rtol=1e-12, inner_maxiter=2000,
                                    max_iter=30)
    solve = make_equilibrium_solve(fn, newton, adjoint_rtol=1e-12)
    u0 = jnp.zeros(fn.solution_size, DT)
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        fn.solution_size))

    def qoi(t):
        return jnp.vdot(w, solve(u0, t))

    t0 = jnp.asarray(1.0, DT)
    g = jax.grad(qoi)(t0)
    h = 1e-5
    fd = (qoi(t0 + h) - qoi(t0 - h)) / (2 * h)
    assert abs(float(fd)) > 1e-6
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


@pytest.mark.slow
def test_equilibrium_adjoint_u0_cotangent_is_zero():
    """The equilibrium forgets its initial guess: d QoI / d u0 == 0."""
    mesh = tb.generate_mesh("hex8", (1, 1, 1))
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0)),
        (tb.ConstantPressureBC(lambda t: 0.05 * t, "right"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-12, inner="gmres",
                                    inner_rtol=1e-12, max_iter=30)
    solve = make_equilibrium_solve(fn, newton)
    u0 = jnp.zeros(fn.solution_size, DT) + 0.001
    g = jax.grad(lambda uu: jnp.sum(solve(uu, jnp.asarray(1.0, DT))))(u0)
    assert float(jnp.abs(g).max()) == 0.0


def _parametric_setup():
    import dataclasses as dc
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0)),
        (tb.ConstantPressureBC(lambda t: 0.05 * t, "right"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-12, inner="gmres",
                                    inner_rtol=1e-12, inner_maxiter=2000,
                                    max_iter=30)

    def apply_params(mat, th):
        return dc.replace(mat, material_model=dc.replace(
            mat.material_model, mu=th["mu"], lam=th["lam"]))

    solve = make_parametric_equilibrium_solve(fn, newton, apply_params,
                                              adjoint_rtol=1e-12)
    return fn, solve


def test_material_parameter_gradient_matches_fd():
    """d QoI / d {mu, lam} through the Newton equilibrium: ONE adjoint
    solve + ONE reverse residual pass vs central finite differences of
    full re-solves, per parameter."""
    fn, solve = _parametric_setup()
    u0 = jnp.zeros(fn.solution_size, DT)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        fn.solution_size))
    t = jnp.asarray(1.0, DT)

    def qoi(th):
        return jnp.vdot(w, solve(u0, t, th))

    th0 = {"mu": jnp.asarray(1.0, DT), "lam": jnp.asarray(2.0, DT)}
    g = jax.grad(qoi)(th0)
    h = 1e-5
    for key in ("mu", "lam"):
        thp = dict(th0); thp[key] = th0[key] + h
        thm = dict(th0); thm[key] = th0[key] - h
        fd = (qoi(thp) - qoi(thm)) / (2 * h)
        assert abs(float(fd)) > 1e-7, key
        np.testing.assert_allclose(float(g[key]), float(fd), rtol=1e-5,
                                   err_msg=key)


def test_parametric_solve_joint_load_gradient():
    """The same parametric solve also carries the load-parameter cotangent
    (t and theta cotangents come from one reverse pass); t-gradient
    matches the non-parametric adjoint path."""
    fn, solve = _parametric_setup()
    u0 = jnp.zeros(fn.solution_size, DT)
    w = jnp.asarray(np.random.default_rng(2).standard_normal(
        fn.solution_size))
    th0 = {"mu": jnp.asarray(1.0, DT), "lam": jnp.asarray(2.0, DT)}

    def qoi_t(t):
        return jnp.vdot(w, solve(u0, t, th0))

    t0 = jnp.asarray(1.0, DT)
    g = jax.grad(qoi_t)(t0)
    h = 1e-5
    fd = (qoi_t(t0 + h) - qoi_t(t0 - h)) / (2 * h)
    assert abs(float(fd)) > 1e-7
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_parametric_solve_theta_is_runtime_operand():
    """Two theta values through the SAME solve object give the two
    correct equilibria (theta is a traced operand of one cached Newton
    program, not baked into the compilation)."""
    fn, solve = _parametric_setup()
    u0 = jnp.zeros(fn.solution_size, DT)
    t = jnp.asarray(1.0, DT)
    u_soft = solve(u0, t, {"mu": jnp.asarray(0.5, DT),
                           "lam": jnp.asarray(1.0, DT)})
    u_stiff = solve(u0, t, {"mu": jnp.asarray(2.0, DT),
                            "lam": jnp.asarray(4.0, DT)})
    # softer material deflects more under the same pressure
    assert float(jnp.abs(u_soft).max()) > 2 * float(jnp.abs(u_stiff).max())
    # and both are genuine equilibria of their own materials
    for th, u in ((0.5, u_soft), (2.0, u_stiff)):
        import dataclasses as dc
        from thunderbolt_tpu.ad import ParametricQuasiStaticFunction
        pfn = ParametricQuasiStaticFunction(
            fn, lambda m, s: dc.replace(m, material_model=dc.replace(
                m.material_model, mu=s["mu"], lam=s["lam"])),
            {"mu": jnp.asarray(th, DT), "lam": jnp.asarray(2 * th, DT)})
        r = pfn.rebound(pfn.theta).residual(u, t)
        r = fn.constraints.apply_zero(r)
        assert float(jnp.linalg.norm(r)) < 1e-10


def test_vmap_ensemble_over_conductivity():
    """A conductivity population runs as ONE vmapped program and matches
    per-member marches; wave arrival is monotone in D (CV ~ sqrt(D))."""
    mesh = tb.generate_mesh("quad4", (24, 4), (0.0, 0.0), (1.5, 0.25))
    dm = DifferentiableMonodomain(mesh, tb.FHNModel(), dt=0.5, substeps=4,
                                  dtype=DT, rtol=1e-8, D_ref=2e-3)
    states0 = dm.initial_states()
    states0 = states0.at[0].set(jnp.asarray(_square_pulse(
        np.asarray(dm.coords)), DT))
    probe = np.array([int(np.argmin(np.linalg.norm(
        np.asarray(dm.coords) - [1.0, 0.125], axis=1)))])
    Ds = jnp.asarray([1e-3, 2e-3, 4e-3], DT)

    traces = jax.vmap(
        lambda d: dm.march(d, states0, 100, probe=probe)[1])(Ds)
    arrivals = []
    for i, d in enumerate(Ds):
        _, tr = dm.march(d, states0, 100, probe=probe)
        np.testing.assert_allclose(np.asarray(traces[i]), np.asarray(tr),
                                   rtol=0, atol=1e-12)
        up = np.nonzero(np.asarray(tr)[:, 0] > 0.5)[0]
        assert up.size, f"wave never arrived at D={float(d)}"
        arrivals.append(up[0])
    assert arrivals[0] > arrivals[1] > arrivals[2], arrivals


# ---------------------------------------------------------------------------
# differentiable PRODUCTION march (ad/march.py, VERDICT r2 item 6)
# ---------------------------------------------------------------------------

def _production_ep():
    """Multi-subdomain + stimulated + Dirichlet-constrained monodomain —
    the full production feature set the scan-kernel backend lacks."""
    mesh = tb.generate_mesh("quad4", (16, 4), (0.0, 0.0), (4.0, 1.0))
    centroids = np.stack([mesh.nodes[b.connectivity].mean(1)
                          for b in mesh.blocks]).reshape(-1, 2)
    mesh.cellsets["fast"] = np.nonzero(centroids[:, 0] < 2.0)[0]
    mesh.cellsets["slow"] = np.nonzero(centroids[:, 0] >= 2.0)[0]
    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        lambda x, t: jnp.where(x[..., 0] < 0.5, 0.4, 0.0),
        intervals=((0.0, 2.0),))
    fast = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=2e-3, stim=stim,
                              ion=tb.FHNModel())
    slow = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=5e-4,
                              stim=tb.NoStimulationProtocol(),
                              ion=tb.FHNModel(b=0.8))
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit({"fast": fast, "slow": slow}),
        tb.FiniteElementDiscretization(
            {"phi_m": 1}, dbcs=[tb.Dirichlet("phi_m", "right", 0.0)],
            dtype=DT),
        mesh)
    return mesh, ode


def test_production_march_grad_matches_fd():
    """d(mean phi_T)/d(u0) through the PRODUCTION semidiscretized split
    (2 subdomains, stimulus, Dirichlet) matches finite differences."""
    from thunderbolt_tpu.ad import make_differentiable_ep_march
    mesh, ode = _production_ep()
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-10, solver="chebyshev"),
        tb.ForwardEulerCellSolver(substeps=4)))
    march = make_differentiable_ep_march(ode, alg, dt=0.5, nsteps=12)
    u0 = tb.create_initial_condition(ode, DT)
    u0 = tb.setvariable(u0, ode, "phi_m",
                        lambda x: np.where(x[:, 0] < 1.0, 0.5, 0.0))
    phi = tb.solution_variable(ode, "phi_m").slice

    @jax.jit
    def qoi(u0):
        return jnp.mean(march(u0)[phi])

    val, g = jax.jit(jax.value_and_grad(qoi.__wrapped__))(u0)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
    # FD check on the entries with the largest gradient magnitude (the
    # jitted qoi is compiled once and reused for all probes)
    gnp = np.asarray(g)
    idx = np.argsort(-np.abs(gnp))[:3]
    eps = 1e-5
    for i in idx:
        e = jnp.zeros_like(u0).at[i].set(1.0)
        fd = (float(qoi(u0 + eps * e)) - float(qoi(u0 - eps * e))) / (2 * eps)
        assert abs(fd - gnp[i]) < 2e-5 * max(1.0, abs(fd)), \
            (i, fd, gnp[i])


def test_production_march_probe_and_agreement():
    """The differentiable march reproduces the production Integrator's
    trajectory (same alg, same dt) and records probes along the way."""
    from thunderbolt_tpu.ad import make_differentiable_ep_march
    mesh, ode = _production_ep()
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-10, solver="chebyshev"),
        tb.ForwardEulerCellSolver(substeps=4)))
    u0 = tb.create_initial_condition(ode, DT)
    u0 = tb.setvariable(u0, ode, "phi_m",
                        lambda x: np.where(x[:, 0] < 1.0, 0.5, 0.0))
    phi = tb.solution_variable(ode, "phi_m").slice
    march = make_differentiable_ep_march(
        ode, alg, dt=0.5, nsteps=10,
        probe=lambda u, t: jnp.max(u[phi]))
    uT, trace = jax.jit(march)(u0)
    integ = tb.init(ode, alg, u0, (0.0, 5.0), dt=0.5)
    u_ref = integ.solve()
    assert np.allclose(np.asarray(uT), np.asarray(u_ref), atol=1e-10)
    assert trace.shape == (10,) and np.isfinite(np.asarray(trace)).all()


def test_production_march_rejects_adaptive_solvers():
    from thunderbolt_tpu.ad import make_differentiable_ep_march
    import pytest
    mesh, ode = _production_ep()
    with pytest.raises(ValueError, match="chebyshev"):
        make_differentiable_ep_march(ode, tb.LieTrotterGodunov((
            tb.BackwardEulerSolver(),     # cg while_loop
            tb.ForwardEulerCellSolver(substeps=4))), 0.5, 4)
    with pytest.raises(ValueError, match="while_loop"):
        make_differentiable_ep_march(ode, tb.LieTrotterGodunov((
            tb.BackwardEulerSolver(solver="chebyshev"),
            tb.AdaptiveForwardEulerSubstepper())), 0.5, 4)


# ---------------------------------------------------------------------------
# electromechanics functional gradient through the 3D-0D blocked step
# (ad/em.py, VERDICT r2 item 6)
# ---------------------------------------------------------------------------

def _coupled_lv(theta0):
    """Small 3D-0D LV whose active-stress scaling and passive modulus are
    traced parameters."""
    import dataclasses as dc
    from thunderbolt_tpu.disc.coupled import (BlockedNewtonSolver,
                                              Coupled3D0DSolver)
    from thunderbolt_tpu.ad import parametric_coupled_function

    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    scale = 5.14
    mesh.nodes[:] = mesh.nodes * scale
    calcium = tb.AnalyticalCoefficient(
        lambda x, t: jnp.clip(t / 50.0, 0.0, 1.0))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=2.0, lam=10.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=30.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), calcium))
    circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
    coupler = tb.LumpedFluidSolidCoupler(
        (tb.ChamberVolumeCoupling("Endocardium", "lv"),), "displacement",
        volume_method=tb.RSAFDQ2022SurrogateVolume(
            h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * scale)))
    coupled = tb.RSAFDQ2022Model(
        tb.QuasiStaticModel("displacement", material, ()), circuit, coupler)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=DT)
    fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)

    def apply_params(m, theta):
        return dc.replace(
            m,
            material_model=dc.replace(m.material_model, mu=theta["mu"]),
            active_stress_model=dc.replace(m.active_stress_model,
                                           Tmax=theta["Tmax"]))

    fn3d_p = parametric_coupled_function(fn3d, apply_params, theta0)
    solver = Coupled3D0DSolver(
        newton=BlockedNewtonSolver(tol=1e-9, max_iter=30))
    return fn3d_p, circ, solver


@pytest.mark.slow
def test_em_functional_gradient_matches_fd():
    """d(ejected volume)/d(Tmax, mu) through THREE coupled 3D-0D steps
    (blocked-Newton equilibria via the IFT custom_vjp + circuit RK2 by
    plain reverse mode) matches finite differences — the composition the
    reference's mutating solvers cannot express."""
    from thunderbolt_tpu.ad import make_differentiable_coupled_march

    theta0 = {"Tmax": jnp.asarray(30.0, DT), "mu": jnp.asarray(2.0, DT)}
    fn3d, circ, solver = _coupled_lv(theta0)
    march = make_differentiable_coupled_march(fn3d, circ, solver,
                                              dt=5.0, nsteps=3)
    w0, c0 = solver.init(fn3d, circ, DT)
    V0 = fn3d.volumes(w0[: fn3d.nmech])[0]
    c0 = c0.at[circ.volume_index("lv")].set(V0)

    @jax.jit
    def qoi(theta):
        w, c, vols, ps = march(w0, c0, theta)
        # "ejected volume" over the activation window
        return V0 - vols[-1, 0]

    val, g = jax.jit(jax.value_and_grad(qoi.__wrapped__))(theta0)
    assert np.isfinite(float(val))
    gT, gmu = float(g["Tmax"]), float(g["mu"])
    for key, gval in (("Tmax", gT), ("mu", gmu)):
        eps = 1e-3 * max(1.0, abs(float(theta0[key])))
        tp = dict(theta0); tp[key] = theta0[key] + eps
        tm = dict(theta0); tm[key] = theta0[key] - eps
        fd = (float(qoi(tp)) - float(qoi(tm))) / (2 * eps)
        assert abs(fd - gval) < 5e-4 * max(1.0, abs(fd)), (key, fd, gval)


# ---------------------------------------------------------------------------
# fiber-angle gradients: traced frames + condensed-state channel
# (VERDICT r3 item 9 — the case em.py's docstring previously excluded)
# ---------------------------------------------------------------------------

def _lv_micro(mesh, helix=60.0):
    cs = tb.compute_lv_coordinate_system(mesh)
    return tb.create_microstructure_model(
        cs, endo_helix_angle=np.deg2rad(helix),
        epi_helix_angle=np.deg2rad(-helix))


def test_traced_frames_match_setup_frames():
    """traced_rule_frames on the extracted frame_geometry at the BASE
    angles reproduces the setup-time numpy frames exactly (both the
    gradient-axes and radial-proxy branches share the rotation recipe)."""
    from thunderbolt_tpu.models.microstructure import (
        ANGLE_PARAM_NAMES, frame_geometry, traced_rule_frames)
    mesh = tb.generate_ideal_lv_mesh(6, 2, 3)
    cs = tb.compute_lv_coordinate_system(mesh)
    micro = tb.create_microstructure_model(
        cs, endo_helix_angle=np.deg2rad(60.0),
        epi_helix_angle=np.deg2rad(-60.0),
        endo_transversal_angle=np.deg2rad(5.0),
        epi_transversal_angle=np.deg2rad(-5.0),
        endo_sheetlet_angle=np.deg2rad(10.0),
        epi_sheetlet_angle=np.deg2rad(-10.0))
    mat = tb.PK1Model(tb.HolzapfelOgden2009Model(),
                      microstructure_model=micro)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=DT)
    fn = tb.semidiscretize(
        tb.QuasiStaticModel("displacement", mat, ()), disc, mesh)
    params = {k: getattr(micro.params, k) for k in ANGLE_PARAM_NAMES}
    for batch, cache in zip(fn.batches, fn.mat_caches):
        geom = frame_geometry(micro, batch)
        tf = traced_rule_frames(geom, params, cache["frames"].dtype)
        np.testing.assert_allclose(np.asarray(tf),
                                   np.asarray(cache["frames"]),
                                   atol=1e-13)


def test_fiber_angle_equilibrium_gradient_matches_fd():
    """d(QoI)/d(helix angle) through a Newton equilibrium of an
    ANISOTROPIC (Holzapfel-Ogden) LV under endocardial pressure: the
    frames are re-evaluated tracably from the traced angle, so the
    adjoint's reverse residual pass carries the angle cotangent."""
    mesh = tb.generate_ideal_lv_mesh(6, 2, 3)
    micro = _lv_micro(mesh)
    mat = tb.PK1Model(tb.HolzapfelOgden2009Model(),
                      microstructure_model=micro)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=DT)
    fn = tb.semidiscretize(
        tb.QuasiStaticModel(
            "displacement", mat,
            (tb.ConstantPressureBC(0.1, "Endocardium"),)), disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-11, inner="dense", max_iter=40)
    solve = make_parametric_equilibrium_solve(
        fn, newton, lambda m, th: m,
        frame_angles=lambda th: {"endo_helix_angle": th["helix"],
                                 "epi_helix_angle": -th["helix"]},
        adjoint_rtol=1e-12)
    u0 = jnp.zeros(fn.solution_size, DT)
    w = jnp.asarray(np.random.default_rng(7).standard_normal(
        fn.solution_size))
    t = jnp.asarray(1.0, DT)

    def qoi(th):
        return jnp.vdot(w, solve(u0, t, th))

    th0 = {"helix": jnp.asarray(np.deg2rad(60.0), DT)}
    g = float(jax.grad(qoi)(th0)["helix"])
    h = 1e-5
    fd = float((qoi({"helix": th0["helix"] + h})
                - qoi({"helix": th0["helix"] - h})) / (2 * h))
    assert abs(fd) > 1e-7
    np.testing.assert_allclose(g, fd, rtol=2e-5)


@pytest.mark.slow
def test_fiber_angle_em_gradient_matches_fd():
    """d(ejected volume)/d(helix angle) through THREE coupled 3D-0D steps
    with a fiber-directed active stress and condensed sarcomere state:
    the angle flows through the equilibrium residual (traced frames), the
    tying block, AND the committed fiber-stretch history
    (internal_after_step_theta) — the channel em.py previously froze."""
    import dataclasses as dc
    from thunderbolt_tpu.disc.coupled import (BlockedNewtonSolver,
                                              Coupled3D0DSolver)
    from thunderbolt_tpu.ad import (make_differentiable_coupled_march,
                                    parametric_coupled_function)

    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    scale = 5.14
    mesh.nodes[:] = mesh.nodes * scale
    micro = _lv_micro(mesh)
    calcium = tb.AnalyticalCoefficient(
        lambda x, t: jnp.clip(t / 50.0, 0.0, 1.0))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=2.0, lam=10.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=30.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(), calcium),
        microstructure_model=micro)
    circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
    coupler = tb.LumpedFluidSolidCoupler(
        (tb.ChamberVolumeCoupling("Endocardium", "lv"),), "displacement",
        volume_method=tb.RSAFDQ2022SurrogateVolume(
            h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * scale)))
    coupled = tb.RSAFDQ2022Model(
        tb.QuasiStaticModel("displacement", material, ()), circuit,
        coupler)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=DT)
    fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)

    theta0 = {"Tmax": jnp.asarray(30.0, DT),
              "helix": jnp.asarray(np.deg2rad(60.0), DT)}

    def apply_params(m, theta):
        return dc.replace(
            m, active_stress_model=dc.replace(m.active_stress_model,
                                              Tmax=theta["Tmax"]))

    fn3d_p = parametric_coupled_function(
        fn3d, apply_params, theta0,
        frame_angles=lambda th: {"endo_helix_angle": th["helix"],
                                 "epi_helix_angle": -th["helix"]})
    solver = Coupled3D0DSolver(
        newton=BlockedNewtonSolver(tol=1e-9, max_iter=30))
    march = make_differentiable_coupled_march(fn3d_p, circ, solver,
                                              dt=5.0, nsteps=3)
    w0, c0 = solver.init(fn3d_p, circ, DT)
    V0 = fn3d_p.volumes(w0[: fn3d_p.nmech])[0]
    c0 = c0.at[circ.volume_index("lv")].set(V0)

    @jax.jit
    def qoi(theta):
        w, c, vols, ps = march(w0, c0, theta)
        return V0 - vols[-1, 0]

    val, g = jax.jit(jax.value_and_grad(qoi.__wrapped__))(theta0)
    assert np.isfinite(float(val))
    for key, rtol in (("helix", 1e-3), ("Tmax", 1e-3)):
        gval = float(g[key])
        eps = 1e-4 * max(1.0, abs(float(theta0[key])))
        tp = dict(theta0); tp[key] = theta0[key] + eps
        tm = dict(theta0); tm[key] = theta0[key] - eps
        fd = (float(qoi(tp)) - float(qoi(tm))) / (2 * eps)
        assert abs(fd) > 1e-9, key
        assert abs(fd - gval) < rtol * max(1e-3, abs(fd)), (key, fd, gval)
