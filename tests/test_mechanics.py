"""Nonlinear solid mechanics: energy catalog sanity, FD-consistent
Jacobians, patch tests, weak BCs, active contraction.
Parity with the reference's ``test_elements.jl`` (FD checks of K_e vs r_e)
and ``test/integration/test_solid_mechanics.jl`` material x solver matrix."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb

DT = jnp.float64

ENERGIES = [
    tb.NeoHookeanModel(),
    tb.BioNeoHookean(),
    tb.HolzapfelOgden2009Model(),
    tb.Guccione1991PassiveModel(),
    tb.LinYinPassiveModel(),
    tb.HumphreyStrumpfYinModel(),
    tb.TransverseIsotopicNeoHookeanModel(),
]

FRAME = jnp.eye(3, dtype=DT)


@pytest.mark.parametrize("energy", ENERGIES, ids=lambda e: type(e).__name__)
def test_stress_free_reference(energy):
    """P(I) = 0 and psi(I) = 0 for every passive energy."""
    F0 = jnp.eye(3, dtype=DT)
    psi0 = energy.psi(F0, FRAME)
    assert np.isfinite(float(psi0))  # Guccione carries a C0/2 offset
    P0 = jax.grad(lambda F: energy.psi(F, FRAME))(F0)
    assert np.abs(np.asarray(P0)).max() < 1e-10, P0


STABLE_AT_REST = [
    tb.NeoHookeanModel(),
    tb.BioNeoHookean(),
    tb.HolzapfelOgden2009Model(),
    tb.Guccione1991PassiveModel(),
]
# LinYin / HumphreyStrumpfYin are Fung polynomials that are NOT positive
# definite at F = I, and TransverseIsotopicNeoHookean has power exponents
# > 2 (zero deviatoric curvature at rest) — properties of the published
# formulas, shared with the reference.


@pytest.mark.parametrize("energy", STABLE_AT_REST, ids=lambda e: type(e).__name__)
def test_tangent_symmetric_and_stable(energy):
    """The tangent at the reference state is symmetric (hyperelastic) and
    positive semidefinite up to the 3 rotational zero modes (material frame
    indifference makes rotations zero-curvature directions at F = I)."""
    F = jnp.eye(3, dtype=DT)
    A = jax.jacfwd(jax.grad(lambda Fad: energy.psi(Fad, FRAME)))(F)
    A = np.asarray(A).reshape(9, 9)
    assert np.allclose(A, A.T, atol=1e-8 * max(1.0, np.abs(A).max()))
    eig = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert eig.min() > -1e-8 * max(1.0, abs(eig).max()), eig
    # at most 3 (rotational) zero modes; the rest strictly positive
    scale = abs(eig).max()
    assert (eig > 1e-8 * scale).sum() >= 6, eig


def _cube_fn(material=None, wbcs=(), dbcs=(), n=(2, 2, 2), order=1):
    mesh = tb.generate_mesh("hex8", n)
    if material is None:
        material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=1.0))
    model = tb.QuasiStaticModel("d", material, tuple(wbcs))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=order, ncomponents=3)},
        dbcs=list(dbcs), dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    return mesh, fn


def test_jacobian_matches_fd():
    """Assembled tangent matches finite differences of the residual
    (the reference's ConsistencyCheck / test_elements.jl pattern)."""
    mesh, fn = _cube_fn(wbcs=[tb.ConstantPressureBC(0.1, "top"),
                              tb.NormalSpringBC(0.5, "right"),
                              tb.RobinBC(0.3, "front")])
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.05 * rng.normal(size=fn.solution_size))
    v = jnp.asarray(rng.normal(size=fn.solution_size))
    kvals, r = fn.assemble(u, 1.0)
    A = fn.jacobian_matrix(kvals)
    Av = np.asarray(A.mv(v))
    eps = 1e-6
    r_p = np.asarray(fn.residual(u + eps * v, 1.0))
    r_m = np.asarray(fn.residual(u - eps * v, 1.0))
    fd = (r_p - r_m) / (2 * eps)
    assert np.allclose(Av, fd, atol=1e-6 * max(1.0, np.abs(fd).max())), \
        np.abs(Av - fd).max()


def test_patch_uniaxial_stretch():
    """Dirichlet-driven homogeneous stretch: interior displacement linear
    (patch test) and deformation gradient constant."""
    lam = 1.1
    dbcs = [
        tb.Dirichlet("d", "left", 0.0, components=[0]),
        tb.Dirichlet("d", "right", lambda x: np.full(len(x), 0.1),
                     components=[0]),
        tb.Dirichlet("d", "front", 0.0, components=[1]),
        tb.Dirichlet("d", "bottom", 0.0, components=[2]),
    ]
    mesh, fn = _cube_fn(dbcs=dbcs, n=(3, 3, 3))
    newton = tb.NewtonRaphsonSolver(tol=1e-10, inner="lu")
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 0.0)
    assert stats.converged, stats
    coords = fn.dh.field_dof_coords("d")
    ux = np.asarray(u).reshape(-1, 3)[:, 0]
    # u_x must be affine in x: u_x = 0.1 * x
    assert np.allclose(ux, 0.1 * coords[:, 0], atol=1e-8)


def test_pressure_bends_beam_up():
    """Follower pressure on the bottom face pushes the clamped beam up."""
    mesh = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0), (4.0, 1.0, 1.0))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
    model = tb.QuasiStaticModel(
        "d", material, (tb.ConstantPressureBC(0.005, "bottom"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="lu")
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 1.0)
    assert stats.converged
    coords = fn.dh.field_dof_coords("d")
    tip = np.argmin(np.linalg.norm(coords - [4.0, 0.5, 0.5], axis=1))
    uz = float(np.asarray(u).reshape(-1, 3)[tip, 2])
    assert uz > 0.002, uz


def test_robin_and_spring_bound_displacement():
    """Springs on the loaded face resist: deflection with springs < without."""
    def solve(wbcs):
        mesh, fn = _cube_fn(
            wbcs=[tb.ConstantPressureBC(0.05, "top")] + wbcs,
            dbcs=[tb.Dirichlet("d", "bottom", 0.0)], n=(2, 2, 2))
        newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="lu")
        u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 1.0)
        assert stats.converged
        return np.abs(np.asarray(u)).max()

    free = solve([])
    sprung = solve([tb.NormalSpringBC(20.0, "top")])
    robined = solve([tb.RobinBC(20.0, "top")])
    assert sprung < free
    assert robined < free


def test_active_stress_contracts_fiber():
    """ActiveStressModel with activation shortens the cube along x."""
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=1.0, lam=5.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=0.5),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.PelceSunLangeveld1995Model(),
            tb.ConstantCoefficient(1.0)),  # Ca = 1 (full activation scale)
    )
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    mesh, fn = _cube_fn(material=material, dbcs=dbcs)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="lu")
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 0.0)
    assert stats.converged
    coords = fn.dh.field_dof_coords("d")
    right = coords[:, 0] > 1 - 1e-9
    ux_right = np.asarray(u).reshape(-1, 3)[right, 0]
    assert ux_right.mean() < -1e-3, ux_right.mean()  # contraction


def test_extended_hill_active_strain():
    """ExtendedHillModel (active strain) also contracts along the fiber."""
    material = tb.ExtendedHillModel(
        passive_model=tb.NeoHookeanModel(mu=1.0, lam=5.0),
        active_model=tb.ActiveMaterialAdapter(tb.LinearSpringModel(eta=2.0)),
        active_deformation_gradient_model=tb.GMKActiveDeformationGradientModel(),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            tb.ConstantStretchModel(lam=0.9), tb.ConstantCoefficient(1.0)),
    )
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    mesh, fn = _cube_fn(material=material, dbcs=dbcs)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="lu")
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 0.0)
    assert stats.converged
    coords = fn.dh.field_dof_coords("d")
    right = coords[:, 0] > 1 - 1e-9
    ux_right = np.asarray(u).reshape(-1, 3)[right, 0]
    assert ux_right.mean() < -1e-3, ux_right.mean()


def test_homotopy_ramps_pressure():
    """HomotopyPathSolver marches a pressure ramp that direct Newton from
    zero cannot jump to in one step."""
    mesh = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0), (4.0, 1.0, 1.0))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=5.0))
    press = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t, 1.0) * 0.08),
        "bottom")
    model = tb.QuasiStaticModel("d", material, (press,))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-7, max_iter=12, inner="lu"))
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT), (0.0, 1.0),
                          dt=0.25)
    assert rep.converged, rep
    coords = fn.dh.field_dof_coords("d")
    tip = np.argmin(np.linalg.norm(coords - [4.0, 0.5, 0.5], axis=1))
    uz = float(np.asarray(u).reshape(-1, 3)[tip, 2])
    assert uz > 0.1, uz


def test_simplified_newton_frozen_tangent():
    """simplified_newton=True (newton_raphson.jl:67,223-233) reuses the
    iteration-0 tangent: same solution as full Newton, linear (more
    iterations) convergence, on BOTH the jitted and host paths."""
    # mildly nonlinear problem (chord Newton requires the frozen tangent
    # to stay contraction-close to the true one)
    mesh, fn = _cube_fn(wbcs=[tb.ConstantPressureBC(0.02, "top")],
                        dbcs=[tb.Dirichlet("d", "bottom", 0.0)])
    u0 = jnp.zeros(fn.solution_size, DT)
    full = tb.NewtonRaphsonSolver(tol=1e-10, max_iter=60, inner="bicgstab",
                                  inner_rtol=1e-10)
    simp = tb.NewtonRaphsonSolver(tol=1e-10, max_iter=60,
                                  inner="bicgstab", inner_rtol=1e-10,
                                  simplified_newton=True)
    u_full, st_full = full.solve(fn, u0, 1.0)
    u_simp, st_simp = simp.solve(fn, u0, 1.0)
    assert st_full.converged and st_simp.converged, (st_full, st_simp)
    assert np.allclose(np.asarray(u_full), np.asarray(u_simp), atol=1e-7)
    # the chord method trades tangent reassembly for extra iterations
    assert st_simp.iterations >= st_full.iterations
    # host path (monitor forces it) agrees
    calls = []
    u_host, st_host = simp.solve(fn, u0, 1.0, monitor=lambda it, rn:
                                 calls.append((it, rn)))
    assert st_host.converged
    assert np.allclose(np.asarray(u_host), np.asarray(u_simp), atol=1e-6)
    assert abs(st_host.iterations - st_simp.iterations) <= 2


def test_newton_theta_history():
    """NewtonStats.thetas mirrors the reference's Theta_k log
    (newton_raphson.jl:276-291): rates below 1 during quadratic
    convergence, terminal 0.0 sentinel on success, Inf on failure."""
    mesh, fn = _cube_fn(wbcs=[tb.ConstantPressureBC(0.02, "top")],
                        dbcs=[tb.Dirichlet("d", "bottom", 0.0)])
    u0 = jnp.zeros(fn.solution_size, DT)
    solver = tb.NewtonRaphsonSolver(tol=1e-9, max_iter=40, inner="lu")
    u, st = solver.solve(fn, u0, 1.0, monitor=lambda it, rn: None)
    assert st.converged
    assert len(st.thetas) >= 1
    assert st.thetas[-1] == 0.0                 # success sentinel (:246)
    assert all(th < 1.0 for th in st.thetas[:-1]), st.thetas
    # jitted path records the same signal shape
    u2, st2 = solver.__class__(tol=1e-9, max_iter=40, inner="bicgstab",
                               inner_rtol=1e-10).solve(fn, u0, 1.0)
    assert st2.converged and st2.thetas[-1] == 0.0
    assert all(np.isfinite(st2.thetas))
    # starved budget -> failure -> Inf sentinel (:249,253)
    bad = tb.NewtonRaphsonSolver(tol=1e-14, max_iter=2, inner="lu")
    _, st3 = bad.solve(fn, u0, 1.0, monitor=lambda it, rn: None)
    assert not st3.converged and st3.thetas[-1] == np.inf


def test_deuflhard_continuation_controller():
    """Rate-driven Deuflhard step control reaches the same ramped state and
    shows the expected grow/shrink behavior (homotopy.jl:219-283 parity:
    Theta_k from NewtonStats.thetas drives Eq. 5.24 prediction)."""
    ctrl = tb.Deuflhard2004DiscreteContinuationController(
        theta_min=0.125, p=1)
    g = lambda x: np.sqrt(1.0 + 4.0 * x) - 1.0
    # adapt_dt! formula: q = clamp(gamma*(g(theta_bar)/(2*Theta0))^(1/p))
    th = (0.3, 0.1)
    q = np.clip(0.95 * g(0.5) / (2 * 0.3), 0.2, 5.0)
    assert np.isclose(ctrl.on_accept(1.0, th), q)
    # Theta0 below theta_min clamps to theta_min
    assert np.isclose(ctrl.on_accept(1.0, (0.01,)),
                      np.clip(0.95 * g(0.5) / (2 * 0.125), 0.2, 5.0))
    # fast rates grow, slow rates shrink
    assert ctrl.on_accept(1.0, (0.125,)) > 1.0
    assert ctrl.on_accept(1.0, (0.9,)) < 1.0
    # should_accept: any rate above theta_reject rejects (monotonic mode)
    assert ctrl.should_accept((0.3, 0.9))
    assert not ctrl.should_accept((0.3, 0.96))
    # reject shrink uses the first offending rate's Eq. 5.24 factor
    assert np.isclose(ctrl.on_reject(1.0, (0.2, 0.97)),
                      np.clip(0.95 * g(0.5) / g(0.97), 0.2, 5.0))
    # B variant: growth uses g(Theta0), not 2*Theta0 (homotopy.jl:283-345)
    ctrl_b = tb.Deuflhard2004_B_DiscreteContinuationControllerVariant(
        theta_min=0.125, p=1)
    assert np.isclose(ctrl_b.on_accept(1.0, th),
                      np.clip(0.95 * g(0.5) / g(0.3), 0.2, 5.0))
    # experimental: reject on max rate, adapt on mean (homotopy.jl:345-399)
    ctrl_e = tb.ExperimentalDiscreteContinuationController(
        theta_min=0.125, p=1)
    assert np.isclose(ctrl_e.on_accept(1.0, (0.2, 0.6)),
                      np.clip(0.95 * g(0.75) / (2 * 0.4), 0.2, 5.0))
    assert ctrl_e.should_accept((0.3, 0.89))
    assert not ctrl_e.should_accept((0.3, 0.91))
    # iteration-count fallback keeps its documented behavior
    fb = tb.IterationCountContinuationController(
        target_iterations=4, gamma=1.0, max_growth=2.0)
    assert fb.on_accept(1.0, 1) == 2.0
    assert fb.on_accept(1.0, 4) == 1.0
    assert fb.on_accept(1.0, 16) == 0.5
    assert fb.on_reject(1.0, 12) < 0.6

    mesh = tb.generate_mesh("hex8", (6, 2, 2), (0, 0, 0), (4.0, 1.0, 1.0))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=5.0))
    press = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t, 1.0) * 0.08),
        "bottom")
    model = tb.QuasiStaticModel("d", material, (press,))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-7, max_iter=12, inner="lu"),
        controller=ctrl)
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT), (0.0, 1.0),
                          dt=0.25)
    assert rep.converged, rep
    coords = fn.dh.field_dof_coords("d")
    tip = np.argmin(np.linalg.norm(coords - [4.0, 0.5, 0.5], axis=1))
    uz = float(np.asarray(u).reshape(-1, 3)[tip, 2])
    assert uz > 0.1, uz


def test_sarcomere_step_too_long_fails_cleanly():
    """A 20 ms single backward step outruns the RDQ20 RU dynamics; the
    failure must surface as a rejected, un-committed step — not an
    exception, not an accepted garbage state (parity:
    test_solid_mechanics.jl:905 'A step too long for the sarcomere fails
    cleanly')."""
    from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel
    mesh = tb.generate_mesh("hex8", (1, 1, 1), (0., 0., 0.), (1., 1., .2))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=220e3),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), tb.ConstantCoefficient(1.0)))
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs,
        dtype=jnp.float32)
    fn = tb.semidiscretize(tb.QuasiStaticModel("d", material, ()), disc,
                           mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-8, inner="lu", max_iter=10),
        adaptive=False)
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float32),
                          (0.0, 20.0), dt=20.0)
    assert not rep.converged
    assert rep.t_reached == 0.0           # the failed attempt not accepted
    assert np.abs(np.asarray(u)).max() == 0.0    # iterate untouched
    st = fn.internal[0]                   # local state not committed
    assert float(st["Qprev"].min()) >= 0.0
    assert float(st["Qprev"].max()) <= 1.0


def test_failed_homotopy_shrinks_dt_once_per_reject():
    """dt shrinks exactly once per failed attempt (parity:
    test_solid_mechanics.jl:960). Two-sided: a dt that never shrank
    would also pass a one-sided <= check."""
    mesh = tb.generate_mesh("hex8", (2, 1, 1), (0., 0., 0.), (1., .2, .2))
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0, 1, 2]),
            tb.Dirichlet("d", "right", 0.3, components=[0]),
            tb.Dirichlet("d", "right", 0.0, components=[1, 2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs,
        dtype=jnp.float32)
    fn = tb.semidiscretize(
        tb.QuasiStaticModel("d", tb.PK1Model(tb.NeoHookeanModel(
            mu=5.0, lam=20.0)), ()), disc, mesh)
    # a tolerance Newton cannot reach: every attempt fails
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-30, inner="lu", max_iter=1),
        adaptive=True, dt_min_factor=0.05)
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float32),
                          (0.0, 1.0), dt=0.2)
    assert not rep.converged
    assert rep.rejects > 1
    ratio = 0.2 / rep.dt_final
    assert 2.0 ** (rep.rejects - 1) <= ratio <= 2.0 ** rep.rejects


def test_reference_normal_precompute_matches_traced():
    """The setup-time host-f64 reference normals (reference_normal_da)
    agree with the traced per-facet normal_da on a curved surface, and the
    spring/Robin kernels built from them produce the same residual as the
    direct formula k (u.n) da wq (u.n delta) — regression for the XLA:TPU
    fused-normalize NaN on refined-LV facet batches (round 3)."""
    from thunderbolt_tpu.fem.facets import make_facet_batch
    from thunderbolt_tpu.models.solid.boundary import reference_normal_da

    mesh = tb.generate_ideal_lv_mesh(4, 2, 2)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dtype=DT)
    fn = tb.semidiscretize(
        tb.QuasiStaticModel("d", tb.PK1Model(tb.NeoHookeanModel()),
                            (tb.NormalSpringBC(0.7, "Epicardium"),)),
        disc, mesh)
    batch = make_facet_batch(fn.dh, "d", "Epicardium", dtype=DT)
    n, da = reference_normal_da(batch)
    # traced reference
    nda = jax.vmap(batch.normal_da)(batch.Xf)
    da_t = jnp.linalg.norm(nda, axis=-1)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(n), np.asarray(nda / da_t[..., None]),
                               rtol=1e-12, atol=1e-14)
    # kernel vs direct formula at a random displacement
    res_fn, tan_fn, dofs, _ = fn.wbc_kernels[0]
    rng = np.random.default_rng(3)
    nf, nd = dofs.shape
    U = jnp.asarray(rng.standard_normal((nf, nd // 3, 3)) * 1e-2, DT)
    rf = np.asarray(res_fn(U, 0.0))
    uq = jnp.einsum("qb,fbi->fqi", batch.N, U)
    un = jnp.einsum("fqi,fqi->fq", uq, n)
    ref = 0.7 * jnp.einsum("fq,q,fq,fqi,qa->fai", da, batch.wq, un, n, batch.N)
    np.testing.assert_allclose(rf, np.asarray(ref), rtol=1e-12, atol=1e-14)
    # tangent is exactly U-independent and symmetric (quadratic energy)
    K = np.asarray(tan_fn(U, 0.0))
    K0 = np.asarray(tan_fn(jnp.zeros_like(U), 0.0))
    np.testing.assert_allclose(K, K0, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(K, np.swapaxes(K, 1, 2), rtol=1e-12, atol=1e-13)


def test_refined_lv_spring_residual_finite_at_zero():
    """Refined ideal-LV epicardial facet batch: the spring residual at
    u = 0 is exactly zero (the TPU fusion pathology this guards against
    produced NaNs here; the precomputed-normal kernel cannot)."""
    from thunderbolt_tpu.mesh.tools import uniform_refinement
    mesh = uniform_refinement(tb.generate_ideal_lv_mesh(6, 2, 3), 1)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "Base", 0.0)], dtype=jnp.float32)
    fn = tb.semidiscretize(
        tb.QuasiStaticModel("d", tb.PK1Model(tb.NeoHookeanModel()),
                            (tb.ConstantPressureBC(0.12, "Endocardium"),
                             tb.NormalSpringBC(0.5, "Epicardium"))),
        disc, mesh)
    u0 = jnp.zeros(fn.dh.ndofs, jnp.float32)
    r = np.asarray(jax.jit(lambda u: fn.residual(u, 1.0))(u0))
    assert np.isfinite(r).all()
    rs = np.asarray(jax.jit(lambda u: fn.residual(u, 1.0))(
        u0 + 1e-4 * jnp.asarray(np.random.default_rng(0).standard_normal(
            fn.dh.ndofs), jnp.float32)))
    assert np.isfinite(rs).all()
