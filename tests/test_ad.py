"""Differentiable-simulation module (thunderbolt_tpu.ad).

Beyond-reference capability tests: (1) the reverse-differentiable
monodomain march reproduces the production operator-split integrator,
(2) its conductivity gradient matches finite differences, (3) the
adjoint (implicit-function-theorem) equilibrium solve's load-parameter
gradient matches finite differences.
"""

import numpy as np
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
