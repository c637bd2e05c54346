"""Krylov solver unit tests: GMRES(m), BiCGStab breakdown reporting,
Newton history parity between the jitted and host loops.

Parity targets: the reference exposes ``KrylovJL_GMRES`` via LinearSolve.jl
(SURVEY.md §2.8); its Newton history semantics are the host-loop ones
(``src/solver/nonlinear/newton_raphson.jl:212-291``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from thunderbolt_tpu.solver.linear import cg, bicgstab, gmres, KrylovInfo


def _nonsym_system(n=40, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = A @ x_true
    return (jnp.asarray(A, dtype), jnp.asarray(b, dtype),
            jnp.asarray(x_true, dtype))


def test_gmres_nonsymmetric_matches_dense():
    A, b, x_true = _nonsym_system()
    x, info = gmres(lambda v: A @ v, b, rtol=1e-10, atol=0.0, restart=20,
                    maxiter=400)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=1e-7)


def test_gmres_restart_smaller_than_needed_still_converges():
    A, b, x_true = _nonsym_system(n=60, seed=1)
    x, info = gmres(lambda v: A @ v, b, rtol=1e-9, atol=0.0, restart=8,
                    maxiter=2000)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=1e-6)


def test_gmres_right_preconditioned():
    A, b, x_true = _nonsym_system(n=50, seed=2)
    dinv = 1.0 / jnp.diag(A)
    x, info = gmres(lambda v: A @ v, b, Minv=lambda r: dinv * r,
                    rtol=1e-10, atol=0.0, restart=15, maxiter=400)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=1e-7)


def test_gmres_beats_unpreconditioned_tolerance_on_spd():
    """Sanity: agrees with CG on an SPD system."""
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((30, 30)))[0]
    A = jnp.asarray(Q @ np.diag(np.linspace(1.0, 50.0, 30)) @ Q.T)
    b = jnp.asarray(rng.standard_normal(30))
    xg, ig = gmres(lambda v: A @ v, b, rtol=1e-10, atol=0.0, restart=30)
    xc, ic = cg(lambda v: A @ v, b, rtol=1e-12, atol=0.0)
    assert bool(ig.converged) and bool(ic.converged)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), atol=1e-6)


def test_bicgstab_breakdown_reports_not_converged():
    """A forced NaN breakdown must come back converged=False with a finite
    residual norm (advisor round-1 medium finding: the old guard zeroed the
    residual and reported a silent false positive)."""
    n = 8
    calls = {"k": 0}

    def A(v):
        # poison the operator from the second application on: first
        # iteration's products turn non-finite -> breakdown path
        calls["k"] += 1
        bad = jnp.asarray(np.nan, v.dtype)
        return jnp.where(calls["k"] > 1, bad, 1.0) * v

    b = jnp.ones(n, jnp.float64)
    x, info = bicgstab(A, b, rtol=1e-12, atol=0.0, maxiter=50)
    assert not bool(info.converged)
    assert np.isfinite(float(info.residual))
    assert np.all(np.isfinite(np.asarray(x)))


def test_bicgstab_healthy_still_converges():
    A, b, x_true = _nonsym_system(n=30, seed=4)
    x, info = bicgstab(lambda v: A @ v, b, rtol=1e-11, atol=0.0,
                       maxiter=500)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_newton_history_parity_jitted_vs_host():
    """The jitted one-dispatch Newton and the host loop must report the
    same iteration count and residual history on the same problem
    (advisor round-1: the jitted history was shifted/duplicated)."""
    import thunderbolt_tpu as tb

    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0))
    model = tb.QuasiStaticModel(
        "d", material, (tb.ConstantPressureBC(0.02, "top"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "bottom", 0.0)])
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.NewtonRaphsonSolver(tol=1e-8, max_iter=20)
    u0 = jnp.zeros(fn.solution_size)
    u_j, st_j = solver.solve_jitted(fn, u0, 0.0)
    u_h, st_h = solver.solve_host(fn, u0, 0.0)
    assert st_j.converged and st_h.converged
    assert st_j.iterations == st_h.iterations
    assert len(st_j.history) == len(st_h.history)
    np.testing.assert_allclose(st_j.history, st_h.history,
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(u_j), np.asarray(u_h), atol=1e-8)


@pytest.mark.slow
def test_newton_jit_cache_keyed_on_config():
    """Two solvers with different settings on the same function object must
    not share a compiled loop (advisor round-1 medium finding)."""
    import thunderbolt_tpu as tb

    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0))
    model = tb.QuasiStaticModel(
        "d", material, (tb.ConstantPressureBC(0.02, "top"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "bottom", 0.0)])
    fn = tb.semidiscretize(model, disc, mesh)
    u0 = jnp.zeros(fn.solution_size)
    loose = tb.NewtonRaphsonSolver(tol=1e-2, max_iter=20)
    tight = tb.NewtonRaphsonSolver(tol=1e-10, max_iter=40)
    _, st_loose = loose.solve_jitted(fn, u0, 0.0)
    _, st_tight = tight.solve_jitted(fn, u0, 0.0)
    # the tight solve must actually use its own tolerance
    assert st_tight.residual_norm <= 1e-10
    assert st_tight.iterations >= st_loose.iterations
