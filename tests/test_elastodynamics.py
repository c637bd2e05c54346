"""Newmark elastodynamics: consistent initial acceleration, energy
conservation, 2nd-order convergence, active vibration.
Parity with ``test/integration/test_elastodynamics.jl`` (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.time.newmark import kinetic_energy

DT = jnp.float64


def _block(n=(2, 2, 2), rho=1.0, mu=5.0, lam=5.0):
    mesh = tb.generate_mesh("hex8", n)
    material = tb.PK1Model(tb.NeoHookeanModel(mu=mu, lam=lam))
    model = tb.ElastodynamicsModel("d", "v", material, rho=rho)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    return mesh, fn


def test_mass_matrix_total():
    mesh, fn = _block(rho=2.5)
    ones = jnp.ones(fn.solution_size, DT)
    # sum over each component block = rho * volume
    total = float(ones @ fn.M.mv(ones))
    assert np.isclose(total, 3 * 2.5 * 1.0, rtol=1e-10)


def test_initial_acceleration_zero_at_rest():
    mesh, fn = _block()
    solver = tb.NewmarkSolver()
    st = solver.init(fn)
    assert np.abs(np.asarray(st.a)).max() < 1e-10


def test_free_vibration_energy_conservation():
    """Trapezoidal Newmark conserves total energy to high accuracy for a
    free nonlinear vibration."""
    mesh, fn = _block()
    coords = fn.dh.field_dof_coords("d")
    # initial velocity kick proportional to x (zero at the clamped face)
    v0 = jnp.asarray(np.stack([0.2 * coords[:, 0],
                               np.zeros(len(coords)),
                               np.zeros(len(coords))], -1).reshape(-1))
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(inner="lu",
                                                            tol=1e-10))
    st = solver.init(fn, v0=v0)
    E0 = kinetic_energy(fn, st.v)  # strain energy is 0 at u=0
    energies = []
    for _ in range(20):
        st, stats = solver.step(fn, st, 0.05)
        assert stats.converged
        # E = kinetic + strain; strain energy via residual work integral is
        # not assembled directly, so check boundedness + return of energy:
        energies.append(kinetic_energy(fn, st.v))
    energies = np.asarray(energies)
    # kinetic energy oscillates but never exceeds the initial total energy
    assert energies.max() <= E0 * 1.02
    # and comes back up (conservative scheme, no numerical damping)
    assert energies.max() > 0.5 * E0
    assert np.isfinite(np.asarray(st.u)).all()


def test_newmark_second_order_convergence():
    """Displacement error vs a fine-dt reference scales ~dt^2."""
    mesh, fn = _block(n=(2, 1, 1))
    coords = fn.dh.field_dof_coords("d")
    v0 = jnp.asarray(np.stack([0.3 * coords[:, 0],
                               np.zeros(len(coords)),
                               np.zeros(len(coords))], -1).reshape(-1))
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(inner="lu",
                                                            tol=1e-12))
    T = 0.4

    def run(dt):
        st = solver.init(fn, v0=v0)
        st = solver.solve(fn, st, T, dt)
        return np.asarray(st.u)

    # pre-asymptotic at coarse dt (observed 0.9 -> 1.6 -> 1.9 over a dt
    # sweep); measure in the asymptotic regime
    u_ref = run(0.003125)
    e1 = np.abs(run(0.025) - u_ref).max()
    e2 = np.abs(run(0.0125) - u_ref).max()
    rate = np.log2(e1 / e2)
    assert 1.6 < rate < 2.6, (e1, e2, rate)


def test_adaptive_newmark_matches_fixed():
    """PID-adaptive Newmark reproduces the fixed fine-dt solution and
    actually adapts the step size."""
    mesh, fn = _block(n=(2, 1, 1))
    coords = fn.dh.field_dof_coords("d")
    v0 = jnp.asarray(np.stack([0.2 * coords[:, 0],
                               np.zeros(len(coords)),
                               np.zeros(len(coords))], -1).reshape(-1))
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(inner="lu",
                                                            tol=1e-11))
    T = 0.5
    st_fix = solver.solve(fn, solver.init(fn, v0=v0), T, 0.005)
    st0 = solver.init(fn, v0=v0)
    st_ad, stats = solver.solve_adaptive(fn, st0, T, dt0=0.1,
                                         abstol=1e-7, reltol=1e-5)
    assert stats["naccept"] > 5
    assert abs(st_ad.t - T) < 1e-10
    err = np.abs(np.asarray(st_ad.u) - np.asarray(st_fix.u)).max()
    scale = np.abs(np.asarray(st_fix.u)).max()
    assert err < 0.05 * scale, (err, scale)
