"""Device-resident fixed marches: the one-dispatch homotopy load ladder
(``march_fixed_ladder``) and Newmark march (``NewmarkSolver.march``) must
reproduce their host-loop drivers exactly — the marches are a latency
optimization (one jitted ``lax.scan`` instead of one dispatch per step),
never a semantics change. Host counterparts: ``HomotopyPathSolver.solve``
(ref ``src/solver/time/homotopy.jl``) and ``NewmarkSolver.step`` (ref
``src/solver/time/time_integrator.jl`` Newmark path)."""

import pytest
import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.time.homotopy import march_fixed_ladder

DT = jnp.float64


def _ramp_fn():
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (3.0, 1.0, 1.0))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=5.0))
    press = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t, 1.0) * 0.06),
        "bottom")
    model = tb.QuasiStaticModel("d", material, (press,))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    return tb.semidiscretize(model, disc, mesh)


def test_fixed_ladder_matches_host_homotopy():
    """Equal-increment device ladder == host HomotopyPathSolver when every
    load step converges at the fixed dt (so the host never adapts)."""
    fn = _ramp_fn()
    newton = tb.NewtonRaphsonSolver(tol=1e-9, max_iter=25, inner="dense")
    u0 = jnp.zeros(fn.solution_size, DT)
    u_dev, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
    assert bool(jnp.all(convs)), np.asarray(convs)
    host = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-9, max_iter=25, inner="lu"),
        adaptive=False)
    u_host, rep = host.solve(fn, u0, (0.0, 1.0), dt=0.25)
    assert rep.converged
    assert np.allclose(np.asarray(u_dev), np.asarray(u_host), atol=1e-7)
    # per-step Newton effort is visible to callers
    assert int(np.asarray(its).sum()) >= 4


def test_fixed_ladder_reports_failures():
    """A ladder too coarse to converge reports converged=False for the
    offending steps instead of raising inside the scan."""
    fn = _ramp_fn()
    newton = tb.NewtonRaphsonSolver(tol=1e-12, max_iter=1, inner="dense")
    u0 = jnp.zeros(fn.solution_size, DT)
    _, _, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 2)
    assert not bool(jnp.all(convs))


def _vibrating_block():
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=5.0, lam=5.0))
    model = tb.ElastodynamicsModel("d", "v", material, rho=1.0)
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    return fn


def test_newmark_march_matches_step_loop():
    """Device Newmark march == the host step loop, state for state."""
    fn = _vibrating_block()
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        tol=1e-10, max_iter=25, inner="dense"))
    st0 = solver.init(fn)
    # kick it: uniform initial velocity on the free dofs
    v0 = jnp.full(fn.solution_size, 0.05, DT)
    v0 = fn.constraints.apply_zero(v0)
    st0 = type(st0)(st0.u, v0, st0.a, st0.t)
    dt, n = 0.1, 6

    st_host = st0
    for _ in range(n):
        st_host, stats = solver.step(fn, st_host, dt)
        assert stats.converged, stats

    st_dev, its, convs = solver.march(fn, st0, dt, n)
    assert bool(jnp.all(convs)), np.asarray(convs)
    assert abs(st_dev.t - st_host.t) < 1e-12
    for a, b in ((st_dev.u, st_host.u), (st_dev.v, st_host.v),
                 (st_dev.a, st_host.a)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-9), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


@pytest.mark.slow
def test_newmark_march_condensed_internal_state():
    """March with condensed sarcomere state: committed internal state is
    threaded through the scan and matches the host loop's committed state
    at the end of the march."""
    from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    ca = tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t / 5.0, 1.0))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=1000.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), ca))
    model = tb.ElastodynamicsModel("d", "v", material, rho=1e-3)
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=DT)

    def fresh():
        return tb.semidiscretize(model, disc, mesh)

    dt, n = 1.0, 4
    fn_h = fresh()
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        tol=1e-8, max_iter=25, inner="dense"))
    st_h = solver.init(fn_h)
    for _ in range(n):
        st_h, stats = solver.step(fn_h, st_h, dt)
        assert stats.converged, stats

    fn_d = fresh()
    st_d, its, convs = solver.march(fn_d, solver.init(fn_d), dt, n)
    assert bool(jnp.all(convs)), np.asarray(convs)
    assert np.allclose(np.asarray(st_d.u), np.asarray(st_h.u), atol=1e-8)
    for key in fn_h.internal[0]:
        a = np.asarray(fn_d.internal[0][key])
        b = np.asarray(fn_h.internal[0][key])
        assert np.allclose(a, b, atol=1e-8), (key, np.abs(a - b).max())
