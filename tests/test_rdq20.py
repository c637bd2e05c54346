"""RDQ20-MF sarcomere + condensed internal variables (multilevel-Newton
parity). Reference patterns: ``test_sarcomere.jl`` trajectories +
``test/integration/test_solid_mechanics.jl`` condensed-state solves."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.contraction_rdq20 import (
    RDQ20MFModel, AsRateIndependent, StandaloneSarcomereModel)

DT = jnp.float64


def test_ru_chain_conservative():
    m = RDQ20MFModel()
    rng = np.random.default_rng(0)
    Q = jnp.asarray(np.abs(rng.normal(size=20)))
    Q = Q.at[:16].set(Q[:16] / Q[:16].sum())
    dQ = m.rhs(Q, jnp.asarray(1.05), jnp.asarray(0.01), jnp.asarray(0.8), 0.0)
    assert abs(float(dQ[:16].sum())) < 1e-14


def test_isometric_twitch():
    """Ca transient drives a tension twitch in the published range."""
    m = RDQ20MFModel()

    def ca(t):
        rise = jnp.where(t > 10,
                         (jnp.exp(-(t - 10) / 200)
                          - jnp.exp(-(t - 10) / 20)) * 1.8, 0.0)
        return 0.1 + 0.9 * rise

    standalone = StandaloneSarcomereModel(
        m, ca, lambda t: 1.0, lambda t: 0.0)
    dt = 0.1
    Q = jnp.asarray(m.default_initial_state())

    @jax.jit
    def advance(Q, t0):
        def body(Q, i):
            t = t0 + i * dt
            k1 = standalone.rhs(Q, t)
            k2 = standalone.rhs(Q + 0.5 * dt * k1, t + 0.5 * dt)
            return Q + dt * k2, None
        return jax.lax.scan(body, Q, jnp.arange(50))[0]

    Ts = []
    for k in range(160):
        Q = advance(Q, k * 5.0)
        Ts.append(float(m.compute_active_tension(Q, 1.0)))
    Ts = np.asarray(Ts)
    assert Ts[0] < 5.0
    assert 30 < Ts.max() < 250, Ts.max()       # physiologic peak (kPa)
    assert Ts[-1] < 0.5 * Ts.max()             # relaxation
    assert (np.asarray(Q[:16]) > -1e-9).all()  # probabilities stay valid
    assert abs(float(Q[:16].sum()) - 1.0) < 1e-10


@pytest.mark.slow
def test_rate_dependence_and_wrapper():
    """Shortening velocity reduces tension (force-velocity); the
    AsRateIndependent wrapper removes the dependence."""
    m = RDQ20MFModel()
    Q = jnp.asarray(m.default_initial_state())
    # activate at constant Ca first
    dt = 0.1
    for _ in range(2000):
        Q = Q + dt * m.rhs(Q, jnp.asarray(1.0), jnp.asarray(0.0),
                           jnp.asarray(1.0), 0.0)
    d_still = m.rhs(Q, jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0), 0.0)
    d_short = m.rhs(Q, jnp.asarray(1.0), jnp.asarray(-0.5), jnp.asarray(1.0), 0.0)
    assert not np.allclose(np.asarray(d_still[16:]), np.asarray(d_short[16:]))
    ri = AsRateIndependent(m)
    d_ri = ri.rhs(Q, jnp.asarray(1.0), jnp.asarray(-0.5), jnp.asarray(1.0), 0.0)
    assert np.allclose(np.asarray(d_ri), np.asarray(d_still))


@pytest.mark.slow
def test_local_solve_and_tangent():
    m = RDQ20MFModel()
    Q0 = jnp.asarray(m.default_initial_state())
    Q = m.local_solve(Q0, jnp.asarray(1.0), jnp.asarray(1.0),
                      jnp.asarray(0.5), 0.0, 0.1)
    res = Q - Q0 - 0.1 * m.rhs(Q, jnp.asarray(1.0), jnp.asarray(0.0),
                               jnp.asarray(0.5), 0.1)
    assert float(jnp.abs(res).max()) < 1e-12
    # differentiating through the solver gives a finite consistent tangent
    g = jax.grad(lambda lam: m.compute_active_tension(
        m.local_solve(Q, lam, jnp.asarray(1.0), jnp.asarray(1.0), 0.0, 0.1),
        lam))(jnp.asarray(1.0))
    assert np.isfinite(float(g))


@pytest.mark.slow
def test_condensed_cuboid_contraction():
    """Quasi-static cuboid with the RDQ20MF-driven active stress: Ca rises,
    the condensed per-qp state activates, the cuboid contracts along the
    fiber, then relaxes when Ca drops (the DAE/condensed path end-to-end)."""
    mesh = tb.generate_mesh("hex8", (2, 2, 2))

    # calcium: ramp on then off over the homotopy pseudo-time [ms]
    ca = tb.AnalyticalCoefficient(
        lambda x, t: jnp.where(t < 60.0, 1.0, 0.05))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        # N = (XB1+XB3)*overlap ~ 5e-3 at full activation, so Tmax ~ a_XB
        # scale gives tensions of a few kPa against mu = 5 kPa
        active_stress_model=tb.SimpleActiveStress(Tmax=5000.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), ca),
    )
    assert material.has_internal_state
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=DT)
    fn = tb.semidiscretize(tb.QuasiStaticModel("d", material, ()), disc, mesh)
    assert fn.internal is not None

    newton = tb.NewtonRaphsonSolver(tol=1e-7, inner="lu", max_iter=20)
    solver = tb.HomotopyPathSolver(newton, adaptive=True)
    coords = fn.dh.field_dof_coords("d")
    right = coords[:, 0] > 1 - 1e-9

    history = []
    solver_store = lambda t, u: history.append(
        (t, float(np.asarray(u).reshape(-1, 3)[right, 0].mean())))
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT),
                          (0.0, 120.0), dt=20.0, store=solver_store)
    assert rep.converged, rep
    ts, ux = np.asarray(history).T
    # contraction develops while Ca is high...
    assert ux[ts <= 60].min() < -5e-3, (ts, ux)
    # ... and releases after Ca drops
    assert ux[-1] > ux[ts <= 60].min() * 0.7
