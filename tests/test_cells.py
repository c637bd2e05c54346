"""Ionic cell models: resting-state stability, AP upstroke/repolarization,
Rush-Larsen vs forward-Euler consistency. Parity with the reference's
trajectory tests (``test/test_sarcomere.jl`` pattern; SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.cells import FHNModel, AlievPanfilovModel, PCG2019Model


def integrate(model, u0, dt, nsteps, x=None, stim=None, sample_every=1):
    """Forward-Euler trajectory via lax.scan; samples every `sample_every`."""

    def stepfn(u, i):
        t = i * dt
        du = model.rhs(u, x, t)
        if stim is not None:
            du = du.at[model.phi_index].add(stim(t))
        return u + dt * du, None

    @jax.jit
    def chunk(u, i0):
        def body(u, j):
            u, _ = stepfn(u, i0 + j)
            return u, None
        u, _ = jax.lax.scan(body, u, jnp.arange(sample_every))
        return u

    u = jnp.asarray(u0)
    traj = [np.asarray(u)]
    for k in range(nsteps // sample_every):
        u = chunk(u, k * sample_every)
        traj.append(np.asarray(u))
    return np.asarray(traj)  # [nsamples+1, nstates, npoints]


@pytest.mark.parametrize("model", [FHNModel(), AlievPanfilovModel(), PCG2019Model()])
def test_resting_state_is_stable(model):
    u0 = model.initial_state_array(4, np.float64)
    traj = integrate(model, u0, 0.1, 200, sample_every=200)
    drift = np.abs(traj[-1] - traj[0]).max()
    assert drift < 1e-2, drift


def test_fhn_excitation():
    """Suprathreshold perturbation fires an action potential."""
    m = FHNModel()
    u0 = m.initial_state_array(2, np.float64)
    u0[0, 0] = 0.5  # excite first point only
    traj = integrate(m, u0, 0.1, 3000, sample_every=100)
    phi = traj[:, 0, :]
    assert phi[:, 0].max() > 0.8          # excited point depolarizes
    assert abs(phi[:, 1]).max() < 1e-6    # resting point stays at rest
    assert abs(phi[-1, 0]) < 0.05         # and repolarizes eventually


def test_pcg2019_action_potential():
    """Stimulated PCG2019 cell: upstroke > 0 mV, APD in physiologic range,
    return toward rest. Mirrors the reference model's published behavior."""
    m = PCG2019Model()
    u0 = m.initial_state_array(1, np.float64)
    dt = 0.01

    def stim(t):
        return jnp.where((t >= 1.0) & (t < 2.0), 52.0, 0.0)

    traj = integrate(m, u0, dt, 120000, stim=stim, sample_every=100)
    phis = traj[:, 0, 0]  # sampled every 1 ms
    assert phis.max() > 0.0, "no upstroke"
    rest = -85.0
    amp = phis.max() - rest
    below = np.nonzero(phis[np.argmax(phis):] < rest + 0.1 * amp)[0]
    assert below.size > 0, "no repolarization within 1.2 s"
    apd90 = below[0]
    assert 50 < apd90 < 500, f"APD90 {apd90} ms out of range"


def test_aliev_panfilov_phi_index():
    m = AlievPanfilovModel()
    assert m.phi_index == 1
    assert m.state_symbols[1] == "phi_m"


def test_pcg_rush_larsen_matches_euler():
    """For small dt the RL gate update matches forward Euler to O(dt^2)."""
    m = PCG2019Model()
    u0 = m.initial_state_array(1, np.float64)
    u0[0, 0] = -20.0  # depolarized: gates move
    u = jnp.asarray(u0)
    dt = 0.001
    du = m.rhs(u, None, 0.0)
    euler = np.asarray(u + dt * du)
    inf, tau = m.gating_inf_tau(u, None, 0.0)
    rl_gates = np.asarray(inf + (u[jnp.asarray(m.gating_indices)] - inf)
                          * jnp.exp(-dt / tau))
    # agreement to O((dt/tau)^2) — tau_m = 0.12 dominates
    assert np.allclose(rl_gates, euler[list(m.gating_indices)], atol=2e-4)


def test_pointwise_ode_ensemble_standalone():
    """Standalone cell-ensemble march (parity: test/gpu/ensemble-test.jl —
    a 2^8-point FHN PointwiseODEProblem driven by ForwardEulerCellSolver
    through TimeChoiceIterator, CPU and accelerator paths agreeing). Here
    the jitted integrator is checked exactly against a dense numpy forward
    Euler on the same RHS."""
    from thunderbolt_tpu.disc.functions import PointwiseODEFunction
    from thunderbolt_tpu.solver.time.integrator import TimeChoiceIterator
    npts = 256
    model = tb.FHNModel()
    fn = PointwiseODEFunction(model, npts)
    rng = np.random.default_rng(7)
    u0 = np.zeros(fn.solution_size, np.float64)
    u0[:npts] = rng.uniform(0.0, 1.0, npts)          # phi
    u0[npts:] = rng.uniform(0.0, 0.2, npts)          # s
    dt = 0.1
    integ = tb.init(fn, tb.ForwardEulerCellSolver(substeps=1),
                    jnp.asarray(u0), (0.0, 10.0), dt)
    seen = []
    for t, u in TimeChoiceIterator(integ, np.arange(1.0, 10.1, 1.0)):
        seen.append((t, np.asarray(u)))
        assert not np.allclose(np.asarray(u), u0)    # it moved
    # dense numpy forward Euler on the package's own RHS
    ref = u0.reshape(2, npts).T.copy()               # [npts, 2]
    for k in range(100):
        du = np.asarray(jax.vmap(
            lambda s: jnp.stack(model.rhs((s[0], s[1]), None, 0.0)))(
                jnp.asarray(ref)))
        ref = ref + dt * du
    final = seen[-1][1].reshape(2, npts).T
    assert np.abs(final - ref).max() < 1e-8, np.abs(final - ref).max()
