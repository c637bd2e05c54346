"""Integrator protocol tests: off-grid saveat (tstop fitting), reinit,
stats bookkeeping.

Parity model: the reference's standalone integrator-protocol suite
(``test/test_time_integrator.jl``) and the ``step_header!`` dt-fitting /
``reinit!`` semantics (``src/solver/time/integrator/diffeq-interface.jl:
91-121,226``).
"""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _heat(n=12):
    mesh = tb.generate_mesh("quad4", (n, n))
    model = tb.TransientDiffusionModel(kappa=1.0,
                                       solution_variable_symbol="u")
    disc = tb.FiniteElementDiscretization(
        {"u": 1},
        dbcs=[tb.Dirichlet("u", s, 0.0)
              for s in ("left", "right", "bottom", "top")],
        dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    coords = fn.dh.field_dof_coords("u")
    u0 = jnp.asarray(np.prod(np.sin(np.pi * coords), axis=-1))
    return fn, u0


def test_offgrid_saveat_fits_partial_step():
    """Save times off the dt grid take floor(delta/dt) full steps plus one
    fitted remainder step — and land on the analytic decay."""
    fn, u0 = _heat()
    stepper = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    integ = tb.init(fn, stepper, u0, (0.0, 0.01), dt=3e-3)
    ts, us = [], []
    # 0.0025 and 0.0085 are NOT multiples of dt=0.003
    for t, u in tb.TimeChoiceIterator(integ, [0.0025, 0.0085, 0.01]):
        ts.append(t)
        us.append(u)
    np.testing.assert_allclose(ts, [0.0025, 0.0085, 0.01])
    lam = 2 * np.pi ** 2
    for t, u in zip(ts, us):
        expected = np.exp(-lam * t) * np.asarray(u0)
        err = np.abs(np.asarray(u) - expected).max()
        # backward Euler O(dt) accumulation at dt=3e-3
        assert err < 2e-2 * max(t / 3e-3, 1.0), (t, err)


def test_offgrid_saveat_matches_manual_stepping():
    """advance_to(T) off-grid == n full jitted steps + one remainder-dt
    step closure applied by hand (exact plumbing check)."""
    fn, u0 = _heat()
    dt = 3e-3
    T = 0.01  # = 3 * dt + 1e-3
    stepper = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    integ = tb.init(fn, stepper, u0, (0.0, T), dt)
    u_auto = integ.solve()
    assert integ.stats.naccept == 4  # 3 full + 1 fitted

    u = u0
    full = stepper.make_step(fn, dt)
    for k in range(3):
        u = full(u, k * dt)
    rem = stepper.make_step(fn, T - 3 * dt)
    u = rem(u, 3 * dt)
    np.testing.assert_allclose(np.asarray(u_auto), np.asarray(u),
                               rtol=0, atol=1e-12)


def test_partial_step_cache_reused_on_regular_grid():
    """A regular off-grid saveat compiles its remainder step once."""
    fn, u0 = _heat(8)
    stepper = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    integ = tb.init(fn, stepper, u0, (0.0, 0.02), dt=3e-3)
    for t, _ in tb.TimeChoiceIterator(integ, [0.004, 0.008, 0.012]):
        pass
    # saveat spacing 0.004 = 3e-3 + 1e-3 remainder each time
    assert len(integ._partial_steps) == 1


def test_reinit_reproduces_trajectory():
    fn, u0 = _heat(8)
    stepper = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    integ = tb.init(fn, stepper, u0, (0.0, 0.01), dt=1e-3)
    u1 = integ.solve()
    n1 = integ.stats.naccept
    integ.reinit()
    assert integ.t == 0.0 and integ.stats.naccept == 0
    u2 = integ.solve()
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert integ.stats.naccept == n1
    # reinit with a different state restarts from it
    integ.reinit(u0=0.5 * u0)
    u3 = integ.solve()
    np.testing.assert_allclose(np.asarray(u3), 0.5 * np.asarray(u1),
                               rtol=0, atol=1e-12)


def test_reinit_adaptive_split_integrator():
    mesh = tb.generate_mesh("quad4", (8, 8), (0.0, 0.0), (2.5, 2.5))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]]),
        stim=tb.NoStimulationProtocol(), ion=tb.FHNModel())
    odeform = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    u0 = tb.create_initial_condition(odeform, jnp.float64)
    u0 = tb.setvariable(u0, odeform, "phi_m",
                        lambda x: np.where(x[:, 0] <= 1.25, 1.0, 0.0))
    rtc = tb.ReactionTangentController(
        (tb.BackwardEulerSolver(rtol=1e-8),
         tb.ForwardEulerCellSolver()),
        sigma_s=1.0, sigma_c=10.0, dt_bounds=(0.1, 1.0))
    integ = tb.init(odeform, rtc, u0, (0.0, 5.0), 0.5)
    ua = integ.solve()
    na = integ.stats.naccept
    integ.reinit()
    ub = integ.solve()
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    assert integ.stats.naccept == na


# ---------------------------------------------------------------------------
# generic accept/reject/adapt controller protocol (type.jl:508-543)
# ---------------------------------------------------------------------------

def test_step_controlled_accepts_everything_matches_fixed():
    """A controller that accepts every finite step reproduces the fixed
    march exactly (same dt grid) — the protocol adds no semantics."""
    fn, u0 = _heat(8)
    stepper = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    integ = tb.init(fn, stepper, u0, (0.0, 0.012), dt=3e-3)
    integ.step_controlled(0.012, tb.StepController())
    ref = tb.init(fn, stepper, u0, (0.0, 0.012), dt=3e-3)
    ref.advance_to(0.012)
    assert integ.stats.naccept == 4 and integ.stats.nreject == 0
    np.testing.assert_allclose(np.asarray(integ.u), np.asarray(ref.u),
                               atol=1e-13)


def test_step_controlled_reject_rolls_back_and_halves():
    """A controller bounding the per-step increment: oversized steps are
    rejected, the state rolled back (rollback_state!), and the retry runs
    at the controller-proposed halved dt (reject_step!/adapt_dt! split)."""
    fn, u0 = _heat(8)
    stepper = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)

    class IncrementBound(tb.StepController):
        def __init__(self, bound):
            self.bound = bound
            self.seen = []

        def should_accept_step(self, integ, u_new, u_prev, t, dt):
            inc = float(jnp.abs(u_new - u_prev).max())
            self.seen.append((t, dt, inc))
            return bool(jnp.isfinite(u_new).all()) and inc <= self.bound

    # the first 6e-3 step decays the peak by ~11% -> increment ~0.106
    # > 0.08; at the halved 3e-3 the increment is ~0.056 -> accepted
    ctrl = IncrementBound(0.08)
    integ = tb.init(fn, stepper, u0, (0.0, 0.006), dt=6e-3)
    integ.step_controlled(0.006, ctrl)
    assert integ.stats.nreject >= 1
    assert integ.stats.naccept >= 2           # 2+ halved steps to finish
    assert abs(integ.t - 0.006) < 1e-12
    # rollback really happened: the first retry re-started from t=0
    ts = [round(s[0], 9) for s in ctrl.seen]
    assert ts.count(0.0) >= 2
    # accepted march agrees with a plain fixed march at the halved dt
    ref = tb.init(fn, stepper, u0, (0.0, 0.006), dt=3e-3)
    ref.advance_to(0.006)
    np.testing.assert_allclose(np.asarray(integ.u), np.asarray(ref.u),
                               atol=1e-12)


def test_step_controlled_dt_underflow_raises():
    """Persistent rejection aborts with the reference's dtmin semantics
    instead of spinning."""
    fn, u0 = _heat(6)
    stepper = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)

    class AlwaysReject(tb.StepController):
        def should_accept_step(self, integ, u_new, u_prev, t, dt):
            return False

    integ = tb.init(fn, stepper, u0, (0.0, 1.0), dt=0.1)
    import pytest
    with pytest.raises(RuntimeError, match="underflow"):
        integ.step_controlled(1.0, AlwaysReject(), dt_min_factor=1e-3)
