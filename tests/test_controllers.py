"""Step-size controller protocol tests.

Parity: the reference's PID-controller testset
(``test/test_time_integrator.jl:411-478``) — same error-history,
Söderlind-law, limiter, and acceptance semantics on our
``PIDController`` — plus the backward-Euler steady-state and
step-accounting protocol checks (``test_time_integrator.jl:29,159-183``).
"""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.time.controllers import (
    PIDController, default_dt_factor_limiter)

K = 2  # adaptive order + 1 (Newmark)
BETA = (3 / 5, -1 / 5, 1 / 10)


def _fresh():
    return PIDController(beta=BETA)


def test_pid_history_holds_three_distinct_steps():
    """err must be (current, previous, previous-previous); shifting it in
    both the factor computation and the accept hook would duplicate err[2]
    (ref :417-431)."""
    c = _fresh()
    for e in (0.5, 0.8, 0.3):
        c.propose_factor(e, K - 1)
        c.accept()
    c.propose_factor(0.9, K - 1)
    np.testing.assert_allclose(c._err, (1 / 0.9, 1 / 0.3, 1 / 0.8))


def test_pid_rejected_attempt_does_not_consume_history():
    """ref :433-446."""
    c = _fresh()
    c.propose_factor(0.5, K - 1)
    c.accept()
    accepted = c._err
    c.propose_factor(4.0, K - 1)   # over tolerance: no accept()
    c.propose_factor(0.5, K - 1)
    assert c._err[1] == accepted[1]
    assert c._err[2] == accepted[2]


def test_pid_factor_is_soderlind_law():
    """ref :448-460."""
    c = _fresh()
    for e in (0.5, 0.8, 0.3, 0.9):
        c.propose_factor(e, K - 1)
        c.accept()
    factor = c.propose_factor(0.4, K - 1)
    e = c._err
    expect = default_dt_factor_limiter(
        e[0] ** (BETA[0] / K) * e[1] ** (BETA[1] / K)
        * e[2] ** (BETA[2] / K))
    np.testing.assert_allclose(factor, expect)


def test_pid_limiter_saturates_and_vanishing_estimate_is_finite():
    """ref :462-468."""
    assert abs(default_dt_factor_limiter(0.0) - (1 - np.pi / 4)) < 0.3
    assert default_dt_factor_limiter(1.0e12) < 1 + np.pi / 2
    c = _fresh()
    assert np.isfinite(c.propose_factor(0.0, K - 1))


def test_pid_acceptance_is_on_the_factor_not_the_estimate():
    """EEst slightly above one gives a factor near one, which
    accept_safety = 0.81 tolerates (ref :470-477)."""
    c = _fresh()
    factor = c.propose_factor(1.05, K - 1)
    assert c.should_accept(factor)


def test_pid_reinit_clears_history():
    c = _fresh()
    for e in (0.5, 0.8):
        c.propose_factor(e, K - 1)
        c.accept()
    c.reinit()
    assert c._err == (1.0, 1.0, 1.0)


def _heat_integrator(dt=0.1):
    mesh = tb.generate_mesh("quad4", (3, 3))
    model = tb.TransientDiffusionModel(tb.ConstantCoefficient(np.eye(2)))
    disc = tb.FiniteElementDiscretization(
        {"u": tb.FieldSpec(order=1)}, dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    u0 = jnp.ones(fn.solution_size, jnp.float64)
    return tb.init(fn, tb.BackwardEulerSolver(), u0, (0.0, 1.0), dt), u0


def test_backward_euler_on_a_steady_state():
    """A spatially constant field is steady under pure diffusion with
    natural BCs; the integrator must hold it exactly (ref :29-41)."""
    integ, u0 = _heat_integrator()
    integ.solve()
    np.testing.assert_allclose(np.asarray(integ.u), np.asarray(u0),
                               atol=1e-12)
    assert integ.check_error() == tb.ReturnCode.Success


def test_tstop_protocol_accounting():
    """t0 / duplicate / interior off-grid / tf targets behave like the
    reference's tstop handling (ref :159-183): a duplicate or past target
    is a no-op, an interior off-grid hit takes floor(delta/dt) full steps
    plus ONE fitted partial step (no micro-stepping), and the integrator
    lands exactly on each target."""
    integ, _ = _heat_integrator(dt=0.1)
    integ.advance_to(0.0)          # t0: no-op
    assert integ.stats.naccept == 0 and integ.t == 0.0
    integ.advance_to(0.25)         # 2 full + 1 partial
    assert integ.t == 0.25
    assert integ.stats.naccept == 3
    integ.advance_to(0.25)         # duplicate: no-op
    assert integ.stats.naccept == 3
    integ.advance_to(1.0)          # tf: 7 fulls + 1 partial (0.75/0.1)
    assert integ.t == 1.0
    assert integ.stats.naccept == 3 + 8


def test_rtc_sigmoid_formula_table():
    """The RTC dt law pinned by hand at R = 0.5 and the sigma_s = inf
    step-function cases, including the boundary R == sigma_c -> dt_max
    (parity: test_os_gearing.jl:251-299)."""
    import numpy as np
    import jax.numpy as jnp
    bounds = (0.01, 1.0)
    rtc = tb.ReactionTangentController((), sigma_s=0.5, sigma_c=1.0,
                                       dt_bounds=bounds)
    R = 0.5
    expected = ((1 - 1 / (1 + np.exp((1.0 - R) * 0.5)))
                * (bounds[1] - bounds[0]) + bounds[0])
    assert np.isclose(float(rtc.next_dt(jnp.asarray(R))), expected,
                      rtol=1e-12)
    for sigma_c, dt_expected in ((0.75, bounds[1]), (0.5, bounds[1]),
                                 (0.25, bounds[0])):
        rtc = tb.ReactionTangentController((), sigma_s=np.inf,
                                           sigma_c=sigma_c,
                                           dt_bounds=bounds)
        assert float(rtc.next_dt(jnp.asarray(0.5))) == dt_expected
