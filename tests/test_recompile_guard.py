"""No-recompile guards — the TPU-native analog of the reference's type-
stability suite (``test/test_type_stability.jl``). There, JET proves the
hot paths stay on the fast (monomorphic) path; here, the fast path is "the
jitted step traces once and re-runs from cache", so these tests assert
zero XLA compilations when solvers are reused with new traced inputs
(different horizons, times, states). A regression here silently costs
20-90 s per avoided cache hit on the real TPU (remote compiles)."""

import logging

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb

DT = jnp.float64


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.records = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compile" in msg.lower():
            self.records.append(msg)


class count_compiles:
    """Context manager: counts XLA compilations via jax_log_compiles."""

    def __enter__(self):
        self.handler = _CompileCounter()
        logging.getLogger("jax._src.interpreters.pxla").addHandler(
            self.handler)
        logging.getLogger("jax._src.dispatch").addHandler(self.handler)
        jax.config.update("jax_log_compiles", True)
        return self.handler

    def __exit__(self, *exc):
        jax.config.update("jax_log_compiles", False)
        logging.getLogger("jax._src.interpreters.pxla").removeHandler(
            self.handler)
        logging.getLogger("jax._src.dispatch").removeHandler(self.handler)
        return False


def _heat():
    mesh = tb.generate_mesh("quad4", (8, 8))
    model = tb.TransientDiffusionModel(kappa=1.0,
                                       solution_variable_symbol="u")
    disc = tb.FiniteElementDiscretization(
        {"u": 1},
        dbcs=[tb.Dirichlet("u", n, 0.0)
              for n in ("left", "right", "bottom", "top")],
        dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    coords = fn.dh.field_dof_coords("u")
    u0 = jnp.asarray(np.prod(np.sin(np.pi * coords), axis=-1))
    return fn, u0


def test_integrator_no_recompile_across_horizons():
    """Fixed-dt marches keep the step count TRACED: re-solving over a
    different horizon or t0 must not recompile (the 'no recompiles across
    horizon changes' contract, solver/time/integrator.py)."""
    fn, u0 = _heat()
    stepper = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    u1 = tb.init(fn, stepper, u0, (0.0, 0.01), 1e-3).solve()  # warm-up
    with count_compiles() as c:
        u2 = tb.init(fn, stepper, u0, (0.0, 0.02), 1e-3).solve()
        u3 = tb.init(fn, stepper, jnp.asarray(u1), (0.5, 0.53), 1e-3).solve()
    _ = np.asarray(u2), np.asarray(u3)
    assert c.records == [], c.records[:3]


def test_newton_no_recompile_across_times_and_states():
    """solve_jitted re-used at a different load time / initial guess runs
    from cache."""
    mesh = tb.generate_mesh("hex8", (2, 2, 2))
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=1.0)),
        (tb.ConstantPressureBC(0.02, "top"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="cg")
    u1, s1 = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 0.3)
    assert s1.converged
    with count_compiles() as c:
        u2, s2 = newton.solve(fn, u1, 1.0)
        assert s2.converged
    _ = np.asarray(u2)
    assert c.records == [], c.records[:3]


def test_cell_solver_no_recompile_across_dt():
    """Pointwise cell steps carry dt TRACED: stepping with a new dt value
    must not recompile (the RTC adaptive path depends on this)."""
    from thunderbolt_tpu.solver.time.euler import ForwardEulerCellSolver
    from thunderbolt_tpu.disc.functions import PointwiseODEFunction
    model = tb.FHNModel()
    npts = 64
    fn = PointwiseODEFunction(ion=model, npoints=npts)
    s0 = jnp.tile(jnp.asarray(model.default_initial_state(), DT)[:, None],
                  (1, npts)).ravel()
    step = jax.jit(ForwardEulerCellSolver().make_step_dt(fn))
    s1 = step(s0, jnp.asarray(0.0, DT), jnp.asarray(0.1, DT))
    with count_compiles() as c:
        s2 = step(jnp.asarray(s1), jnp.asarray(5.0, DT),
                  jnp.asarray(0.025, DT))
    _ = np.asarray(s2)
    assert c.records == [], c.records[:3]


def test_energy_zero_at_reference():
    """The reference suite's value checks: psi(I) == 0 for the catalog and
    U(1) == 0 for every compression penalty."""
    F = jnp.eye(3, dtype=DT)
    frame = jnp.eye(3, dtype=DT)
    for en in [tb.HolzapfelOgden2009Model(),
               tb.TransverseIsotopicNeoHookeanModel(),
               tb.LinYinPassiveModel(), tb.HumphreyStrumpfYinModel()]:
        psi = float(en.psi(F, frame))
        assert np.isfinite(psi)
    from thunderbolt_tpu.models.solid.energies import (
        SimpleCompressionPenalty, HartmannNeffCompressionPenalty1,
        HartmannNeffCompressionPenalty2, HartmannNeffCompressionPenalty3)
    for pen in [SimpleCompressionPenalty(), HartmannNeffCompressionPenalty1(),
                HartmannNeffCompressionPenalty2(),
                HartmannNeffCompressionPenalty3()]:
        assert float(pen.U(jnp.asarray(1.0, DT))) == 0.0
