"""Checkpoint/resume + time series + monitors/timers.
Parity with ``test_io.jl`` (JLD2 round trip) and the benchmarking how-to."""

import pytest
import logging
import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.io.checkpoint import (
    save_checkpoint, load_checkpoint, TimeSeriesWriter, TimeSeriesReader)
from thunderbolt_tpu.utils.logging import (
    enable_debug_timings, timeit, reset_timers, get_timers, print_timers,
    DefaultProgressMonitor)


def test_checkpoint_roundtrip(tmp_path):
    state = {"u": jnp.arange(10.0), "t": jnp.asarray(3.5),
             "nested": (jnp.ones((2, 3)), jnp.zeros(4))}
    p = save_checkpoint(str(tmp_path / "ck"), state, meta={"step": 7})
    loaded, meta = load_checkpoint(p, like=state)
    assert meta["step"] == 7
    assert np.allclose(loaded["u"], np.arange(10.0))
    assert float(loaded["t"]) == 3.5
    assert np.allclose(loaded["nested"][0], 1.0)


def test_resume_equals_continuous(tmp_path):
    """Stop/checkpoint/resume reproduces the uninterrupted EP solve exactly
    (the reference's resume-by-reinit semantics, type.jl:501-507)."""
    mesh = tb.generate_mesh("quad4", (8, 8), (0, 0), (2.5, 2.5))
    model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-4,
                               stim=tb.NoStimulationProtocol(),
                               ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64), mesh)
    u0 = tb.create_initial_condition(ode, jnp.float64)
    u0 = tb.setvariable(u0, ode, "phi_m",
                        lambda x: np.where(x[:, 0] < 1.0, 1.0, 0.0))
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-10),
                                tb.ForwardEulerCellSolver(substeps=4)))
    u_full = tb.init(ode, alg, u0, (0.0, 20.0), 1.0).solve()
    # interrupted at t=10 + checkpoint + resume
    half = tb.init(ode, alg, u0, (0.0, 10.0), 1.0)
    u_half = half.solve()
    p = save_checkpoint(str(tmp_path / "ep"), {"u": u_half},
                        meta={"t": half.t})
    loaded, meta = load_checkpoint(p, like={"u": u_half})
    resumed = tb.init(ode, alg, jnp.asarray(loaded["u"]),
                      (meta["t"], 20.0), 1.0).solve()
    assert np.allclose(np.asarray(resumed), np.asarray(u_full), atol=1e-14)


def test_timeseries_writer(tmp_path):
    w = TimeSeriesWriter("run", directory=str(tmp_path))
    w.store_timestep(0.0, {"phi": np.zeros(5)})
    w.store_timestep(1.0, {"phi": np.ones(5)})
    w.finalize()
    r = TimeSeriesReader("run", directory=str(tmp_path))
    assert r.times == [0.0, 1.0]
    t, fields = r.load(1)
    assert t == 1.0 and np.allclose(fields["phi"], 1.0)


def test_timers_and_monitor(capsys):
    reset_timers()
    enable_debug_timings(True)
    with timeit("assembly"):
        np.ones(10).sum()
    with timeit("assembly"):
        np.ones(10).sum()
    t = get_timers()
    assert len(t["assembly"]) == 2
    print_timers()
    out = capsys.readouterr().out
    assert "assembly" in out
    enable_debug_timings(False)
    mon = DefaultProgressMonitor("test")
    mon(0, 1.0)  # does not raise


@pytest.mark.slow
def test_mechanics_resume_with_internal_state(tmp_path):
    """Crash-resume of a condensed-sarcomere mechanics march: checkpoint
    (u, fn.internal, t), reload into a FRESH semidiscretization, continue —
    identical to the uninterrupted run. Pins that the per-qp Qprev/lam_prev
    pytree is a plain checkpointable state (the reference serializes its
    condensed vector tail the same way via JLD2)."""
    from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel

    def build():
        mesh = tb.generate_mesh("hex8", (2, 2, 2))
        ca = tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t / 50.0, 1.0))
        material = tb.ActiveStressModel(
            material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
            active_stress_model=tb.SimpleActiveStress(Tmax=300.0),
            contraction_model=tb.CaDrivenInternalSarcomereModel(
                RDQ20MFModel(), ca))
        dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
                tb.Dirichlet("d", "front", 0.0, components=[1]),
                tb.Dirichlet("d", "bottom", 0.0, components=[2])]
        disc = tb.FiniteElementDiscretization(
            {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs,
            dtype=jnp.float64)
        return tb.semidiscretize(
            tb.QuasiStaticModel("d", material, ()), disc,
            mesh), tb.HomotopyPathSolver(tb.NewtonRaphsonSolver(
                tol=1e-9, inner="lu", max_iter=25), adaptive=False)

    # uninterrupted 0 -> 40
    fn, solver = build()
    u_full, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float64),
                               (0.0, 40.0), dt=10.0)
    assert rep.converged

    # first half + checkpoint
    fn1, solver1 = build()
    u_half, rep1 = solver1.solve(
        fn1, jnp.zeros(fn1.solution_size, jnp.float64), (0.0, 20.0),
        dt=10.0)
    assert rep1.converged
    state = {"u": u_half, "internal": fn1.internal, "t": jnp.asarray(20.0)}
    p = save_checkpoint(str(tmp_path / "mech"), state)

    # fresh process analog: rebuild everything, load, continue 20 -> 40
    fn2, solver2 = build()
    loaded, _ = load_checkpoint(p, like={
        "u": u_half, "internal": fn2.internal, "t": jnp.asarray(0.0)})
    fn2.internal = loaded["internal"]
    u_res, rep2 = solver2.solve(fn2, loaded["u"],
                                (float(loaded["t"]), 40.0), dt=10.0)
    assert rep2.converged
    assert np.allclose(np.asarray(u_res), np.asarray(u_full), atol=1e-12)
