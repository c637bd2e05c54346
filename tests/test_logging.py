"""Monitors, structured logging, profiling timers (parity:
``src/solver/logging.jl`` + the TimerOutputs benchmarking workflow,
``docs/src/howto/benchmarking.md``)."""

import io

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb


def test_timers_workflow():
    tb.reset_timers()
    tb.enable_debug_timings(True)
    with tb.timeit("assembly"):
        _ = jnp.ones(10).sum()
    with tb.timeit("assembly"):
        _ = jnp.ones(10).sum()
    with tb.timeit("linsolve"):
        _ = jnp.ones(10).sum()
    from thunderbolt_tpu.utils.logging import get_timers
    t = get_timers()
    assert len(t["assembly"]) == 2 and len(t["linsolve"]) == 1
    buf = io.StringIO()
    tb.print_timers(buf)
    out = buf.getvalue()
    assert "assembly" in out and "linsolve" in out
    tb.enable_debug_timings(False)
    tb.reset_timers()
    assert get_timers() == {}


def test_newton_monitor_receives_iterations():
    """A host monitor switches Newton to the host loop and observes every
    iteration's residual norm."""
    mesh = tb.generate_mesh("hex8", (3, 2, 2))
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    model = tb.QuasiStaticModel(
        "d", mat, (tb.ConstantPressureBC(0.001, "top"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    seen = []
    sol = tb.NewtonRaphsonSolver(tol=1e-10, inner="cg", inner_rtol=1e-12)
    u, st = sol.solve(fn, jnp.zeros(fn.solution_size),
                      0.0, monitor=lambda it, rn: seen.append((it, rn)))
    assert st.converged
    assert len(seen) == st.iterations + 1
    assert all(np.isfinite(r) for _, r in seen)


def test_vtk_newton_monitor_writes_fields(tmp_path):
    """VTKNewtonMonitor writes one VTU per Newton iteration containing the
    residual, increment, and iterate fields (parity:
    ``src/solver/logging.jl:101-120``)."""
    import os
    from thunderbolt_tpu.io.vtk import read_vtu

    mesh = tb.generate_mesh("hex8", (3, 2, 2))
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    model = tb.QuasiStaticModel(
        "d", mat, (tb.ConstantPressureBC(0.005, "top"),))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    mon = tb.VTKNewtonMonitor(mesh=mesh, fn=fn, outdir=str(tmp_path))
    mon.new_solve()
    sol = tb.NewtonRaphsonSolver(tol=1e-10, inner="cg", inner_rtol=1e-12)
    u, st = sol.solve(fn, jnp.zeros(fn.solution_size), 0.0, monitor=mon)
    assert st.converged
    files = sorted(f for f in os.listdir(tmp_path) if f.endswith(".vtu"))
    # one file per iteration that performed an update
    assert len(files) == st.iterations
    pts, blocks, pdata = read_vtu(os.path.join(tmp_path, files[0]))
    assert "residual" in pdata and "increment" in pdata and "u" in pdata
    res = np.asarray(pdata["residual"]).reshape(mesh.nnodes, 3)
    assert np.isfinite(res).all()
    # first iteration's residual is the (nonzero) initial load imbalance
    assert np.abs(res).max() > 0
