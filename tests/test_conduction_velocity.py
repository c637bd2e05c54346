"""Conduction-velocity validation: planar-wave speed measured between two
probes, and the analytic sqrt(diffusivity) scaling of monodomain CV.

Parity model: the reference's conduction-velocity benchmark
(``bak/examples/conduction-velocity-benchmark.jl`` — strip geometry,
stimulus at one end, CV from activation times) reduced to a
discretization-robust assertion: for the cable equation, CV scales as
sqrt(kappa); doubling resolution must not move CV by more than a few
percent.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _strip(N, kappa):
    mesh = tb.generate_mesh("quad4", (N, 4), (0.0, 0.0), (20.0, 1.0))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=np.diag([kappa, kappa]),
        stim=tb.NoStimulationProtocol(), ion=tb.FHNModel(),
        transmembrane_solution_symbol="phi_m",
        internal_state_symbol="s")
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    u0 = tb.create_initial_condition(ode, jnp.float64)
    u0 = tb.setvariable(u0, ode, "phi_m",
                        lambda x: np.where(x[:, 0] < 1.0, 1.0, 0.0))
    return ode, u0


def _cv(ode, u0, xa=4.0, xb=8.0, dt=0.5, T=600.0, sample=2.0):
    """Wave speed from threshold-crossing times at two probe planes.

    FHN CV on this strip is ~0.017 len/ms at kappa=1e-3 (measured), so the
    probes sit at x=4 and x=8 and the horizon is 600 ms.
    """
    vi = tb.solution_variable(ode, "phi_m")
    coords = vi.coords
    ia = np.argmin(np.abs(coords[:, 0] - xa) + np.abs(coords[:, 1] - 0.5))
    ib = np.argmin(np.abs(coords[:, 0] - xb) + np.abs(coords[:, 1] - 0.5))
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-9, atol=1e-11),
                                tb.ForwardEulerCellSolver(substeps=8)))
    integ = tb.init(ode, alg, u0, (0.0, T), dt)
    ta = tb_tb = None
    for t, u in tb.TimeChoiceIterator(integ,
                                      np.arange(sample, T + sample / 2,
                                                sample)):
        phi = np.asarray(u[vi.slice])
        if ta is None and phi[ia] > 0.5:
            ta = t
        if tb_tb is None and phi[ib] > 0.5:
            tb_tb = t
            break
    assert ta is not None and tb_tb is not None, "wave never arrived"
    xA, xB = coords[ia, 0], coords[ib, 0]
    return (xB - xA) / (tb_tb - ta)


def test_cv_sqrt_kappa_scaling():
    """Cable-equation law: CV ~ sqrt(kappa). A 4x diffusivity increase
    must double CV (within discretization tolerance)."""
    cv1 = _cv(*_strip(80, 1e-3))
    cv4 = _cv(*_strip(80, 4e-3))
    ratio = cv4 / cv1
    assert 1.8 < ratio < 2.2, (cv1, cv4, ratio)


@pytest.mark.slow
def test_cv_resolution_converged():
    """Doubling spatial resolution moves CV by < 10% (the Niederer-style
    h-convergence discipline on the strip)."""
    cv_c = _cv(*_strip(60, 2e-3))
    cv_f = _cv(*_strip(120, 2e-3))
    assert abs(cv_f - cv_c) / cv_f < 0.10, (cv_c, cv_f)
    assert cv_f > 0
