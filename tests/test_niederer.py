"""Niederer 2011 N-version EP benchmark (coarse CI configuration).

Full-resolution runs (h=0.2/0.1 mm) are benchmark-tier (bench.py /
benchmarks/niederer.py); here h=0.5 mm + dt=0.1 ms asserts the qualitative
published behavior: full activation, plausible conduction velocities,
anisotropy ordering (BASELINE.md config 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.benchmarks import niederer


@pytest.fixture(scope="module")
def slab():
    mesh, ode, u0 = niederer.build(h=0.5, dtype=jnp.float32)
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6),
                                tb.RushLarsenCellSolver(substeps=2)))
    act, _ = niederer.activation_times(ode, u0, alg, T=80.0, dt=0.1,
                                       sample_dt=1.0)
    return mesh, ode, act


def test_full_activation(slab):
    mesh, ode, act = slab
    assert np.isfinite(act).all(), \
        f"{(~np.isfinite(act)).sum()} dofs never activated"


def test_probe_ordering_and_velocities(slab):
    mesh, ode, act = slab
    probes = niederer.corner_probes(ode)
    a = {k: act[i] for k, i in probes.items()}
    # stimulus corner fires during the stimulus
    assert a["P1"] <= 3.0
    # along-fiber propagation to P3 (20 mm): CV_f in [0.4, 0.9] mm/ms
    cv_f = 20.0 / (a["P3"] - a["P1"])
    assert 0.4 < cv_f < 0.9, cv_f
    # transverse to P2 (7 mm): CV_t in [0.08, 0.3] mm/ms, slower than fiber
    cv_t = 7.0 / (a["P2"] - a["P1"])
    assert 0.08 < cv_t < 0.3, cv_t
    assert cv_t < cv_f
    # far corner activates last (within sampling tolerance)
    assert a["P8"] >= max(a[k] for k in ("P1", "P2", "P3", "P5")) - 1.0
    # center before far corner
    assert a["C"] < a["P8"]


def test_activation_monotone_along_fiber(slab):
    mesh, ode, act = slab
    coords = tb.solution_variable(ode, "phi_m").coords
    # on the stimulated edge line y=z=0: activation increases with x
    on_line = (coords[:, 1] < 1e-9) & (coords[:, 2] < 1e-9)
    xs = coords[on_line, 0]
    ts = act[on_line]
    order = np.argsort(xs)
    dt_seq = np.diff(ts[order])
    # allow sampling-resolution wiggle inside the stimulus region
    assert (dt_seq >= -1.0).all()
