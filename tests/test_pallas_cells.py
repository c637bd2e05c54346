"""Fused Pallas cell-ODE kernels (interpret mode on CPU) must reproduce the
XLA substep chains bit-for-bit — adaptive select, forward-Euler chain, and
Rush-Larsen exponential gates (TPU analog of the reference's CUDA pointwise
kernels, ``ext/CuThunderboltExt.jl:103-146``)."""

import numpy as np
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.ops.pallas_cells import (
    make_adaptive_substep_kernel, make_forward_euler_kernel,
    make_rush_larsen_kernel)
from thunderbolt_tpu.disc.functions import PointwiseODEFunction


def _state(ion, n=1000, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    u = ion.initial_state_array(n, np.float64).astype(np.float32)
    u[ion.phi_index] += spread * rng.uniform(0, 1, n).astype(np.float32)
    return jnp.asarray(u.reshape(-1))


def test_adaptive_kernel_matches_xla():
    ion = tb.FHNModel()
    fn = PointwiseODEFunction(ion=ion, npoints=1000)
    u = _state(ion)
    ref = tb.AdaptiveForwardEulerSubstepper(
        reaction_threshold=0.1, substeps=8,
        use_pallas=False).make_step(fn, 1.0)
    pal = make_adaptive_substep_kernel(ion, 1000, 1.0, 8, 0.1,
                                       interpret=True)
    assert pal is not None
    a, b = np.asarray(pal(u, 3.0)), np.asarray(ref(u, 3.0))
    assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()  # 1-ulp fma


def test_forward_euler_kernel_matches_xla():
    ion = tb.AlievPanfilovModel()
    fn = PointwiseODEFunction(ion=ion, npoints=777)  # exercises padding
    u = _state(ion, 777)
    ref = tb.ForwardEulerCellSolver(substeps=4,
                                    use_pallas=False).make_step(fn, 0.5)
    pal = make_forward_euler_kernel(ion, 777, 0.5, 4, interpret=True)
    assert pal is not None
    a, b = np.asarray(pal(u, 1.0)), np.asarray(ref(u, 1.0))
    assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()


def test_rush_larsen_kernel_matches_xla():
    ion = tb.TenTusscherPanfilov2006Model()
    fn = PointwiseODEFunction(ion=ion, npoints=300)
    u = _state(ion, 300, spread=40.0)  # depolarized spread: gates move
    ref = tb.RushLarsenCellSolver(substeps=2,
                                  use_pallas=False).make_step(fn, 0.05)
    pal = make_rush_larsen_kernel(ion, 300, 0.05, 2, interpret=True)
    assert pal is not None
    a, b = np.asarray(pal(u, 0.0)), np.asarray(ref(u, 0.0))
    assert np.allclose(a, b, atol=2e-6), np.abs(a - b).max()


def test_gating_respects_uses_coordinates():
    class XIon(tb.FHNModel):
        uses_coordinates = True
    assert make_forward_euler_kernel(XIon(), 100, 1.0, 2,
                                     interpret=True) is None
    # f64 is not Pallas-eligible either
    assert make_forward_euler_kernel(tb.FHNModel(), 100, 1.0, 2,
                                     dtype=jnp.float64,
                                     interpret=False) is None
