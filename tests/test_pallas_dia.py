"""VMEM-fused DIA kernels, interpret-mode equivalence on CPU.

The fused Chebyshev solve is TPU-gated in production
(``BackwardEulerSolver(solver="chebyshev", use_pallas=True)``), so these
interpret-mode tests are its only CPU-side coverage — any regression in
the segment/halo/rho-threading logic would otherwise surface only as a
silently wrong monodomain solve on hardware (fixed-count Chebyshev has no
residual check).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.ops.pallas_dia import (
    chebyshev_dia_fused, cheb_fused_fits, _cheb_plan, dia_mv_pallas)
from thunderbolt_tpu.solver.linear import (
    chebyshev, lanczos_bounds, chebyshev_iterations, jacobi_preconditioner)


def _heat_operator(N=48, dt=1.0):
    mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
    kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
    model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=kappa,
                               stim=tb.NoStimulationProtocol(),
                               ion=tb.FHNModel())
    odeform = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32),
        mesh)
    heat = odeform.functions[0]
    return heat.M_dia, heat.M_dia.axpby(1.0, heat.K_dia, -dt)


@pytest.fixture(scope="module")
def heat():
    M, A = _heat_operator()
    diag = A.diagonal()
    s = 1.0 / jnp.sqrt(jnp.abs(diag))
    lmin, lmax = lanczos_bounds(lambda v: s * A.mv(s * v), A.n,
                                jnp.float32)
    lmin, lmax = 0.9 * lmin, 1.02 * lmax
    iters = chebyshev_iterations(lmax / lmin, 1e-5)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(A.n), jnp.float32) * 0.1
    b = M.mv(u)
    x_ref = chebyshev(A.mv, b, x0=u, lam_min=lmin, lam_max=lmax,
                      iters=iters, Minv=jacobi_preconditioner(diag))
    return A, b, u, lmin, lmax, iters, x_ref


def test_fused_single_segment_matches_xla(heat):
    A, b, u, lmin, lmax, iters, x_ref = heat
    assert cheb_fused_fits(A, iters, tile=4096)
    x = chebyshev_dia_fused(A, b, u, lam_min=lmin, lam_max=lmax,
                            iters=iters, tile=4096, interpret=True)
    err = float(jnp.max(jnp.abs(x - x_ref)))
    assert err < 1e-5 * float(jnp.abs(x_ref).max()) + 1e-6, err


@pytest.mark.slow
def test_fused_multi_segment_matches_xla():
    """A tile too small for the full iteration count forces the segmented
    path: the recurrence state (x, r, d, rho) must round-trip HBM between
    segments exactly. Needs a wider stencil (128^2 mesh, lo=129) so the
    1024-aligned halo can split at tile=2048."""
    M, A = _heat_operator(N=128)
    diag = A.diagonal()
    s = 1.0 / jnp.sqrt(jnp.abs(diag))
    lmin, lmax = lanczos_bounds(lambda v: s * A.mv(s * v), A.n,
                                jnp.float32)
    lmin, lmax = 0.9 * lmin, 1.02 * lmax
    iters = chebyshev_iterations(lmax / lmin, 1e-5)
    lo = -min(min(A.offsets), 0)
    plan = _cheb_plan(A.n, lo, lo, iters, 2048)
    assert plan is not None and len(plan[1]) >= 2, plan
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(A.n), jnp.float32) * 0.1
    b = M.mv(u)
    x_ref = chebyshev(A.mv, b, x0=u, lam_min=lmin, lam_max=lmax,
                      iters=iters, Minv=jacobi_preconditioner(diag))
    x = chebyshev_dia_fused(A, b, u, lam_min=lmin, lam_max=lmax,
                            iters=iters, tile=2048, interpret=True)
    err = float(jnp.max(jnp.abs(x - x_ref)))
    assert err < 1e-5 * float(jnp.abs(x_ref).max()) + 1e-6, err


def test_fused_declines_when_halo_dominates(heat):
    A, b, u, lmin, lmax, iters, x_ref = heat
    # a tile smaller than one iteration's halo cannot be segmented
    assert chebyshev_dia_fused(A, b, u, lam_min=lmin, lam_max=lmax,
                               iters=iters, tile=128,
                               interpret=True) is None
    assert not cheb_fused_fits(A, iters, tile=128)


def test_dia_mv_pallas_matches(heat):
    A = heat[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(A.n), jnp.float32)
    y = dia_mv_pallas(A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(A.mv(x)),
                               atol=1e-5)
