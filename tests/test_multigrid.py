"""Geometric multigrid preconditioning. Parity with
``test/integration/test_multigrid.jl`` (PMG/GMG-preconditioned Krylov vs
plain)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.multigrid import (
    GridHierarchy, GMGPreconditioner, assemble_level_laplacians)
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner


@pytest.mark.parametrize("celltype,dims", [("quad4", (4, 4)),
                                           ("hex8", (2, 2, 2))])
def test_gmg_beats_jacobi(celltype, dims):
    coarse = tb.generate_mesh(celltype, dims)
    hier = GridHierarchy.from_coarse(coarse, nlevels=3)
    ops = assemble_level_laplacians(hier, kappa=1.0, mass_shift=1.0)
    A = ops[-1]
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=n))

    x_j, info_j = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                     rtol=1e-10, atol=1e-12, maxiter=2000)
    gmg = GMGPreconditioner(ops, hier)
    x_g, info_g = cg(A.mv, b, Minv=gmg, rtol=1e-10, atol=1e-12, maxiter=2000)
    assert bool(info_g.converged)
    assert np.allclose(np.asarray(x_g), np.asarray(x_j), atol=1e-7)
    # the V-cycle must cut the iteration count substantially
    assert int(info_g.iterations) < 0.5 * int(info_j.iterations), (
        int(info_g.iterations), int(info_j.iterations))


def test_prolongation_partition_of_unity():
    coarse = tb.generate_mesh("quad4", (3, 3))
    hier = GridHierarchy.from_coarse(coarse, nlevels=2)
    pidx, pw = hier.prolongations[0]
    ones_c = jnp.ones(coarse.nnodes)
    from thunderbolt_tpu.solver.multigrid import _prolong
    fine_vals = _prolong(pidx, pw, ones_c)
    assert np.allclose(np.asarray(fine_vals), 1.0)
