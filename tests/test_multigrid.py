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


@pytest.mark.parametrize("celltype,dims", [("quad4", (12, 12)),
                                           ("hex8", (4, 4, 4))])
def test_pmg_beats_jacobi(celltype, dims):
    """Two-level p-multigrid (P2 smoothed, P1 dense) on one mesh cuts the
    CG iteration count (PMGPrecon parity, multigrid.jl / the FerriteMG
    extension)."""
    from thunderbolt_tpu.solver.multigrid import pmg_preconditioner
    mesh = tb.generate_mesh(celltype, dims)
    pmg = pmg_preconditioner(mesh, kappa=1.0, mass_shift=1.0)
    A = pmg.operators[-1]
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=n))
    x_j, info_j = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                     rtol=1e-10, atol=1e-12, maxiter=4000)
    x_p, info_p = cg(A.mv, b, Minv=pmg, rtol=1e-10, atol=1e-12, maxiter=4000)
    assert bool(info_p.converged)
    assert np.allclose(np.asarray(x_p), np.asarray(x_j), atol=1e-7)
    assert int(info_p.iterations) < 0.7 * int(info_j.iterations), (
        int(info_p.iterations), int(info_j.iterations))


def test_pmg_transfer_partition_of_unity():
    """P(1) = 1: constants prolong to constants through the p-transfer."""
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.solver.multigrid import pmg_transfer, _prolong
    mesh = tb.generate_mesh("tet4", (2, 2, 2))
    dh = DofHandler(mesh).add_field("u", order=2).close()
    pidx, pw = pmg_transfer(dh, "u")
    ones = jnp.ones(mesh.nnodes)
    fine = _prolong(pidx, pw, ones)
    assert np.allclose(np.asarray(fine), 1.0, atol=1e-14)
    # linear fields are reproduced exactly (P2 entities are parent means)
    lin = jnp.asarray(mesh.nodes @ np.array([1.0, -2.0, 0.5]))
    fine = np.asarray(_prolong(pidx, pw, lin))
    coords = dh.fields["u"].entity_coords
    assert np.allclose(fine, coords @ np.array([1.0, -2.0, 0.5]), atol=1e-12)
