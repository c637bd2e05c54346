"""Land et al. 2015 community benchmark, problem 1 (deforming beam).

The reference's only published-number validation
(``test/validation/land2015.jl:95-100``): clamped 10x1x1 beam, Guccione
material (C0=2, Bff=8, Bss=Bnn=2, Bns=1, Bfs=Bfn=2, penalty 100), fibers
along x, follower pressure 0.004 kPa ramped on the bottom face, order-2
displacement on a 25x3x3 hex grid. The z-deflection of the probe at
(10, 0.5, 1) must be 3.17 +- 0.02.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _solve(celltype):
    mesh = tb.generate_mesh(celltype, (25, 3, 3), (0., 0., 0.),
                            (10., 1., 1.))
    passive = tb.Guccione1991PassiveModel(
        C0=2.0, Bff=8.0, Bss=2.0, Bnn=2.0, Bns=1.0, Bfs=2.0, Bfn=2.0,
        mpU=tb.SimpleCompressionPenalty(100.0))
    material = tb.PK1Model(passive)  # default frame: fibers along x
    press = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t, 1.0) * 0.004),
        "bottom")
    model = tb.QuasiStaticModel("displacement", material, (press,))
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=2, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "left", 0.0)], dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-4, max_iter=10, inner="lu"))
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, jnp.float64),
                          (0.0, 1.0), dt=0.2)
    assert rep.converged, rep
    coords = fn.dh.field_dof_coords("displacement")
    probe = np.argmin(np.linalg.norm(coords - [10.0, 0.5, 1.0], axis=1))
    assert np.allclose(coords[probe], [10.0, 0.5, 1.0])
    return float(np.asarray(u).reshape(-1, 3)[probe, 2]), rep


@pytest.mark.slow
def test_land2015_problem1_hex():
    deflection, rep = _solve("hex8")
    # reference strictness: 3.17 +- 0.02 (land2015.jl:95-100); measured
    # 3.1550 on this discretization
    assert abs(deflection - 3.17) < 0.02, deflection


@pytest.mark.slow
def test_land2015_problem1_tet():
    """The reference validates BOTH Hex and Tet meshes
    (``land2015.jl:95-100``) — tet4 geometry exercises the P2 tet path
    with the same Guccione + SimpleCompressionPenalty setup. Measured
    3.1699."""
    deflection, rep = _solve("tet4")
    assert abs(deflection - 3.17) < 0.02, deflection
