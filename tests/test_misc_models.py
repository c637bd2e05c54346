"""Viscoelastic Maxwell, Hodgkin-Huxley, FD-consistency wrapper, VTU
readback."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.viscoelastic import LinearMaxwellMaterial

DT = jnp.float64


def test_hodgkin_huxley_spike():
    m = tb.HodgkinHuxleyModel()
    u = jnp.asarray(m.initial_state_array(1, np.float64))
    dt = 0.01
    vs = []

    @jax.jit
    def advance(u, t0):
        def body(u, i):
            t = t0 + i * dt
            du = m.rhs(u, None, t)
            stim = jnp.where((t >= 5.0) & (t < 5.5), 20.0, 0.0)
            du = du.at[0].add(stim)
            return u + dt * du, None
        return jax.lax.scan(body, u, jnp.arange(25))[0]

    for k in range(120):
        u = advance(u, k * 0.25)
        vs.append(float(u[0, 0]))
    vs = np.asarray(vs)
    assert vs[0] < -60
    assert vs.max() > 20          # spike overshoot
    assert abs(vs[-1] + 65) < 10  # returns to rest
    # resting state is stable without stimulus
    m2 = tb.HodgkinHuxleyModel()
    u2 = jnp.asarray(m2.initial_state_array(1, np.float64))
    for _ in range(500):
        u2 = u2 + dt * m2.rhs(u2, None, 0.0)
    assert abs(float(u2[0, 0]) + 65) < 1.0


def test_linear_maxwell_relaxation():
    """Held stretch: stress relaxes from (E0+E1) toward E0 response."""
    mesh = tb.generate_mesh("hex8", (1, 1, 1))
    mat = LinearMaxwellMaterial(E0=10.0, E1=10.0, mu=0.0, tau=50.0)
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "right",
                         lambda x: np.full(len(x), 0.01), components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=DT)
    fn = tb.semidiscretize(tb.QuasiStaticModel("d", mat, ()), disc, mesh)
    assert fn.internal is not None
    newton = tb.NewtonRaphsonSolver(tol=1e-10, inner="lu")

    # measure the reaction "force" via the residual at constrained dofs
    def reaction(u, t):
        r = fn.residual(u, t, *fn.newton_extra())
        mask = ~np.asarray(fn.constraints.free_mask)
        coords = fn.dh.field_dof_coords("d")
        right = np.repeat(coords[:, 0] > 1 - 1e-9, 3)
        return float(np.asarray(r)[mask & right].sum())

    forces = []
    u = jnp.zeros(fn.solution_size, DT)
    t = 0.0
    for k in range(6):
        dt = 25.0
        fn.internal_dt = dt
        fn.internal_t = t
        u, stats = newton.solve(fn, u, t + dt)
        assert stats.converged
        forces.append(reaction(u, t + dt))
        fn.update_internal_state(u, t + dt, dt)
        t += dt
    forces = np.asarray(forces)
    # monotone stress relaxation toward the long-term (E0-only) value
    assert (np.diff(forces) < 1e-12).all(), forces
    assert forces[-1] < 0.75 * forces[0], forces


def test_consistency_check_wrapper():
    mesh = tb.generate_mesh("hex8", (1, 1, 1))
    bc = tb.ConsistencyCheckWeakBoundaryCondition(
        tb.ConstantPressureBC(0.1, "top"))
    model = tb.QuasiStaticModel("d", tb.PK1Model(tb.NeoHookeanModel()), (bc,))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "bottom", 0.0)], dtype=DT)
    fn = tb.semidiscretize(model, disc, mesh)
    u = jnp.zeros(fn.solution_size, DT) + 0.01
    kvals, r = fn.assemble(u, 1.0)   # raises if the tangent were wrong
    assert np.isfinite(np.asarray(r)).all()


def test_vtu_roundtrip(tmp_path):
    mesh = tb.generate_mesh("quad4", (3, 2))
    phi = np.linspace(0, 1, mesh.nnodes).astype(np.float32)
    p = str(tmp_path / "snap.vtu")
    tb.write_vtu(p, mesh, point_data={"phi": phi})
    pts, blocks, pdata = tb.read_vtu(p)
    assert pts.shape == (mesh.nnodes, 3)
    assert np.allclose(pts[:, :2], mesh.nodes)
    assert 9 in blocks and blocks[9].shape == (6, 4)  # VTK_QUAD
    assert np.allclose(pdata["phi"], phi)
