"""Mixed-dimensional EP: 1D Purkinje-style cable (line2) embedded in a 3D
hex slab, sharing nodes — parity with the reference's mixed-dimensional
grid fixture (``test/testfixtures.jl:20-43``, Hex + Line "Purkinje") and
the ep02 tutorial topic. The cable's tangential-gradient geometry uses the
pseudo-inverse path of ``FormBatch.geometry``."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock


def _slab_with_cable(nx=16, ny=3, nz=3, L=8.0, W=1.5, cable=True):
    mesh = tb.generate_mesh("hex8", (nx, ny, nz), (0, 0, 0), (L, W, W))
    blocks = list(mesh.blocks)
    if cable:
        # cable along the y=0, z=0 edge: consecutive nodes by coordinate
        on_edge = np.nonzero((np.abs(mesh.nodes[:, 1]) < 1e-12)
                             & (np.abs(mesh.nodes[:, 2]) < 1e-12))[0]
        order = np.argsort(mesh.nodes[on_edge, 0])
        ids = on_edge[order]
        conn = np.stack([ids[:-1], ids[1:]], axis=1)
        blocks.append(ElementBlock("line2", conn.astype(np.int32)))
    return Mesh(mesh.nodes, blocks, nodesets=dict(mesh.nodesets),
                facetsets=dict(mesh.facetsets),
                cellsets=dict(mesh.cellsets))


def _activation_time(with_cable, kappa_cable=0.02):
    mesh = _slab_with_cable(cable=with_cable)
    ncells = sum(b.ncells for b in mesh.blocks)
    nhex = mesh.blocks[0].ncells
    kpc = np.full(ncells, 4e-4)
    if with_cable:
        kpc[nhex:] = kappa_cable           # fast conduction along the cable
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0,
        kappa=tb.FieldCoefficient(kpc, per_cell_constant=True),
        stim=tb.NoStimulationProtocol(), ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    u0 = tb.create_initial_condition(ode, jnp.float64)
    u0 = tb.setvariable(u0, ode, "phi_m",
                        lambda x: np.where(x[:, 0] <= 0.5, 1.0, 0.0))
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-8, atol=1e-10),
        tb.ForwardEulerCellSolver(substeps=4)))
    integ = tb.init(ode, alg, u0, (0.0, 400.0), 1.0)
    # probe: far-end corner node (x=L, y=0, z=0)
    far = int(np.argmin(np.linalg.norm(
        mesh.nodes - np.array([8.0, 0.0, 0.0]), axis=1)))
    t_act = None
    for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, 401.0, 5.0)):
        phi = tb.nodal_values(u, ode, "phi_m", mesh)
        if t_act is None and float(phi[far]) > 0.5:
            t_act = t
            break
    return t_act


def test_cable_accelerates_activation():
    t_no = _activation_time(False)
    t_yes = _activation_time(True)
    assert t_yes is not None, "cable run never activated the far corner"
    assert t_no is None or t_yes < 0.7 * t_no, (t_yes, t_no)


def test_line_in_3d_geometry():
    """Tangential geometry of an embedded cable: detJw integrates to the
    cable length; gradients point along the cable."""
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import make_form_batch
    mesh = _slab_with_cable(nx=4, ny=2, nz=2, L=2.0)
    dh = DofHandler(mesh).add_field("phi", order=1).close()
    subs = dh.subdata("phi")
    line_sub = [s for s in subs if s.celltype == "line2"]
    assert line_sub, "line block missing from dof layout"
    batch = make_form_batch(dh, line_sub[0], dtype=jnp.float64)
    dNdx, detJw = batch.geometry()
    np.testing.assert_allclose(float(detJw.sum()), 2.0, rtol=1e-12)
    # gradient of the linear hat along x has magnitude 1/h, x-direction
    assert np.allclose(np.abs(np.asarray(dNdx[:, :, :, 0])), 2.0, atol=1e-9)
    assert np.allclose(np.asarray(dNdx[:, :, :, 1:]), 0.0, atol=1e-12)
