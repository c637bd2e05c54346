"""Intergrid transfer operators (parity: ``test/test_transfer.jl`` —
nodal interpolation between non-matching grids, disc source fan mesh,
NaN outside the source domain, subdomain-restricted target fields)."""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.points import (
    NodalIntergridTransfer, PointEvalHandler, evaluate_at_points)


def test_simple_disc_mesh():
    """Fan disc: n quads, 2n rim facets, rim radius exact, positive area
    summing to the inscribed 2n-gon."""
    n, r = 12, 1.5
    mesh = tb.generate_simple_disc_mesh(n, radius=r)
    blk = mesh.blocks[0]
    assert blk.ncells == n and mesh.nnodes == 2 * n + 1
    assert mesh.facetset("boundary").shape[0] == 2 * n
    rad = np.linalg.norm(mesh.nodes[:-1], axis=1)
    assert np.allclose(rad, r)
    dh = DofHandler(mesh).add_field("z", order=1).close()
    from thunderbolt_tpu.fem.forms import make_form_batch
    batch = make_form_batch(dh, dh.subdata("z")[0], dtype=jnp.float64)
    _, detJw = batch.geometry()
    area = float(jnp.sum(detJw))
    # inscribed 2n-gon area = n r^2 sin(pi/n)
    assert np.isclose(area, n * r * r * np.sin(np.pi / n), rtol=1e-12)


def _disc_source(order):
    """Disc source mesh + dh with one field of given order, seeded with the
    analytic nodal values f(x) = sgn * |x| (reference's apply_analytical!)."""
    mesh = tb.generate_simple_disc_mesh(40)
    dh = DofHandler(mesh).add_field("v", order=order).close()
    coords = dh.field_dof_coords("v")
    return mesh, dh, coords


def test_matching_grid_transfer():
    """Source disc P1/P2 fields evaluated at target dof sites inside the
    disc reproduce the analytic field (reference atol 3e-1 on the same
    meshes)."""
    tgt = tb.generate_mesh("tri3", (10, 11), (-1.0, -1.0), (1.0, 1.0))
    tdh = DofHandler(tgt).add_field("w", order=1).close()
    tcoords = tdh.field_dof_coords("w")
    inside = np.linalg.norm(tcoords, axis=1) <= 0.95  # stay off the rim
    for order, sgn in [(1, 1.0), (2, -1.0)]:
        mesh, dh, coords = _disc_source(order)
        u = jnp.asarray(sgn * np.linalg.norm(coords, axis=1))
        op = NodalIntergridTransfer(mesh, dh, "v", tcoords)
        out = np.asarray(op.transfer(u))
        want = sgn * np.linalg.norm(tcoords[inside], axis=1)
        assert np.abs(out[inside] - want).max() < 3e-1
        # P2 radial field is captured much better than P1's bilinear fan
        if order == 2:
            assert np.abs(out[inside] - want).max() < 6e-2


def test_nonmatching_grid_nan_outside():
    """Target grid larger than the source: points outside the disc give
    NaN, points inside transfer (reference's non-matching testset)."""
    mesh, dh, coords = _disc_source(1)
    u = jnp.asarray(np.linalg.norm(coords, axis=1))
    # (20, 22): enough target points on both sides of the disc boundary to
    # prove the NaN-outside/finite-inside split; 4x fewer point locations
    # than the original (40, 44) keeps this in the fast gate
    tgt = tb.generate_mesh("tri3", (20, 22), (-2.0, -2.0), (2.0, 2.0))
    tdh = DofHandler(tgt).add_field("w", order=1).close()
    tcoords = tdh.field_dof_coords("w")
    op = NodalIntergridTransfer(mesh, dh, "v", tcoords)
    out = np.asarray(op.transfer(u))
    rad = np.linalg.norm(tcoords, axis=1)
    outside = rad > 1.05
    inside = rad <= 0.95
    assert np.isnan(out[outside]).all()
    assert np.isfinite(out[inside]).all()
    assert np.abs(out[inside] - rad[inside]).max() < 3e-1


def test_subdomain_restricted_target():
    """Target field living only on a 'hole' cellset: transfer lands on the
    restricted dof set (the reference's subdomains_to path)."""
    mesh, dh, coords = _disc_source(1)
    u = jnp.asarray(np.linalg.norm(coords, axis=1))
    tgt = tb.generate_mesh("tri3", (20, 22), (-2.0, -2.0), (2.0, 2.0))
    blk = tgt.blocks[0]
    cent = tgt.nodes[blk.connectivity].mean(axis=1)
    hole = np.nonzero(np.linalg.norm(cent, axis=1) <= 1.0)[0]
    tgt.cellsets["hole"] = hole
    tdh = DofHandler(tgt).add_field("w", order=1, subdomains="hole").close()
    tcoords = tdh.field_dof_coords("w")
    assert tcoords.shape[0] < tgt.nnodes  # actually restricted
    out = np.asarray(NodalIntergridTransfer(mesh, dh, "v", tcoords)
                     .transfer(u))
    rad = np.linalg.norm(tcoords, axis=1)
    inside = rad <= 0.95
    assert np.abs(out[inside] - rad[inside]).max() < 3e-1


def test_point_eval_vector_field_and_missing():
    """evaluate_at_points on a vector field returns [np, ncomp]; points
    outside the mesh give NaN rows (PointEvalHandler.missing)."""
    mesh = tb.generate_mesh("quad4", (4, 4))
    dh = DofHandler(mesh).add_field("d", order=1, ncomponents=2).close()
    coords = dh.field_dof_coords("d")
    u = jnp.asarray(np.stack([coords[:, 0], 2 * coords[:, 1]],
                             axis=1).ravel())
    pts = np.array([[0.3, 0.7], [5.0, 5.0]])
    ph = PointEvalHandler(mesh, pts)
    assert list(ph.missing) == [1]
    out = evaluate_at_points(mesh, dh, "d", u, pts)
    assert np.allclose(out[0], [0.3, 1.4], atol=1e-12)
    assert np.isnan(out[1]).all()
