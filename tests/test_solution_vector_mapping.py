"""Stage wiring between DofHandlers (parity: the reference's
``SolutionVectorMapping`` protocol suite, ``test/test_solution_vector_mapping.jl``).

The reference appends condensed internal variables to the solution vector
and maps them between handlers; here the condensed state is a separate
pytree threaded through Newton (``disc/mechanics.py``), so the internal-
variable half of the reference suite is covered by the extras-roundtrip
assertions in ``tests/test_multidomain_mechanics.py`` / ``test_rdq20.py``.
This file covers the dof half: the field mapping between a (d) handler and
a (d, v) handler over the same mesh."""

import numpy as np
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.dofs import DofHandler, field_dof_mapping


def _handlers(velocity_order=1):
    mesh = tb.generate_mesh("hex8", (2, 1, 1), (0, 0, 0), (1.0, 0.2, 0.2))
    dh_u = DofHandler(mesh).add_field("d", order=1, ncomponents=3).close()
    dh_uv = (DofHandler(mesh)
             .add_field("d", order=1, ncomponents=3)
             .add_field("v", order=velocity_order, ncomponents=3).close())
    return dh_u, dh_uv


def test_dof_wiring_is_a_bijection_onto_the_field():
    dh_u, dh_uv = _handlers()
    m = field_dof_mapping(dh_u, "d", dh_uv, "d")
    assert len(m) == dh_u.ndofs
    assert len(np.unique(m)) == len(m)
    assert (0 <= m).all() and (m < dh_uv.ndofs).all()
    # a second same-order field doubles the handler; displacement is half
    assert dh_uv.ndofs == 2 * dh_u.ndofs


def test_displacement_and_velocity_wirings_are_disjoint():
    dh_u, dh_uv = _handlers()
    d = field_dof_mapping(dh_u, "d", dh_uv, "d")
    v = field_dof_mapping(dh_u, "d", dh_uv, "v")
    assert len(v) == len(d)
    assert not set(v) & set(d)
    # together they cover the whole handler: there is no third field
    assert np.array_equal(np.sort(np.concatenate([d, v])),
                          np.arange(dh_uv.ndofs))


def test_gather_then_scatter_is_a_round_trip():
    dh_u, dh_uv = _handlers()
    m = field_dof_mapping(dh_u, "d", dh_uv, "d")
    source = np.arange(1.0, dh_uv.ndofs + 1)
    target = source[m]                      # gather
    wiped = np.zeros(dh_uv.ndofs)
    wiped[m] = target                       # scatter
    assert np.array_equal(wiped[m], source[m])
    # untouched (velocity) dofs stay wiped — the mapping is surjective
    # exactly onto the field
    v = field_dof_mapping(dh_u, "d", dh_uv, "v")
    assert (wiped[v] == 0).all()


def test_values_follow_geometry():
    """A coordinate field gathered through the mapping lands on the dst
    handler's own dof coordinates."""
    dh_u, dh_uv = _handlers()
    coords = dh_uv.field_dof_coords("d")
    u_src = np.repeat(coords[:, 0], 3)      # x at every component
    m = field_dof_mapping(dh_u, "d", dh_uv, "d")
    got = u_src[m].reshape(-1, 3)[:, 0]
    assert np.allclose(got, dh_u.field_dof_coords("d")[:, 0])


def test_mismatched_interpolations_raise():
    dh_u, dh_uv = _handlers(velocity_order=2)
    with pytest.raises(ValueError, match="order"):
        field_dof_mapping(dh_u, "d", dh_uv, "v")
    mesh = tb.generate_mesh("hex8", (2, 1, 1), (0, 0, 0), (1.0, 0.2, 0.2))
    blk = mesh.blocks[0]
    mesh.cellsets["half"] = np.arange(blk.ncells // 2)
    dh_half = DofHandler(mesh).add_field("d", order=1, ncomponents=3,
                                         subdomains="half").close()
    with pytest.raises(ValueError, match="entity"):
        field_dof_mapping(dh_half, "d", dh_uv, "d")
