"""Multi-subdomain EP: per-region cell models sharing the phi field.
Parity with the reference's multi-subdomain pacemaker test
(``test/integration/test_electrophysiology.jl:65-195``) and the packing
hard-part of SURVEY.md §7 (overlapping-split index maps)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _two_region_mesh(N=24):
    mesh = tb.generate_mesh("quad4", (N, 4), (0.0, 0.0), (6.0, 1.0))
    # left quarter = pacemaker, rest = tissue
    centroids = np.stack([mesh.nodes[b.connectivity].mean(1)
                          for b in mesh.blocks]).reshape(-1, 2)
    pm = np.nonzero(centroids[:, 0] < 1.5)[0]
    ti = np.nonzero(centroids[:, 0] >= 1.5)[0]
    mesh.cellsets["pacemaker"] = pm
    mesh.cellsets["tissue"] = ti
    return mesh


@pytest.fixture(scope="module")
def multidomain():
    mesh = _two_region_mesh()
    # pacemaker: FHN pushed into auto-oscillation via a negative offset d;
    # tissue: standard excitable FHN
    pacemaker = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-3, stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel(d=-0.08))
    tissue = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-3, stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit({"pacemaker": pacemaker, "tissue": tissue}),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    return mesh, ode


def test_state_packing(multidomain):
    """gather/scatter of every part round-trips; parts partition phi dofs."""
    mesh, ode = multidomain
    heat, cells = ode.functions
    nd = heat.dh.ndofs
    all_dofs = np.concatenate([np.asarray(p.phi_dofs) for p in cells.parts])
    assert len(all_dofs) == nd
    assert len(np.unique(all_dofs)) == nd  # disjoint ownership
    u = jnp.asarray(np.random.default_rng(0).normal(
        size=cells.solution_size))
    for part in cells.parts:
        U = part.gather(u)
        assert U.shape == (part.ion.nstates, part.npoints)
        u2 = part.scatter(u, U)
        assert np.allclose(np.asarray(u2), np.asarray(u))


def test_initial_condition_per_region(multidomain):
    mesh, ode = multidomain
    u0 = tb.create_initial_condition(ode, jnp.float64)
    assert np.isfinite(np.asarray(u0)).all()
    names = tb.solution_variable_names(ode)
    assert "phi_m" in names
    assert "pacemaker/s" in names and "tissue/s" in names


def test_pacemaker_drives_tissue(multidomain):
    """The oscillatory region fires and the wave propagates into the
    excitable tissue; with an insulating tissue (kappa ~ 0 via separate
    setup) the tissue stays quiet."""
    mesh, ode = multidomain
    u0 = tb.create_initial_condition(ode, jnp.float64)
    # kick the pacemaker region above threshold
    heat, cells = ode.functions
    pm = cells.parts[0]
    u0 = u0.at[pm.phi_dofs].set(0.4)
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-8),
                                tb.ForwardEulerCellSolver(substeps=8)))
    integ = tb.init(ode, alg, u0, (0.0, 400.0), dt=1.0)
    vi = tb.solution_variable(ode, "phi_m")
    coords = vi.coords
    far = np.argmin(np.linalg.norm(coords - [6.0, 0.5], axis=1))
    fired = False
    for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, 401.0, 50.0)):
        phi = np.asarray(u[vi.slice])
        assert np.isfinite(phi).all()
        if phi[far] > 0.5:
            fired = True
    assert fired, "wave never reached the far tissue end"
