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
    # pacemaker: FHN pushed into auto-oscillation via a POSITIVE recovery
    # offset d (the s-nullcline then meets the cubic on its unstable middle
    # branch -> limit cycle); tissue: standard excitable FHN
    pacemaker = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-3, stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel(d=0.08))
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


def test_interface_diffusion_couples_disconnected_regions():
    """Two strips sharing a plane but NO nodes: the wave crosses only via
    the InterfaceDiffusionModel jump coupling (parity:
    test_electrophysiology.jl multi-subdomain interface block)."""
    from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock

    mA = tb.generate_mesh("quad4", (8, 4), (0.0, 0.0), (1.0, 0.5))
    mB = tb.generate_mesh("quad4", (8, 4), (1.0, 0.0), (2.0, 0.5))
    nodes = np.vstack([mA.nodes, mB.nodes])
    blocks = [ElementBlock("quad4", mA.blocks[0].connectivity),
              ElementBlock("quad4", mB.blocks[0].connectivity + mA.nnodes)]
    mesh = Mesh(nodes, blocks)  # NOT welded: duplicate nodes at x=1
    nA = mA.ncells
    mesh.cellsets["A"] = np.arange(nA)
    mesh.cellsets["B"] = np.arange(nA, nA + mB.ncells)
    # interface facetsets: right boundary of A, left boundary of B
    mesh.facetsets["iA"] = mA.facetsets["right"]
    mesh.facetsets["iB"] = np.asarray(
        [(gc + nA, lf) for gc, lf in mB.facetsets["left"]], np.int64)

    def build(G):
        mono = lambda: tb.MonodomainModel(
            chi=1.0, Cm=1.0, kappa=1e-3, stim=tb.NoStimulationProtocol(),
            ion=tb.FHNModel())
        spec = {"A": mono(), "B": mono()}
        if G is not None:
            spec["iface"] = tb.InterfaceDiffusionModel(
                G, "phi_m", ("iA", "iB"))
        ode = tb.semidiscretize(
            tb.ReactionDiffusionSplit(spec),
            tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
            mesh)
        u0 = tb.create_initial_condition(ode, jnp.float64)
        vi = tb.solution_variable(ode, "phi_m")
        kick = np.where(vi.coords[:, 0] < 0.3, 1.0, 0.0)
        u0 = u0.at[vi.slice].set(jnp.asarray(kick))
        alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-8),
                                    tb.ForwardEulerCellSolver(substeps=8)))
        u = tb.init(ode, alg, u0, (0.0, 120.0), dt=1.0).solve()
        phi = np.asarray(u[vi.slice])
        right_of_gap = vi.coords[:, 0] > 1.5
        return phi[right_of_gap].max()

    # without coupling the B strip never fires; with it the wave crosses
    assert build(None) < 0.05
    assert build(1e-2) > 0.5


def test_rtc_on_multi_subdomain_split(multidomain):
    """ReactionTangentController drives the multi-subdomain split: the
    reaction tangent is the max d(phi)/dt over ALL subdomains' ionic
    models, and the adaptive solve agrees with fixed fine stepping
    (generalizes test_ep.py::test_reaction_tangent_controller beyond the
    single-ion split; ref rtc.jl applied per cell child)."""
    mesh, ode = multidomain
    u0 = tb.create_initial_condition(ode, jnp.float64)
    heat, cells = ode.functions
    u0 = u0.at[cells.parts[0].phi_dofs].set(0.4)
    be = tb.BackwardEulerSolver(rtol=1e-8, atol=1e-10)
    fe = tb.ForwardEulerCellSolver(substeps=8)
    T = 40.0
    u_fix = tb.init(ode, tb.LieTrotterGodunov((be, fe)), u0, (0, T),
                    dt=0.25).solve()
    rtc = tb.ReactionTangentController((be, fe), sigma_s=20.0, sigma_c=0.1,
                                       dt_bounds=(0.25, 1.0))
    integ = tb.init(ode, rtc, u0, (0.0, T), 1.0)
    u_rtc = integ.solve()
    nsteps = integ.stats.naccept
    assert T / 1.0 < nsteps < T / 0.25, nsteps
    err = np.abs(np.asarray(u_rtc) - np.asarray(u_fix)).max()
    assert err < 5e-2, err


def test_quadratic_interface_jump_exact():
    """dG interface batches on QUADRATIC geometry: the jump of a continuous
    field through N_jump vanishes to machine precision and w_dG integrates
    the exact interface area (exercises the hex27 facet trace + inverse
    mapping; depends on the facet-geometry node-ordering fix)."""
    from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.facets import make_interface_batch
    ml = tb.elevate_to_quadratic(
        tb.generate_mesh("hex8", (2, 2, 2), (0, 0, 0), (0.5, 1, 1)))
    mr = tb.elevate_to_quadratic(
        tb.generate_mesh("hex8", (2, 2, 2), (0.5, 0, 0), (1, 1, 1)))
    nodes = np.vstack([ml.nodes, mr.nodes])
    mesh = Mesh(nodes, [
        ElementBlock("hex27", ml.blocks[0].connectivity),
        ElementBlock("hex27", mr.blocks[0].connectivity + ml.nnodes)])
    fa = ml.facetsets["right"].copy()
    fb = mr.facetsets["left"].copy()
    fb[:, 0] += ml.ncells
    mesh.facetsets["ia"] = fa
    mesh.facetsets["ib"] = fb
    dh = DofHandler(mesh).add_field("u", order=2).close()
    ib = make_interface_batch(dh, "u", "ia", "ib", dtype=jnp.float64)
    coords = dh.fields["u"].entity_coords
    u = jnp.asarray(1.0 + 2 * coords[:, 0] - coords[:, 1]
                    + 0.5 * coords[:, 2] * coords[:, 1])
    jump = np.asarray(jnp.einsum("pqb,pb->pq", ib["N_jump"],
                                 u[ib["pair_dofs"]]))
    assert np.abs(jump).max() < 1e-12
    assert abs(float(np.asarray(ib["w_dG"]).sum()) - 1.0) < 1e-12
