"""Solution-variable protocol tests mirroring the reference's dedicated
suite (``test/test_solution_variables.jl``): publishing/lookup, get/set
round trips, transmembrane potential at any state index, custom symbol
names, cell-model defaults, layout agreement, and tree-wide uniqueness
across subdomains with different cell models.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _mono(ion, phisym="phi_m", ssym="s", N=6):
    mesh = tb.generate_mesh("quad4", (N, N))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-3, stim=tb.NoStimulationProtocol(),
        ion=ion, transmembrane_solution_symbol=phisym,
        internal_state_symbol=ssym)
    return tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({phisym: 1}, dtype=jnp.float64),
        tb.generate_mesh("quad4", (N, N)))


def test_publishing_and_lookup():
    """Every published name resolves to an in-bounds view; unknown names
    raise (ref 'Publishing and lookup')."""
    ode = _mono(tb.FHNModel())
    names = tb.solution_variable_names(ode)
    assert "phi_m" in names and "s" in names
    for name in names:
        vi = tb.solution_variable(ode, name)
        assert 0 <= vi.offset and vi.offset + vi.size <= ode.solution_size
    with pytest.raises(KeyError):
        tb.solution_variable(ode, "nonexistent")


def test_get_set_round_trip():
    """Scalar, array, and callable setters round-trip through getvariable
    without touching other variables (ref 'Round trip...')."""
    ode = _mono(tb.FHNModel())
    u = tb.create_initial_condition(ode, jnp.float64)
    s_before = np.asarray(tb.getvariable(u, ode, "s")).copy()
    u = tb.setvariable(u, ode, "phi_m", 0.25)
    assert (np.asarray(tb.getvariable(u, ode, "phi_m")) == 0.25).all()
    np.testing.assert_array_equal(np.asarray(tb.getvariable(u, ode, "s")),
                                  s_before)
    vi = tb.solution_variable(ode, "phi_m")
    arr = np.linspace(0.0, 1.0, vi.size)
    u = tb.setvariable(u, ode, "phi_m", arr)
    np.testing.assert_allclose(np.asarray(tb.getvariable(u, ode, "phi_m")),
                               arr)
    u = tb.setvariable(u, ode, "phi_m", lambda x: x[:, 0])
    np.testing.assert_allclose(np.asarray(tb.getvariable(u, ode, "phi_m")),
                               vi.coords[:, 0])


def test_phi_at_any_state_index():
    """AlievPanfilov orders (s, phi): phi_index=1. Named access, defaults,
    and the AoS layout all honor the index (ref 'The transmembrane
    potential may sit at any state index')."""
    ion = tb.AlievPanfilovModel()
    assert ion.phi_index == 1
    ode = _mono(ion)
    u0 = tb.create_initial_condition(ode, jnp.float64)
    u0 = tb.setvariable(u0, ode, "phi_m", 0.8)
    # AoS: column phi_index must be the phi values
    aos = np.asarray(tb.to_point_blocked(u0, ode))
    np.testing.assert_allclose(aos[:, ion.phi_index], 0.8)
    np.testing.assert_allclose(
        aos[:, 0], np.asarray(tb.getvariable(u0, ode, "s")))
    # a step keeps the aliasing consistent: phi evolves, both views agree
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-8),
                                tb.ForwardEulerCellSolver()))
    integ = tb.init(ode, alg, u0, (0.0, 1.0), dt=0.5)
    u = integ.solve()
    aos = np.asarray(tb.to_point_blocked(u, ode))
    np.testing.assert_allclose(aos[:, ion.phi_index],
                               np.asarray(tb.getvariable(u, ode, "phi_m")))
    assert np.isfinite(aos).all()


def test_custom_transmembrane_name():
    """The publish name follows the model's symbol (ref 'Custom
    transmembrane potential name')."""
    ode = _mono(tb.FHNModel(), phisym="V", ssym="w")
    names = tb.solution_variable_names(ode)
    assert "V" in names and "w" in names and "phi_m" not in names


def test_defaults_come_from_cell_model():
    """create_initial_condition fills each variable with the ionic model's
    default state (ref 'Defaults come from the cell model')."""
    ion = tb.FHNModel()
    ode = _mono(ion)
    u0 = np.asarray(tb.create_initial_condition(ode, jnp.float64))
    defaults = np.asarray(ion.default_initial_state())
    np.testing.assert_allclose(
        u0[tb.solution_variable(ode, "phi_m").slice],
        defaults[ion.phi_index])
    np.testing.assert_allclose(
        u0[tb.solution_variable(ode, "s").slice], defaults[1])


def test_layout_agrees_with_solver_cache():
    """SoA <-> AoS conversions are exact inverses and agree with the named
    views (ref 'Layout agrees with the solver cache')."""
    ode = _mono(tb.FHNModel())
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=ode.solution_size))
    aos = tb.to_point_blocked(u, ode)
    back = tb.from_point_blocked(aos, ode, u)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u))
    np.testing.assert_array_equal(
        np.asarray(aos)[:, tb.FHNModel().phi_index],
        np.asarray(tb.getvariable(u, ode, "phi_m")))


def test_multidomain_tree_uniqueness_and_models():
    """Subdomains with DIFFERENT cell models: names are tree-wide unique,
    per-region defaults land in the right blocks, and every dof is owned
    (ref 'Nested splits...' + 'Subdomains with different cell models')."""
    mesh = tb.generate_mesh("quad4", (8, 4), (0.0, 0.0), (2.0, 1.0))
    centroids = np.stack([mesh.nodes[b.connectivity].mean(1)
                          for b in mesh.blocks]).reshape(-1, 2)
    mesh.cellsets["left"] = np.nonzero(centroids[:, 0] < 1.0)[0]
    mesh.cellsets["right"] = np.nonzero(centroids[:, 0] >= 1.0)[0]
    fhn = tb.FHNModel()
    ap = tb.AlievPanfilovModel()
    left = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                              stim=tb.NoStimulationProtocol(), ion=fhn)
    right = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                               stim=tb.NoStimulationProtocol(), ion=ap)
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit({"left": left, "right": right}),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    names = tb.solution_variable_names(ode)
    assert len(names) == len(set(names))
    assert "phi_m" in names
    assert any(n.startswith("left/") for n in names)
    assert any(n.startswith("right/") for n in names)
    # per-region defaults: phi defaults agree here (both 0), internal
    # states land per model
    u0 = np.asarray(tb.create_initial_condition(ode, jnp.float64))
    heat, cells = ode.functions
    for part, ion in zip(cells.parts, (fhn, ap)):
        d = np.asarray(ion.default_initial_state())
        U = np.asarray(part.gather(jnp.asarray(u0)))
        np.testing.assert_allclose(U, np.repeat(d[:, None], part.npoints,
                                                axis=1))
    # the split solves: one step stays finite with mixed models
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-8),
                                tb.ForwardEulerCellSolver()))
    integ = tb.init(ode, alg, jnp.asarray(u0), (0.0, 1.0), dt=0.5)
    assert np.isfinite(np.asarray(integ.solve())).all()
