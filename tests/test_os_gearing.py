"""Operator-splitting child gearing: children marching at a finer dt than
the outer split step, synchronizing at outer boundaries.

Parity model: ``test/test_os_gearing.jl`` — the reference drives its split
integrator tree with per-child dts (children fit their dt to the outer
synchronization point). TPU-native form: ``Substepped(alg, n)`` compiles the
child's substep loop into the composed outer step (fori_loop), so gearing
adds no host dispatches.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _heat(n=10):
    mesh = tb.generate_mesh("quad4", (n, n))
    model = tb.TransientDiffusionModel(kappa=1.0,
                                       solution_variable_symbol="u")
    disc = tb.FiniteElementDiscretization(
        {"u": 1},
        dbcs=[tb.Dirichlet("u", s, 0.0)
              for s in ("left", "right", "bottom", "top")],
        dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    coords = fn.dh.field_dof_coords("u")
    u0 = jnp.asarray(np.prod(np.sin(np.pi * coords), axis=-1))
    return fn, u0


def test_substepped_equals_manual_substeps():
    """Substepped(alg, n).make_step(fn, dt) is EXACTLY n applications of
    alg.make_step(fn, dt/n) — plumbing identity, no tolerance slack."""
    fn, u0 = _heat()
    dt, n = 4e-3, 4
    alg = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    geared = tb.Substepped(alg, substeps=n).make_step(fn, dt)
    inner = alg.make_step(fn, dt / n)
    u_manual = u0
    for i in range(n):
        u_manual = inner(u_manual, i * dt / n)
    u_geared = geared(u0, 0.0)
    np.testing.assert_allclose(np.asarray(u_geared), np.asarray(u_manual),
                               rtol=1e-12, atol=1e-14)


def test_substepped_dt_max_fits_substep_count():
    """dt_max gearing fits the substep count so the child dt never exceeds
    it (the reference's child-dt fitting to the outer sync point):
    dt=0.01, dt_max=0.003 -> 4 substeps of 0.0025."""
    fn, u0 = _heat()
    alg = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    geared = tb.Substepped(alg, dt_max=3e-3).make_step(fn, 1e-2)
    explicit = tb.Substepped(alg, substeps=4).make_step(fn, 1e-2)
    np.testing.assert_allclose(np.asarray(geared(u0, 0.0)),
                               np.asarray(explicit(u0, 0.0)),
                               rtol=1e-12, atol=1e-14)


def test_substepped_single_substep_is_identity_wrapper():
    fn, u0 = _heat()
    alg = tb.BackwardEulerSolver(rtol=1e-12, atol=1e-14)
    plain = alg.make_step(fn, 2e-3)
    geared = tb.Substepped(alg, substeps=1).make_step(fn, 2e-3)
    np.testing.assert_allclose(np.asarray(geared(u0, 0.0)),
                               np.asarray(plain(u0, 0.0)), rtol=0, atol=0)


def test_substepped_rejects_bad_count():
    fn, _ = _heat(4)
    with pytest.raises(ValueError):
        tb.Substepped(tb.BackwardEulerSolver(), substeps=0).make_step(
            fn, 1e-3)


def test_geared_split_improves_accuracy_and_syncs():
    """In a Lie-Trotter monodomain split, gearing the cell child reduces
    the splitting/reaction error while children still sync at outer
    boundaries (integrator accounting unchanged)."""
    mesh = tb.generate_mesh("quad4", (12, 12), (0.0, 0.0), (1.0, 1.0))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=np.eye(2) * 1e-4,
        stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel(),
        transmembrane_solution_symbol="phi_m",
        internal_state_symbol="s")
    odeform = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    u0 = tb.create_initial_condition(odeform, jnp.float64)
    u0 = tb.setvariable(u0, odeform, "phi_m",
                        lambda x: 0.8 * np.exp(-20 * ((x[:, 0] - 0.5) ** 2 +
                                                      (x[:, 1] - 0.5) ** 2)))
    be = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    fe = tb.ForwardEulerCellSolver()
    T, dt = 1.0, 0.25  # coarse outer dt stresses the reaction child

    def run(alg):
        integ = tb.init(odeform, alg, u0, (0.0, T), dt)
        u = integ.solve()
        assert integ.t == T
        assert integ.stats.naccept == int(np.ceil(T / dt))
        return np.asarray(u)

    u_plain = run(tb.LieTrotterGodunov((be, fe)))
    u_geared = run(tb.LieTrotterGodunov((be, tb.Substepped(fe, substeps=8))))
    # reference: fine fixed-dt solve (dt/8 outer everywhere)
    integ_ref = tb.init(odeform, tb.LieTrotterGodunov((be, fe)), u0,
                        (0.0, T), dt / 8)
    u_ref = np.asarray(integ_ref.solve())
    err_plain = np.abs(u_plain - u_ref).max()
    err_geared = np.abs(u_geared - u_ref).max()
    assert err_geared < err_plain, (err_geared, err_plain)


def test_nested_split_addresses_the_right_dofs():
    """A nested split (outer Lie-Trotter whose second child is itself a
    Lie-Trotter over two leaves) must integrate exactly like the flat
    3-way split: inner ranges are relative to the child's slice (parity:
    test_os_gearing.jl:471 'Nested split with view-wired leaves addresses
    the right dofs')."""
    from thunderbolt_tpu.disc.functions import (GenericSplitFunction,
                                                PointwiseODEFunction)
    npts = 8
    fa = PointwiseODEFunction(tb.FHNModel(), npts)
    fb = PointwiseODEFunction(tb.FHNModel(), npts)
    fc = PointwiseODEFunction(tb.FHNModel(), npts)
    n = fa.solution_size                      # 2 * npts each
    flat = GenericSplitFunction(
        functions=(fa, fb, fc),
        ranges=(slice(0, n), slice(n, 2 * n), slice(2 * n, 3 * n)))
    inner = GenericSplitFunction(
        functions=(fb, fc), ranges=(slice(0, n), slice(n, 2 * n)))
    nested = GenericSplitFunction(
        functions=(fa, inner),
        ranges=(slice(0, n), slice(n, 3 * n)))
    rng = np.random.default_rng(11)
    u0 = jnp.asarray(rng.uniform(0.0, 1.0, 3 * n), jnp.float64)
    fe = tb.ForwardEulerCellSolver(substeps=2)
    alg_flat = tb.LieTrotterGodunov((fe, fe, fe))
    alg_nested = tb.LieTrotterGodunov((fe, tb.LieTrotterGodunov((fe, fe))))
    u_flat = tb.init(flat, alg_flat, u0, (0.0, 2.0), 0.5).solve()
    u_nested = tb.init(nested, alg_nested, u0, (0.0, 2.0), 0.5).solve()
    assert np.allclose(np.asarray(u_flat), np.asarray(u_nested), atol=0.0)
    assert not np.allclose(np.asarray(u_flat), np.asarray(u0))
