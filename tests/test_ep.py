"""End-to-end electrophysiology: semidiscretize -> split -> step -> named
variables. Parity with the reference's EP integration tests
(``test/integration/test_electrophysiology.jl``; north-star config:
``docs/src/literate-tutorials/ep01_spiral-wave.jl``)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb


def test_heat_equation_decay():
    """Pure diffusion: lowest-mode decay rate matches exp(-pi^2 t) on [0,1]
    with homogeneous Dirichlet BCs."""
    mesh = tb.generate_mesh("quad4", (16, 16))
    model = tb.TransientDiffusionModel(kappa=1.0, solution_variable_symbol="u")
    disc = tb.FiniteElementDiscretization(
        {"u": 1},
        dbcs=[tb.Dirichlet("u", n, 0.0)
              for n in ("left", "right", "bottom", "top")],
        dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    coords = fn.dh.field_dof_coords("u")
    u0 = jnp.asarray(np.prod(np.sin(np.pi * coords), axis=-1))
    dt = 1e-4
    stepper = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    integ = tb.init(fn, stepper, u0, (0.0, 0.02), dt)
    u = integ.solve()
    lam = 2 * np.pi ** 2
    expected = np.exp(-lam * 0.02) * np.asarray(u0)
    # backward Euler is O(dt): tolerance reflects 1e-4*lam*T accumulation
    err = np.abs(np.asarray(u) - expected).max()
    assert err < 5e-3, err


def _spiral_setup(N=32, dtype=jnp.float32, cell_stepper=None):
    """EP01 spiral-wave configuration (ep01_spiral-wave.jl:27-130)."""
    mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
    kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=kappa,
        stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel(),
        transmembrane_solution_symbol="phi_m",
        internal_state_symbol="s",
    )
    odeform = tb.semidiscretize(tb.ReactionDiffusionSplit(model),
                                tb.FiniteElementDiscretization({"phi_m": 1},
                                                               dtype=dtype),
                                mesh)
    u0 = tb.create_initial_condition(odeform, dtype)
    u0 = tb.setvariable(u0, odeform, "phi_m",
                        lambda x: np.where((x[:, 0] <= 1.25) & (x[:, 1] <= 1.25),
                                           1.0, 0.0))
    u0 = tb.setvariable(u0, odeform, "s",
                        lambda x: np.where(x[:, 1] >= 1.25, 0.1, 0.0))
    if cell_stepper is None:
        cell_stepper = tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.1)
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6),
                                cell_stepper))
    return mesh, odeform, u0, alg


def test_spiral_wave_slice():
    """Wave propagates: potential reaches the far corner, stays bounded."""
    mesh, odeform, u0, alg = _spiral_setup(N=32)
    integ = tb.init(odeform, alg, u0, (0.0, 150.0), dt=1.0)
    phi_info = tb.solution_variable(odeform, "phi_m")
    # probe ~0.35 beyond the initial front (FHN conduction here is slow:
    # c ~ sqrt(kappa) ~ 4e-3 length/ms)
    probe = np.argmin(np.linalg.norm(phi_info.coords - np.array([1.6, 1.0]),
                                     axis=1))
    seen = []
    for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, 151.0, 50.0)):
        phi = np.asarray(tb.getvariable(u, odeform, "phi_m"))
        assert np.isfinite(phi).all()
        assert phi.min() > -1.0 and phi.max() < 1.6
        seen.append(phi[probe])
    # the wavefront reaches the probe within 150 ms
    assert max(seen) > 0.5, seen
    # and the excited region repolarizes behind the front (spiral dynamics)
    assert seen[0] < 0.1


def test_split_steppers_agree():
    """Fixed fine-step FE vs adaptive substepper agree to tolerance
    (parity with test_electrophysiology.jl:65-195 stepper-agreement)."""
    _, odeform, u0, _ = _spiral_setup(N=16, dtype=jnp.float64)
    be = tb.BackwardEulerSolver(rtol=1e-8, atol=1e-10)
    alg_fixed = tb.LieTrotterGodunov((be, tb.ForwardEulerCellSolver(substeps=16)))
    alg_adapt = tb.LieTrotterGodunov(
        (be, tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.05,
                                               substeps=16)))
    u_fixed = tb.init(odeform, alg_fixed, u0, (0.0, 20.0), dt=1.0).solve()
    u_adapt = tb.init(odeform, alg_adapt, u0, (0.0, 20.0), dt=1.0).solve()
    err = np.abs(np.asarray(u_fixed) - np.asarray(u_adapt)).max()
    assert err < 5e-2, err


@pytest.mark.slow
def test_strang_more_accurate_than_lie():
    """Strang splitting beats Lie-Trotter against a fine-dt reference."""
    _, odeform, u0, _ = _spiral_setup(N=8, dtype=jnp.float64)
    be = tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12)
    fe = tb.ForwardEulerCellSolver(substeps=64)
    T = 8.0
    ref = tb.init(odeform, tb.LieTrotterGodunov((be, fe)), u0, (0, T),
                  dt=0.0625).solve()
    lie = tb.init(odeform, tb.LieTrotterGodunov((be, fe)), u0, (0, T),
                  dt=1.0).solve()
    strang = tb.init(odeform, tb.StrangSplitting((be, fe)), u0, (0, T),
                     dt=1.0).solve()
    e_lie = np.abs(np.asarray(lie - ref)).max()
    e_strang = np.abs(np.asarray(strang - ref)).max()
    assert e_strang < e_lie


def test_stimulation_protocol():
    """Stimulus current drives a quiescent tissue to depolarize."""
    mesh = tb.generate_mesh("quad4", (12, 12), (0.0, 0.0), (1.0, 1.0))
    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        f=lambda x, t: jnp.where(jnp.linalg.norm(x, axis=-1) < 0.3, 0.5, 0.0),
        intervals=((0.0, 2.0),))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-4, stim=stim, ion=tb.FHNModel())
    odeform = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64), mesh)
    u0 = tb.create_initial_condition(odeform, jnp.float64)
    alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(),
                                tb.ForwardEulerCellSolver(substeps=4)))
    u = tb.init(odeform, alg, u0, (0.0, 30.0), dt=0.5).solve()
    phi = np.asarray(tb.getvariable(u, odeform, "phi_m"))
    assert phi.max() > 0.5  # fired
    # without stimulus nothing happens
    model0 = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-4,
                                stim=tb.NoStimulationProtocol(),
                                ion=tb.FHNModel())
    ode0 = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model0),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64), mesh)
    u0b = tb.create_initial_condition(ode0, jnp.float64)
    ub = tb.init(ode0, alg, u0b, (0.0, 30.0), dt=0.5).solve()
    assert np.abs(np.asarray(ub)).max() < 1e-6


def test_variable_access_roundtrip():
    _, odeform, u0, _ = _spiral_setup(N=8)
    names = tb.solution_variable_names(odeform)
    assert "phi_m" in names and "s" in names
    u = tb.setvariable(u0, odeform, "s", 0.25)
    s = np.asarray(tb.getvariable(u, odeform, "s"))
    assert np.allclose(s, 0.25)
    phi = tb.getvariable(u, odeform, "phi_m")
    assert phi.shape[0] == 9 * 9


def test_paraview_writer(tmp_path):
    mesh, odeform, u0, alg = _spiral_setup(N=8)
    io = tb.ParaViewWriter("ep_test", directory=str(tmp_path))
    # VTU point data must be in mesh-node order, not dof order
    phi = tb.nodal_values(u0, odeform, "phi_m", mesh)
    assert np.isfinite(phi).all()
    # round-trip: node values match the initial condition at node coords
    expect = np.where((mesh.nodes[:, 0] <= 1.25) & (mesh.nodes[:, 1] <= 1.25),
                      1.0, 0.0)
    assert np.allclose(phi, expect)
    io.store_timestep(0.0, mesh, {"phi": phi})
    io.store_timestep(1.0, mesh, {"phi": phi * 0.5})
    io.finalize()
    import os
    assert os.path.exists(tmp_path / "ep_test" / "ep_test.pvd")
    assert os.path.exists(tmp_path / "ep_test" / "ep_test_00001.vtu")
    txt = open(tmp_path / "ep_test" / "ep_test_00000.vtu").read()
    assert "UnstructuredGrid" in txt and 'Name="phi"' in txt


def test_reaction_tangent_controller():
    """RTC adapts dt: fewer steps than fixed fine-dt, more than fixed
    coarse-dt, and the solution agrees with fixed stepping to tolerance
    (parity: test_electrophysiology.jl RTC block)."""
    _, odeform, u0, _ = _spiral_setup(N=16, dtype=jnp.float64)
    be = tb.BackwardEulerSolver(rtol=1e-8, atol=1e-10)
    fe = tb.ForwardEulerCellSolver(substeps=8)
    T = 40.0
    # fixed fine reference
    u_fix = tb.init(odeform, tb.LieTrotterGodunov((be, fe)), u0, (0, T),
                    dt=0.25).solve()
    rtc = tb.ReactionTangentController((be, fe), sigma_s=20.0, sigma_c=0.1,
                                       dt_bounds=(0.25, 1.0))
    integ = tb.init(odeform, rtc, u0, (0.0, T), 1.0)
    u_rtc = integ.solve()
    nsteps = integ.stats.naccept
    assert T / 1.0 < nsteps < T / 0.25, nsteps  # genuinely adaptive
    err = np.abs(np.asarray(u_rtc) - np.asarray(u_fix)).max()
    assert err < 5e-2, err


def test_layout_conversions():
    _, odeform, u0, _ = _spiral_setup(N=8)
    aos = tb.to_point_blocked(u0, odeform)
    assert aos.shape == (81, 2)
    back = tb.from_point_blocked(aos, odeform, u0)
    assert np.allclose(np.asarray(back), np.asarray(u0))


def test_failure_detection_unstable():
    """Deliberately unstable explicit diffusion -> ReturnCode.Unstable
    (parity: numerical-failure machinery, SURVEY.md §5.3)."""
    mesh = tb.generate_mesh("quad4", (16, 16))
    model = tb.TransientDiffusionModel(kappa=1.0)
    fn = tb.semidiscretize(model,
                           tb.FiniteElementDiscretization({"u": 1},
                                                          dtype=jnp.float32),
                           mesh)
    coords = fn.dh.field_dof_coords("u")
    u0 = jnp.asarray(np.sin(np.pi * coords[:, 0]), jnp.float32)
    # forward Euler far above the stability limit
    integ = tb.init(fn, tb.ForwardEulerSolver(), u0, (0.0, 50.0), dt=1.0)
    integ.step(50)
    assert integ.check_error() == tb.ReturnCode.Unstable
    # and the implicit path reports success
    integ2 = tb.init(fn, tb.BackwardEulerSolver(), u0, (0.0, 50.0), dt=1.0)
    integ2.step(50)
    assert integ2.check_error() == tb.ReturnCode.Success


def test_piecewise_temporal_coefficient():
    """SpatiallyHomogeneousDataField jumps at timestamps
    (``coefficients.jl:501``)."""
    coeff = tb.SpatiallyHomogeneousDataField(
        timestamps=[1.0, 2.0], values=[10.0, 20.0, 30.0])
    mesh = tb.generate_mesh("quad4", (2, 2))
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import make_form_batch
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0])
    cache = tb.setup_coefficient_cache(coeff, batch)
    assert float(tb.evaluate_coefficient(cache, 0.5)) == 10.0
    assert float(tb.evaluate_coefficient(cache, 1.5)) == 20.0
    assert float(tb.evaluate_coefficient(cache, 5.0)) == 30.0


def test_cell_index_coordinates():
    from thunderbolt_tpu.models.coordinates import CellIndexCoordinateSystem
    mesh = tb.generate_mesh("quad4", (3, 2))
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import make_form_batch
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0])
    cs = CellIndexCoordinateSystem()
    idx = np.asarray(cs.at_qps(batch))
    assert idx.shape == (6, 4, 1)
    assert np.allclose(idx[:, 0, 0], np.arange(6))


def test_chebyshev_heat_solver_accuracy():
    """Fixed-count Chebyshev BE (no inner products) matches a
    tight-tolerance CG backward-Euler step to ~1e-6 — and beats CG's own
    adaptive-stop error at the same nominal tolerance."""
    import numpy as np
    mesh = tb.generate_mesh("quad4", (24, 24), (0.0, 0.0), (2.5, 2.5))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=np.diag([4.5e-5, 2.0e-5]),
        stim=tb.NoStimulationProtocol(), ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    hf = ode.functions[0]
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.uniform(-0.2, 1.0, hf.solution_size))
    ref = tb.BackwardEulerSolver(rtol=1e-13, atol=1e-15,
                                 maxiter=5000).make_step(hf, 1.0)(phi, 0.0)
    chb = tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8,
                                 solver="chebyshev").make_step(hf, 1.0)(
        phi, 0.0)
    assert float(jnp.abs(chb - ref).max()) < 1e-6
