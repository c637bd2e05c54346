"""Multi-subdomain quasi-static mechanics: Dict[name -> QuasiStaticModel]
with a material per subdomain (parity: ``semidiscretize(Dict{String,
QuasiStaticModel}, ...)``, ``src/discretization/fem.jl:843-895``)."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel

DT = jnp.float64


def _split_bar(n=(4, 2, 2), L=2.0):
    mesh = tb.generate_mesh("hex8", n, (0, 0, 0), (L, 1.0, 1.0))
    blk = mesh.blocks[0]
    cent = mesh.nodes[blk.connectivity].mean(axis=1)
    left = np.nonzero(cent[:, 0] < L / 2)[0]
    right = np.nonzero(cent[:, 0] >= L / 2)[0]
    mesh.cellsets["A"] = left
    mesh.cellsets["B"] = right
    return mesh


def _disc(dbcs=()):
    return tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=list(dbcs), dtype=DT)


def test_dict_matches_single_material():
    """Same material on both subdomains == the single-model path: identical
    residual and Jacobian action (dof numbering is mesh-node ordered in
    both, so vectors compare elementwise)."""
    mesh = _split_bar()
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    fn1 = tb.semidiscretize(tb.QuasiStaticModel("d", mat, ()), _disc(), mesh)
    fn2 = tb.semidiscretize({"A": tb.QuasiStaticModel("d", mat, ()),
                             "B": tb.QuasiStaticModel("d", mat, ())},
                            _disc(), mesh)
    assert fn2.solution_size == fn1.solution_size
    rng = np.random.default_rng(0)
    u = jnp.asarray(0.03 * rng.normal(size=fn1.solution_size))
    r1 = np.asarray(fn1.residual(u, 0.0))
    r2 = np.asarray(fn2.residual(u, 0.0))
    assert np.allclose(r1, r2, atol=1e-12)
    v = jnp.asarray(rng.normal(size=fn1.solution_size))
    A1, _ = fn1.assemble_operator(u, 0.0)
    A2, _ = fn2.assemble_operator(u, 0.0)
    assert np.allclose(np.asarray(A1.mv(v)), np.asarray(A2.mv(v)), atol=1e-11)


def test_dict_jacobian_matches_fd():
    """FD consistency of the assembled tangent with two DIFFERENT
    materials."""
    mesh = _split_bar()
    models = {
        "A": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.NeoHookeanModel(mu=10.0, lam=20.0)), ()),
        "B": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.HolzapfelOgden2009Model()), ()),
    }
    fn = tb.semidiscretize(models, _disc(), mesh)
    assert fn.materials is not None and len(fn.materials) == 2
    rng = np.random.default_rng(1)
    u = jnp.asarray(0.02 * rng.normal(size=fn.solution_size))
    v = jnp.asarray(rng.normal(size=fn.solution_size))
    kvals, _ = fn.assemble(u, 0.0)
    Av = np.asarray(fn.jacobian_matrix(kvals).mv(v))
    eps = 1e-6
    fd = (np.asarray(fn.residual(u + eps * v, 0.0))
          - np.asarray(fn.residual(u - eps * v, 0.0))) / (2 * eps)
    assert np.allclose(Av, fd, atol=1e-5 * max(1.0, np.abs(fd).max())), \
        np.abs(Av - fd).max()


def test_soft_stiff_halves():
    """Stiff left half + soft right half under uniaxial stretch: the soft
    half carries most of the elongation, so the mid-plane displacement is
    well below half the end displacement."""
    mesh = _split_bar(n=(6, 2, 2))
    models = {
        "A": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.NeoHookeanModel(mu=20.0, lam=40.0)), ()),
        "B": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0)), ()),
    }
    pull = 0.2
    dbcs = [tb.Dirichlet("d", "left", 0.0),
            tb.Dirichlet("d", "right", lambda x: np.full(len(x), pull),
                         components=[0])]
    fn = tb.semidiscretize(models, _disc(dbcs), mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-10, inner="lu")
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 0.0)
    assert stats.converged, stats
    coords = fn.dh.field_dof_coords("d")
    mid = np.abs(coords[:, 0] - 1.0) < 1e-9
    ux_mid = np.asarray(u).reshape(-1, 3)[mid, 0].mean()
    assert ux_mid < 0.25 * pull, ux_mid  # homogeneous bar would give 0.5*pull


@pytest.mark.slow
def test_mixed_stateful_passive():
    """Active stateful material (condensed RDQ20 state) on one subdomain,
    plain passive on the other: internal-state threading carries None for
    the passive batch and the Newton extras roundtrip."""
    mesh = _split_bar(n=(2, 2, 2), L=1.0)
    ca = tb.AnalyticalCoefficient(lambda x, t: 1.0)
    active = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=1000.0),
        contraction_model=tb.CaDrivenInternalSarcomereModel(
            RDQ20MFModel(), ca))
    passive = tb.PK1Model(tb.NeoHookeanModel(mu=5.0, lam=20.0))
    models = {"A": tb.QuasiStaticModel("d", active, ()),
              "B": tb.QuasiStaticModel("d", passive, ())}
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    fn = tb.semidiscretize(models, _disc(dbcs), mesh)
    assert fn.internal is not None
    assert sum(st is None for st in fn.internal) == 1
    # extras roundtrip: pack -> unpack preserves the stateful batch's arrays
    extra = fn.newton_extra()
    states = fn._states_from_extra(extra)
    assert sum(st is None for st in states) == 1
    st = next(s for s in states if s is not None)
    assert st["Qprev"].shape[-1] == RDQ20MFModel().nstates

    newton = tb.NewtonRaphsonSolver(tol=1e-7, inner="lu", max_iter=25)
    fn.internal_dt, fn.internal_t = 10.0, 10.0
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, DT), 10.0)
    assert stats.converged, stats
    fn.update_internal_state(u, 10.0, 10.0)  # exercises the None branch
    # the active half contracts along x, the passive half is dragged: the
    # right face moves in -x
    coords = fn.dh.field_dof_coords("d")
    right = coords[:, 0] > 1 - 1e-9
    assert np.asarray(u).reshape(-1, 3)[right, 0].mean() < -1e-4


def test_errors():
    mesh = _split_bar()
    mat = tb.PK1Model(tb.NeoHookeanModel())
    with pytest.raises(ValueError, match="share the same displacement"):
        tb.semidiscretize({"A": tb.QuasiStaticModel("d", mat, ()),
                           "B": tb.QuasiStaticModel("u", mat, ())},
                          _disc(), mesh)
    mesh.cellsets["B"] = np.concatenate(
        [mesh.cellsets["B"], mesh.cellsets["A"][:1]])
    with pytest.raises(ValueError, match="disjoint"):
        tb.semidiscretize({"A": tb.QuasiStaticModel("d", mat, ()),
                           "B": tb.QuasiStaticModel("d", mat, ())},
                          _disc(), mesh)


# --- per-subdomain weak boundary conditions ---------------------------------
# The reference routes a subdomain's facemodels through its own element
# cache (multi-integrator.jl setup_boundary_cache); the two time-dependent
# variants below are @test_broken THERE (test_solid_mechanics.jl:461-535) —
# here they must pass.

def test_subdomain_facetsets_not_double_loaded():
    """'top' spans both subdomains; each subdomain's own PressureFieldBC
    must load only its own facets, so the union equals the single-model
    path with ONE global BC."""
    mesh = _split_bar()
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    bc = tb.PressureFieldBC(tb.ConstantCoefficient(0.03), "top")
    fn1 = tb.semidiscretize(tb.QuasiStaticModel("d", mat, (bc,)),
                            _disc(), mesh)
    fn2 = tb.semidiscretize({"A": tb.QuasiStaticModel("d", mat, (bc,)),
                             "B": tb.QuasiStaticModel("d", mat, (bc,))},
                            _disc(), mesh)
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.02 * rng.normal(size=fn1.solution_size))
    r1 = np.asarray(fn1.residual(u, 0.0))
    r2 = np.asarray(fn2.residual(u, 0.0))
    assert np.allclose(r1, r2, atol=1e-12), np.abs(r1 - r2).max()


def test_weak_bc_on_subdomain_without_matching_facetset():
    """A subdomain whose face models name a facetset it does not touch
    must neither crash nor leak load (parity:
    test_solid_mechanics.jl:572 'Weak boundary conditions on subdomains
    without a matching facetset')."""
    mesh = _split_bar()
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    # "left" lies entirely in subdomain A; B listing it must be a no-op
    bc_left = tb.PressureFieldBC(tb.ConstantCoefficient(0.03), "left")
    fn_ref = tb.semidiscretize(
        {"A": tb.QuasiStaticModel("d", mat, (bc_left,)),
         "B": tb.QuasiStaticModel("d", mat, ())}, _disc(), mesh)
    fn_extra = tb.semidiscretize(
        {"A": tb.QuasiStaticModel("d", mat, (bc_left,)),
         "B": tb.QuasiStaticModel("d", mat, (bc_left,))}, _disc(), mesh)
    rng = np.random.default_rng(3)
    u = jnp.asarray(0.02 * rng.normal(size=fn_ref.solution_size))
    r1 = np.asarray(fn_ref.residual(u, 0.0))
    r2 = np.asarray(fn_extra.residual(u, 0.0))
    assert np.allclose(r1, r2, atol=1e-12)


@pytest.mark.slow
def test_time_dependent_coefficient_on_rate_free_subdomain():
    """Rate-free (steady-state sarcomere) subdomain next to a stateful
    RDQ20 subdomain, both driven by a TIME-DEPENDENT calcium hat — the
    time must actually reach the coefficient on the rate-free side.
    @test_broken in the reference (test_solid_mechanics.jl:461)."""
    mesh = _split_bar(n=(2, 2, 2), L=1.0)
    ca = tb.AnalyticalCoefficient(
        lambda x, t: jnp.where(t / 1000.0 < 0.5,
                               2.0 * t / 1000.0, 2.0 - 2.0 * t / 1000.0))
    def active(contraction):
        return tb.ActiveStressModel(
            material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
            active_stress_model=tb.SimpleActiveStress(Tmax=500.0),
            contraction_model=tb.CaDrivenInternalSarcomereModel(
                contraction, ca))
    models = {"A": tb.QuasiStaticModel(
                  "d", active(tb.PelceSunLangeveld1995Model()), ()),
              "B": tb.QuasiStaticModel("d", active(RDQ20MFModel()), ())}
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    fn = tb.semidiscretize(models, _disc(dbcs), mesh)
    solver = tb.HomotopyPathSolver(
        tb.NewtonRaphsonSolver(tol=1e-8, inner="lu", max_iter=20))
    u, rep = solver.solve(fn, jnp.zeros(fn.solution_size, DT),
                          (0.0, 300.0), dt=50.0)
    assert rep.converged, rep
    coords = fn.dh.field_dof_coords("d")
    right = coords[:, 0] > 1 - 1e-9
    ux = np.asarray(u).reshape(-1, 3)[right, 0].mean()
    assert ux < -1e-4, ux        # Ca(300) = 0.6 -> contraction happened
    # the time reaches the rate-free coefficient: residual at equal u
    # differs between Ca(0)=0 and Ca(300)=0.6 (stateful extras threaded)
    extra = fn.newton_extra()
    r0 = np.asarray(fn.residual(u, 0.0, *extra))
    r3 = np.asarray(fn.residual(u, 300.0, *extra))
    assert np.abs(r0 - r3).max() > 1e-8


def test_time_dependent_facet_coefficient_on_subdomains():
    """Per-subdomain PressureFieldBC with a ramp coefficient: the facet
    integrals must see the time, on both a rate-free and a stateful
    subdomain. @test_broken in the reference
    (test_solid_mechanics.jl:512-571)."""
    mesh = _split_bar()
    mat = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=4.0))
    ramp = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: 0.01 * t), "top")
    models = {"A": tb.QuasiStaticModel("d", mat, (ramp,)),
              "B": tb.QuasiStaticModel("d", mat, (ramp,))}
    dbcs = [tb.Dirichlet("d", "left", 0.0), tb.Dirichlet("d", "right", 0.0)]
    fn = tb.semidiscretize(models, _disc(dbcs), mesh)
    newton = tb.NewtonRaphsonSolver(tol=1e-10, inner="lu")
    u0 = jnp.zeros(fn.solution_size, DT)
    u1, s1 = newton.solve(fn, u0, 1.0)
    u2, s2 = newton.solve(fn, u0, 2.0)
    assert s1.converged and s2.converged
    d1 = np.abs(np.asarray(u1)).max()
    d2 = np.abs(np.asarray(u2)).max()
    assert d1 > 1e-6             # load at t=1 does something
    assert d2 > 1.5 * d1         # and grows with the ramp
