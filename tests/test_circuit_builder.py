"""Declarative circuit builder (MTK-extension parity:
``ext/ThunderboltMTKExt.jl`` + prebuilt ``RSAFDQ2022CircuitMTK`` of
``ext/mtkmodels.jl``). The built RSAFDQ2022 circuit must reproduce the
hand-written rhs to machine precision, and built circuits must satisfy the
LumpedCircuitModel protocol (state symbols, coupling hooks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb


def test_built_rsafdq2022_matches_handwritten():
    hand = tb.RSAFDQ2022LumpedCircuitModel()
    built = tb.build_rsafdq2022_circuit()
    assert built.nstates == hand.nstates == 12
    assert tuple(built.state_symbols) == tuple(hand.state_symbols)
    assert np.allclose(built.default_initial_state(),
                       hand.default_initial_state())
    rng = np.random.default_rng(3)
    for t in (0.0, 55.0, 213.0, 700.0):
        u = jnp.asarray(hand.default_initial_state()
                        * (1.0 + 0.2 * rng.normal(size=12)))
        assert np.allclose(np.asarray(built.rhs(u, t)),
                           np.asarray(hand.rhs(u, t)), rtol=1e-14), t
        # built returns pressures in chamber insertion order (la,lv,ra,rv);
        # the hand-written accessor uses its fixed (lv,rv,la,ra) order
        p_la, p_lv, p_ra, p_rv = built.chamber_pressures(u, t)
        h_lv, h_rv, h_la, h_ra = hand.chamber_pressures(u, t)
        assert np.allclose(
            np.asarray(jnp.stack((p_lv, p_rv, p_la, p_ra))),
            np.asarray(jnp.stack((h_lv, h_rv, h_la, h_ra))), rtol=1e-14)


def test_external_pressure_hooks():
    """lv_pressure_given=False exposes the 3D-0D coupling slot with the
    same indexing convention as the hand-written model."""
    hand = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
    built = tb.build_rsafdq2022_circuit(lv_pressure_given=False)
    assert built.num_unknown_pressures() == 1
    assert built.pressure_input_index("lv") == \
        hand.pressure_input_index("lv") == 0
    assert built.volume_index("lv") == hand.volume_index("lv")
    u = jnp.asarray(hand.default_initial_state())
    p_ext = (2.5,)
    assert np.allclose(np.asarray(built.rhs(u, 10.0, p_ext)),
                       np.asarray(hand.rhs(u, 10.0, p_ext)), rtol=1e-14)
    with pytest.raises(ValueError):
        built.pressure_input_index("ra")  # ra pressure is internal


def test_custom_two_element_windkessel():
    """A fresh circuit (not the prebuilt one): ventricle + 2-element
    windkessel behind an aortic diode; heartbeat produces forward flow and
    a physiological arterial pressure decay during diastole."""
    b = tb.CircuitBuilder(THB=800.0)
    b.add(
        tb.ElastanceChamber("lv", Epass=0.01, Eactmax=0.36, V0=5.0,
                            tC=0.0, TC=340.0, TR=170.0, V_init=120.0),
        tb.CapacitorNode("art", C=9.0, p_init=10.0),
        tb.Valve("av", "lv", "art"),
        tb.PressureSource("ven", p=1.0),
        tb.Resistor("periph", "art", "ven", R=140.0),
        tb.Valve("mv", "ven", "lv"),
    )
    model = b.build()
    assert model.state_symbols == ("V_lv", "p_art")

    @jax.jit
    def march(u):
        def body(i, u):
            t = i * 1.0
            return u + 1.0 * model.rhs(u, t)
        return jax.lax.fori_loop(0, 1600, body, u)  # two beats

    u = march(jnp.asarray(model.default_initial_state()))
    V, p = float(u[0]), float(u[1])
    assert np.isfinite([V, p]).all()
    assert 1.0 < p < 25.0       # arterial pressure in a sane kPa range
    assert 5.0 < V < 200.0


def test_builder_validation():
    b = tb.CircuitBuilder()
    b.add(tb.CapacitorNode("a", 1.0))
    b.add(tb.Resistor("r", "a", "nowhere", 1.0))
    with pytest.raises(ValueError, match="unknown node"):
        b.build()
    b2 = tb.CircuitBuilder()
    b2.add(tb.CapacitorNode("a", 1.0), tb.CapacitorNode("a", 2.0))
    with pytest.raises(ValueError, match="duplicate"):
        b2.build()


def test_built_circuit_drops_into_3d0d_coupling():
    """A builder-made circuit is protocol-compatible with the 3D-0D coupled
    solver (same hooks the hand-written model exposes)."""
    from thunderbolt_tpu.models.coupling import (
        RSAFDQ2022SurrogateVolume, ChamberVolumeCoupling,
        LumpedFluidSolidCoupler, RSAFDQ2022Model, RSAFDQ2022Split)
    from thunderbolt_tpu.disc.coupled import (
        BlockedNewtonSolver, Coupled3D0DSolver)

    scale = 5.14
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    mesh.nodes[:] = mesh.nodes * scale
    material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
    model = tb.QuasiStaticModel("displacement", material, ())
    coupler = LumpedFluidSolidCoupler(
        (ChamberVolumeCoupling("Endocardium", "lv"),), "displacement",
        volume_method=RSAFDQ2022SurrogateVolume(h=(0.0, 0.0, 1.0),
                                                b=(0.0, 0.0, 0.2 * scale)))
    circuit = tb.build_rsafdq2022_circuit(lv_pressure_given=False)
    coupled = RSAFDQ2022Model(model, circuit, coupler)
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)], dtype=jnp.float64)
    fn3d, circ = tb.semidiscretize(RSAFDQ2022Split(coupled), disc, mesh)

    solver = Coupled3D0DSolver(newton=BlockedNewtonSolver(tol=1e-7,
                                                          max_iter=30))
    w, c = solver.init(fn3d, circ, jnp.float64)
    V0 = float(fn3d.volumes(w[: fn3d.nmech])[0])
    c = c.at[circ.volume_index("lv")].set(V0)
    t = 0.0
    for k in range(2):
        w, c, stats = solver.step(fn3d, circ, w, c, t, 2.0)
        assert stats.converged, (k, stats)
        t += 2.0
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(c)).all()
