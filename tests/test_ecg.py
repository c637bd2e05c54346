"""ECG forward models. Parity with ``test/integration/test_ecg.jl``:
dipole symmetry/sign physics for all three methods + cross-method
consistency of lead polarity."""

import numpy as np
import pytest
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.ecg import (
    Plonsey1964ECGGaussCache, Geselowitz1989ECGLeadCache,
    PoissonECGReconstructionCache)


@pytest.fixture(scope="module")
def heart():
    mesh = tb.generate_mesh("hex8", (8, 4, 4), (0, 0, 0), (2.0, 1.0, 1.0))
    model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                               stim=tb.NoStimulationProtocol(),
                               ion=tb.FHNModel())
    ode = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float64),
        mesh)
    heat = ode.functions[0]
    coords = heat.dh.fields["phi_m"].entity_coords
    # a wavefront along x: phi = tanh((x0 - x)/w) -> dipole pointing +x
    phi = jnp.asarray(np.tanh((1.0 - coords[:, 0]) / 0.2))
    return mesh, ode, heat, phi


def test_plonsey_dipole_sign_and_symmetry(heart):
    mesh, ode, heat, phi = heart
    cache = Plonsey1964ECGGaussCache(heat, kappa_i=1e-3)
    cache.update_ecg(phi)
    # electrodes in front of / behind the wavefront along x
    e = np.array([[4.0, 0.5, 0.5], [-2.0, 0.5, 0.5]])
    v = cache.evaluate_ecg(e, kappa_t=1.0)
    assert v.shape == (2,)
    # potentials have opposite sign and similar magnitude (symmetric probes)
    assert v[0] * v[1] < 0, v
    assert abs(abs(v[0]) / abs(v[1]) - 1.0) < 0.5
    # uniform phi -> zero ECG
    cache.update_ecg(jnp.ones_like(phi))
    v0 = cache.evaluate_ecg(e, kappa_t=1.0)
    assert np.abs(v0).max() < 1e-10


def test_geselowitz_lead(heart):
    mesh, ode, heat, phi = heart
    pairs = [((2.0, 0.5, 0.5), (0.0, 0.5, 0.5)),
             ((0.0, 0.5, 0.5), (2.0, 0.5, 0.5))]
    cache = Geselowitz1989ECGLeadCache(heat, kappa=1e-3, kappa_i=1e-3,
                                       electrode_pairs=pairs)
    cache.update_ecg(phi)
    V = cache.evaluate_ecg()
    assert V.shape == (2,)
    # swapping the electrode pair flips the lead signal
    assert np.isclose(V[0], -V[1], rtol=1e-8)
    assert abs(V[0]) > 1e-8
    # uniform potential -> zero lead signal
    cache.update_ecg(jnp.ones_like(phi))
    assert np.abs(cache.evaluate_ecg()).max() < 1e-10


def test_poisson_reconstruction(heart):
    mesh, ode, heat, phi = heart
    electrodes = [(2.0, 0.5, 0.5), (0.0, 0.5, 0.5)]
    cache = PoissonECGReconstructionCache(
        heat, kappa=1e-3, kappa_i=1e-3, electrodes=electrodes,
        ground=(0.0, 0.0, 0.0))
    cache.update_ecg(phi)
    V = cache.evaluate_ecg()
    assert V.shape == (2,)
    assert np.isfinite(V).all()
    # the two electrodes see different potentials across the dipole
    assert abs(V[0] - V[1]) > 1e-6
    # uniform phi -> (numerically) constant phi_e -> zero difference
    cache.update_ecg(jnp.zeros_like(phi))
    V0 = cache.evaluate_ecg()
    assert abs(V0[0] - V0[1]) < 1e-7  # CG tolerance floor (warm start)


def test_geselowitz_poisson_polarity_agree(heart):
    """Both volume-conductor methods agree on lead polarity."""
    mesh, ode, heat, phi = heart
    p_plus, p_minus = (2.0, 0.5, 0.5), (0.0, 0.5, 0.5)
    ges = Geselowitz1989ECGLeadCache(heat, 1e-3, 1e-3,
                                     [(p_plus, p_minus)])
    ges.update_ecg(phi)
    poi = PoissonECGReconstructionCache(heat, 1e-3, 1e-3,
                                        [p_plus, p_minus],
                                        ground=(0.0, 0.0, 0.0))
    poi.update_ecg(phi)
    V_ges = ges.evaluate_ecg()[0]
    Vp = poi.evaluate_ecg()
    V_poi = Vp[0] - Vp[1]
    assert V_ges * V_poi > 0, (V_ges, V_poi)


def test_poisson_torso_mesh(heart):
    """Distinct torso mesh: phi_m transferred heart -> torso, reconstruction
    solved on the torso (``ecg.jl`` transfer path)."""
    mesh, ode, heat, phi = heart
    torso = tb.generate_mesh("hex8", (6, 4, 4), (-1.0, -0.5, -0.5),
                             (3.0, 1.5, 1.5))
    # anisotropic intracellular tensor vs isotropic bath — with kappa_i
    # proportional to kappa the reconstruction is exactly -phi_m and the
    # far field vanishes
    cache = PoissonECGReconstructionCache(
        heat, kappa=1e-3, kappa_i=np.diag([3e-3, 1e-4, 1e-4]),
        electrodes=[(3.0, 0.5, 0.5), (-1.0, 0.5, 0.5)],
        ground=(-1.0, -0.5, -0.5), torso_mesh=torso)
    cache.update_ecg(phi)
    V = cache.evaluate_ecg()
    assert np.isfinite(V).all()
    assert abs(V[0] - V[1]) > 1e-8  # the dipole is visible on the torso


@pytest.mark.slow
def test_geselowitz_torso_embedded():
    """Heart embedded in a larger torso: lead fields solved on the torso,
    transferred to the heart once (ep04 tutorial setup). A dipole-like
    phi_m gradient along +x must give opposite-sign voltages on a lead
    pair aligned vs anti-aligned with x."""
    from thunderbolt_tpu.fem.dofs import DofHandler
    heart = tb.generate_mesh("tet4", (3, 2, 2), (1.0, 1.0, 1.0),
                             (2.0, 2.0, 2.0))
    torso = tb.generate_mesh("hex8", (6, 6, 6), (0.0, 0.0, 0.0),
                             (3.0, 3.0, 3.0))
    dh = DofHandler(heart).add_field("phi_m").close()

    class _Fn:
        pass
    fn = _Fn()
    fn.dh, fn.field = dh, "phi_m"
    ges = Geselowitz1989ECGLeadCache(
        fn, kappa=1.0, kappa_i=1e-2,
        electrode_pairs=[((0.0, 1.5, 1.5), (3.0, 1.5, 1.5)),
                         ((3.0, 1.5, 1.5), (0.0, 1.5, 1.5))],
        ground=(0.0, 0.0, 0.0), torso_mesh=torso)
    assert ges.Z.shape == (2, dh.ndofs)
    assert np.isfinite(np.asarray(ges.Z)).all()
    coords = dh.field_dof_coords("phi_m")
    phi = jnp.asarray(coords[:, 0])  # uniform +x gradient
    V = ges.update_ecg(phi).evaluate_ecg()
    assert np.isfinite(V).all()
    assert abs(V[0]) > 1e-8            # a dipole IS visible on the lead
    assert np.isclose(V[0], -V[1], rtol=1e-10)  # reversed pair flips sign


def test_planar_wave_x3_orthogonality_and_idempotence(heart):
    """phi = x^3 drives a signal along x only: strong and sign-split on
    the +-x electrodes, ~0 on orthogonal axes; updating twice with the
    same phi changes nothing (parity: test_ecg.jl:113-193 'Idempotence' +
    'Planar wave' x_i^3)."""
    mesh, ode, heat, phi0 = heart
    coords = heat.dh.fields["phi_m"].entity_coords
    phi = jnp.asarray((coords[:, 0] - 1.0) ** 3)    # centered cube wave
    cache = Plonsey1964ECGGaussCache(heat, kappa_i=1e-3)
    cache.update_ecg(phi)
    far = 4.0
    ex = np.array([[1.0 + far, 0.5, 0.5], [1.0 - far, 0.5, 0.5]])
    ey = np.array([[1.0, 0.5 + far, 0.5], [1.0, 0.5 - far, 0.5]])
    ez = np.array([[1.0, 0.5, 0.5 + far], [1.0, 0.5, 0.5 - far]])
    vx = cache.evaluate_ecg(ex, kappa_t=1.0)
    vy = cache.evaluate_ecg(ey, kappa_t=1.0)
    vz = cache.evaluate_ecg(ez, kappa_t=1.0)
    scale = np.abs(vx).max()
    assert scale > 1e-8
    assert vx[0] * vx[1] < 0                      # sign splits along x
    # orthogonal electrodes see (near) nothing
    assert np.abs(vy).max() < 0.05 * scale
    assert np.abs(vz).max() < 0.05 * scale
    # idempotence: a second update with the same phi is a no-op
    v1 = cache.evaluate_ecg(ex, kappa_t=1.0)
    cache.update_ecg(phi)
    v2 = cache.evaluate_ecg(ex, kappa_t=1.0)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=0)
    # Geselowitz idempotence too
    ges = Geselowitz1989ECGLeadCache(heat, 1e-3, 1e-3,
                                     [(tuple(ex[0]), tuple(ex[1]))])
    ges.update_ecg(phi)
    g1 = ges.evaluate_ecg()
    ges.update_ecg(phi)
    np.testing.assert_allclose(g1, ges.evaluate_ecg(), rtol=0, atol=0)
