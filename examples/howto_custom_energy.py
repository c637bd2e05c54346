"""How-to: adding a custom strain-energy density.

Mirrors the topic of ``docs/src/literate-howto/custom-energies.jl`` (a
stub in the reference; the machinery is the energy catalog of
``src/modeling/solid/energies.jl``): a passive hyperelastic material is
just an object with

    psi(F, frame) -> scalar strain energy

where ``F`` is the 3x3 deformation gradient at a quadrature point and
``frame`` the local microstructure eigenbasis (rows f, s, n — or fewer;
``None`` for isotropic materials). Everything else — the first
Piola-Kirchhoff stress P = dPsi/dF and the consistent tangent dP/dF — is
derived by automatic differentiation (``jax.grad`` / ``jax.jacfwd``), so a
new material is ONLY its energy. No stress, no tangent, no element code.

``psi`` must be jnp-traceable: use ``jnp.where`` for tension-only switches
(not Python ``if``), and build invariants from the provided helpers.

Run:  python examples/howto_custom_energy.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# small cube demo; remote-TPU compile latency dwarfs the solve — force CPU
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # f64 for the FD sanity check

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.energies import (
    invariants, SimpleCompressionPenalty)


# 1. The material: a minimal transversely isotropic Fung-type energy.
#    Frozen dataclass => hashable => static under jit; parameters are
#    plain floats (swap dtype via the discretization, not the material).
@dataclass(frozen=True)
class DemoFungModel:
    """Psi = c/2 (exp(Q) - 1) + U(I3),  Q = b1 (I1bar - 3) + bf <I4f-1>^2."""
    c: float = 2.0       # kPa
    b1: float = 1.0
    bf: float = 8.0
    mpU: object = SimpleCompressionPenalty(10.0)

    def psi(self, F, frame):
        iv = invariants(F, frame)      # I1, I3, J (+ I4f/I4s/I8fs if frame)
        I1bar = iv["I1"] / jnp.cbrt(iv["I3"])
        Q = self.b1 * (I1bar - 3.0)
        if frame is not None:          # static: frame presence is structural
            e4 = iv["I4f"] - 1.0
            # tension-only fiber stiffening — jnp.where, NOT python if
            Q = Q + self.bf * jnp.where(e4 > 0.0, e4, 0.0) ** 2
        return self.c / 2.0 * (jnp.exp(Q) - 1.0) + self.mpU.U(iv["I3"])


# 2. Sanity: P = dPsi/dF vanishes at rest and AD matches finite differences.
frame = jnp.eye(3)[:1]                 # fiber along x
P_at = jax.grad(lambda F: DemoFungModel().psi(F, frame))
assert np.allclose(P_at(jnp.eye(3)), 0.0, atol=1e-12), "nonzero rest stress"
F = jnp.eye(3) + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (3, 3))
dF = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
h = 1e-5
fd = (DemoFungModel().psi(F + h * dF, frame)
      - DemoFungModel().psi(F - h * dF, frame)) / (2 * h)
assert np.allclose(jnp.sum(P_at(F) * dF), fd, rtol=1e-5), "AD/FD mismatch"
print("P = dPsi/dF checks out against finite differences.")


# 3. Use it in a solve: cube clamped at the left face, pressure on the
#    right, fibers along the stretch axis vs across it. The fiber-aligned
#    cube is stiffer, so it deflects less.
def deflection(fiber_dir):
    mesh = tb.generate_mesh("hex8", (3, 3, 3))
    micro = tb.TransverselyIsotropicMicrostructureModel(
        tb.ConstantCoefficient(np.asarray(fiber_dir, np.float64)))
    model = tb.QuasiStaticModel(
        "d", tb.PK1Model(DemoFungModel(), micro),
        (tb.ConstantPressureBC(-0.5, "right"),))    # pull in +x
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    u, stats = tb.NewtonRaphsonSolver(tol=1e-9).solve(
        fn, jnp.zeros(fn.solution_size, jnp.float64), 0.0)
    assert stats.converged, stats
    xd = fn.dh.field_dof_coords("d")
    right = np.asarray(u).reshape(-1, 3)[xd[:, 0] > 0.99]
    return float(right[:, 0].mean())


d_along = deflection([1.0, 0.0, 0.0])
d_across = deflection([0.0, 0.0, 1.0])
print(f"mean right-face stretch: fibers along pull = {d_along:.4f}, "
      f"fibers across = {d_across:.4f}")
assert 0.0 < d_along < d_across, "fiber stiffening not visible"
print("OK: custom energy drives the Newton solve; fibers stiffen the pull "
      "direction.")
