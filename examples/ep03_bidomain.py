"""EP tutorial 3: parabolic-elliptic bidomain with unequal anisotropy.

The reference ships this tutorial as an empty TODO stub
(``docs/src/literate-tutorials/ep03_bidomain.jl``) because its bidomain
models are unimplemented; here the full physics runs: unequal intra-/extra-
cellular anisotropy ratios (the regime where bidomain differs from any
monodomain reduction), one SPD 2x2-block backward-Euler CG solve per
diffusion step, zero-mean-gauged extracellular potential phi_e.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # small demo; remove on TPU

import jax.numpy as jnp  # noqa: E402
import thunderbolt_tpu as tb  # noqa: E402
from thunderbolt_tpu.utils.smoke import smoke  # noqa: E402


def main(N=smoke(16, 48), T=smoke(20.0, 60.0)):
    mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
    # unequal anisotropy ratios (classic bidomain-only regime):
    # intracellular strongly fiber-biased, extracellular nearly isotropic
    kappa_i = np.diag([3.0e-3, 0.3e-3])
    kappa_e = np.diag([2.0e-3, 1.6e-3])

    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        lambda x, t: jnp.where(
            ((x[..., 0] - 1.25) ** 2 + (x[..., 1] - 1.25) ** 2 < 0.04)
            & (t < 2.0), 1.0, 0.0))
    model = tb.ParabolicEllipticBidomainModel(
        chi=1.0, Cm=1.0, kappa_i=kappa_i, kappa_e=kappa_e,
        stim=stim, ion=tb.FHNModel())
    fn = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32),
        mesh)
    u0 = tb.create_initial_condition(fn, jnp.float32)
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8),
        tb.AdaptiveForwardEulerSubstepper()))
    integ = tb.init(fn, alg, u0, (0.0, T), dt=1.0)

    writer = tb.ParaViewWriter("out/ep03_bidomain")
    for t, u in tb.TimeChoiceIterator(integ, np.arange(10.0, T + 1e-9, 10.0)):
        pm = np.asarray(tb.getvariable(u, fn, "phi_m"))
        pe = np.asarray(tb.getvariable(u, fn, "phi_e"))
        print(f"t={t:5.1f}  phi_m [{pm.min():+.3f},{pm.max():+.3f}]  "
              f"phi_e [{pe.min():+.4f},{pe.max():+.4f}]  "
              f"activated {100 * (pm > 0.5).mean():.0f}%")
        writer.store_timestep(
            t, mesh,
            point_data={
                "phi_m": tb.nodal_values(u, fn, "phi_m", mesh),
                "phi_e": tb.nodal_values(u, fn, "phi_e", mesh)})
    writer.finalize()
    print("wrote out/ep03_bidomain.pvd — the anisotropy mismatch shows in "
          "the four-lobed phi_e pattern around the elliptical phi_m wave")
    return u


if __name__ == "__main__":
    main()
