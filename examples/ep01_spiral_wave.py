"""EP tutorial 1: spiral wave on a 2D sheet (monodomain + FitzHugh-Nagumo).

Mirrors the reference tutorial
``docs/src/literate-tutorials/ep01_spiral-wave.jl`` on the TPU-native stack:
the reaction-diffusion split becomes one jitted program per step chunk.

Run:  python examples/ep01_spiral_wave.py  (writes ./EP01_spiral_wave/*.vtu)
"""

import numpy as np
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

# 1. geometry: a 2.5 x 2.5 sheet of tissue
mesh = tb.generate_mesh("quad4", smoke((32, 32), (64, 64)),
                        (0.0, 0.0), (2.5, 2.5))

# 2. the monodomain model: chi Cm d(phi)/dt = div(kappa grad phi) + chi I
kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])  # anisotropic conductivity
model = tb.MonodomainModel(
    chi=1.0, Cm=1.0, kappa=kappa,
    stim=tb.NoStimulationProtocol(),      # the spiral comes from the IC
    ion=tb.FHNModel(),
)

# 3. semidiscretize the reaction-diffusion split (P1 Lagrange)
odeform = tb.semidiscretize(
    tb.ReactionDiffusionSplit(model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32),
    mesh)

# 4. initial condition: half-plane excitation + refractory stripe
u0 = tb.create_initial_condition(odeform, jnp.float32)
u0 = tb.setvariable(u0, odeform, "phi_m",
                    lambda x: np.where((x[:, 0] <= 1.25) & (x[:, 1] <= 1.25),
                                       1.0, 0.0))
u0 = tb.setvariable(u0, odeform, "s",
                    lambda x: np.where(x[:, 1] >= 1.25, 0.1, 0.0))

# 5. operator splitting: implicit heat step + adaptive explicit cells
alg = tb.LieTrotterGodunov((
    tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6, solver="chebyshev"),
    tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.1),
))

# 6. march and write ParaView output
dt, dtvis, T = 1.0, 25.0, smoke(100.0, 1000.0)
integ = tb.init(odeform, alg, u0, (0.0, T), dt)
io = tb.ParaViewWriter("EP01_spiral_wave")
for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, T + 1, dtvis)):
    phi = tb.nodal_values(u, odeform, "phi_m", mesh)
    io.store_timestep(t, mesh, {"phi_m": phi})
    print(f"t = {t:6.1f} ms   phi in [{phi.min():+.3f}, {phi.max():+.3f}]")
io.finalize()
print("wrote EP01_spiral_wave/EP01_spiral_wave.pvd")
