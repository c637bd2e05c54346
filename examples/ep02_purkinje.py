"""EP tutorial 2: Purkinje-style mixed-dimensional conduction.

Mirrors the topic of ``docs/src/literate-tutorials/ep02_purkinje.jl`` (a
content stub in the reference; the mixed-dimensional Hex+Line machinery it
relies on is the fixture of ``test/testfixtures.jl:20-43``): a 1D cable
with fast conduction embedded in a 3D monodomain slab, sharing mesh nodes,
so the wavefront races down the cable and re-enters the tissue from the
far end.

Run:  python examples/ep02_purkinje.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
from thunderbolt_tpu.utils.smoke import smoke

L, W = 8.0, 1.5
nx, ny, nz = smoke((16, 4, 4), (32, 6, 6))
T_END = smoke(80.0, 200.0)
mesh3 = tb.generate_mesh("hex8", (nx, ny, nz), (0, 0, 0), (L, W, W))

# cable along the y=0, z=0 edge, sharing the slab's nodes
edge = np.nonzero((np.abs(mesh3.nodes[:, 1]) < 1e-12)
                  & (np.abs(mesh3.nodes[:, 2]) < 1e-12))[0]
edge = edge[np.argsort(mesh3.nodes[edge, 0])]
cable = ElementBlock("line2", np.stack([edge[:-1], edge[1:]], 1).astype(np.int32))
mesh = Mesh(mesh3.nodes, list(mesh3.blocks) + [cable],
            nodesets=dict(mesh3.nodesets), facetsets=dict(mesh3.facetsets))

nhex = mesh3.blocks[0].ncells
kappa = np.full(nhex + cable.ncells, 4e-4)
kappa[nhex:] = 0.05                      # ~100x faster along the cable

model = tb.MonodomainModel(
    chi=1.0, Cm=1.0,
    kappa=tb.FieldCoefficient(kappa, per_cell_constant=True),
    stim=tb.NoStimulationProtocol(), ion=tb.FHNModel())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit(model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32), mesh)

u0 = tb.create_initial_condition(ode, jnp.float32)
u0 = tb.setvariable(u0, ode, "phi_m",
                    lambda x: np.where(x[:, 0] <= 0.4, 1.0, 0.0))

alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8),
                            tb.ForwardEulerCellSolver(substeps=8)))
integ = tb.init(ode, alg, u0, (0.0, T_END), 0.5)

io = tb.ParaViewWriter("out/EP02_purkinje")
p_cable = int(np.argmin(np.linalg.norm(mesh.nodes - [L, 0, 0], axis=1)))
p_far = int(np.argmin(np.linalg.norm(mesh.nodes - [L, W, W], axis=1)))
for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, T_END + 1, 10.0)):
    phi = tb.nodal_values(u, ode, "phi_m", mesh)
    io.store_timestep(t, mesh3, {"phi_m": phi})
    print(f"t = {t:6.1f} ms   phi(cable end) = {float(phi[p_cable]):+.3f}"
          f"   phi(far corner) = {float(phi[p_far]):+.3f}")
io.finalize()
print("wrote out/EP02_purkinje.pvd")
