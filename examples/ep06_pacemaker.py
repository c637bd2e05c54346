"""EP tutorial 6: pacemakers (multi-subdomain automaticity).

Mirrors the topic of ``docs/src/literate-tutorials/ep06_pacemaker.jl`` (a
content stub in the reference; the machinery is the multi-subdomain EP
split the reference tests in ``test_electrophysiology.jl:65-195``): a
sinoatrial-node-like region runs a self-oscillatory FHN variant while the
surrounding tissue is excitable-only — the node fires periodically and
each beat propagates into the tissue.

Run:  python examples/ep06_pacemaker.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# small 2D multi-subdomain demo; remote-TPU compile latency dwarfs the
# 1.2 s march here — run on CPU (drop this override for large 3D runs)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

T_END = smoke(400.0, 1500.0)
mesh = tb.generate_mesh("quad4", (48, 8), (0.0, 0.0), (6.0, 1.0))
cent = np.stack([mesh.nodes[b.connectivity].mean(1)
                 for b in mesh.blocks]).reshape(-1, 2)
mesh.cellsets["node"] = np.nonzero(cent[:, 0] < 0.75)[0]
mesh.cellsets["tissue"] = np.nonzero(cent[:, 0] >= 0.75)[0]

# the positive recovery offset d moves the nullcline intersection onto
# the unstable middle branch -> a relaxation limit cycle (automaticity;
# standalone period ~160 ms)
pacemaker = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                               stim=tb.NoStimulationProtocol(),
                               ion=tb.FHNModel(d=0.08))
tissue = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                            stim=tb.NoStimulationProtocol(),
                            ion=tb.FHNModel())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit({"node": pacemaker, "tissue": tissue}),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32), mesh)

u0 = tb.create_initial_condition(ode, jnp.float32)
heat, cells = ode.functions
u0 = u0.at[cells.parts[0].phi_dofs].set(0.4)       # kick the node once

alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8),
                            tb.ForwardEulerCellSolver(substeps=8)))
integ = tb.init(ode, alg, u0, (0.0, T_END), 1.0)
vi = tb.solution_variable(ode, "phi_m")
far = int(np.argmin(np.linalg.norm(vi.coords - [6.0, 0.5], axis=1)))

beats, above = 0, False
for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, T_END + 1, 10.0)):
    phi = float(np.asarray(u[vi.slice])[far])
    if phi > 0.5 and not above:
        beats += 1
        above = True
        print(f"t = {t:7.1f} ms  beat #{beats} reaches the far end")
    elif phi < 0.0:
        above = False
print(f"{beats} spontaneous beats propagated in {T_END / 1e3:.1f} s "
      f"(pacemaker period ~ FHN recovery time)")
